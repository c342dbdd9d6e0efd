package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate's moving parts, tested off-JVM-noise: the
  * previous-round BENCH_FULL.json parse (if it silently broke, the gate
  * would report an empty diff forever) and the 2x-AND-0.5s flag rule. */
class BenchGateSpec extends AnyFunSuite {

  private val sample =
    """{"metric":"total","value":97.37,"unit":"sec","queries":{"q1":0.312,""" +
    """"substring_dedup":5.9898,"vamana_search":0.1053},""" +
    """"storage_mb_after":{"q1":42.0},"regressions":{},"sf":"/x","iters":3}"""

  test("parsePrevQueries extracts exactly the queries block") {
    val m = Bench.parsePrevQueries(sample)
    assert(m == Map("q1" -> 0.312, "substring_dedup" -> 5.9898,
      "vamana_search" -> 0.1053))
  }

  test("parsePrevQueries handles scientific-notation medians") {
    // Scala renders doubles below 1e-3 as "1.0E-4"; truncating the exponent
    // would read a 10000x-inflated baseline and fabricate/suppress flags.
    val m = Bench.parsePrevQueries(
      """{"queries":{"fast":1.0E-4,"slow":2.5e+1,"neg":3.1E-2,"mid":0.5}}""")
    assert(m == Map("fast" -> 1.0e-4, "slow" -> 25.0, "neg" -> 0.031, "mid" -> 0.5))
  }

  test("parsePrevQueries is empty on garbage, missing block, and empty file") {
    assert(Bench.parsePrevQueries("").isEmpty)
    assert(Bench.parsePrevQueries("not json at all").isEmpty)
    assert(Bench.parsePrevQueries("""{"metric":"total","value":1.0}""").isEmpty)
  }

  test("regression rule: both thresholds must trip (2x AND 0.5s absolute)") {
    val prev = Map("a" -> 1.0, "b" -> 0.1, "c" -> 2.0, "d" -> 1.0)
    val cur = Seq(
      "a" -> 2.6,  // 2.6x and +1.6s -> flagged
      "b" -> 0.45, // 4.5x but +0.35s -> noise, not flagged
      "c" -> 3.5,  // +1.5s but 1.75x -> not flagged
      "e" -> 99.0) // new query, no baseline -> not flagged
    assert(Bench.regressionsOf(prev, cur) == Seq(("a", 1.0, 2.6)))
  }

  test("tail-latency percentile is nearest-rank over the sorted sample") {
    val s100 = (1 to 100).map(_.toDouble)
    assert(ScaleBench.percentile(s100, 0.50) == 50.0)
    assert(ScaleBench.percentile(s100, 0.95) == 95.0)
    assert(ScaleBench.percentile(s100, 1.00) == 100.0)
    assert(ScaleBench.percentile(Seq(7.26), 0.95) == 7.3) // rounds to 0.1
    assert(ScaleBench.percentile(Seq(1.0, 2.0), 0.01) == 1.0) // clamps low
  }

  test("round-13's substring_dedup regression would have been flagged") {
    val prev = Bench.parsePrevQueries(
      """{"queries":{"substring_dedup":0.8469,"winnow_overlap":1.4416}}""")
    val flagged = Bench.regressionsOf(prev,
      Seq("substring_dedup" -> 5.9898, "winnow_overlap" -> 3.7426))
    assert(flagged.map(_._1) == Seq("substring_dedup", "winnow_overlap"))
  }
}
