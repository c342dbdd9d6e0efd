package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.vamana._

/** End-to-end flow through the user-facing facade, mirroring the reference's
  * Go e2e test (main.go:39-148): create → add 1000 points → build → search
  * 100 queries → recall@10 >= 0.8 → save → load → search again. */
class VamanaIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dim = 32
  private val n = 1000

  private def randVec(rng: Random): Array[Float] = Array.fill(dim)(rng.nextFloat() * 2 - 1)

  test("go-api flow: add/build/search/recall gate/save/load/stats/capacity") {
    spark.sparkContext.setLogLevel("WARN")
    val rng = new Random(2024)
    val points = Array.fill(n)(randVec(rng))
    val params = VamanaParams(dim = dim, maxDegree = 32, beamWidth = 64, alpha = 1.2f, efSearch = 128)
    val idx = new VamanaIndex(params, maxPoints = n)

    // AddPoint semantics: ok, then -1 at capacity (vamana.h:102-104)
    points.zipWithIndex.foreach { case (v, i) => assert(idx.addPoint(v, i.toLong) == 0) }
    assert(idx.addPoint(randVec(rng), 99999L) == -1, "over-capacity insert must return -1")
    assert(idx.addPoint(new Array[Float](dim + 1), 99998L) == -1, "wrong dim must be rejected")
    assert(idx.dataSize == n)

    idx.buildIndex()

    // recall@10 over 100 queries vs brute force (main.go gate: >= 0.8)
    val queries = Array.fill(100)(randVec(rng))
    val recalls = queries.map { q =>
      val truth = points.indices
        .sortBy(i => (VamanaKernel.l2sq(points(i), q), i)).take(10).map(_.toLong).toSet
      val got = idx.search(q, 10).map(_._1).toSet
      (got intersect truth).size / 10.0
    }
    val avg = recalls.sum / recalls.length
    assert(avg >= 0.8, s"avg recall $avg below the reference gate")

    // search stats are real, not the reference's 0.0 stubs
    assert(idx.avgHops > 0.0 && idx.avgDistComputations > idx.avgHops)

    // GetPoint by internal position
    assert(idx.getPoint(0).sameElements(points(0)))

    // save -> load -> identical answers
    val tmp = java.nio.file.Files.createTempDirectory("vamana_facade").toString
    idx.save(spark, tmp)
    val loaded = VamanaIndex.load(spark, tmp)
    assert(loaded.dataSize == n && loaded.params == params)
    val q0 = queries(0)
    assert(loaded.search(q0, 10).toSeq == idx.search(q0, 10).toSeq)
    // loaded index is frozen at capacity n, like the reference (vamana.h:69)
    assert(loaded.addPoint(randVec(rng), 123456L) == -1)
  }
}
