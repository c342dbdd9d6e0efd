package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Knn
import graft.vamana._

/** Scale gate for the sharded ANN path: 4× the reference's own benchmark
  * size (main.cpp:35-36 benches 10k points), built and served DISTRIBUTED —
  * the corpus never reaches the driver. Slow by suite standards (~40 s);
  * the full 100k/1M sweep lives in `graft.ScaleBench` + BASELINE_REPRO.md. */
class ScaleSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("fanout build+serve at 40k points (4x reference bench) keeps recall@10 >= 0.8") {
    spark.sparkContext.setLogLevel("WARN")
    val n = 40000L
    val pts = ScaleBench.syntheticPoints(spark, n, dim = 64).repartition(4).cache()
    assert(pts.count() == n)
    val queries = ScaleBench.perturbedQueries(spark, pts, 50).cache()
    val truth = Knn.knnExact(pts, queries, 10)
    val params = VamanaParams(dim = 64, maxDegree = 32, beamWidth = 64,
      alpha = 1.2f, efSearch = 128)
    val fm = VamanaFanout.fit(pts, params, numShards = 8)
    val got = fm.search(queries, 10)
    val r = Knn.recallAt(10, got, truth)
    fm.unpersist()
    pts.unpersist()
    assert(r >= 0.8, s"fanout recall@10 at n=$n was $r, below the 0.8 scale gate")
  }
}
