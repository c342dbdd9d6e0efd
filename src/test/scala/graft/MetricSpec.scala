package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.vamana._

/** Cosine and inner-product metrics — the reference's declared-but-missing
  * feature (readme.md:76 "TODO: add inner product") — implemented via
  * metric→L2 reductions; accuracy gated against brute-force rankings under
  * the TRUE metric. */
class MetricSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def corpus(): Array[(Long, Array[Float])] = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().sortBy(_._1)
  }

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
    s
  }

  test("cosine metric: recall@10 >= 0.8 vs brute-force cosine ranking") {
    spark.sparkContext.setLogLevel("WARN")
    val all = corpus()
    val params = VamanaParams(dim = 64, maxDegree = 32, beamWidth = 64, efSearch = 128, metric = "cos")
    val model = VamanaIndexer.fit(Tables.embeddings(spark, dir), params)
    val recalls = all.take(30).map { case (qid, q) =>
      val truth = all
        .sortBy { case (id, v) =>
          (-dot(q, v) / (MetricReduction.normOf(q) * MetricReduction.normOf(v)), id)
        }.take(10).map(_._1).toSet
      val got = VamanaKernel.search(model.index, MetricReduction.prepareQuery(q, "cos"), 10)
        .map(_._1).toSet
      (got intersect truth).size / 10.0
    }
    val avg = recalls.sum / recalls.length
    assert(avg >= 0.8, s"cosine recall $avg")
  }

  test("inner-product metric (MIPS): recall@10 >= 0.8 vs brute-force dot ranking") {
    val all = corpus()
    val params = VamanaParams(dim = 64, maxDegree = 32, beamWidth = 64, efSearch = 128, metric = "ip")
    val model = VamanaIndexer.fit(Tables.embeddings(spark, dir), params)
    val recalls = all.take(30).map { case (qid, q) =>
      val truth = all.sortBy { case (id, v) => (-dot(q, v), id) }.take(10).map(_._1).toSet
      val got = VamanaKernel.search(model.index, MetricReduction.prepareQuery(q, "ip"), 10)
        .map(_._1).toSet
      (got intersect truth).size / 10.0
    }
    val avg = recalls.sum / recalls.length
    assert(avg >= 0.8, s"ip recall $avg")
  }

  test("metric survives save/load (reference persists no params at all)") {
    val params = VamanaParams(dim = 64, maxDegree = 16, beamWidth = 32, efSearch = 64, metric = "cos")
    val model = VamanaIndexer.fit(Tables.embeddings(spark, dir), params)
    val tmp = java.nio.file.Files.createTempDirectory("vamana_metric").toString
    model.save(spark, tmp)
    val loaded = VamanaModel.load(spark, tmp)
    assert(loaded.index.params.metric == "cos")
  }
}
