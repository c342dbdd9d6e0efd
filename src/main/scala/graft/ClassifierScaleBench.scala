package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DocClassifier

/** Scale evidence for trained-classifier fitting — the sweep that shows
  * batch-GD training cost grows ~linearly in corpus size while the driver
  * never holds more than the width+2 weight vector. The planted corpus is
  * linearly separable (two disjoint vocabularies, generated DISTRIBUTED in
  * mapPartitions — never on the driver), so the fitted model must reach
  * holdout accuracy 1.0 at every n: a wrong gradient, a lost fixed-point
  * digit, or a split leak all break the 1.0, so the sweep is a correctness
  * gate as well as a timing curve.
  *
  * Usage: runMain graft.ClassifierScaleBench [nList] [cpus]
  * e.g.   runMain graft.ClassifierScaleBench 10000,100000,1000000 32
  * Prints one JSON line per n; recorded in BASELINE_REPRO.md.
  */
object ClassifierScaleBench {

  private val VocabA = Array("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel")
  private val VocabB = Array("zulu", "yankee", "xray", "whiskey", "victor",
    "uniform", "tango", "sierra")

  /** Planted separable corpus: doc i draws 12 tokens from vocabulary
    * (i mod 2), token choice seeded per id — deterministic, partitioning-
    * independent. */
  def plantedCorpus(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { it =>
      it.map { id =>
        val y = (id % 2).toInt
        val vocab = if (y == 1) VocabA else VocabB
        val rng = new scala.util.Random(id * 0x9e3779b97f4a7c15L + 17L)
        val text = Array.fill(12)(vocab(rng.nextInt(vocab.length))).mkString(" ")
        (id, y, text)
      }
    }.toDF("doc_id", "y", "text")
  }

  def main(args: Array[String]): Unit = {
    val ns = args.headOption.map(_.split(",").map(_.toLong).toSeq)
      .getOrElse(Seq(10000L, 100000L, 1000000L))
    val cpus = args.lift(1).map(_.toInt)
      .orElse(sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- ns) {
      val corpus = plantedCorpus(spark, n)
      val t0 = System.nanoTime()
      val m = DocClassifier.fitOn(corpus)
      val fitS = (System.nanoTime() - t0) / 1e9
      println(f"""{"bench":"classifier_scale","n":$n,"iters":${DocClassifier.DefaultIters},""" +
        f""""width":${DocClassifier.DefaultWidth},"fit_s":${math.rint(fitS * 100) / 100}%.2f,""" +
        f""""acc_train":${m.accTrain},"acc_test":${m.accTest}}""")
    }
    spark.stop()
  }
}
