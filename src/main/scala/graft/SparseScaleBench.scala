package graft

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SparseRetrieval

/** Scale evidence for the learned-sparse retrieval family on a ZIPFIAN
  * corpus — the natural regime the in-registry `sparse_champion_gate`
  * deliberately does not show (its 31-term uniform vocabulary is the
  * worst case for index elimination; a real vocabulary is Zipf, where
  * champion lists are nearly free). Term ranks are drawn LOG-UNIFORM over
  * a 50k vocabulary (P(rank ≤ r) = ln r / ln V — the truncated Zipf s=1
  * shape), so the corpus has true stopwords (df ≈ n, impact ≈ 0, pruned
  * from the index by the encoder itself), a torso, and a long tail —
  * the df profile a web corpus actually has.
  *
  * Per corpus size: encode wall-clock + index size, exact inverted-index
  * top-10 serving for a torso/tail standing query set, and the champion
  * trade at c ∈ {10, 100}: top-10 overlap vs exact + postings touched.
  *
  * Usage: runMain graft.SparseScaleBench [docList] [cpus]
  * e.g.   runMain graft.SparseScaleBench 50000,500000 32
  * Prints one JSON line per corpus size; recorded in BASELINE_REPRO.md.
  */
object SparseScaleBench {

  private val Vocab = 50000
  private val DocTokens = 100

  /** Deterministic distributed Zipfian corpus: token `pos` of doc `id` is
    * a pure function of (id, pos) — identical under any partitioning. */
  def zipfDocs(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    val lnV = math.log(Vocab.toDouble)
    spark.range(n).as[Long].mapPartitions { it =>
      it.map { id =>
        val rng = new Random(id * 0x9e3779b97f4a7c15L + 29L)
        val sb = new StringBuilder
        var p = 0
        while (p < DocTokens) {
          // log-uniform rank: exp(u·lnV) ∈ [1, V) — truncated Zipf s=1
          val rank = math.min(Vocab - 1, math.exp(rng.nextDouble() * lnV).toInt)
          if (p > 0) sb.append(' ')
          sb.append('w').append(rank)
          p += 1
        }
        (id, sb.toString)
      }
    }.toDF("doc_id", "text")
  }

  /** Torso/tail standing queries — head terms (w1..w9) are deliberately
    * absent: the encoder prunes them to ~zero impact, exactly as a
    * learned-sparse head down-weights stopwords. */
  private val Queries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("w200", "w1200"),
    2L -> Seq("w800", "w5000", "w12000"),
    3L -> Seq("w2500", "w20000"))

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("50000,500000")
      .split(",").map(_.trim.toLong).toSeq
    val cpus = args.lift(1).map(_.toInt)
      .orElse(sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    sizes.foreach { n =>
      val docs = zipfDocs(spark, n)
      val tc = SparseRetrieval.termCountsOf(docs).persist()
      tc.count() // the corpus scan both sides of the accounting share
      val ((pruned, nPostings), encodeSec) = timed {
        val p = SparseRetrieval
          .prunedPostingsOf(SparseRetrieval.fullPostingsOf(tc), SparseRetrieval.PruneM)
          .persist()
        (p, p.count())
      }
      val vocabKept = pruned.select(col("term")).distinct().count()
      val qw = SparseRetrieval.queryWeightsOf(spark, Queries, tc)

      val (exact, exactSec) = timed {
        val e = SparseRetrieval.topkOver(spark, pruned, qw, 10)
          .select(col("qid"), col("doc_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        e
      }
      val exactSet = exact.toSet
      val touchedFull = pruned.join(broadcast(qw), Seq("term")).count()

      val champJson = Seq(10, 100).map { c =>
        val champWin = org.apache.spark.sql.expressions.Window
          .partitionBy(col("term")).orderBy(col("w").desc, col("doc_id").asc)
        val champions = pruned.select(col("doc_id"), col("term"), col("w"))
          .withColumn("rc", row_number().over(champWin))
          .where(col("rc") <= c)
        val (rows, sec) = timed {
          SparseRetrieval.topkOver(spark, champions, qw, 10)
            .select(col("qid"), col("doc_id")).collect()
            .map(r => (r.getLong(0), r.getLong(1)))
        }
        val overlap = rows.count(exactSet.contains)
        val touched = champions.join(broadcast(qw), Seq("term")).count()
        s""""c$c":{"overlap":$overlap,"of":${exactSet.size},"touched":$touched,"sec":${f"$sec%.3f"}}"""
      }.mkString(",")

      pruned.unpersist(); tc.unpersist()
      // scientific-notation-free longs for the JSON line
      println(s"""{"bench":"sparse_scale","n":$n,"postings_kept":$nPostings,""" +
        s""""vocab_kept":$vocabKept,"encode_sec":${f"$encodeSec%.3f"},""" +
        s""""exact_topk_sec":${f"$exactSec%.3f"},"touched_full":$touchedFull,$champJson}""")
    }
    spark.stop()
  }
}
