package graft

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming._

/** Streaming-path throughput evidence — the batch queries have `Bench`;
  * this drives the ingest-side pipeline shapes through MemoryStream
  * micro-batches against the noop sink and reports end-to-end rows/sec:
  *
  *  - `stream_ingest`: the COMPOSED corpus pass (quality/lang filter →
  *    watermark-bounded exact dedup → windowed accepted counts) — two
  *    chained stateful operators;
  *  - `stream_perceptual`: media dedup at ingest (64-bit envelope
  *    fingerprint + within-watermark signature dedup);
  *  - `stream_cluster`: embedding cluster assignment against a broadcast
  *    centroid matrix (stateless narrow projection — the ceiling);
  *  - `stream_winnow`: verbatim-copy detection at ingest (per-row winnow
  *    fingerprints → stream-static join vs a standing corpus index →
  *    watermarked windowed pair bar).
  *
  * Corpus is generated on the driver BEFORE the clock starts (MemoryStream
  * is driver-fed by design); event times spread across minutes so windows
  * and watermarks actually cycle. Usage:
  * runMain graft.StreamBench [n] [batchSize] [cpus]
  */
object StreamBench {

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    new Timestamp(minute * 60000L + sec * 1000L)

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val batchSize = args.lift(1).map(_.toInt).getOrElse(10000)
    val cpus = args.lift(2).map(_.toInt)
      .orElse(sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)).getOrElse(32)
    // optional comma-list of bench names: the 100x sweep runs only the
    // stateless ops (the stateful paths are micro-batch-commit bound and
    // would spend an hour proving what the 10x point already shows)
    val only: Option[Set[String]] = args.lift(3).map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def r4(v: Double): Double = math.rint(v * 100) / 100

    def run[T](name: String, rows: Seq[T], mk: MemoryStream[T] => org.apache.spark.sql.DataFrame)(
        implicit enc: org.apache.spark.sql.Encoder[T]): Unit = {
      if (!only.forall(_.contains(name))) return
      val input = MemoryStream[T]
      val q = mk(input).writeStream.format("noop").outputMode("append").start()
      try {
        val t0 = System.nanoTime()
        rows.grouped(batchSize).foreach { b => input.addData(b); q.processAllAvailable() }
        val s = (System.nanoTime() - t0) / 1e9
        println(f"""{"bench":"$name","n":${rows.size},"batch":$batchSize,"wall_s":${r4(s)}%.2f,"rows_per_s":${math.rint(rows.size / s)}%.0f}""")
      } finally q.stop()
    }

    // docs: ~10% exact duplicates (same normalized text), event time
    // spread over n/1000 minutes so the dedup watermark actually expires
    val docs = (0 until n).map { i =>
      val rng = new Random(i * 0x9e3779b97f4a7c15L + 5L)
      val base = if (i % 10 == 9) (i - 1) else i
      val words = {
        val r2 = new Random(base * 0x517cc1b727220a95L + 3L)
        Array.fill(30)(s"w${r2.nextInt(50000)}").mkString(" ")
      }
      Doc(i.toLong, ts(i / 1000, rng.nextInt(60)), words)
    }
    // web-pipeline STAGE ZERO at the stream: canonical-URL dedup before
    // any content fetch — ~10% duplicate pages arrive under a different
    // surface spelling (case-shuffled host, default port, tracking params,
    // /./ segments) and must be dropped by canonical-key collision
    val urls = (0 until n).map { i =>
      val base = if (i % 10 == 9) (i - 1) else i
      val raw =
        if (i % 10 == 9)
          s"HTTPS://Host${base % 997}.Example.com:443/a/./p$base?utm_source=x&id=$base#frag"
        else
          s"https://host${base % 997}.example.com/a/p$base?id=$base"
      Doc(i.toLong, ts(i / 1000, i % 60), raw)
    }
    run[Doc]("stream_url", urls,
      in => StreamingOps.streamingUrlDedup(in.toDF().toDF("doc_id", "ts", "url")))

    run[Doc]("stream_ingest", docs, in => StreamingOps.streamingIngestPipeline(in.toDF()))
    run[Doc]("stream_perceptual", docs, in => StreamingOps.streamingPerceptualDedup(in.toDF()))
    // DCT pHash dedup at ingest — same watermark-bounded state as the
    // aHash twin, but the fingerprint pass is the codegen phash_native
    run[Doc]("stream_phash", docs, in => StreamingOps.streamingPhashDedup(in.toDF()))
    // trained language ID at ingest — stateless frozen-model projection;
    // the model literals come from the one shared fit
    lazy val langModel = graft.operators.LangClassifier.fit(spark)
    run[Doc]("stream_langid", docs,
      in => StreamingOps.streamingLangClassify(in.toDF(), langModel))

    // learned-sparse encode at ingest: the frozen dictionary is fit from
    // the same corpus BEFORE the clock (a standing model is a pre-existing
    // asset); the encode itself is a stateless per-row projection
    lazy val sparseModel = graft.operators.SparseRetrieval.fitSparseModelOf(
      graft.operators.SparseRetrieval.termCountsOf(spark.createDataset(docs).toDF()))
    run[Doc]("stream_sparse", docs,
      in => StreamingOps.streamingSparseEncode(in.toDF(), sparseModel))

    // winnow copy-detection at ingest: index the same corpus (materialized
    // BEFORE the clock — a standing index is a pre-existing asset), then
    // replay it; the ~10% planted duplicates guarantee real matches flow
    val winnowIdx = graft.operators.Dedup
      .winnowCorpusIndexOf(spark.createDataset(docs).toDF()).cache()
    winnowIdx.count()
    run[Doc]("stream_winnow", docs,
      in => StreamingOps.streamingWinnowMatches(in.toDF(), winnowIdx))

    // benchmark decontamination at ingest: the ~10% benchmark slice's
    // n-gram index is a pre-existing asset (built before the clock); the
    // planted duplicates guarantee real contamination flags flow
    val benchIdx = spark.createDataset(docs.filter(_.doc_id % 100 >= 90)).toDF()
      .select(org.apache.spark.sql.functions.explode(
        graft.operators.CorpusPipeline.ngramSurrogates(
          graft.operators.Dedup.tokens(org.apache.spark.sql.functions.col("text")),
          graft.operators.CorpusPipeline.DecontamN)).as("s"))
      .distinct().cache()
    benchIdx.count()
    run[Doc]("stream_decontam", docs.filter(_.doc_id % 100 < 90),
      in => StreamingOps.streamingDecontamFlags(in.toDF(), benchIdx))

    // span-duplication scoring at ingest: the corpus's duplicated-window
    // index is the standing asset (the ~10% planted exact dups guarantee
    // real duplicated windows); arrivals score through the stateless
    // hits_in_long_set kernel — same frozen-probe shape as decontam but
    // COUNTING, the per-doc verbatim-copy fraction at the stream
    val dupWindows = graft.operators.Dedup
      .duplicatedWindowIndexOf(spark.createDataset(docs).toDF())
      .collect().map(_.getLong(0))
    run[Doc]("stream_span_dedup", docs,
      in => StreamingOps.streamingSpanDedup(in.toDF(), dupWindows))

    // temperature resampling at ingest: frozen per-lang rates (computed
    // driver-side over the imbalanced synthetic lang mix) broadcast into
    // the stateless keep/drop filter
    val langOf: Long => String = id => s"l${(id % 10) match {
      case x if x <= 5 => 0; case 6 | 7 => 1; case 8 => 2; case _ => 3 }}"
    val langRows = docs.map(d => (d.doc_id, d.ts, langOf(d.doc_id)))
    val langCounts = langRows.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nTot = langCounts.values.sum
    val ws = langCounts.view.mapValues(c => math.floor(math.sqrt(c.toDouble * 1e6)).toLong).toMap
    val wTot = ws.values.sum
    val rateRows = langCounts.toSeq.map { case (l, c) =>
      (l, c, math.min(1000000L, (nTot / 2) * ws(l) * 1000000L / (c * wTot))) }
    val ratesDf = spark.createDataFrame(rateRows).toDF("lang", "n_l", "rate_micro")
    run[(Long, Timestamp, String)]("stream_temperature", langRows,
      in => StreamingOps.streamingTemperatureSample(
        in.toDF().toDF("doc_id", "ts", "lang"), ratesDf))

    // the COMPOSED web ingest — the three stages above in ONE query:
    // canonical-URL first-wins state, stateless literal-probe
    // decontamination, frozen-rate temperature sampling. One state store
    // total; the throughput gap vs `stream_url` alone is the price of the
    // whole crawl-to-training-mix path at ingest.
    val benchGrams = benchIdx.collect().map(_.getLong(0))
    val webRows = (0 until n).map { i =>
      (docs(i).doc_id, docs(i).ts, urls(i).text, docs(i).text, langOf(docs(i).doc_id))
    }
    run[(Long, Timestamp, String, String, String)]("stream_web", webRows,
      in => StreamingOps.streamingWebIngest(
        in.toDF().toDF("doc_id", "ts", "url", "text", "lang"), benchGrams, ratesDf))

    val centroids = Array.tabulate(8) { c =>
      val rng = new Random(c * 1234567L + 11L)
      Array.fill(64)((rng.nextInt(2000001) - 1000000).toLong)
    }
    val emb = (0 until n).map { i =>
      val rng = new Random(i * 0x9e3779b97f4a7c15L + 21L)
      EmbRow(i.toLong, ts(i / 1000, rng.nextInt(60)),
        Array.fill(64)(rng.nextFloat() * 2 - 1))
    }
    run[EmbRow]("stream_cluster", emb,
      in => StreamingOps.streamingClusterAssign(in.toDF(), centroids))

    // ONLINE ANN serving from the clustered layout: a standing 200k-point,
    // 16-shard routed index rides to executors once (the guarded
    // localServing collect), arriving query vectors route by the adaptive
    // band rule and traverse only their in-band shard graphs — the
    // retrieval-service shape where the nightly batch refreshes the index
    // the stream serves from. Fit cost is the standing index's, excluded.
    if (only.forall(_.contains("stream_routed_search"))) {
      val servingPts = ScaleBench.syntheticPoints(spark, 200000, 64).repartition(cpus)
      val rm = graft.vamana.VamanaRouted.fit(servingPts,
        graft.vamana.VamanaParams(dim = 64, maxDegree = 32, beamWidth = 64,
          alpha = 1.2f, efSearch = 128), numShards = 16)
      val serving = rm.localServing(maxLocalPoints = 1000000)
      rm.unpersist()
      run[EmbRow]("stream_routed_search", emb,
        in => StreamingOps.streamingRoutedSearch(in.toDF(), serving, 10, routeEps = 0.05))
    }

    spark.stop()
  }
}
