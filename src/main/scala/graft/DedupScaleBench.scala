package graft

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** 10×-and-beyond scale evidence for the DEDUP path — the ANN path has
  * `ScaleBench`; this is its twin for the operators the 100 TB posture
  * leans on hardest: the shingle-surrogate pair join (+ df cutoff),
  * MinHash banding (+ hot-bucket cap), 64-bit SimHash chunk join, and the
  * fixpoint connected-components pass.
  *
  * The synthetic corpus is generated DISTRIBUTED (seeded per-id RNG inside
  * mapPartitions — never on the driver) and plants the two adversarial
  * structures that break naive dedup at scale:
  *
  *  - **duplicate chains**: 10% of docs sit in 10-doc mutation chains
  *    (each member rewrites one 6-token window of the chain head), so
  *    adjacent members are near-dups but head and tail are not — the CC
  *    pass must stitch the chain transitively, not just collapse cliques;
  *  - **hot boilerplate**: 20% of docs append one shared 14-token
  *    sentence. Its shingles reach document frequency 0.2·n — without the
  *    df cutoff the pair join would materialize (0.2·n)²/2 candidate rows
  *    (5×10⁹ at n=500k) for pairs whose true Jaccard (~0.06) fails the
  *    threshold anyway. The cutoff is what makes the join linear.
  *
  * Usage: runMain graft.DedupScaleBench [docList] [cpus]
  * e.g.   runMain graft.DedupScaleBench 50000,500000 32
  * Prints one JSON line per corpus size; recorded in BASELINE_REPRO.md.
  */
object DedupScaleBench {

  private val ChainSpan = 100   // ids [c*100, c*100+10) form chain c
  private val ChainLen = 10
  private val Vocab = 50000

  private def word(rng: Random): String = s"w${rng.nextInt(Vocab)}"

  /** Deterministic synthetic corpus: text of doc id is a pure function of
    * id, identical under any partitioning. ~100 tokens per doc. */
  def syntheticDocs(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    val boiler = (0 until 14).map(i => s"boil$i").mkString(" ")
    spark.range(n)
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val inChain = id % ChainSpan < ChainLen
          val base =
            if (inChain) {
              // member p carries the head's tokens with windows 1..p
              // rewritten; window w's replacement is seeded by (head, w)
              // and thus SHARED by all members past w. Members p<q then
              // differ in exactly windows p+1..q — 6·(q−p) tokens — so
              // similarity decays with chain distance: adjacent members
              // are strong near-dups, head vs tail barely related, and
              // the CC pass must stitch the chain transitively
              val head = (id / ChainSpan) * ChainSpan
              val rngH = new Random(head * 0x9e3779b97f4a7c15L + 11L)
              val toks = Array.fill(100)(word(rngH))
              val p = (id % ChainSpan).toInt
              var w = 1
              while (w <= p) {
                val rngW = new Random(head * 31L + w * 0x5deece66dL + 13L)
                var i = w * 6
                while (i < w * 6 + 6) { toks(i) = word(rngW); i += 1 }
                w += 1
              }
              toks
            } else {
              val rng = new Random(id * 0x9e3779b97f4a7c15L + 11L)
              Array.fill(100)(word(rng))
            }
          val text = if (id % 5 == 0) base.mkString(" ") + " " + boiler else base.mkString(" ")
          (id, text)
        }
      }
      .toDF("doc_id", "text")
  }

  /** The registered queries' own tokenize+shingle pass over the corpus. */
  def shingledOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), Dedup.shingles(col("toks")).as("sh"))

  /** The paragraph path's windowed+packed shingle pass (dedupParagraph's
    * shape: 32-token windows, doc_id<<20|para_idx keys) over the synthetic
    * corpus — the window step multiplies rows ~4× before the SAME pair
    * join, so its scale point is measured separately. */
  def paraShingledOf(docs: DataFrame, paraTokens: Int = 32): DataFrame =
    docs.select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), greatest(size(col("toks")), lit(1)), lit(paraTokens)),
          st => slice(col("toks"), st, lit(paraTokens)))).as(Seq("para_idx", "ptoks")))
      .where(size(col("ptoks")) >= 3)
      .select((col("doc_id") * (1L << 20) + col("para_idx")).as("doc_id"),
        Dedup.shingles(col("ptoks")).as("sh"))

  /** Deterministic synthetic 64-bit media signatures with PLANTED
    * Hamming-ball structure: ids group in tens; member 0 is the group's
    * base signature, members 1-3 flip the first 1-3 positions of a
    * group-seeded distinct-position list (so pairwise distances within
    * the planted quad are |p−q| ≤ 3), members 4-9 are independent random
    * (a spurious ≤3-bit collision between 64-bit random signatures has
    * probability ~2.4e-15 per pair — negligible at any sweep size). */
  def syntheticSigs(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { it =>
      it.map { id =>
        val g = id / 10
        val p = (id % 10).toInt
        val base = new Random(g * 7919 + 17).nextLong()
        val sig =
          if (p == 0) base
          else if (p <= 3) {
            val posRng = new Random(g * 31 + 7)
            val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
            while (buf.size < 3) {
              val x = posRng.nextInt(64)
              if (!buf.contains(x)) buf += x
            }
            buf.take(p).foldLeft(base)((s, b) => s ^ (1L << b))
          } else new Random(id * 104729 + 13).nextLong()
        val bits = (63 to 0 by -1)
          .map(i => if (((sig >> i) & 1L) == 1L) '1' else '0').mkString
        (id, bits)
      }
    }.toDF("doc_id", "bits")
  }

  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.map(_.split(",").map(_.toLong).toSeq)
      .getOrElse(Seq(50000L, 500000L))
    val cpus = args.lift(1).map(_.toInt)
      .orElse(sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (n <- sizes) {
      val sh = shingledOf(syntheticDocs(spark, n)).repartition(cpus).cache()
      sh.count()

      def timed[A](body: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val r = body
        (r, (System.nanoTime() - t0) / 1e9)
      }

      // 1. exact ngram-Jaccard pair join (inverted index + df cutoff)
      val pairs = Dedup.ngramJaccardPairs(sh, threshold = 0.2, maxDf = Dedup.DefaultMaxShingleDf)
        .cache()
      val (nPairs, pairSec) = timed(pairs.count())
      // 2. MinHash banding + capped bucket join + Jaccard verify
      val (nMh, mhSec) = timed(Dedup.dedupMinhashFrame(spark, sh).count())
      // 3. 64-bit SimHash chunk join (+ key-spread evidence: distinct
      //    (chunk,piece) keys and the largest bucket — the pre-round-6
      //    16-bit scheme had 64 keys total, i.e. buckets of n/16)
      val (nSh, shSec) = timed(Dedup.dedupSimhashFrame(spark, sh).count())
      val keyStats = Dedup.simhashSignaturesFrame(spark, sh)
        .select(explode(sequence(lit(0), lit(3))).as("chunk"), col("sig"))
        .select(col("chunk"), expr("shiftright(sig, chunk * 16) & 65535").as("piece"))
        .groupBy(col("chunk"), col("piece")).agg(count(lit(1)).as("m"))
        .agg(count(lit(1)).as("keys"), max(col("m")).as("maxBucket")).head()
      // 4. fixpoint CC over the verified pairs, forced DISTRIBUTED
      //    (driverCcMaxPairs=0): min-label + pointer-jumping to fixpoint
      val universe = sh.select(col("doc_id"))
      val ((nComp, nSurv), ccSec) = timed {
        val s = Dedup.survivorsOf(spark, pairs, universe, driverCcMaxPairs = 0L).cache()
        val surv = s.where(col("is_survivor") === 1).count()
        val comp = s.select(col("canonical_id")).distinct().count()
        s.unpersist()
        (comp, surv)
      }
      pairs.unpersist()
      sh.unpersist()
      // 5. text-analysis path over the same corpus: bigram-LM scoring with
      //    the SHUFFLE-join model (50k vocab → up to 2.5e9 bigram types,
      //    far beyond a broadcast; the registered query's dictionary-sized
      //    corpus broadcasts instead), OOV against the frequent vocab, and
      //    boilerplate with a corpus-proportional cutoff (n/10) so the
      //    broadcast hot set holds ONLY the planted 14-token sentence's
      //    shingles, not chain-level near-dup shingles
      val docs = syntheticDocs(spark, n).cache()
      docs.count()
      val (nLm, lmSec) = timed(
        graft.operators.TextAnalysis.lmPerplexityOf(spark, docs, broadcastModel = false).count())
      val (nOov, oovSec) = timed(
        graft.operators.TextAnalysis.oovRateOf(spark, docs, minCount = 100).count())
      val (nBp, bpSec) = timed(
        graft.operators.TextAnalysis.boilerplateScoreOf(spark, docs, dfCutoff = n / 10).count())
      // 5b. substring-span dedup: ~93 stride-1 8-token windows per doc
      //     (the heaviest per-doc explode in the text family) through the
      //     count-distinct + semi-join pair; chains and boilerplate plant
      //     real cross-doc spans, so n_dup > 0 is structural
      val (nSs, ssSec) = timed(
        Dedup.substringDedupOf(spark, docs, w = 8).count())
      // 5b2. FROZEN-probe serving at a realistic standing-index size: the
      //     corpus's own cross-doc dup-window index collected once (the
      //     offline build), then today's n docs scored through the
      //     sorted-array binary-search kernel — batch form AND the
      //     streaming twin under MemoryStream micro-batches. The index is
      //     padded with DISJOINT synthetic surrogates to ≥1.2M entries
      //     (decoys carry bit 62; real surrogates are 60-bit, so no decoy
      //     can ever match a real window — hit counts are unchanged, only
      //     the searched-array size grows to deployment scale).
      val (frozenIdx, frozenIdxSec) = timed(
        Dedup.duplicatedWindowIndexOf(docs, 8).collect().map(_.getLong(0)))
      val FrozenTarget = 1200000
      val dupSetPadded =
        if (frozenIdx.length >= FrozenTarget) frozenIdx
        else frozenIdx ++ Array.tabulate(FrozenTarget - frozenIdx.length)(
          i => (1L << 62) | ((i * 0x9e3779b97f4a7c15L) >>> 4))
      val (frozenHitDocs, frozenProbeSec) = timed(
        Dedup.substringDedupFrozenOf(docs, dupSetPadded, 8)
          .where(col("n_dup_windows") > 0).count())
      val streamSpanSec = {
        import spark.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
        val rows = docs.select(col("doc_id"), col("text")).collect()
          .map(r => (r.getLong(0),
            new java.sql.Timestamp(1700000000000L), r.getString(1))).toSeq
        val input = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, java.sql.Timestamp, String)]
        val q = graft.streaming.StreamingOps.streamingSpanDedup(
            input.toDF().toDF("doc_id", "ts", "text"), dupSetPadded)
          .writeStream.format("noop").start()
        val t0 = System.nanoTime()
        try {
          rows.grouped(50000).foreach { b => input.addData(b); q.processAllAvailable() }
          (System.nanoTime() - t0) / 1e9
        } finally q.stop()
      }
      // 5c. DSIR importance weights with a derived 25% "en" target slice —
      //     the model stays 1024 rows at every n (broadcast by construction)
      val docsL = docs.withColumn("lang",
        when(col("doc_id") % 4 === 0, "en").otherwise("xx"))
      val (nDs, dsSec) = timed(
        graft.operators.CorpusPipeline.dsirWeightOf(spark, docsL, 1024, "en").count())
      // 5d. BPE merge training: the corpus pays ONE word-frequency
      //     groupBy; the 5 merge iterations then run over the distinct-
      //     word frame (50k planted types at every n — dictionary-sized
      //     regardless of corpus size, the property this point measures)
      val (bpeRows, bpeSec) = timed(
        graft.operators.TextAnalysis.bpeMergesOf(spark, docs, k = 5).count())
      val bpeVocab = docs.select(explode(split(lower(col("text")), "\\s+")).as("w"))
        .where(col("w") =!= "").distinct().count()
      // 5e. count-min sketch: the sketch is 4×1024 cells at EVERY n — the
      //     shuffle after map-side combine carries O(cells × partitions)
      //     rows however many tokens stream through, which is the property
      //     this point measures (the exact top-k twin inside the query
      //     pays the real vocabulary groupBy, same as vocab_topk)
      val (cmsRows, cmsSec) = timed(
        graft.operators.TextAnalysis.cmsHeavyHittersOf(spark, docs).count())
      // 6. paragraph-window pair join (dedupParagraph's machinery): the
      //    window step multiplies rows ~4× (100-token docs, 32-token
      //    windows) before the identical shingle-surrogate join, so one
      //    scale point at 50k docs characterizes the added constant —
      //    beyond that it tracks the doc-level pair join, which IS swept
      val (nPara, paraSec) = if (n <= 50000L) {
        val para = paraShingledOf(docs).repartition(cpus).cache()
        para.count()
        val r = timed(Dedup.ngramJaccardPairs(para, threshold = 0.5,
          maxDf = Dedup.DefaultMaxShingleDf).count())
        para.unpersist()
        r
      } else (-1L, -1.0)
      docs.unpersist()
      // 7. PageRank power iteration over a synthetic skewed host graph:
      //    m = n/10 nodes, a binary-tree backbone (connectivity) plus 100
      //    preferential hubs with in-degree m/100 (skew) — ~4 directed
      //    edges/node after symmetrization. The whole 10-round join+agg
      //    chain executes as ONE action; per-round cost is a keyed
      //    shuffle of the edge list, the generic billion-edge shape.
      val m = math.max(1000L, n / 10)
      val prNodes = spark.range(m).select(col("id").cast("string").as("source"))
      val half = spark.range(1, m).select(
          col("id").cast("string").as("src"),
          expr("id div 2").cast("string").as("dst"),
          lit(1L).as("w"))
        .union(spark.range(100, m).select(
          col("id").cast("string").as("src"),
          (col("id") % 100).cast("string").as("dst"),
          (col("id") % 5 + 1).cast("long").as("w")))
      val prEdges = half.union(
        half.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      val (prTop, prSec) = timed {
        // allowDriver=false: the sweep's purpose is the distributed
        // billion-edge shape, so the small-graph driver path is opted out.
        val r = graft.operators.Dedup.pagerankIterate(spark, prNodes, prEdges,
          iters = 10, allowDriver = false)
        // one action drives all 10 rounds; take the max rank as the probe
        r.limit(1).head().getLong(1)
      }
      // 8. media-signature Hamming-ball near-dup: the pigeonhole quarter-
      //    chunk join over planted 64-bit signatures — each group of ten
      //    ids plants C(4,2)=6 pairs at distances 1-3; recovery must be
      //    complete (the join's completeness theorem, checked at scale).
      val sigs = syntheticSigs(spark, n).repartition(cpus).cache()
      sigs.count()
      val mediaPairs = graft.operators.Multimodal.bitstringNearDupPairs(sigs).cache()
      val (nMedia, mediaSec) = timed(mediaPairs.count())
      val plantedExpected = 6L * (n / 10)
      val plantedFound = mediaPairs
        .where(col("id_a") % 10 <= 3 && col("id_b") % 10 <= 3 &&
          expr("id_a div 10") === expr("id_b div 10"))
        .count()
      mediaPairs.unpersist()
      sigs.unpersist()
      // 9. winnow copy-detection at scale, BOTH halves: (a) the corpus
      //    fingerprint index through the shuffle-free per-row expression
      //    (the streaming-ingest derivation — one narrow pass + distinct +
      //    df cap), (b) the overlap pair join over it. Planted-structure
      //    recovery: adjacent chain members differ in ONE 6-token window,
      //    so both flanks are verbatim runs ≥ k+w−1 tokens and the
      //    winnowing theorem guarantees ≥1 fingerprint per flank — every
      //    adjacent pair must surface at minShared=2.
      val wdocs = syntheticDocs(spark, n).cache()
      wdocs.count()
      val ((winIdx, nFp), winIdxSec) = timed {
        val ix = Dedup.winnowCorpusIndexOf(wdocs).cache()
        (ix, ix.count())
      }
      val winPairs = winIdx.select(col("fp"), col("src_id").as("id_a"))
        .join(winIdx.select(col("fp"), col("src_id").as("id_b")), "fp")
        .where(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("n_shared"))
        .where(col("n_shared") >= 2)
        .cache()
      val (nWinPairs, winPairSec) = timed(winPairs.count())
      val winAdjFound = winPairs
        .where(col("id_b") === col("id_a") + 1 &&
          col("id_a") % ChainSpan < (ChainLen - 1))
        .count()
      val winAdjExpected = (ChainLen - 1).toLong * (n / ChainSpan)
      winPairs.unpersist()
      winIdx.unpersist()
      // 10. blocked fuzzy ER at scale: every 7th doc's first 3 tokens form
      //     a "name"; a 1-char-dropped variant must re-link through the
      //     (prefix4, ±2 length band) blocking join + codegen Jaro-Winkler
      //     — the comparison volume is block-bounded, never n × n/7.
      val names = wdocs
        .select(col("doc_id"),
          array_join(slice(split(lower(col("text")), "\\s+"), 1, 3), " ").as("name"))
        .where(length(col("name")) >= 8).cache()
      names.count()
      val variants = names.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000000L).as("variant_id"), col("doc_id").as("src_id"),
          concat(col("name").substr(lit(1), (col("doc_id") % 3 + 5).cast("int") - 1),
            col("name").substr((col("doc_id") % 3 + 5).cast("int") + 1, lit(1000000)))
            .as("vname"))
      val (fuzzyStats, fuzzySec) = timed {
        val jw = graft.functions.EditDistanceExpressions
          .jaroWinkler(spark, col("vname"), col("name"))
        val matched = variants.join(names,
            substring(col("vname"), 1, 4) === substring(col("name"), 1, 4) &&
              abs(length(col("vname")) - length(col("name"))) <= 2)
          .withColumn("jw", jw)
          .where(col("jw") >= 0.9)
          .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("variant_id"))
              .orderBy(col("jw").desc, col("doc_id").asc)))
          .where(col("rk") === 1).cache()
        val nMatched = matched.count()
        // recovery = the matched name EQUALS the mutation source's name
        val ok = matched.join(
            names.select(col("doc_id").as("src_id"), col("name").as("src_name")), "src_id")
          .where(col("name") === col("src_name")).count()
        matched.unpersist()
        (nMatched, ok)
      }
      val nVariants = variants.count()
      names.unpersist()
      // 11. benchmark n-gram decontamination: 1% benchmark slice (an eval
      //     suite is tiny relative to the corpus — the broadcast-side
      //     premise), 8-gram collision screen over the remaining 99%.
      //     Planted recovery: the shared 14-token boilerplate sentence
      //     rides on 20% of docs, so the 1% bench slice certainly holds a
      //     boiler doc at these sizes and EVERY train boiler doc must
      //     flag — decontam_boiler_miss = 0 is the completeness check.
      val (dcStats, dcSec) = timed {
        val dc = graft.operators.CorpusPipeline.decontaminateOf(spark, wdocs,
          benchLo = 990L, mod = 1000L).cache()
        val flagged = dc.where(col("contaminated") === 1).count()
        val boilerMiss = dc
          .where(col("doc_id") % 5 === 0 && col("contaminated") === 0).count()
        val total = dc.count()
        dc.unpersist()
        (flagged, boilerMiss, total)
      }
      // 12. URL canonicalization + per-host dedup over n synthetic surface
      //     spellings — stage zero's scan-speed claim: pure codegen string
      //     arithmetic into one host-keyed aggregation.
      val (urlStats, urlSec) = timed {
        val r = wdocs
          .select(graft.operators.CorpusPipeline.syntheticUrl(col("doc_id")).as("raw"))
          .withColumn("curl", graft.operators.CorpusPipeline.canonicalizeUrl(col("raw")))
          .withColumn("host", regexp_extract(col("curl"), "^[a-z]+://([^/:?]*)", 1))
          .groupBy(col("host"))
          .agg(countDistinct(col("curl")).as("nc"))
          .agg(count(lit(1)).as("hosts"), sum(col("nc")).as("canon")).head()
        (r.getLong(0), r.getLong(1))
      }
      wdocs.unpersist()

      def r2(v: Double) = math.rint(v * 100) / 100
      println(
        s"""{"docs":$n,"cpus":$cpus,"pair_join_sec":${r2(pairSec)},"pairs":$nPairs,""" +
        s""""minhash_sec":${r2(mhSec)},"minhash_pairs":$nMh,""" +
        s""""simhash_sec":${r2(shSec)},"simhash_pairs":$nSh,""" +
        s""""simhash_keys":${keyStats.getLong(0)},"simhash_max_bucket":${keyStats.getLong(1)},""" +
        s""""cc_sec":${r2(ccSec)},"components":$nComp,"survivors":$nSurv,""" +
        s""""lm_sec":${r2(lmSec)},"lm_docs":$nLm,"oov_sec":${r2(oovSec)},"oov_docs":$nOov,""" +
        s""""boiler_sec":${r2(bpSec)},"boiler_docs":$nBp,""" +
        s""""substr_sec":${r2(ssSec)},"substr_docs":$nSs,""" +
        s""""frozen_idx_sec":${r2(frozenIdxSec)},"frozen_real_windows":${frozenIdx.length},""" +
        s""""frozen_set_size":${dupSetPadded.length},""" +
        s""""frozen_probe_sec":${r2(frozenProbeSec)},"frozen_hit_docs":$frozenHitDocs,""" +
        s""""frozen_probe_rows_per_sec":${math.rint(n / frozenProbeSec)},""" +
        s""""stream_span_sec":${r2(streamSpanSec)},""" +
        s""""stream_span_rows_per_sec":${math.rint(n / streamSpanSec)},""" +
        s""""dsir_sec":${r2(dsSec)},"dsir_docs":$nDs,""" +
        s""""bpe_sec":${r2(bpeSec)},"bpe_merges":$bpeRows,"bpe_vocab":$bpeVocab,""" +
        s""""cms_sec":${r2(cmsSec)},"cms_rows":$cmsRows,""" +
        s""""pagerank_sec":${r2(prSec)},"pagerank_nodes":$m,"pagerank_top":$prTop,""" +
        s""""media_neardup_sec":${r2(mediaSec)},"media_pairs":$nMedia,""" +
        s""""media_planted":$plantedExpected,"media_planted_found":$plantedFound,""" +
        s""""para_pair_sec":${r2(paraSec)},"para_pairs":$nPara,""" +
        s""""winnow_index_sec":${r2(winIdxSec)},"winnow_fps":$nFp,""" +
        s""""winnow_pair_sec":${r2(winPairSec)},"winnow_pairs":$nWinPairs,""" +
        s""""winnow_adj_expected":$winAdjExpected,"winnow_adj_found":$winAdjFound,""" +
        s""""fuzzy_sec":${r2(fuzzySec)},"fuzzy_variants":$nVariants,""" +
        s""""fuzzy_matched":${fuzzyStats._1},"fuzzy_correct":${fuzzyStats._2},""" +
        s""""decontam_sec":${r2(dcSec)},"decontam_train":${dcStats._3},""" +
        s""""decontam_flagged":${dcStats._1},"decontam_boiler_miss":${dcStats._2},""" +
        s""""url_sec":${r2(urlSec)},"url_hosts":${urlStats._1},"url_canon":${urlStats._2}}""")
    }
    spark.stop()
  }
}
