package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Text-analysis operators over `documents`: quality stats, language ID,
  * token counting, fingerprinting (north-star surface, SURVEY.md §2b).
  * All single-pass narrow transforms — no shuffle except the final orderBy;
  * at 100 TB these run scan-speed with full column pruning.
  *
  * Every heuristic is a closed-form expression mirrored exactly in DuckDB
  * oracle SQL (beware: DuckDB regexp_replace needs the 'g' flag to match
  * Spark's replace-all default).
  */
object TextAnalysis {

  /** Occurrence-counting English stopword list (function words that appear
    * in the synthetic corpus vocabulary). */
  val StopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  private val langStopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "en" -> Seq("the", "a", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "los", "y", "es", "un"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans"))

  private[graft] def toks(c: Column): Column = split(lower(c), "\\s+")

  /** The shared quality expressions over a `text` column — single source of
    * truth for [[textStats]] and the composed
    * [[CorpusPipeline.cleanCorpus]] single-pass plan. Set-membership counts
    * run through the codegen'd [[graft.functions.TokenSetCount]] — the
    * lambda form (`size(filter(...))`) is CodegenFallback and was the hot
    * interpreted loop of the text path (equality asserted in
    * NativeExpressionSpec). */
  private[operators] def nTokensExpr: Column = size(toks(col("text")))

  private[graft] def qualityExpr(spark: SparkSession): Column = {
    val nTokens = size(toks(col("text")))
    val charLen = length(col("text"))
    val punct = charLen - length(regexp_replace(lower(col("text")), "[a-z0-9 ]", ""))
    val stop = graft.functions.TextExpressions.tokenSetCount(spark, lower(col("text")), StopwordsEn)
    val punctRatio = punct.cast("double") / charLen
    val stopRatio = stop.cast("double") / nTokens
    least(nTokens.cast("double") / 100.0, lit(1.0)) * 0.6 +
      (lit(1.0) - punctRatio) * 0.2 + least(stopRatio * 5.0, lit(1.0)) * 0.2
  }

  /** Per-doc quality stats: token count, average token length, punctuation
    * ratio, stopword ratio, and a deterministic composite quality score. */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    val t = toks(col("text"))
    val nTokens = size(t)
    val charLen = length(col("text"))
    val punct = charLen - length(regexp_replace(lower(col("text")), "[a-z0-9 ]", ""))
    val stop = graft.functions.TextExpressions.tokenSetCount(spark, lower(col("text")), StopwordsEn)
    val avgLen = aggregate(transform(t, tk => length(tk)), lit(0), (a, v) => a + v)
      .cast("double") / nTokens
    val punctRatio = punct.cast("double") / charLen
    val stopRatio = stop.cast("double") / nTokens
    Tables.documents(spark, dir).select(
      col("doc_id"),
      nTokens.cast("long").as("n_tokens"),
      round(avgLen, 4).as("avg_token_len"),
      round(punctRatio, 4).as("punct_ratio"),
      round(stopRatio, 4).as("stopword_ratio"),
      round(qualityExpr(spark), 4).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** N-gram-free language ID: count occurrences of each language's stopwords,
    * argmax score with deterministic tie-break (lang name asc); 'und'
    * (undetermined) when no stopword hits. Compared against the `lang`
    * column for an accuracy flag. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      predLangExpr(spark).as("pred_lang"),
      col("lang").as("label_lang"))
      .withColumn("is_match", (col("pred_lang") === col("label_lang")).cast("int"))
      .orderBy(col("doc_id"))

  /** The language prediction over a `text` column — shared with the
    * composed clean-corpus pass.
    *
    * Shape matters: an earlier `reduce(when(b > a, b).otherwise(a))` tree
    * referenced each accumulated subtree twice per level, so the interpreted
    * (higher-order functions are CodegenFallback) stopword filters were
    * re-evaluated ~2^langs times per row — and twice that when a predicate
    * pushdown copied the expression into a Filter. Sorting a 4-element
    * struct array evaluates each language score exactly once. Tie-break is
    * unchanged: sort ascending on (−score, lang) picks highest score, then
    * the alphabetically-first language (the langStopwords order). */
  private[graft] def predLangExpr(spark: SparkSession): Column = {
    val cand = array(langStopwords.map { case (lang, words) =>
      struct(
        (-graft.functions.TextExpressions.tokenSetCount(spark, lower(col("text")), words))
          .as("neg_score"),
        lit(lang).as("lang"))
    }: _*)
    val best = element_at(sort_array(cand), 1)
    when(best.getField("neg_score") < 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Token counting: whitespace tokens and a BPE-ish regex tokenization
    * (letter runs / digit runs / single other chars). */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(toks(col("text"))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
        .cast("long").as("re_tokens"),
      length(col("text")).cast("long").as("n_chars"))
      .orderBy(col("doc_id"))

  /** BPE merge training (Sennrich et al. 2016, arXiv:1508.07909): learn
    * the first `k` byte-pair merges from the corpus, the tokenizer-training
    * step a data pipeline runs after [[vocabTopK]] picks the seed
    * vocabulary. Distributed the way fastBPE-style trainers shard: the
    * corpus-sized work is ONE word-frequency groupBy (map-side combined);
    * every merge iteration then runs over the DISTINCT-WORD frame — pair
    * explode → keyed sum → argmax — whose size is the vocabulary, not the
    * corpus, so 100 TB pays k shuffles of a dictionary-sized table. The
    * single row collected per iteration is the merge decision itself (the
    * OUTPUT artifact is driver-sized by definition). Greedy left-to-right
    * merge application is an `aggregate` fold over the symbol array; a
    * merged token can never recreate its own pair (AB = A or AB = B would
    * need an empty symbol), so the fold's greedy scan is order-equivalent
    * to the oracle's leftmost-first iterated replacement. */
  def bpeMerges(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    bpeTrainCached(spark, dir, k)._2
      .toDF("merge_rank", "left_sym", "right_sym", "pair_count")
      .orderBy(col("merge_rank"))
  }

  /** Frame form over any (text) corpus — trains fresh (nothing to key a
    * memo on) and releases the segmented vocab at once: the merge
    * decisions are already driver-side. */
  def bpeMergesOf(spark: SparkSession, documents: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    val (cur, merges) = bpeTrain(spark, documents, k)
    cur.unpersist(blocking = false)
    merges
      .toDF("merge_rank", "left_sym", "right_sym", "pair_count")
      .orderBy(col("merge_rank"))
  }

  /** One BPE training run per (session, dir, k): bpe_merges and
    * bpe_encode consume the same artifacts, and the pinned
    * dictionary-sized vocab frame is what keeps [[bpeEncode]] from
    * replaying the corpus-sized word groupBy plus the k nested merge
    * folds when its lazy plan evaluates (the word-frequency cache is
    * released by then). Cleared by [[clearCaches]]. */
  private val bpeCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Int), (DataFrame, Seq[(Long, String, String, Long)])]

  private def bpeTrainCached(spark: SparkSession, dir: String, k: Int)
      : (DataFrame, Seq[(Long, String, String, Long)]) =
    bpeCache.getOrElseUpdate((spark, dir, k),
      bpeTrain(spark, Tables.documents(spark, dir), k))

  /** Unpersist + drop the per-dataset text-analysis memos (the
    * Dedup.clearCaches twin, reachable through
    * [[graft.GraftCaches.clearAll]]). */
  def clearCaches(): Unit = {
    for ((_, (df, _)) <- bpeCache) scala.util.Try(df.unpersist())
    bpeCache.clear()
    for ((_, df) <- lexTcCache) scala.util.Try(df.unpersist())
    lexTcCache.clear()
    for ((_, df) <- lexDlCache) scala.util.Try(df.unpersist())
    lexDlCache.clear()
    for ((_, df) <- lexDfCache) scala.util.Try(df.unpersist())
    lexDfCache.clear()
  }

  /** The shared training loop: returns (final segmented vocab
    * `(w, cnt, syms)` — cached AND materialized, so consumers never
    * replay the corpus pass — plus the k merge decisions). Callers own
    * the returned frame's cache. */
  private def bpeTrain(spark: SparkSession, documents: DataFrame, k: Int)
      : (DataFrame, Seq[(Long, String, String, Long)]) = {
    val vocab = documents
      .select(explode(toks(col("text"))).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("w"), col("cnt"),
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))).as("syms"))
      .cache()
    var cur = vocab
    val merges = scala.collection.mutable.Buffer.empty[(Long, String, String, Long)]
    try {
      for (r <- 1 to k) {
        // adjacent-pair frequencies; the n<2 guard lives INSIDE the
        // expression (sequence(1, 0) descends — see shingles' note)
        val best = cur
          .select(col("cnt"), explode(
            when(size(col("syms")) >= 2, transform(
              sequence(lit(1), size(col("syms")) - 1),
              i => struct(element_at(col("syms"), i).as("a"),
                element_at(col("syms"), i + 1).as("b"))))
              .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("a").asc, col("b").asc)
          .limit(1).collect()
        if (best.nonEmpty) {
          val (a, b, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
          merges += ((r.toLong, a, b, c))
          cur = cur.select(col("w"), col("cnt"),
            aggregate(col("syms"), array().cast("array<string>"),
              (acc, s) => when(size(acc) > 0 &&
                  element_at(acc, -1) === lit(a) && s === lit(b),
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
                .otherwise(concat(acc, array(s)))).as("syms"))
        }
      }
      // Pin the final segmented vocab (dictionary-sized) and materialize
      // it WHILE the word-frequency cache still exists — a lazy cache
      // would otherwise fill by replaying the corpus groupBy + k
      // interpreted merge folds after vocab is gone.
      if (cur ne vocab) {
        cur = cur.cache()
        cur.count()
      }
      (cur, merges.toSeq)
    } finally {
      // (no merges -> cur IS vocab: keep the cache, the caller owns it)
      if (cur ne vocab) vocab.unpersist(blocking = false)
    }
  }

  /** BPE ENCODING with the merges [[bpeMerges]] just learned — the apply
    * half of tokenizer training: per-doc subword token counts and the
    * chars-per-token compression the tokenizer achieves. The corpus-sized
    * pass is one explode + one broadcast join against the segmented
    * vocabulary, then a map-side combined per-doc sum. `broadcastVocab`
    * gates the dictionary broadcast the same way [[lmPerplexityOf]]'s
    * `broadcastModel` does: whitespace types are an OPEN vocabulary at
    * web scale (URLs, typos, ids), so the beyond-broadcast path
    * equi-joins the words on their own shuffle instead — no forced
    * broadcast of a corpus-derived frame either way. */
  def bpeEncode(spark: SparkSession, dir: String, k: Int = 5,
      broadcastVocab: Boolean = true): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val seg = bpeTrainCached(spark, dir, k)._1
      .select(col("w"), size(col("syms")).cast("long").as("n_sub"))
    docs.select(col("doc_id"), explode(toks(col("text"))).as("w"))
      .where(col("w") =!= "")
      .join(if (broadcastVocab) broadcast(seg) else seg, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_bpe_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
        round(col("n_bpe_tokens").cast("double") / col("n_words"), 4)
          .as("subtokens_per_word"))
      .orderBy(col("doc_id"))
  }

  /** Tokenizer fertility audit — per LANGUAGE, BPE subtokens-per-word
    * (fertility) and chars-per-subtoken over the whole corpus: the
    * multilingual-equity check every tokenizer release ships (a language
    * with high fertility pays more compute per word and fits less text
    * per context window, which is why per-language fertility tables
    * accompany every public vocabulary). Rides the ONE cached BPE
    * training artifact ([[bpeTrainCached]] — shared with bpe_merges /
    * bpe_encode, so the fertility audit costs one broadcast join + one
    * lang-keyed aggregate, never a retrain). All counts exact integers;
    * the two ratios are single-division doubles rounded 4dp. */
  def bpeFertility(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val seg = bpeTrainCached(spark, dir, k)._1
      .select(col("w"), size(col("syms")).cast("long").as("n_sub"),
        length(col("w")).cast("long").as("n_chars_w"))
    Tables.documents(spark, dir)
      .select(col("lang"), explode(toks(col("text"))).as("w"))
      .where(col("w") =!= "")
      .join(broadcast(seg), Seq("w"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_bpe_tokens"),
        sum(col("n_chars_w")).as("n_chars"))
      .select(col("lang"), col("n_words"), col("n_bpe_tokens"),
        round(col("n_bpe_tokens").cast("double") / col("n_words"), 4).as("fertility"),
        round(col("n_chars").cast("double") / col("n_bpe_tokens"), 4).as("chars_per_token"))
      .orderBy(col("lang"))
  }

  /** Corpus vocabulary: the k most frequent whitespace tokens with
    * deterministic tie-break (count desc, token asc) — the input to
    * vocabulary construction / BPE seeding. One explode + one keyed
    * aggregation; partial aggregation bounds the shuffle to the distinct
    * vocabulary per partition, so a hot token ("the") never skews a task. */
  def vocabTopK(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    // top-k via orderBy().limit() -> TakeOrderedAndProject (per-partition
    // heaps, no single-partition window over the full VOCABULARY); ranks
    // come from a row_number window over the k ordered SURVIVORS — a
    // no-partition window, but bounded by k rows by construction (limit
    // already ran), where the rdd.zipWithIndex this replaces re-executed
    // the whole explode+agg lineage a second time for its sizing job
    // (measured: the r6 bench charged vocab_topk 6x its r5 median)
    val rankW = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_occurrences").desc, col("token").asc)
    Tables.documents(spark, dir)
      .select(explode(toks(col("text"))).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token").asc)
      .limit(k)
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .select(col("rank"), col("token"), col("n_occurrences"))
      .orderBy(col("rank"))
  }

  /** Top-k word BIGRAMS — the n-gram LM / tokenizer-design statistic next
    * to [[vocabTopK]]'s unigrams. Same scale shape: per-doc adjacent-pair
    * explode → keyed count → TakeOrderedAndProject heap top-k → rank via a
    * k-bounded window over the survivors (see vocabTopK's rank note). */
  def bigramTopK(spark: SparkSession, dir: String, k: Int = 30): DataFrame = {
    import spark.implicits._
    val t = toks(col("text"))
    Tables.documents(spark, dir)
      .select(t.as("toks"))
      .select(explode(
        // guard INSIDE the expression: sequence(1, n-1) descends for n < 2
        // and the optimizer may hoist this projection past a row filter
        when(size(col("toks")) >= 2, transform(
          sequence(lit(1), size(col("toks")) - 1),
          i => concat_ws(" ", element_at(col("toks"), i), element_at(col("toks"), i + 1))))
          .otherwise(array().cast("array<string>")))
        .as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("bigram").asc)
      .limit(k)
      .withColumn("rank", row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("n_occurrences").desc, col("bigram").asc)).cast("long"))
      .select(col("rank"), col("bigram"), col("n_occurrences"))
      .orderBy(col("rank"))
  }

  /** Count-min sketch heavy hitters — the FIXED-MEMORY frequency sketch
    * (Cormode & Muthukrishnan 2005) next to q14's HLL and q18's KMV:
    * `rows`×`width` counters (default 4×1024 = 4096 cells) estimate any
    * token's frequency with one-sided error, however large the corpus.
    * The sketch build is one groupBy over (row, bucket) whose partial
    * aggregation combines map-side, so each task ships at most
    * rows×width cells to the shuffle — the sketch is mergeable by
    * construction, exactly what a 1000-executor frequency pass needs.
    *
    * The bucket hashes are md5-derived (`md5(j + ":" + token)` 60-bit
    * prefix mod width — the same engine-portable family the minhash/KMV
    * sketches ride), so DuckDB rebuilds the IDENTICAL sketch and the
    * estimates hash-match exactly: this is a fully oracle-checked sketch,
    * not a tolerance gate. Output: the exact top-k tokens (the
    * verification twin) with their CMS estimate and the one-sided-error
    * guarantee (`cms_cnt >= exact_cnt`) as a checked flag per row. */
  /** The CMS bucket-hash family — shared by the batch sketch, its probe
    * side, and the streaming windowed twin, so all three build the
    * IDENTICAL sketch (and DuckDB can rebuild it too). */
  private[graft] def cmsBucket(j: Int, token: Column, width: Int): Column =
    conv(substring(md5(concat(lit(j + ":"), token)), 1, 15), 16, 10)
      .cast("long") % lit(width.toLong)

  /** All `rows` (r, b) cell coordinates of a token as one array — a single
    * scan feeds the whole sketch (vs one pass per hash row). */
  private[graft] def cmsCells(token: Column, rows: Int, width: Int): Column =
    array((0 until rows).map(j =>
      struct(lit(j).as("r"), cmsBucket(j, token, width).as("b"))): _*)

  def cmsHeavyHitters(spark: SparkSession, dir: String, k: Int = 20,
      rows: Int = 4, width: Int = 1024): DataFrame =
    cmsHeavyHittersOf(spark, Tables.documents(spark, dir), k, rows, width)

  /** Feature hashing (the hashing trick) — fixed-width sparse doc vectors
    * with NO vocabulary pass: each token hashes straight to one of
    * `width` buckets (md5-derived, the engine's portable family), emitted
    * as (doc_id, bucket, cnt) sparse rows. The classic
    * train-a-classifier-on-100TB representation: no dictionary to build,
    * broadcast, or version — the feature space is a pure function of the
    * token bytes, identical across batches, engines, and reruns. One
    * narrow explode + one (doc, bucket)-keyed count; output is bounded by
    * min(tokens, docs×width). */
  def featureHash(spark: SparkSession, dir: String, width: Int = 64): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(toks(col("text"))).as("token"))
      .where(col("token") =!= "")
      .select(col("doc_id"), cmsBucket(0, col("token"), width).as("bucket"))
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("doc_id"), col("bucket"))

  /** Frame form over any (doc_id, text) corpus. */
  def cmsHeavyHittersOf(spark: SparkSession, docs: DataFrame, k: Int = 20,
      rows: Int = 4, width: Int = 1024): DataFrame = {
    // Aggregate token occurrences to vocabulary grain FIRST: the 4 md5
    // bucket hashes then run once per DISTINCT token (vocab-sized) instead
    // of once per occurrence (corpus-sized), and the sketch and the exact
    // top-k share the same (token → count) exchange subtree (ReusedExchange
    // — one corpus scan instead of two). Cell counts are integer sums of
    // integer counts grouped by the identical md5 buckets — exact.
    val tcnt = docs
      .select(explode(toks(col("text"))).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("exact_cnt"))
    val cells = tcnt
      .select(col("exact_cnt"), explode(cmsCells(col("token"), rows, width)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(sum(col("exact_cnt")).as("cnt"))
    val exact = tcnt
      .orderBy(col("exact_cnt").desc, col("token").asc)
      .limit(k)
    // estimate = min over the d row counters; the probe side is k rows ->
    // broadcast against the <=rows*width-cell sketch
    exact
      .select(col("token"), col("exact_cnt"),
        explode(cmsCells(col("token"), rows, width)).as("rb"))
      .select(col("token"), col("exact_cnt"), col("rb.r").as("r"), col("rb.b").as("b"))
      .join(cells, Seq("r", "b"))
      .groupBy(col("token"), col("exact_cnt")).agg(min(col("cnt")).as("cms_cnt"))
      .select(col("token"), col("exact_cnt"), col("cms_cnt"),
        (col("cms_cnt") >= col("exact_cnt")).as("never_underestimates"))
      .orderBy(col("exact_cnt").desc, col("token").asc)
  }

  /** Exact length percentiles (p50/p90/p99 of n_chars, nearest-rank
    * ceil(p·n)) — the token-budget planning numbers. Exact so both engines
    * agree bit-for-bit, unlike approx_percentile sketches; computed from a
    * keyed VALUE histogram + driver cumsum instead of a global sort, so only
    * the distinct-length counts (bounded by max document length) ever leave
    * the executors — the shape that survives 100 TB. */
  def lengthPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hist = Tables.documents(spark, dir)
      .select(length(col("text")).cast("long").as("n_chars"))
      .groupBy(col("n_chars")).agg(count(lit(1)).as("c"))
      .orderBy(col("n_chars"))
      .as[(Long, Long)].collect()
    val n = hist.map(_._2).sum
    def pick(p: Double): Long = {
      val target = math.ceil(p * n).toLong
      var acc = 0L
      for ((v, c) <- hist) { acc += c; if (acc >= target) return v }
      hist.last._1
    }
    Seq((n, pick(0.5), pick(0.9), pick(0.99)))
      .toDF("n_docs", "p50_chars", "p90_chars", "p99_chars")
  }

  /** Per-language MAD length-outlier detection — the ROBUST curation
    * filter next to [[lengthPercentiles]]: median + median-absolute-
    * deviation are immune to the heavy tails that drag a mean±kσ rule
    * around (one 10 MB doc shifts a mean, not a median), so the
    * `dev > 3·MAD` bar is the length filter a production cleaning pass
    * actually ships. One corpus scan builds the (lang, n_chars) VALUE
    * histogram (column-pruned to two columns — n_chars is a stored
    * column, text never leaves the scan); medians ride the interpolated
    * quantile_cont(0.5) formula over the histogram in driver arithmetic
    * (bounded by distinct lengths × languages, the [[lengthPercentiles]]
    * scale argument), and every quantity is an exact binary fraction
    * (halves from the median of integers, quarters from the MAD of
    * halves), so both engines agree bit-for-bit with no rounding
    * contract. */
  def lengthMadOutliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hist = Tables.documents(spark, dir)
      .groupBy(col("lang"), col("n_chars")).agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)].collect()
    val rows = hist.groupBy(_._1).toSeq.map { case (lang, rs) =>
      val (n, med, mad, outliers) =
        madStats(rs.map { case (_, v, c) => (v.toDouble, c) }.toSeq)
      (lang, n, med, mad, outliers)
    }
    rows.toDF("lang", "n_docs", "med_chars", "mad_chars", "n_outliers")
      .orderBy(col("lang"))
  }

  /** quantile_cont(0.5) over a sorted (value, count) histogram — DuckDB's
    * median formula: h = 0.5*(n-1) zero-indexed, interpolate v[k]..v[k+1].
    * Shared by [[lengthMadOutliers]] and the embedding-norm twin so both
    * replicate the oracle's interpolation bit-for-bit. */
  private[operators] def contMedian(h: Seq[(Double, Long)]): Double = {
    val s = h.sortBy(_._1)
    val n = s.map(_._2).sum
    val pos = 0.5 * (n - 1)
    val k = math.floor(pos).toLong
    def at(rank: Long): Double = {
      var acc = 0L
      for ((v, c) <- s) { acc += c; if (acc > rank) return v }
      s.last._1
    }
    val lo = at(k)
    if (pos == k) lo else lo + (at(k + 1) - lo) * (pos - k)
  }

  /** (n, median, MAD, count beyond 3·MAD) over a value histogram — the
    * robust-outlier driver arithmetic shared across the MAD family. */
  private[operators] def madStats(vh: Seq[(Double, Long)]): (Long, Double, Double, Long) = {
    val n = vh.map(_._2).sum
    val med = contMedian(vh)
    val devH = vh.groupBy { case (v, _) => math.abs(v - med) }
      .map { case (dv, g) => (dv, g.map(_._2).sum) }.toSeq
    val mad = contMedian(devH)
    val outliers = devH.collect { case (dv, c) if dv > 3 * mad => c }.sum
    (n, med, mad, outliers)
  }

  /** Hash-checked gate for the percentile SKETCH (`approx_percentile`,
    * the KLL/GK-family estimator every monitoring pipeline leans on at
    * 100 TB where exact ranks need a full sort): emits the exact
    * nearest-rank percentiles (oracle-recomputable) plus flags that the
    * sketch landed within `tol` of each — the q14 HLL pattern applied to
    * quantiles. At the correctness SF the sketch (accuracy 10⁴) is exact,
    * so the flags are deterministic. */
  def percentileGate(spark: SparkSession, dir: String, tol: Double = 0.02): DataFrame = {
    val approx = Tables.documents(spark, dir)
      .agg(percentile_approx(length(col("text")).cast("long"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("ap"))
    lengthPercentiles(spark, dir).crossJoin(approx).select(
      col("n_docs"), col("p50_chars"), col("p90_chars"), col("p99_chars"),
      (abs(element_at(col("ap"), 1) - col("p50_chars")) <= col("p50_chars") * tol).as("p50_ok"),
      (abs(element_at(col("ap"), 2) - col("p90_chars")) <= col("p90_chars") * tol).as("p90_ok"),
      (abs(element_at(col("ap"), 3) - col("p99_chars")) <= col("p99_chars") * tol).as("p99_ok"))
  }

  /** Per-doc top-k TF-IDF terms: tf = termCount/docLen, idf = ln(N/df),
    * ranked (weight desc, term asc). Three keyed aggregations + two
    * equi-joins (the df side is dictionary-sized → broadcast); the rank
    * window partitions by doc_id, so no global sort. The classic keyword
    * extraction pass of a text pipeline. */
  def tfIdfTop(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count().toDouble
    val tc = lexTermCounts(spark, dir)
    val dl = lexDocLens(spark, dir)
    val dfs = lexTermDfs(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("wt").desc, col("term").asc)
    tc.join(dl, "doc_id").join(dfs, "term")
      .withColumn("wt", col("c").cast("double") / col("n") * log(lit(nDocs) / col("df")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), round(col("wt"), 4).as("tfidf"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** Fixed query set for [[bm25Retrieval]] — terms drawn from the corpus
    * vocabulary (TESTDATA.md's synthetic token set) so every query has
    * matches; the 2-3-term shape is the classic keyword-search workload. */
  val Bm25Queries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("hash", "join"),
    2L -> Seq("vector", "scan", "fast"),
    3L -> Seq("window", "agg", "merge"))

  /** BM25 top-k retrieval (the Lucene/Elasticsearch default ranking) over
    * `documents` for a fixed literal query set — the retrieval half of a
    * RAG/eval pipeline next to the embedding top-k twins in Similarity:
    * idf = ln((N − df + ½)/(df + ½) + 1), tf saturation k1, length
    * regularization b. Cross-engine determinism: each term's contribution
    * is a fixed double expression over INTEGER count statistics, rounded
    * to 6 dp and summed as DECIMAL(18,6) (the lm_perplexity contract —
    * order-independent across partitionings and engines); ranks then sort
    * on the exact decimal sum. Ranking is a rank-limited window — Spark
    * ≥3.5 plants a Partial WindowGroupLimit below the exchange, so k rows
    * per partition per query cross the shuffle (the same bounded-heap
    * shape as [[graft.functions.TopKAggregator]], which this replaced,
    * without the per-row object/Kryo boundary) — so the plan is: doc-side
    * explode + one term-count aggregation (the only corpus-wide
    * shuffles), a broadcast join against the literal query set's
    * dictionary stats, and a k-bounded rank window. Holds at any corpus
    * size; the query set is config-bounded by construction. */
  def bm25Retrieval(spark: SparkSession, dir: String, k: Int = 5,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import spark.implicits._
    val tc = lexTermCounts(spark, dir)
    val dl = lexDocLens(spark, dir)
    val stats = dl.agg(count(lit(1)).cast("double").as("nd"),
      (sum(col("n")).cast("double") / count(lit(1))).as("avgdl"))
    val qt = Bm25Queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("qid", "term")
    val dfs = lexTermDfs(spark, dir)
    // dictionary stats restricted to the literal query terms: a ≤|q| row
    // frame however large the corpus vocabulary is → always broadcastable
    val qi = qt.join(dfs, Seq("term"), "left_outer")
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("term"),
        log((col("nd") - coalesce(col("df"), lit(0L)) + 0.5) /
          (coalesce(col("df"), lit(0L)) + 0.5) + 1.0).as("idf"),
        col("avgdl"))
    val scored = tc.join(broadcast(qi), Seq("term"))
      .join(dl, Seq("doc_id"))
      .select(col("qid"), col("doc_id"),
        round(col("idf") * (col("c") * lit(k1 + 1.0)) /
          (col("c") + lit(k1) * (lit(1.0 - b) + lit(b) *
            (col("n").cast("double") / col("avgdl")))), 6)
          .cast("decimal(18,6)").as("contrib"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("contrib")).as("s"))
    // round the exact DECIMAL sum to 4 dp BEFORE ranking (the dsir_weight
    // boundary lesson: a 10⁻⁶-multiple sum hits the .00005 double-rounding
    // boundary on ~1% of docs) — both engines then rank the same rounded
    // value with doc_id breaking the extra ties rounding introduces
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("dist").asc, col("id").asc)
    scored
      .select(col("qid"), (-round(col("s"), 4).cast("double")).as("dist"),
        col("doc_id").as("id"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("doc_id"),
        (-col("dist")).as("score"))
      .orderBy(col("qid"), col("rank"))
  }

  /** BM25 with pseudo-relevance feedback — RM3-lite query expansion, the
    * classic recall lever of lexical retrieval (Lavrenko-Croft relevance
    * models; Lucene/Terrier's QueryExpansion default shape): pass 1 runs
    * the [[bm25Retrieval]] scoring and keeps each query's top-`fbDocs`
    * docs as pseudo-relevant; candidate expansion terms are the feedback
    * docs' terms scored by the EXACT decimal sum of 6-dp-rounded c×idf
    * over the feedback set (original query terms excluded, top-`fbTerms`
    * by score desc / term asc); pass 2 re-scores with original ∪
    * expansion terms — same rounded-decimal BM25 contract, so both passes
    * and the term ranking are engine-stable. Scale shape: the candidate
    * frame is bounded by fbDocs × doc-length per query (never the
    * vocabulary), the expanded query side stays a broadcast dictionary
    * frame, and both passes end in the k-bounded rank window. The shared
    * memoized term-count frame feeds every stage — one corpus scan. */
  def bm25Prf(spark: SparkSession, dir: String, k: Int = 5, fbDocs: Int = 3,
      fbTerms: Int = 5, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import spark.implicits._
    val tc = lexTermCounts(spark, dir)
    val dl = lexDocLens(spark, dir)
    val stats = dl.agg(count(lit(1)).cast("double").as("nd"),
      (sum(col("n")).cast("double") / count(lit(1))).as("avgdl"))
    val dfs = lexTermDfs(spark, dir)
    val qt0 = Bm25Queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("qid", "term")

    def idfOf(qt: DataFrame): DataFrame = qt.join(dfs, Seq("term"), "left_outer")
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("term"),
        log((col("nd") - coalesce(col("df"), lit(0L)) + 0.5) /
          (coalesce(col("df"), lit(0L)) + 0.5) + 1.0).as("idf"),
        col("avgdl"))

    def scoreOf(qi: DataFrame): DataFrame = tc.join(broadcast(qi), Seq("term"))
      .join(dl, Seq("doc_id"))
      .select(col("qid"), col("doc_id"),
        round(col("idf") * (col("c") * lit(k1 + 1.0)) /
          (col("c") + lit(k1) * (lit(1.0 - b) + lit(b) *
            (col("n").cast("double") / col("avgdl")))), 6)
          .cast("decimal(18,6)").as("contrib"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("contrib")).as("s"))

    // row_number ≤ n — bounded pre-shuffle via Partial WindowGroupLimit
    // (see rankHeapTopK), identical ordering contract to the typed heap it
    // replaces: ascending (dist, id) = descending (score, -id).
    def heapTop(scored: DataFrame, n: Int): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("dist").asc, col("id").asc)
      scored
        .select(col("qid"), (-round(col("s"), 4).cast("double")).as("dist"),
          col("doc_id").as("id"))
        .withColumn("r", row_number().over(w))
        .where(col("r") <= n)
    }

    val fb = heapTop(scoreOf(idfOf(qt0)), fbDocs)
      .select(col("qid"), col("id").as("doc_id"))
    val termIdf = dfs.crossJoin(broadcast(stats))
      .select(col("term"),
        log((col("nd") - col("df") + 0.5) / (col("df") + 0.5) + 1.0).as("tidf"))
    val exp = fb.join(tc, Seq("doc_id"))
      .join(termIdf, Seq("term"))
      .select(col("qid"), col("term"),
        round(col("c") * col("tidf"), 6).cast("decimal(18,6)").as("w"))
      .groupBy(col("qid"), col("term")).agg(sum(col("w")).as("tw"))
      .join(qt0.withColumn("orig", lit(1)), Seq("qid", "term"), "left_outer")
      .where(col("orig").isNull)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("tw").desc, col("term").asc)))
      .where(col("rk") <= fbTerms)
      .select(col("qid"), col("term"))
    heapTop(scoreOf(idfOf(qt0.union(exp))), k)
      .select(col("qid"), col("r").cast("long").as("rank"),
        col("id").as("doc_id"), (-col("dist")).as("score"))
      .orderBy(col("qid"), col("rank"))
  }

  /** HYBRID retrieval — the modern RAG-stack shape: a lexical BM25 leg and
    * an embedding-cosine leg fused by reciprocal-rank fusion
    * (rrf = Σ 1/(60 + rank), the Cormack/Clarke/Buettcher SIGIR'09 rule,
    * also the default hybrid combiner of the mainstream search engines).
    * Query-by-example: each query id < `nQueries` contributes its
    * document's DISTINCT tokens as the BM25 query and its embedding as
    * the vector query (the documents↔embeddings id join is the corpus
    * convention, see mm_join). Determinism: BM25 rides the rounded-
    * decimal contract of [[bm25Retrieval]]; the cosine leg ranks on the
    * raw sequential-fold double (the sim_cosine_topk contract); each
    * fusion term is a 6-dp-rounded double so the 2-term sum is exact.
    * Scale shape: both legs end in the bounded TopK heap (k rows per
    * partition per query cross the shuffle, never a corpus rank window),
    * and the fusion join + final rank window run over two ≤ nQueries·k
    * row frames — driver-trivial at any corpus size. */
  /** Per-qid top-k ranks through the bounded heap — (qid, rankName,
    * doc_id) from a (qid, dist, id) scored frame. Shared by the hybrid
    * legs and [[SparseRetrieval.trimodalFusion]] so every leg's ranking
    * rides the same k-bounded aggregation, never a corpus-wide window. */
  private[graft] def rankHeapTopK(scored: DataFrame, k: Int,
      rankName: String): DataFrame = {
    // row_number ≤ k — SAME bounded pre-shuffle shape as the typed
    // TopKAggregator it replaces (Spark ≥3.5 plants a Partial
    // WindowGroupLimit below the exchange for rank-limit filters, so the
    // shuffle still carries ≤ partitions·q·k rows), minus the
    // per-row object conversion + Kryo heap buffers of the groupByKey
    // path. Output contract unchanged: TopKAggregator was documented (and
    // spec'd) identical to row_number OVER (ORDER BY dist, id) <= k.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("dist").asc, col("id").asc)
    scored.withColumn(rankName, row_number().over(w).cast("long"))
      .where(col(rankName) <= k)
      .select(col("qid"), col(rankName), col("id").as("doc_id"))
  }

  /** The dense query-by-example leg: exact cosine of every corpus vector
    * against the broadcast first-nQueries query embeddings, self-hit
    * excluded — (qid, dist = −cos, id). One definition serving
    * [[hybridRetrieval]] and the tri-modal fusion. */
  private[graft] def vecCosineScored(spark: SparkSession, dir: String,
      nQueries: Int): DataFrame = {
    import graft.functions.NativeVectorFunctions.{dotNative, normNative}
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), normNative(spark, col("embedding")).as("nrm"))
    val qv = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"), col("nrm").as("qn"))
    e.select(col("vec_id").as("id"), col("embedding").as("vec"), col("nrm").as("vn"))
      .crossJoin(broadcast(qv))
      .where(col("id") =!= col("query_id"))
      .select(col("query_id").as("qid"),
        (-(dotNative(spark, col("vec"), col("qvec")) / (col("vn") * col("qn")))).as("dist"),
        col("id"))
  }

  def hybridRetrieval(spark: SparkSession, dir: String, nQueries: Int = 5,
      k: Int = 10, kRrf: Int = 60, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // ---- lexical leg: BM25 with the query doc's distinct tokens --------
    val lex = rankHeapTopK(lexScores(spark, dir, nQueries, k1, b)
      .select(col("qid"), col("dist"), col("id")), k, "lex_rank")

    // ---- vector leg: exact cosine over the broadcast query embeddings --
    val vec = rankHeapTopK(vecCosineScored(spark, dir, nQueries), k, "vec_rank")

    // ---- reciprocal-rank fusion ---------------------------------------
    val fused = lex.join(vec, Seq("qid", "doc_id"), "full_outer")
      .select(col("qid"), col("doc_id"),
        coalesce(col("lex_rank"), lit(-1L)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(-1L)).as("vec_rank"),
        (coalesce(round(lit(1.0) / (lit(kRrf) + col("lex_rank")), 6), lit(0.0)) +
          coalesce(round(lit(1.0) / (lit(kRrf) + col("vec_rank")), 6), lit(0.0))).as("rrf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("rrf").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc_id"),
        round(col("rrf"), 6).as("rrf"), col("lex_rank"), col("vec_rank"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Composed RAG retrieval — the full modern retrieval stack as ONE
    * declarative query: the hybrid BM25+cosine RRF fusion supplies each
    * query's top-10 shortlist, fused scores are min-max normalized onto
    * [0,1] PER QUERY (raw RRF lives in [0, 2/(kRrf+1)] ≈ 0.033 — three
    * orders below cosine similarity, which would reduce MMR to pure
    * farthest-point selection), and the shared greedy MMR core
    * ([[graft.operators.Similarity.mmrSelect]]) picks the final
    * diversity-aware context set. Every stage keeps its parent's
    * determinism contract (decimal BM25, raw-double cosine ranks,
    * 6-dp-rounded fusion terms, 0.7/0.3 literals), so the whole pipeline
    * hash-matches an oracle that composes the stages' own SQL. Scale:
    * the hybrid legs end in bounded heaps; everything past them is
    * shortlist-sized. */
  def ragRetrieval(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
    val cand = hybridRetrieval(spark, dir)
      .withColumn("mn", min(col("rrf")).over(w))
      .withColumn("mx", max(col("rrf")).over(w))
      .withColumn("rel", when(col("mx") > col("mn"),
        (col("rrf") - col("mn")) / (col("mx") - col("mn"))).otherwise(lit(0.0)))
      .join(Tables.embeddings(spark, dir)
        .select(col("vec_id").as("doc_id"), col("embedding").as("vec")), "doc_id")
      .select(col("qid").as("query_id"), col("doc_id").as("id"), col("rel"), col("vec"))
    graft.operators.Similarity.mmrSelect(cand, k)
      .select(col("query_id"), col("mmr_rank"), col("id"),
        round(col("rel"), 4).as("rel"), round(col("score"), 4).as("score"))
      .orderBy(col("query_id"), col("mmr_rank"))
  }

  /** Cross-encoder-shaped FINAL rerank — the last stage of the modern
    * retrieval stack [[ragRetrieval]] assembles: the MMR-selected context
    * set is re-scored by a deterministic PAIRWISE scorer that examines
    * query and document jointly — the MaxSim late-interaction arithmetic
    * over token-level sub-vectors
    * ([[graft.operators.Similarity.maxSimScore]]: Σ_i max_j ⟨q_i, d_j⟩) —
    * exactly the slot a learned cross-encoder occupies in production
    * (bi-encoder shortlist → cheap fusion → expensive pairwise head on
    * the final handful). Scale shape: the pairwise kernel runs on
    * queries×k rows ONLY (the whole point of staging — never on the
    * corpus); the query-embedding side is a broadcast of nQueries rows.
    * Determinism: raw-double MaxSim ranking with ascending-id tie-break,
    * 4-dp-rounded emission — the maxsim_topk contract; the oracle replays
    * the full composed stack plus the same 16-sub-dot expression. */
  def ragRerank(spark: SparkSession, dir: String, k: Int = 5, nQueries: Int = 5): DataFrame = {
    import graft.operators.Similarity
    val picks = ragRetrieval(spark, dir, k)
      .select(col("query_id"), col("mmr_rank"), col("id"))
    val e = Tables.embeddings(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("ces").desc, col("id").asc)
    picks
      .join(e.select(col("vec_id").as("id"), col("embedding").as("vec")), "id")
      .join(broadcast(e.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))), "query_id")
      .withColumn("ces", Similarity.maxSimScore(spark, col("qvec"), col("vec")))
      .withColumn("ce_rank", row_number().over(w).cast("long"))
      .select(col("query_id"), col("ce_rank"), col("id"),
        round(col("ces"), 4).as("ce_score"), col("mmr_rank"))
      .orderBy(col("query_id"), col("ce_rank"))
  }

  /** Per-(doc, term) token counts — the shared base frame of the lexical
    * retrieval leg. MEMOIZED + persisted per (session, dir): one action
    * over `hybridRetrieval`/`lexScores`/`fitBm25QueryModel` otherwise
    * re-runs the corpus scan + groupBy ~4× (dl, dfs, the score join, and
    * the query-idf's own dl), which at corpus scale is the plan you would
    * not want. Everything downstream of this frame is dictionary-sized.
    * Cleared by [[clearCaches]]. */
  private val lexTcCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  private[graft] def lexTermCounts(spark: SparkSession, dir: String): DataFrame =
    lexTcCache.getOrElseUpdate((spark, dir),
      Tables.documents(spark, dir)
        .select(col("doc_id"), explode(toks(col("text"))).as("term"))
        .where(col("term") =!= "")
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))
        .persist())

  /** Doc lengths (doc_id, n) and term document frequencies (term, df) —
    * the two corpus aggregates every lexical-retrieval stage re-derives
    * from [[lexTermCounts]]. Memoized + persisted like their base frame:
    * bm25/PRF/hybrid/RAG each fold them ~2-4×, and while recomputing from
    * the cached tc is not a rescan, it is still a full shuffle per use at
    * corpus scale. Cleared by [[clearCaches]]. */
  private val lexDlCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]
  private val lexDfCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  private[graft] def lexDocLens(spark: SparkSession, dir: String): DataFrame =
    lexDlCache.getOrElseUpdate((spark, dir),
      lexTermCounts(spark, dir)
        .groupBy(col("doc_id")).agg(sum(col("c")).as("n")).persist())

  private[graft] def lexTermDfs(spark: SparkSession, dir: String): DataFrame =
    lexDfCache.getOrElseUpdate((spark, dir),
      lexTermCounts(spark, dir)
        .groupBy(col("term")).agg(count(lit(1)).as("df")).persist())

  /** (qid, term, idf, avgdl) for the standing query set — the ONE BM25
    * query-side arithmetic, shared by the batch lexical leg and
    * [[fitBm25QueryModel]] so the frozen ingest model is the batch model
    * by construction. */
  private def lexQueryIdf(spark: SparkSession, dir: String, nQueries: Int,
      tc: DataFrame): DataFrame = {
    val dl = lexDocLens(spark, dir)
    val stats = dl.agg(count(lit(1)).cast("double").as("nd"),
      (sum(col("n")).cast("double") / count(lit(1))).as("avgdl"))
    val dfs = lexTermDfs(spark, dir)
    val qt = Tables.documents(spark, dir).where(col("doc_id") < nQueries)
      .select(col("doc_id").as("qid"), explode(toks(col("text"))).as("term"))
      .where(col("term") =!= "").distinct()
    qt.join(dfs, Seq("term"), "left_outer")
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("term"),
        log((col("nd") - coalesce(col("df"), lit(0L)) + 0.5) /
          (coalesce(col("df"), lit(0L)) + 0.5) + 1.0).as("idf"),
        col("avgdl"))
  }

  /** Full BM25 score frame for the standing query set: one row per
    * (qid, doc) sharing ≥1 term, `dist` = −round(score, 4) (ascending =
    * most relevant first, the heap contract) and `bm25` the positive
    * score. Decimal(18,6) per-term contributions summed — decimal
    * addition is exact and order-free, so any engine/exec plan agrees. */
  private[graft] def lexScores(spark: SparkSession, dir: String, nQueries: Int = 5,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tc = lexTermCounts(spark, dir)
    val dl = lexDocLens(spark, dir)
    val qi = lexQueryIdf(spark, dir, nQueries, tc)
    tc.join(broadcast(qi), Seq("term"))
      .join(dl, Seq("doc_id"))
      .where(col("doc_id") =!= col("qid"))
      .select(col("qid"), col("doc_id"),
        round(col("idf") * (col("c") * lit(k1 + 1.0)) /
          (col("c") + lit(k1) * (lit(1.0 - b) + lit(b) *
            (col("n").cast("double") / col("avgdl")))), 6)
          .cast("decimal(18,6)").as("contrib"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("contrib")).as("s"))
      .select(col("qid"), (-round(col("s"), 4).cast("double")).as("dist"),
        col("doc_id").as("id"),
        round(col("s"), 4).cast("double").as("bm25"))
  }

  /** Frozen standing-query lexical model for ingest-side retrieval: each
    * standing query's distinct terms with their corpus-fitted BM25 idf,
    * plus the corpus avgdl — fit OFFLINE on the batch corpus (the exact
    * [[lexQueryIdf]] arithmetic), then shipped to the stream as plan
    * literals, the [[graft.operators.DocClassifier]] deployment shape.
    * Size is nQueries × distinct-query-terms — dictionary-bounded, never
    * corpus-bounded. */
  final case class Bm25QueryModel(
      queries: Seq[(Long, Seq[(String, Double)])],
      avgdl: Double, k1: Double, b: Double) extends Serializable

  def fitBm25QueryModel(spark: SparkSession, dir: String, nQueries: Int = 5,
      k1: Double = 1.2, b: Double = 0.75): Bm25QueryModel = {
    val qi = lexQueryIdf(spark, dir, nQueries, lexTermCounts(spark, dir))
    val rows = qi.select(col("qid"), col("term"), col("idf"), col("avgdl")).collect()
    val avgdl = if (rows.isEmpty) 0.0 else rows.head.getAs[Double]("avgdl")
    val queries = rows.groupBy(_.getAs[Long]("qid")).toSeq.sortBy(_._1)
      .map { case (q, rs) =>
        (q, rs.map(r => (r.getAs[String]("term"), r.getAs[Double]("idf")))
          .sortBy(_._1).toSeq)
      }
    Bm25QueryModel(queries, avgdl, k1, b)
  }

  /** N-gram repetition score — the "repetitive junk" quality signal LLM
    * corpus filters cut on (boilerplate, keyword stuffing, generation
    * loops): 1 − distinct/total word-3-grams per doc, 0 = no repeated
    * trigram, → 1 = one trigram repeated throughout. Single narrow pass,
    * no shuffle before the output sort. */
  def repetitionScore(spark: SparkSession, dir: String): DataFrame = {
    val t = toks(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), t.as("toks"))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"),
        (size(col("toks")) - 2).cast("long").as("n_ngrams"),
        size(Dedup.shingles(col("toks"))).cast("long").as("n_distinct"))
      .withColumn("repetition",
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_ngrams"), 4))
      .orderBy(col("doc_id"))
  }

  /** Overlapping token chunks — the tokenize→chunk step every embedding
    * pipeline runs before vectorizing: windows of `chunkTokens` tokens
    * every `stride` tokens (stride < chunkTokens ⇒ overlap), one row per
    * chunk with its token count and content hash. Narrow explode, no
    * shuffle before the output sort; at 100 TB this is the map-side stage
    * feeding the embedding model. */
  def docChunks(spark: SparkSession, dir: String,
      chunkTokens: Int = 64, stride: Int = 48): DataFrame = {
    val t = toks(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), t.as("toks"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), greatest(size(col("toks")), lit(1)), lit(stride)),
          st => slice(col("toks"), st, lit(chunkTokens)))).as(Seq("chunk_id", "chunk")))
      .where(size(col("chunk")) > 0)
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        size(col("chunk")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Word-bigram language-model scoring — the perplexity-proxy quality
    * filter of an LLM corpus pipeline (KenLM-style, one order down): score
    * each doc by the mean add-one-smoothed bigram log-probability under the
    * corpus's own bigram counts, ppl = exp(−mean).
    *
    * Two keyed aggregations build the model (bigram counts + context
    * counts — both bounded by vocabulary², broadcast back; a production
    * run caps the vocab with a df floor the same way [[oovRate]] does), one
    * explode scores every doc position, one groupBy(doc_id) folds them.
    * Cross-engine determinism: each bigram's log-prob is ln of a ratio of
    * INTEGERS (counts + vocab size), rounded to 6 dp and summed as
    * DECIMAL(18,6) — exact integer arithmetic, so the per-doc sum is
    * order-independent (double summation would diverge between Spark's
    * partial aggregates and DuckDB's scan order). */
  def lmPerplexity(spark: SparkSession, dir: String): DataFrame =
    lmPerplexityOf(spark, Tables.documents(spark, dir))

  /** Frame form over any (doc_id, text). `broadcastModel` picks the join
    * strategy for the count tables: broadcast when the vocabulary is
    * dictionary-sized (the registered query's corpus — the optimal plan),
    * shuffle equi-join when vocab² outgrows a broadcast (a 30k-token LM
    * vocab has up to 9×10⁸ bigram types; DedupScaleBench measures this
    * path at 50k vocab / 500k docs). The scoring math is identical. */
  def lmPerplexityOf(spark: SparkSession, documents: DataFrame,
      broadcastModel: Boolean = true): DataFrame = {
    val docs = documents.select(col("doc_id"), toks(col("text")).as("tk"))
    val bg = docs
      .where(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("tk")) - 1),
        i => struct(element_at(col("tk"), i).as("w1"), element_at(col("tk"), i + 1).as("w2"))))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    // ONE aggregation of the bigram explode to (doc, w1, w2) grain; the
    // model counts and the scoring stream are re-aggregations of it, so
    // the three consumers share a single exchange subtree (AQE stage
    // reuse) instead of re-running the tokenize+explode per consumer —
    // the dsir_weight lesson. Integer sums of integer counts — exact.
    val cbd = bg.groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
    val cb = cbd.groupBy(col("w1"), col("w2")).agg(sum(col("c")).as("cb"))
    val cu = cbd.groupBy(col("w1")).agg(sum(col("c")).as("cu"))
    val vf = docs.select(explode(col("tk")).as("w")).agg(countDistinct(col("w")).as("vsz"))
    // fold context counts + vocab size into ONE score table keyed by the
    // bigram; the bigram stream then pays ONE model join, not two
    // (measured 1.7x on the 500k-doc scale corpus). cu is one row per
    // distinct context word — an OPEN vocabulary, not config-bounded — so
    // it obeys `broadcastModel` exactly like cb does: the shuffle-join
    // path advertised for beyond-broadcast vocabularies must carry no
    // forced broadcast at all (w1 is already cb's own join key, so the
    // shuffle variant rides the same partitioning). Only vf (a single
    // global-count row) broadcasts unconditionally.
    val st = cb.join(if (broadcastModel) broadcast(cu) else cu, Seq("w1"))
      .crossJoin(broadcast(vf))
      .select(col("w1"), col("w2"),
        round(log((col("cb") + 1).cast("double") / (col("cu") + col("vsz")).cast("double")), 6)
          .cast("decimal(18,6)").as("logp"))
    cbd
      .join(if (broadcastModel) broadcast(st) else st, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      // Σ over instances of logp = Σ over distinct (doc,w1,w2) of c·logp —
      // decimal-exact, and the model join now carries the distinct-bigram
      // stream instead of every instance
      .agg(sum(col("c")).as("n_bigrams"), sum(col("c") * col("logp")).as("slp"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("slp").cast("double") / col("n_bigrams"), 4).as("avg_logp"))
      .withColumn("ppl", round(exp(-col("avg_logp")), 4))
      .orderBy(col("doc_id"))
  }

  /** Out-of-vocabulary rate per doc against the corpus's own frequent-token
    * vocabulary (count >= minCount) — the tokenizer-coverage signal that
    * decides whether a vocab/BPE merge table fits a corpus. The vocab is
    * small by construction (it's the FREQUENT tokens) → broadcast left
    * join + keyed count; token explode is the only wide stage. */
  def oovRate(spark: SparkSession, dir: String, minCount: Long = 100): DataFrame =
    oovRateOf(spark, Tables.documents(spark, dir), minCount)

  /** Frame form over any (doc_id, text). */
  def oovRateOf(spark: SparkSession, documents: DataFrame, minCount: Long): DataFrame = {
    val tok = documents
      .select(col("doc_id"), explode(toks(col("text"))).as("w"))
    val vocab = tok.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount).select(col("w"), lit(1).as("in_v"))
    tok.join(broadcast(vocab), Seq("w"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("in_v").isNull, 1)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 4).as("oov_rate"))
      .orderBy(col("doc_id"))
  }

  /** Boilerplate score: fraction of a doc's distinct word-3-gram shingles
    * whose corpus document-frequency exceeds `dfCutoff` — the line/span
    * boilerplate-removal signal (shared headers, navigation chrome) scored
    * at doc granularity. The hot-shingle set is small BY CONSTRUCTION
    * (boilerplate = few distinct strings, many docs) → broadcast left join
    * against it; per-doc counters are integers, so the aggregation is
    * order-independent. Same trade as the dedup family's df cutoff, read in
    * reverse: there hot shingles are dropped noise, here they ARE the
    * signal. */
  def boilerplateScore(spark: SparkSession, dir: String, dfCutoff: Long = 5): DataFrame =
    boilerplateScoreOf(spark, Tables.documents(spark, dir), dfCutoff)

  /** Frame form over any (doc_id, text). At scale pick `dfCutoff` high
    * enough that only true boilerplate (df proportional to the corpus)
    * lands in the broadcast hot set — a cutoff that also catches
    * cluster-level near-dup shingles grows the hot set linearly with the
    * corpus and belongs in the pair-join machinery instead. */
  def boilerplateScoreOf(spark: SparkSession, documents: DataFrame,
      dfCutoff: Long): DataFrame = {
    // (doc, shingle)-grain aggregation first: the df model and the per-doc
    // probe both re-aggregate it (shared exchange, one tokenize+shingle
    // explode instead of two), and the hot-set join probes distinct
    // doc-shingles instead of instances. Integer sums of counts — exact.
    val g = documents
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(Dedup.shingles(col("toks"))).as("sh"))
      .groupBy(col("doc_id"), col("sh")).agg(count(lit(1)).as("c"))
    val hot = g.groupBy(col("sh")).agg(sum(col("c")).as("df"))
      .where(col("df") > dfCutoff).select(col("sh"), lit(1).as("hot"))
    g.join(broadcast(hot), Seq("sh"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_shingles"),
        sum(when(col("hot").isNotNull, col("c")).otherwise(lit(0L))).as("n_boiler"))
      .select(col("doc_id"), col("n_shingles"), col("n_boiler"),
        round(col("n_boiler").cast("double") / col("n_shingles"), 4).as("boiler_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Quality-score deciles — the corpus-curation view of the quality
    * signal (how much mass sits in each quality band, where do the decile
    * boundaries fall — the numbers a "keep top 60%" filter is tuned from).
    * Same distributed-rank shape as the price deciles: range-repartition +
    * zipWithIndex, never a global no-partition window; scores ride as
    * ×10⁴ longs (decimal-scaled BEFORE the cast, so a one-ulp-low double
    * cannot truncate) making every aggregate integer-exact. */
  def qualityDeciles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long").as("doc_id"),
        (round(qualityExpr(spark), 4).cast("decimal(9,4)") * 10000).cast("long").as("q4"))
    val n = scored.count()
    val parts = math.max(1, scored.rdd.getNumPartitions)
    val ranked = scored
      .repartitionByRange(parts, col("q4"), col("doc_id"))
      .sortWithinPartitions(col("q4"), col("doc_id"))
      .as[(Long, Long)].rdd.zipWithIndex()
      .map { case ((id, q), i) => (id, q, i * 10 / n) }
      .toDF("doc_id", "q4", "decile")
    ranked.groupBy(col("decile"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(min(col("q4")) / 10000.0, 4).as("min_q"),
        round(max(col("q4")) / 10000.0, 4).as("max_q"),
        round(sum(col("q4")).cast("double") / 10000.0 / count(lit(1)), 4).as("avg_q"))
      .orderBy(col("decile"))
  }

  /** Per-doc unigram (token) Shannon entropy, emitted in MICRO-NATS as an
    * integer — low entropy flags repetitive/generated junk the way
    * [[repetitionScore]] does at trigram granularity. Each distinct token
    * contributes ⌊−(c/n)·ln(c/n)·10⁶ + 0.5⌋ (the sq_quantize half-up-floor
    * trick — `round` can split at .5 boundaries between engines; round-to-
    * decimal splits on 1-ulp ln differences, which a first cut of this op
    * hit on one doc in 500), and the per-doc sum is an exact LONG — fully
    * order-independent. Two keyed integer aggregations; nothing
    * corpus-global. */
  def tokenEntropy(spark: SparkSession, dir: String): DataFrame = {
    val tc = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(toks(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    val dl = tc.groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
    val p = col("c").cast("double") / col("n")
    tc.join(dl, "doc_id")
      .withColumn("term", floor(-p * log(p) * 1e6 + 0.5).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_distinct"), max(col("n")).as("n_tokens"),
        sum(col("term")).as("entropy_unats"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"), col("entropy_unats"))
      .orderBy(col("doc_id"))
  }

  /** PII detection + redaction — the scrub pass every released training
    * corpus runs: find email / phone patterns, count them, and replace them
    * with type tags. The synthetic corpus contains no PII, so the op first
    * plants a deterministic email + phone derived from doc_id (the oracle
    * plants the identical strings), then runs the REAL detector over the
    * combined text — the regex machinery, counting, and replacement are
    * exactly what runs on a corpus with organic PII. Output carries
    * md5(redacted) instead of the redacted text (hash-checkable without
    * shipping full documents). Narrow scan-speed pass, no shuffle; the
    * regexes are RE2-safe (no backtracking blowup on hostile inputs). */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "\\+1-555-[0-9]{4}"
    val planted = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com or call +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), planted.as("t"))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("t"), lit(emailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(col("t"), lit(phoneRe), lit(0))).cast("long").as("n_phones"),
        md5(regexp_replace(regexp_replace(col("t"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>")).as("redacted_hash"))
      .orderBy(col("doc_id"))
  }

  /** Content-defined chunking — the dedup-friendly alternative to
    * [[docChunks]]' fixed stride: a chunk boundary falls AFTER any token
    * whose md5-derived value ≡ 0 (mod `modulus`), so boundaries are a pure
    * function of local content and survive insertions/deletions elsewhere
    * in the doc (fixed-stride chunk hashes all shift after one edit; CDC
    * chunk hashes only change around the edit — what makes chunk-level
    * dedup work on mutated near-dups). Expected chunk length = modulus
    * tokens. One explode + per-doc running boundary count (window
    * partitioned BY DOC — never global) + keyed re-assembly; every step is
    * integer/md5 arithmetic the oracle mirrors. */
  def docChunksCdc(spark: SparkSession, dir: String, modulus: Int = 16): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(toks(col("text"))).as(Seq("pos", "w")))
      .withColumn("is_boundary",
        (conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long") % modulus === 0).cast("int"))
      // chunk id = boundaries strictly BEFORE this token (boundary token
      // closes its own chunk)
      .withColumn("chunk_id", coalesce(sum(col("is_boundary")).over(w), lit(0)).cast("long"))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).as("n_tokens"),
        // collect_list order is partition-dependent: sort by pos first
        md5(concat_ws(" ",
          transform(sort_array(collect_list(struct(col("pos"), col("w")))),
            s => s.getField("w")))).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Chunk-level dedup over the CDC chunks — the payoff of content-defined
    * boundaries: spans shared by mutated near-dups hash identically, so a
    * hash groupBy finds REUSED SPANS across the corpus (the sub-document
    * dedup fixed-stride chunking cannot do). Keeps one owner per distinct
    * chunk (min doc_id, min chunk_id) with its copy count; only chunks of
    * >= minTokens tokens count (single-token chunks collide by vocabulary,
    * not by content reuse). */
  def chunkDedup(spark: SparkSession, dir: String, minTokens: Long = 4): DataFrame =
    docChunksCdc(spark, dir)
      .where(col("n_tokens") >= minTokens)
      .groupBy(col("chunk_hash"))
      .agg(min(struct(col("doc_id"), col("chunk_id"))).as("owner"),
        count(lit(1)).as("n_copies"), max(col("n_tokens")).as("n_tokens"))
      .where(col("n_copies") > 1)
      .select(col("owner.doc_id").as("doc_id"), col("owner.chunk_id").as("chunk_id"),
        col("chunk_hash"), col("n_tokens"), col("n_copies"))
      .orderBy(col("doc_id"), col("chunk_id"))

  /** The Gopher rule battery (Rae et al. 2021, arXiv:2112.11446, Table A1)
    * — the published heuristic filter set every large web-corpus pipeline
    * (Gopher, MassiveText, Dolma, FineWeb) applies before model-based
    * scoring, next to [[textStats]]'s composite score and the trained
    * [[DocClassifier]] filter. Every rule is evaluated in INTEGER
    * arithmetic (cross-multiplied thresholds: `10·symbol_toks <= n` instead
    * of a double ratio), so each flag is bit-deterministic in both engines
    * and the row hash-checks with no float hazard. One narrow scan, no
    * shuffle — the 100 TB shape of a per-doc filter. */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    val t = toks(col("text"))
    val n = size(t).cast("long")
    val sumLen = aggregate(transform(t, tk => length(tk)), lit(0), (a, v) => a + v).cast("long")
    val symbolToks = size(filter(t, tk => tk.contains("#") || tk.contains("..."))).cast("long")
    val alphaToks = size(filter(t, tk => tk.rlike("[a-z]"))).cast("long")
    val lines = split(col("text"), "\n")
    val nLines = size(lines).cast("long")
    val bulletLines = size(filter(lines,
      l => l.startsWith("- ") || l.startsWith("* "))).cast("long")
    val ellipsisLines = size(filter(lines, l => l.endsWith("..."))).cast("long")
    // Gopher's rule is ">=2 distinct stopwords present"; the word list is
    // the engine's corpus-matched StopwordsEn (the paper's 8-word list has
    // <2 members in this synthetic vocabulary, which would pin the flag)
    val stopHits = size(array_intersect(array_distinct(t),
      array(StopwordsEn.map(lit): _*))).cast("long")
    Tables.documents(spark, dir).select(
      col("doc_id"),
      n.as("n_tokens"),
      (n >= 50L && n <= 100000L).as("wc_ok"),
      (sumLen >= n * 3L && sumLen <= n * 10L).as("wlen_ok"),
      (symbolToks * 10L <= n).as("symbol_ok"),
      (bulletLines * 10L <= nLines * 9L).as("bullet_ok"),
      (ellipsisLines * 10L <= nLines * 3L).as("ellipsis_ok"),
      (alphaToks * 5L >= n * 4L).as("alpha_ok"),
      (stopHits >= 2L).as("stop_ok"))
      .withColumn("gopher_pass",
        col("wc_ok") && col("wlen_ok") && col("symbol_ok") && col("bullet_ok") &&
          col("ellipsis_ok") && col("alpha_ok") && col("stop_ok"))
      .orderBy(col("doc_id"))
  }

  /** Unicode-normalization dedup — the text canonicalization stage a
    * multilingual crawl runs BEFORE content hashing: the same visible
    * string arrives precomposed (é = U+00E9) or decomposed
    * (e + U+0301), and byte-keyed exact dedup silently misses the pair.
    * The fixture derives both spellings deterministically from doc ids
    * (the [[CorpusPipeline.syntheticUrl]] planted-fixture pattern — the
    * corpus text is ASCII): docs (2k, 2k+1) carry the SAME logical
    * string, the even one composed and the odd one decomposed, cycling
    * through three composition families (Latin acute, Latin diaeresis,
    * Hangul L+V+T jamo — the algorithmic-composition path). Each doc is
    * normalized through the codegen `nfc_native` kernel
    * ([[graft.functions.NfcExpressions]] — JDK Normalizer, the same
    * Unicode standard DuckDB's utf8proc implements, so normalized
    * strings agree cross-engine) and deduped on the normalized hash:
    * every odd doc must resolve dup_of → its even twin. Scale shape: one
    * narrow codegen projection (with an O(n) no-alloc `isNormalized`
    * fast path for the dominant already-NFC case) plus the standard
    * hash-groupBy dedup. */
  def nfcDedup(spark: SparkSession, dir: String): DataFrame = {
    val fam = expr("(doc_id div 2) % 3")
    val composed = when(fam === 0, lit("\u00e9"))
      .when(fam === 1, lit("\u00f6")).otherwise(lit("\uac01"))
    val decomposed = when(fam === 0, lit("e\u0301"))
      .when(fam === 1, lit("o\u0308")).otherwise(lit("\u1100\u1161\u11a8"))
    val raw = concat(lit("caf"),
      when(col("doc_id") % 2 === 0, composed).otherwise(decomposed),
      lit(" page "), expr("CAST(doc_id div 2 AS STRING)"))
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), raw.as("raw"))
      .withColumn("nfc", graft.functions.NfcExpressions.nfc(spark, col("raw")))
    val groups = base
      .groupBy(md5(col("nfc")).as("h")).agg(min(col("doc_id")).as("dup_of"))
    base.join(groups, md5(col("nfc")) === col("h"))
      .select(col("doc_id"),
        length(col("raw")).cast("long").as("raw_len"),
        length(col("nfc")).cast("long").as("nfc_len"),
        (col("raw") =!= col("nfc")).cast("int").as("changed"),
        col("dup_of"))
      .orderBy(col("doc_id"))
  }

  /** Editorial-blocklist filter — the C4 "bad words" stage (Raffel et al.
    * 2020 §2.2 drop any page containing a listed word; every public web
    * corpus since runs a variant): each doc is scanned against a frozen
    * word blocklist and emits its hit count and the drop verdict. The
    * fixture list is the corpus's own tokens whose md5 starts with "0e"
    * — deterministic, dictionary-sized, the planted-fixture stand-in for
    * the real editorial list, exactly replayable in DuckDB, and chosen so
    * the verdicts DISCRIMINATE on this corpus (the 31-token synthetic
    * vocabulary puts common words in ~75% of docs; the "0e" bucket holds
    * exactly the rare near-dup marker token, blocking 5% of docs at every
    * scale — a prefix that caught a common word would block everything
    * and one that caught nothing would be the vacuous-fixture trap);
    * membership-by-hash-rule lets the hot path be
    * ONE per-token codegen predicate with no list shipped at all. A real
    * deployment swaps the predicate for the frozen-set probe
    * ([[graft.functions.SetProbeExpressions.overlapsLongSet]] over the
    * list's 60-bit token surrogates — O(tokens·log|list|) per row, the
    * streamingWebIngest decontamination pattern). Scale shape: one narrow
    * scan, no join, no shuffle before the output sort. */
  def blocklistFilter(spark: SparkSession, dir: String): DataFrame = {
    val toks = filter(Dedup.tokens(col("text")), t => t =!= "")
    val hits = filter(toks, t => substring(md5(t), 1, 2) === "0e")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(hits).cast("long").as("n_hits"),
        (size(hits) > 0).cast("int").as("blocked"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprint: bottom-5 sketch of md5'd word-3-gram shingles —
    * a fixed-size content signature (min-k sketch) whose overlap estimates
    * Jaccard similarity; joins on fingerprint find near-dups cheaply. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val t = toks(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), t.as("toks"))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"),
        array_join(slice(array_sort(transform(Dedup.shingles(col("toks")), s => md5(s))), 1, 5), ",")
          .as("fingerprint"))
      .orderBy(col("doc_id"))
  }
}
