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

  private def toks(c: Column): Column = split(lower(c), "\\s+")

  /** Per-doc quality stats: token count, average token length, punctuation
    * ratio, stopword ratio, and a deterministic composite quality score. */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    val t = toks(col("text"))
    val nTokens = size(t)
    val charLen = length(col("text"))
    val punct = charLen - length(regexp_replace(lower(col("text")), "[a-z0-9 ]", ""))
    val stop = size(filter(t, tk => array_contains(array(StopwordsEn.map(lit): _*), tk)))
    val avgLen = aggregate(transform(t, tk => length(tk)), lit(0), (a, v) => a + v)
      .cast("double") / nTokens
    val punctRatio = punct.cast("double") / charLen
    val stopRatio = stop.cast("double") / nTokens
    val quality = least(nTokens.cast("double") / 100.0, lit(1.0)) * 0.6 +
      (lit(1.0) - punctRatio) * 0.2 + least(stopRatio * 5.0, lit(1.0)) * 0.2
    Tables.documents(spark, dir).select(
      col("doc_id"),
      nTokens.cast("long").as("n_tokens"),
      round(avgLen, 4).as("avg_token_len"),
      round(punctRatio, 4).as("punct_ratio"),
      round(stopRatio, 4).as("stopword_ratio"),
      round(quality, 4).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** N-gram-free language ID: count occurrences of each language's stopwords,
    * argmax score with deterministic tie-break (lang name asc); 'und'
    * (undetermined) when no stopword hits. Compared against the `lang`
    * column for an accuracy flag. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val t = toks(col("text"))
    val scored = langStopwords.map { case (lang, words) =>
      struct(
        size(filter(t, tk => array_contains(array(words.map(lit): _*), tk))).as("score"),
        lit(lang).as("lang"))
    }
    // max of structs: Spark orders structs lexicographically (score, lang);
    // we want max score, tie -> FIRST lang name, so compare on (score, negated rank)
    val best = scored.reduce { (a, b) =>
      when(b.getField("score") > a.getField("score"), b).otherwise(a)
    }
    Tables.documents(spark, dir).select(
      col("doc_id"),
      when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und")).as("pred_lang"),
      col("lang").as("label_lang"))
      .withColumn("is_match", (col("pred_lang") === col("label_lang")).cast("int"))
      .orderBy(col("doc_id"))
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

  /** Corpus vocabulary: the k most frequent whitespace tokens with
    * deterministic tie-break (count desc, token asc) — the input to
    * vocabulary construction / BPE seeding. One explode + one keyed
    * aggregation; partial aggregation bounds the shuffle to the distinct
    * vocabulary per partition, so a hot token ("the") never skews a task. */
  def vocabTopK(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    // top-k via orderBy().limit() -> TakeOrderedAndProject (per-partition
    // heaps, no single-partition window over the full vocabulary); the rank
    // window then runs over only the k survivors
    val top = Tables.documents(spark, dir)
      .select(explode(toks(col("text"))).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token").asc)
      .limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_occurrences").desc, col("token").asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("token"), col("n_occurrences"))
      .orderBy(col("rank"))
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
