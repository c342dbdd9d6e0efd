package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Corpus-level pipeline operators (SURVEY.md §2b north star): reproducible
  * sampling and the composed clean-corpus selection a training-data pipeline
  * runs before tokenization. Both are single-pass, shuffle-free except the
  * final orderBy, and oracle-checkable (no RNG state — determinism comes
  * from content hashes).
  */
object CorpusPipeline {

  /** Deterministic hash-based sampling: keep a doc iff
    * md5(decimal doc_id string) sorts below the hex threshold prefix.
    * Lexicographic compare of uniform hex strings gives
    * P(keep) = int(prefix,16) / 16^len(prefix) (default "1a" → 26/256 ≈
    * 10.2%). Unlike `df.sample`, the choice is a pure function of the id:
    * identical across engines, runs, partitionings, and cluster sizes — the
    * property a reproducible 100 TB pipeline actually needs (rerunning a
    * failed stage must not resample). */
  def sampleByHash(spark: SparkSession, dir: String, thresholdPrefix: String = "1a"): DataFrame =
    Tables.documents(spark, dir)
      .where(md5(col("doc_id").cast("string")) < thresholdPrefix)
      .select(col("doc_id"), col("lang"), length(col("text")).cast("long").as("n_chars"))
      .orderBy(col("doc_id"))

  /** The composed training-data cleaning pass: predicted-language filter +
    * quality-score floor + exact-dedup survivorship, in one plan. Reuses the
    * single-op building blocks ([[TextAnalysis.textStats]],
    * [[TextAnalysis.langId]], [[Dedup.dedupExact]]) so their oracle-verified
    * semantics compose instead of being re-implemented. All three joins are
    * equi-joins on doc_id. */
  def cleanCorpus(spark: SparkSession, dir: String, lang: String = "en",
      minQuality: Double = 0.5): DataFrame = {
    val stats = TextAnalysis.textStats(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
    val langs = TextAnalysis.langId(spark, dir).select(col("doc_id"), col("pred_lang"))
    val survivors = Dedup.dedupExact(spark, dir).select(col("doc_id"))
    stats.join(langs, "doc_id").join(survivors, "doc_id")
      .where(col("pred_lang") === lang && col("quality_score") >= minQuality)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
      .orderBy(col("doc_id"))
  }
}
