package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Scalar quantization (int8) of the embedding column — the standard
  * compression step before a vector index at 100 TB (4 bytes/dim → 1).
  *
  * Two passes, both scan-shaped: (1) per-dimension global min/max — one
  * shuffle of dim×partitions partial aggregates; (2) row-wise encode against
  * the broadcast dimension stats. Codes use `floor(t·255 + 0.5)` (not
  * `round`) so Spark and DuckDB agree bit-for-bit at .5 boundaries; the
  * reconstruction error is a sequential double fold like every other
  * cross-engine number here.
  */
object Quantization {

  /** Per-dimension (min, max) as two broadcastable array columns. */
  private def dimStats(emb: DataFrame): DataFrame =
    emb.select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .orderBy(col("pos"))
      .agg(collect_list(col("mn")).as("mins"), collect_list(col("mx")).as("maxs"))

  /** (vec_id, codes: array<int> in 0..255, recon_err: mean abs dequant
    * error, rounded) — deterministic, oracle-checked. */
  def sqQuantize(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val stats = dimStats(emb)
    val x = col("embedding")
    // t in [0,1]; guard degenerate dims (mx == mn) to 0
    def tExpr = transform(sequence(lit(1), size(x)),
      i => {
        val mn = element_at(col("mins"), i).cast("double")
        val mx = element_at(col("maxs"), i).cast("double")
        val v = element_at(x, i).cast("double")
        when(mx === mn, lit(0.0)).otherwise((v - mn) / (mx - mn))
      })
    emb.crossJoin(broadcast(stats))
      .withColumn("codes", transform(tExpr, t => floor(t * 255.0 + 0.5).cast("int")))
      .withColumn("recon_err", round(
        aggregate(
          zip_with(
            transform(col("codes"), c => c.cast("double") / 255.0),
            tExpr,
            (q, t) => abs(q - t)),
          lit(0.0), (acc, v) => acc + v) / size(x), 6))
      // codes emitted as a comma-joined string: stable cross-engine hashing
      // without array-typed output columns
      .select(col("vec_id"),
        array_join(transform(col("codes"), c => c.cast("string")), ",").as("codes"),
        col("recon_err"))
      .orderBy(col("vec_id"))
  }

  /** Aggregate quality report over the quantized corpus. */
  def sqReport(spark: SparkSession, dir: String): DataFrame =
    sqQuantize(spark, dir)
      .agg(
        count(lit(1)).as("n_vectors"),
        round(avg(col("recon_err")), 6).as("avg_recon_err"),
        round(max(col("recon_err")), 6).as("max_recon_err"))
}
