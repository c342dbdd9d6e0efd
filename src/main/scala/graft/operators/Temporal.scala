package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Temporal operators over the events stream — the point-in-time joins a
  * feature/training pipeline needs (attach "state as of event time" without
  * leaking the future).
  */
object Temporal {

  /** As-of join: attach to each `leftType` event the most recent
    * `rightType` event at-or-before it for the same user, plus the gap in
    * microseconds (NULL when no prior match — left semantics).
    *
    * Spark has no ASOF JOIN operator, and the naive form (inequality join +
    * per-left-row max) explodes quadratically per user. This is the
    * UNION-TAG form: tag both sides, one shuffle by user_id, and a running
    * `last(..., ignoreNulls)` over (ts, tag) picks each left row's match in
    * a single window scan — O(n log n) per user, no join at all. Matches at
    * the exact same timestamp count as "before" (tag orders the right side
    * first), mirroring the inclusive semantics of DuckDB's native ASOF JOIN
    * (`l.ts >= r.ts`), which is what makes the op oracle-checkable.
    * Right-side rows are pre-aggregated to one per (user, ts) so ties
    * within the right stream are deterministic in both engines. */
  def asofJoin(spark: SparkSession, dir: String,
      leftType: String = "purchase", rightType: String = "click"): DataFrame = {
    val ev = Tables.events(spark, dir)
    val right = ev.where(col("event_type") === rightType)
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("asof_value"))
    val left = ev.where(col("event_type") === leftType)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    asofJoinFrames(left, right)
      .select(col("event_id"), col("user_id"), col("value"),
        col("asof_value"), col("micros_since_match"))
      .orderBy(col("event_id"))
  }

  /** The generic form over any pair of frames: `left` must carry
    * (`keyCol`, `tsCol`) plus payload columns, `right` must carry (`keyCol`,
    * `tsCol`, `valueCol`) with ONE row per (key, ts) — pre-aggregate ties
    * first, as [[asofJoin]] does. Returns every `left` row with `asof_value`
    * (the `valueCol` of the right row with the greatest ts <= left's ts for
    * that key, NULL if none) and `micros_since_match`. */
  def asofJoinFrames(left: DataFrame, right: DataFrame,
      keyCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "asof_value"): DataFrame = {
    val payload = left.columns.filterNot(c => c == keyCol || c == tsCol)
    val rTagged = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__tag"), col(valueCol).as("__rv")) ++
        payload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("__tag"),
        lit(null).cast(right.schema(valueCol).dataType).as("__rv")) ++
        payload.map(col): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rTagged.unionByName(lTagged)
      .withColumn("__mv", last(col("__rv"), ignoreNulls = true).over(w))
      .withColumn("__mts", last(when(col("__tag") === 0, col(tsCol)), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .select(
        Seq(col(keyCol)) ++ payload.map(col) ++ Seq(
          col("__mv").as(valueCol),
          (unix_micros(col(tsCol)) - unix_micros(col("__mts"))).as("micros_since_match")): _*)
  }
}
