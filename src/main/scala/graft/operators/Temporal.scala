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
    val tagged = right.select(col("user_id"), col("ts"), lit(0).as("tag"),
        col("asof_value"), lit(null).cast("long").as("event_id"),
        lit(null).cast("double").as("value"))
      .unionByName(left.select(col("user_id"), col("ts"), lit(1).as("tag"),
        lit(null).cast("double").as("asof_value"), col("event_id"), col("value")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("m_value", last(col("asof_value"), ignoreNulls = true).over(w))
      .withColumn("m_ts", last(when(col("tag") === 0, col("ts")), ignoreNulls = true).over(w))
      .where(col("tag") === 1)
      .select(col("event_id"), col("user_id"), col("value"),
        col("m_value").as("asof_value"),
        (unix_micros(col("ts")) - unix_micros(col("m_ts"))).as("micros_since_match"))
      .orderBy(col("event_id"))
  }
}
