package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Temporal operators over the events stream — the point-in-time and
  * interval joins a feature/training pipeline needs (attach "state as of
  * event time" without leaking the future; assign probes to time windows).
  */
object Temporal {

  /** Session gap (and granule width) for [[sessionRangeJoin]]: 12 hours in
    * microseconds — sized to the fixture's inter-event cadence so sessions
    * actually chain (a 30-min gap on this corpus yields singleton sessions). */
  val RangeGapUs: Long = 12L * 3600 * 1000 * 1000

  /** Range (interval-containment) join: assign each `probeType` event to
    * the activity session of the SAME user that contains its timestamp,
    * where sessions are built from all non-probe events with a `RangeGapUs`
    * inactivity gap. Events outside any session drop (inner semantics).
    *
    * Spark's native plan for a `BETWEEN` join predicate is a nested-loop —
    * quadratic per user. This is the GRANULE-BUCKETED form: time is cut
    * into gap-sized granules; each probe carries exactly ONE granule key,
    * each interval explodes into the granules it covers (bounded by its
    * event count, because intra-session gaps are < the granule width), and
    * the join becomes a keyed equi-join on (user, granule) + a residual
    * containment filter. One probe granule × disjoint intervals ⇒ at most
    * one match per pair with no post-dedup. The oracle is DuckDB's plain
    * inequality join — again two different algorithms that must agree. */
  /** Gap-filled hourly resample — the time-series REGULARIZATION step
    * (metrics dashboards, per-user activity features, anomaly baselines):
    * each user gets a DENSE hourly grid from first to last activity,
    * zero-filled where no events arrived — the rows an aggregation alone
    * can never emit. The grid explodes per user (span-hours rows) and
    * rejoins on (user, hour) — both steps ride the same user-keyed
    * shuffle, so cost is output-proportional; no time-range is
    * materialized on the driver. Hour emitted as a formatted string
    * (q9's cross-engine timestamp convention). */
  def gapfillHourly(spark: SparkSession, dir: String, maxUser: Long = 20): DataFrame = {
    val ev = Tables.events(spark, dir)
      .where(col("user_id") < maxUser)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"), col("value"))
    val hourly = ev.groupBy(col("user_id"), col("h"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("sum_value"))
    val grid = ev.groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
    grid.join(hourly, Seq("user_id", "h"), "left")
      .select(col("user_id"),
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy(col("user_id"), col("hour"))
  }

  def sessionRangeJoin(spark: SparkSession, dir: String,
      probeType: String = "error"): DataFrame = {
    val g = RangeGapUs
    val ev = Tables.events(spark, dir)
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val base = ev.where(col("event_type") =!= probeType)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > g, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
    val intervals = base.groupBy(col("user_id"), col("session_id"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"))
    val granules = intervals.select(col("user_id"), col("session_id"),
      col("start_us"), col("end_us"),
      explode(sequence(expr(s"start_us div $g"), expr(s"end_us div $g"))).as("granule"))
    val probes = ev.where(col("event_type") === probeType)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("granule", expr(s"us div $g"))
    probes.join(granules, Seq("user_id", "granule"))
      .where(col("us").between(col("start_us"), col("end_us")))
      .select(col("event_id"), col("user_id"), col("session_id"),
        (col("us") - col("start_us")).as("us_into_session"))
      .orderBy(col("event_id"))
  }

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
    // the union-tag rewrite owns these names; a left payload column with
    // one of them would silently shadow the merge state — fail loudly
    val internal = Set("__tag", "__rv", "__mv", "__mts", valueCol, "micros_since_match")
    val clashes = left.columns.filterNot(c => c == keyCol || c == tsCol).filter(internal)
    require(clashes.isEmpty,
      s"asofJoinFrames: left payload column(s) ${clashes.mkString(", ")} collide with " +
        s"the join's output/internal names ($valueCol, micros_since_match, __tag/__rv/__mv/__mts); " +
        "rename them before joining")
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
