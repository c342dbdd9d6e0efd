package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** General-analytics surface on the TPC-H-ish tables: projection/filter,
  * multi-way joins, aggregation, window top-k, semi-join, rollup, set ops,
  * date/JSON functions. The reference has none of this (SURVEY.md §2b) —
  * these demonstrate that the engine exposes Spark's full relational layer
  * alongside the vector/pipeline operators.
  *
  * Cross-engine determinism: money aggregates are cast to DECIMAL(18,2)
  * *before* summing — decimal addition is exact and order-independent, so
  * Spark and DuckDB agree bit-for-bit regardless of partial-aggregation
  * order. Averages are decimal-cast then rounded.
  *
  * Scale posture: every filter is a plain predicate on scanned columns
  * (parquet pushdown), every projection is narrow (column pruning), small
  * dimension tables (region/nation/supplier) are broadcast, and group-bys
  * run with map-side partial aggregation — the plans survive a 1000-executor
  * scale-up without modification.
  */
object Relational {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
  /** Exact decimal sum, emitted as a 2-dp double — matches the oracle's
    * `round(sum(CAST(.. AS DECIMAL)),2)::DOUBLE` bit-for-bit. */
  private def moneySum(c: org.apache.spark.sql.Column) =
    round(sum(dec(c)), 2).cast("double")

  /** TPC-H Q1-style pricing summary: full-scan aggregate with map-side
    * combine; shuffle carries only (flag,status) partial sums. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        round(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))), 2).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Revenue per region/nation: orders ⋈ customer ⋈ nation ⋈ region.
    * nation+region are tiny → broadcast; customer⋈orders shuffles on the
    * join key only after both sides are projected to 2-3 columns. */
  def regionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir).select(col("o_custkey"), col("o_totalprice"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val nation = Tables.nation(spark, dir)
    val region = Tables.region(spark, dir)
    orders
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(moneySum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Top-3 orders per customer by totalprice — per-group top-k via window,
    * the relational analogue of the reference's bounded result heap
    * (vamana.h:506-528). */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("o_custkey"), col("rank").cast("long").as("rank"), col("o_orderkey"),
        round(dec(col("o_totalprice")), 2).cast("double").as("o_totalprice"))
      .orderBy(col("o_custkey"), col("rank"))
  }

  /** Order-priority check (TPC-H Q4 shape): semi-join orders→lineitem on a
    * date window. Left-semi keeps the build side narrow; at scale the
    * orderkey set shuffles once. */
  def orderPriority(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey")).distinct()
    orders
      .join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q17 shape: revenue from "small-quantity" line items — those
    * below 20% of their part's average order quantity (the correlated
    * scalar-subquery pattern, decorrelated into a per-part aggregate +
    * equi-join). The per-part frame is CORPUS-proportional (one row per
    * distinct part key in lineitem, ~10⁹ rows at 100 TB), so it must NOT
    * carry a broadcast hint — the plain equi-join shuffles both sides on
    * l_partkey (the aggregate already left perPart partitioned by it) and
    * AQE still broadcasts at scale factors where it genuinely fits.
    * The threshold compare stays in exact decimal so the filter edge is
    * engine-stable: avg = sum/count as DECIMAL, compared via
    * quantity·count·5 < sum (cross-multiplied — no division, no floats). */
  def smallQuantityRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val perPart = li.groupBy(col("l_partkey"))
      .agg(sum(dec(col("l_quantity"))).as("qty_sum"), count(lit(1)).as("qty_n"))
    li.join(perPart, "l_partkey")
      // l_quantity < 0.2 * (qty_sum / qty_n)  <=>  5 * qty * n < sum
      .where(dec(col("l_quantity")) * 5 * col("qty_n") < col("qty_sum"))
      .agg(moneySum(col("l_extendedprice")).as("small_qty_revenue"),
        count(lit(1)).as("n_items"))
  }

  /** The skew-safe join surfaced as a query: order-priority revenue routed
    * through [[graft.core.Joins.saltedJoin]] (the hot-key mitigation a
    * 100 TB join reaches for when one key holds a measurable fraction of
    * the rows). The oracle is the PLAIN join SQL — hash-matching proves
    * salting is row-identical on real data, not just on the spec fixture;
    * decimal money sums keep the aggregate order-independent as usual. */
  def saltedRevenue(spark: SparkSession, dir: String, salts: Int = 8): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"))
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    graft.core.Joins.saltedJoin(li, orders, "l_orderkey", salts)
      .groupBy(col("o_orderpriority"))
      .agg(moneySum(col("l_extendedprice")).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))
  }

  /** Forecast-revenue-change (TPC-H Q6 shape): pure scan-filter-aggregate —
    * the predicate-pushdown showcase; no join, no wide shuffle. */
  def filteredRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
      .agg(round(sum(dec(col("l_extendedprice")) * dec(col("l_discount"))), 2).cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))

  /** Local-supplier volume (TPC-H Q5 shape): 5-way join where customer and
    * supplier must share a nation — revenue per nation. lineitem⋈orders⋈
    * customer⋈supplier shuffle on their keys; only nation (25 rows at ANY
    * scale factor) keeps a broadcast hint. supplier is SF-proportional
    * (10k rows per sf unit → ~10⁹ at 100 TB), so hinting it would bypass
    * AQE's size check and OOM the driver at scale — AQE still broadcasts
    * it at sf where it fits. */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
    val orders = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val nation = Tables.nation(spark, dir)
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        round(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("n_name"))
  }

  /** Brand stats with ROLLUP grouping sets over part. */
  def partBrandStats(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .rollup(col("p_brand"))
      .agg(
        count(lit(1)).as("n_parts"),
        moneySum(col("p_retailprice")).as("sum_price"),
        min(col("p_size")).as("min_size"),
        max(col("p_size")).as("max_size"))
      .orderBy(col("p_brand").asc_nulls_first)

  /** Full CUBE over (mfgr-prefix, container): all 4 grouping combinations in
    * one pass — Catalyst expands the grouping sets and the aggregation stays
    * partial/final, so the cost is one shuffle regardless of combination
    * count. Completes the grouping-sets surface next to q7's ROLLUP. */
  def partCube(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_brand"), split(col("p_type"), " ").getItem(0).as("type_head"),
        col("p_retailprice"))
      .cube(col("p_brand"), col("type_head"))
      .agg(count(lit(1)).as("n_parts"), moneySum(col("p_retailprice")).as("sum_price"))
      .orderBy(col("p_brand").asc_nulls_first, col("type_head").asc_nulls_first)

  /** Set-operation demo (EXCEPT): high-balance customers with no
    * finished ('F') order. */
  def segmentSetOps(spark: SparkSession, dir: String): DataFrame = {
    val high = Tables.customer(spark, dir)
      .where(col("c_acctbal") > 5000).select(col("c_custkey"))
    val finished = Tables.orders(spark, dir)
      .where(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("c_custkey"))
    high.except(finished).orderBy(col("c_custkey"))
  }

  /** Hourly event aggregation + JSON extraction: date_trunc bucketing with
    * get_json_object over the props payload. */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"))
      .agg(
        count(lit(1)).as("n_events"),
        moneySum(col("value")).as("sum_value"),
        sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))
      .orderBy(col("event_type"), col("hour"))

  /** Co-purchase pair mining — the market-basket staple: part pairs
    * appearing in the same order, ranked by co-occurrence. The self-join
    * key is the ORDER, whose item count is bounded by the schema (≤7
    * lineitems in TPC-H-shaped data), so per-key fanout is C(7,2) — the
    * pair explosion is linear in orders by construction, unlike a
    * part-keyed join (the hot-shingle lesson, solved here by data shape
    * rather than a cap). Global top-N rides orderBy+limit →
    * TakeOrderedAndProject. */
  def copurchasePairs(spark: SparkSession, dir: String, topN: Int = 20): DataFrame = {
    // One exchange, no join: collect each order's distinct part set (fanout
    // bounded by items-per-order), expand the i<j pairs from the sorted
    // array in codegen, and count. The previous shape — distinct + keyed
    // self-join — shuffled the lineitem projection three times (distinct,
    // then each join side) and rebuilt the same pairs through a join;
    // the pair set and counts are identical (sorted array ⇒ part_a <
    // part_b, collect_set ⇒ the same distinct (order, part) grain).
    val ps = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .where(size(col("ps")) >= 2)
    ps.select(explode(flatten(transform(
        sequence(lit(0), size(col("ps")) - 2),
        i => transform(sequence(i + 1, size(col("ps")) - 1),
          j => struct(element_at(col("ps"), i + 1).as("part_a"),
            element_at(col("ps"), j + 1).as("part_b")))))).as("pr"))
      .groupBy(col("pr.part_a").as("part_a"), col("pr.part_b").as("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a").asc, col("part_b").asc)
      .limit(topN)
  }

  /** Weekly retention cohorts — the product-analytics staple next to the
    * funnel (q10) and sessionization (q15): users grouped by first-event
    * week, each later active week counted as (cohort, age) cell, retention
    * = cell users / cohort size. Age rides exact epoch-second arithmetic
    * between week-truncated timestamps (both engines' `date_trunc('week')`
    * is ISO Monday-start; the difference is an exact multiple of 604800 —
    * no calendar function whose convention could drift). Two keyed
    * aggregations over (user, week)-distinct rows plus a cohort-sized
    * broadcast join — nothing user-list-sized crosses the driver. */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    val firstWeek = e.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    val cells = e.join(firstWeek, "user_id")
      .groupBy(col("cohort_week"),
        ((unix_timestamp(col("week")) - unix_timestamp(col("cohort_week"))) / 604800L)
          .cast("long").as("age_weeks"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    val base = cells.where(col("age_weeks") === 0)
      .select(col("cohort_week"), col("n_users").as("cohort_size"))
    cells.join(broadcast(base), "cohort_week")
      .select(
        date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        col("age_weeks"), col("n_users"),
        round(col("n_users").cast("double") / col("cohort_size"), 4).as("retention"))
      .orderBy(col("cohort_week"), col("age_weeks"))
  }

  /** Yearly ORDER retention — the multi-cohort form of
    * [[retentionCohorts]] (the synthetic events table has every user
    * active from day 1, so its weekly matrix is one near-flat cohort;
    * orders span 1995-2001 with 7 first-order cohorts): customers
    * cohorted by first-order year, age = plain integer year difference —
    * no calendar arithmetic at all. Same two keyed aggregations over the
    * (customer, year)-distinct frame. */
  def orderRetentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), year(col("o_orderdate")).cast("long").as("yr"))
      .distinct()
    val f = o.groupBy(col("o_custkey")).agg(min(col("yr")).as("cohort_year"))
    val cells = o.join(f, "o_custkey")
      .groupBy(col("cohort_year"), (col("yr") - col("cohort_year")).as("age_years"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"))
    val base = cells.where(col("age_years") === 0)
      .select(col("cohort_year"), col("n_customers").as("cohort_size"))
    cells.join(broadcast(base), "cohort_year")
      .select(col("cohort_year"), col("age_years"), col("n_customers"),
        round(col("n_customers").cast("double") / col("cohort_size"), 4).as("retention"))
      .orderBy(col("cohort_year"), col("age_years"))
  }

  /** Date-function demo: orders bucketed by calendar month (year+month
    * extraction), order counts and revenue per month. */
  def ordersByMonth(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("revenue"))
      .orderBy(col("yr"), col("mo"))

  /** String-function demo over part: first word of p_type, uppercased brand,
    * name-length stats, LIKE filtering. */
  def partTypeBreakdown(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .where(col("p_name").like("%a%"))
      .groupBy(
        split(col("p_type"), " ").getItem(0).as("type_head"),
        upper(col("p_brand")).as("brand"))
      .agg(
        count(lit(1)).as("n_parts"),
        min(length(col("p_name"))).cast("long").as("min_name_len"),
        max(length(col("p_name"))).cast("long").as("max_name_len"))
      .orderBy(col("type_head"), col("brand"))

  /** Math/statistics demo with EXACT variance: var = (Σx² − (Σx)²/n)/(n−1)
    * computed over decimal sums (order-independent), so Spark and DuckDB
    * agree bit-for-bit — the portable alternative to float `var_samp`. */
  def acctbalStats(spark: SparkSession, dir: String): DataFrame = {
    val x = dec(col("c_acctbal"))
    Tables.customer(spark, dir)
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(x), 2).cast("double").as("sum_bal"),
        sum(x * x).as("sumsq"),
        sum(x).as("s"))
      .select(
        col("c_mktsegment"), col("n"), col("sum_bal"),
        round(
          (col("sumsq").cast("double") - col("s").cast("double") * col("s").cast("double") / col("n")) /
            (col("n") - 1), 2).as("var_bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** Sketch demo: approx_count_distinct (HLL++) vs exact distinct per
    * event_type. HLL register layouts are engine-private, so the estimate
    * itself can never hash-match a DuckDB oracle — instead the query emits
    * the oracle-computable exact count plus `hll_ok`, the HLL estimate's
    * relative error checked against a 5% bound (rsd = 0.02, measured error
    * on the testdata is <= 0.4%; HLL is deterministic for a fixed input
    * set, so the gate cannot flake). The oracle recomputes the exact count
    * and asserts the gate as a literal — the same emission pattern as
    * vamana_search_overlap. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .select(
        col("event_type"), col("exact_users"),
        (abs(col("approx") - col("exact_users")).cast("double") <=
          col("exact_users") * 0.05).as("hll_ok"))
      .orderBy(col("event_type"))

  /** KMV (k-minimum-values) distinct-count sketch — the deterministic,
    * cross-engine-portable twin of [[approxDistinct]]'s HLL: estimate =
    * (k−1) / (k-th smallest md5-hash mapped into (0,1)), exact count when a
    * group has fewer than k distinct values. Unlike HLL (whose register
    * layout is engine-private, making q14 rows-only), every step here is
    * md5 + IEEE arithmetic that DuckDB reproduces bit-for-bit — a sketch
    * whose VALUE is hash-checkable. The per-group rank window runs over
    * DISTINCT hashes only; the scale form replaces it with a bounded k-min
    * heap (same TopKAggregator family as knn_exact_agg). */
  def kmvDistinct(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
      .cast("long").cast("double") / lit(1.152921504606846976e18) // 2^60, exact
    val d = Tables.events(spark, dir)
      .select(col("event_type"), h.as("h")).distinct()
    val w = Window.partitionBy(col("event_type")).orderBy(col("h").asc)
    d.withColumn("rk", row_number().over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_distinct"),
        max(when(col("rk") === k, col("h"))).as("kth"))
      .select(col("event_type"), col("n_distinct"),
        round(when(col("kth").isNotNull, lit((k - 1).toDouble) / col("kth"))
          .otherwise(col("n_distinct").cast("double")), 4).as("kmv_estimate"))
      .orderBy(col("event_type"))
  }

  /** Batch sessionization via window functions: a session breaks after 30
    * minutes of inactivity; session id = running count of breaks per user
    * (lag + conditional cumulative sum) — the batch twin of
    * [[graft.streaming.StreamingOps.sessionize]], and SQL-expressible so it
    * carries a full oracle. */
  def sessionizeBatch(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapMs = 30L * 60 * 1000
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMs * 1000, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("start_ts"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("end_ts"),
        moneySum(col("value")).as("sum_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Rolling 30-day revenue per customer — the RANGE-frame window variety
    * (every other window here is ROWS/rank-based): frame = all orders of
    * the same customer within the trailing 30 days by order DATE, so
    * same-day peers are always included together regardless of row order
    * (which is what makes a value-range frame deterministic where a ROWS
    * frame would not be). Day = epoch days, making the range arithmetic
    * integer-exact and identical across engines. */
  def rollingRevenue(spark: SparkSession, dir: String): DataFrame = {
    // day = calendar days since epoch via DATE arithmetic — timezone-free
    // on both engines (unix_micros rejects the ntz type these parquet
    // timestamps surface as)
    val day = datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")).cast("long")
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
      .rangeBetween(-29, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), day.as("day"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
      .withColumn("rolling_30d", round(sum(col("price")).over(w), 2).cast("double"))
      .select(col("o_orderkey"), col("o_custkey"), col("day"),
        round(col("price"), 2).cast("double").as("o_totalprice"), col("rolling_30d"))
      .orderBy(col("o_orderkey"))
  }

  /** True relational PIVOT (q10 is the conditional-aggregation cousin):
    * source × lang document-count matrix via `RelationalGroupedDataset
    * .pivot` with an EXPLICIT value list — explicit values keep the plan a
    * single aggregate pass with a static schema (no distinct-scan job),
    * which is the only pivot form that belongs on a 100 TB table. */
  def langSourcePivot(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("source"))

  /** Decile statistics over order values WITHOUT a no-partition window:
    * global rank = range-repartition + in-partition sort + `zipWithIndex`
    * (the same shape as the distributed save-pos and vocab rank — a global
    * `ntile()` would funnel the table through ONE task). All arithmetic is
    * integer-exact: prices as cents (long), decile = rank*10/n, stats from
    * integer sums — bit-identical across engines by construction. */
  def priceDeciles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // double → decimal(18,2) BEFORE scaling: double*100 truncates a
    // one-ulp-low representation (…28.999) while the decimal round-trips
    val cents = Tables.orders(spark, dir)
      .select(col("o_orderkey").cast("long").as("k"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val n = cents.count()
    val parts = math.max(1, cents.rdd.getNumPartitions)
    val ranked = cents
      .repartitionByRange(parts, col("cents"), col("k"))
      .sortWithinPartitions(col("cents"), col("k"))
      .as[(Long, Long)].rdd.zipWithIndex()
      .map { case ((k, c), i) => (k, c, i * 10 / n) }
      .toDF("o_orderkey", "cents", "decile")
    ranked.groupBy(col("decile"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(min(col("cents")) / 100.0, 2).as("min_price"),
        round(max(col("cents")) / 100.0, 2).as("max_price"),
        round(sum(col("cents")).cast("double") / 100.0 / count(lit(1)), 2).as("avg_price"))
      .orderBy(col("decile"))
  }

  /** TPC-H Q21 shape on the available columns: suppliers whose RETURNED
    * lineitem ('R') sits on a multi-supplier order where no OTHER supplier
    * returned anything. The EXISTS + NOT EXISTS pair collapses to a single
    * per-order predicate: the order's distinct-R-supplier set has EXACTLY
    * one member and the order has ≥2 distinct suppliers total — so ONE
    * groupBy(l_orderkey) with two collect_sets replaces the r6 plan's two
    * distinct passes + semi/anti self-joins (3 lineitem shuffles → 1; the
    * sets are bounded by suppliers-per-order, single digits in TPC-H at
    * any scale factor). collect_set skips the nulls the non-R rows leave
    * in the conditional set. */
  def soleFailedSupplier(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
    val sole = l.groupBy(col("l_orderkey"))
      .agg(
        size(collect_set(col("l_suppkey"))).as("n_supp"),
        collect_set(when(col("l_returnflag") === "R", col("l_suppkey"))).as("fail_set"))
      .where(size(col("fail_set")) === 1 && col("n_supp") >= 2)
      .select(element_at(col("fail_set"), 1).as("skey"))
    sole.join(Tables.supplier(spark, dir), col("skey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait")) // one qualifying supplier per order
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** TPC-H Q22 shape: above-average-balance customers with no URGENT
    * order, per market segment. The average is compared EXACTLY —
    * c_acctbal·n > Σbal in DECIMAL, multiplying through instead of
    * dividing — because a double-precision average differs in ulps between
    * engines and a boundary row would silently flip. The scalar aggregate
    * rides a broadcast crossJoin (stays in the plan — no driver collect),
    * and NOT EXISTS is a LEFT ANTI join against the pushed-down filtered
    * orders scan. */
  def idleRichCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val thresh = cust.where(col("c_acctbal") > 0)
      .agg(sum(col("c_acctbal").cast("decimal(18,2)")).as("s"), count(lit(1)).as("n"))
    val urgent = Tables.orders(spark, dir)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    cust.crossJoin(broadcast(thresh))
      .where(col("c_acctbal").cast("decimal(18,2)") * col("n") > col("s"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal").cast("decimal(18,2)")).cast("double"), 2).as("total_acctbal"))
      .orderBy(col("c_mktsegment"))
  }

  /** Per-user event funnel: conditional aggregation (pivot-style) — counts
    * per event_type for the heaviest users, deterministic order. */
  def userFunnel(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "view", 1).otherwise(0)).as("n_view"),
        sum(when(col("event_type") === "click", 1).otherwise(0)).as("n_click"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n_purchase"),
        moneySum(col("value")).as("sum_value"))
      .where(col("n_events") >= 10)
      .orderBy(col("user_id"))
}
