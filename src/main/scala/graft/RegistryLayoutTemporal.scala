package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.RegistrySqlParts._

/** File-layout and temporal registered queries (partitioned/bucketed/Z-order layout, format roundtrip, as-of/range joins, gap-fill) with their DuckDB oracle SQL. Split from the monolithic PipelineRegistry; the
  * aggregate surface (and entry order) lives there. */
private[graft] object RegistryLayoutTemporal {

  private[graft] def entries: Seq[(String, QFn, Option[String])] = Seq(
    asofJoinQ, rangeJoinQ, formatRoundtripQ, bucketedRevenueQ, partitionedRevenueQ, zorderRevenueQ, gapfillHourlyQ, skewReportQ)

  /** Key-skew diagnostic: the oracle recomputes each audited column's
    * exact key counts, the top-5 by (cnt DESC, key) and the two
    * single-division ratios — shares and skew ratios hash-match. */
  private val skewReportQ: (String, QFn, Option[String]) = (
    "skew_report",
    (s, d) => Formats.skewReport(s, d),
    Some("""
      WITH e AS (SELECT user_id::VARCHAR AS key_val, count(*)::BIGINT AS cnt FROM events GROUP BY key_val),
      es AS (SELECT sum(cnt)::BIGINT AS total, count(*)::BIGINT AS n_keys FROM e),
      et AS (SELECT 'events.user_id' AS table_col, key_val, cnt,
               round(cnt::DOUBLE / total, 4) AS share,
               round((cnt * n_keys)::DOUBLE / total, 4) AS skew_ratio
             FROM e, es ORDER BY cnt DESC, key_val LIMIT 5),
      l AS (SELECT l_partkey::VARCHAR AS key_val, count(*)::BIGINT AS cnt FROM lineitem GROUP BY key_val),
      ls AS (SELECT sum(cnt)::BIGINT AS total, count(*)::BIGINT AS n_keys FROM l),
      lt AS (SELECT 'lineitem.l_partkey' AS table_col, key_val, cnt,
               round(cnt::DOUBLE / total, 4) AS share,
               round((cnt * n_keys)::DOUBLE / total, 4) AS skew_ratio
             FROM l, ls ORDER BY cnt DESC, key_val LIMIT 5),
      dd AS (SELECT lang::VARCHAR AS key_val, count(*)::BIGINT AS cnt FROM documents GROUP BY key_val),
      ds AS (SELECT sum(cnt)::BIGINT AS total, count(*)::BIGINT AS n_keys FROM dd),
      dt AS (SELECT 'documents.lang' AS table_col, key_val, cnt,
               round(cnt::DOUBLE / total, 4) AS share,
               round((cnt * n_keys)::DOUBLE / total, 4) AS skew_ratio
             FROM dd, ds ORDER BY cnt DESC, key_val LIMIT 5)
      SELECT * FROM et UNION ALL SELECT * FROM lt UNION ALL SELECT * FROM dt
      ORDER BY table_col, cnt DESC, key_val
    """.trim))

  /** Date-partitioned layout vs the unpartitioned oracle: the partition
    * filter `date(ts) in [Jan 8, Jan 15)` is exactly `ts in [Jan 8 00:00,
    * Jan 15 00:00)` on the raw column, so DuckDB recomputes the week from
    * the original file while Spark reads only 7 of 30 directories. */
  private val partitionedRevenueQ: (String, QFn, Option[String]) = (
    "partitioned_revenue",
    (s, d) => Formats.partitionedRevenue(s, d),
    Some("""
      SELECT event_type, count(*) AS n_events,
             round(sum(CAST(value AS DECIMAL(18,2))), 2)::DOUBLE AS sum_value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
      GROUP BY event_type ORDER BY event_type
    """.trim))

  /** Bucketed co-located join vs the plain-join oracle — hash-identical
    * output proves the bucketed write+read+join path is row-lossless (the
    * exchange-free plan shape is PlanSpec's half of the check). */
  private val bucketedRevenueQ: (String, QFn, Option[String]) = (
    "bucketed_revenue",
    (s, d) => Formats.bucketedRevenue(s, d),
    Some("""
      SELECT o_orderpriority,
             round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)::DOUBLE AS revenue,
             count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority
    """.trim))

  /** Z-ordered layout box scan vs the unsorted original: hash-identical
    * aggregates prove the Morton rewrite row-lossless, and min_z/max_z
    * pin the 16-bit interleave arithmetic (the oracle recomputes z with
    * the same shift/mask/or terms). */
  private val zorderRevenueQ: (String, QFn, Option[String]) = {
    val zSql = (0 until 16).map { i =>
      s"((((l_partkey % 65536) >> $i) & 1) << ${2 * i}) | " +
        s"((((l_suppkey % 65536) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", ") | (", ")")
    ("zorder_revenue",
      (s: SparkSession, d: String) => Formats.zorderRevenue(s, d),
      Some(s"""
      WITH b AS (SELECT l_extendedprice, $zSql AS z
                 FROM lineitem
                 WHERE l_partkey >= 100 AND l_partkey < 200
                   AND l_suppkey >= 10 AND l_suppkey < 60)
      SELECT count(*)::BIGINT AS n_items,
             round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)::DOUBLE AS revenue,
             min(z)::BIGINT AS min_z, max(z)::BIGINT AS max_z
      FROM b
    """.trim))
  }

  /** The oracle recomputes each format's checksums from the parquet
    * originals — rows can only match if the sink→source path was
    * byte-lossless for every doc. */
  private val formatRoundtripQ: (String, QFn, Option[String]) = (
    "format_roundtrip",
    (s, d) => Formats.formatRoundtrip(s, d),
    Some("""
      SELECT v.fmt AS format, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars,
             sum(('0x' || substr(md5(text), 1, 8))::BIGINT)::BIGINT AS text_sum
      FROM documents CROSS JOIN (VALUES ('csv'), ('json'), ('orc'),
                                        ('json_gzip'), ('csv_bzip2')) v(fmt)
      GROUP BY v.fmt ORDER BY v.fmt
    """.trim))

  // ---- corpus pipeline (declared last: composes the oracle SQL of the
  // single ops above, so those vals must already be initialized) ------------

  /** Spark lacks ASOF JOIN; the operator is the union-tag window form (one
    * shuffle by user, no join), and the oracle is DuckDB's NATIVE ASOF LEFT
    * JOIN — two entirely different algorithms that must agree row-for-row. */
  private val asofJoinQ: (String, QFn, Option[String]) = (
    "asof_join",
    (s, d) => Temporal.asofJoin(s, d),
    Some("""
      WITH r AS (SELECT user_id, ts, max(value) AS asof_value
                 FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      l AS (SELECT event_id, user_id, ts, value
            FROM events WHERE event_type = 'purchase')
      SELECT l.event_id, l.user_id, l.value, r.asof_value,
             epoch_us(l.ts) - epoch_us(r.ts) AS micros_since_match
      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
      ORDER BY l.event_id
    """.trim))

  /** Granule-bucketed interval join vs DuckDB's plain inequality join —
    * the Spark side must turn the BETWEEN predicate into a keyed equi-join
    * (PlanSpec asserts no nested-loop) yet agree row-for-row. */
  private val rangeJoinQ: (String, QFn, Option[String]) = (
    "range_join_sessions",
    (s, d) => Temporal.sessionRangeJoin(s, d),
    Some(s"""
      WITH e AS (
        SELECT user_id, event_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events WHERE event_type <> 'error'),
      m AS (SELECT *, CASE WHEN prev_ts IS NULL
                           OR epoch_us(ts) - epoch_us(prev_ts) > ${Temporal.RangeGapUs}
                           THEN 1 ELSE 0 END AS new_session FROM e),
      s AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM m),
      iv AS (SELECT user_id, session_id, min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us
             FROM s GROUP BY user_id, session_id),
      p AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'error')
      SELECT p.event_id, p.user_id, iv.session_id, p.us - iv.start_us AS us_into_session
      FROM p JOIN iv ON p.user_id = iv.user_id AND p.us BETWEEN iv.start_us AND iv.end_us
      ORDER BY p.event_id
    """.trim))

  /** Gap-filled resample: Spark's sequence-explode grid vs DuckDB's
    * generate_series — two different densification mechanisms that must
    * agree row-for-row, including the all-zero gap rows. */
  private val gapfillHourlyQ: (String, QFn, Option[String]) = (
    "gapfill_hourly",
    (s, d) => Temporal.gapfillHourly(s, d),
    Some("""
      WITH ev AS (SELECT user_id, date_trunc('hour', ts) AS h, value
                  FROM events WHERE user_id < 20),
      hourly AS (SELECT user_id, h, count(*)::BIGINT AS n_events,
                        round(sum(CAST(value AS DECIMAL(18,2))), 2)::DOUBLE AS sum_value
                 FROM ev GROUP BY 1, 2),
      grid AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
               FROM (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM ev GROUP BY user_id)),
      j AS (SELECT g.user_id, strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour,
                   COALESCE(hh.n_events, 0)::BIGINT AS n_events,
                   COALESCE(hh.sum_value, 0.0) AS sum_value
            FROM grid g LEFT JOIN hourly hh ON g.user_id = hh.user_id AND g.h = hh.h)
      SELECT * FROM j ORDER BY user_id, hour
    """.trim))

}
