package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The storage-flatness contract of [[GraftCaches.clearAll]]: a long-lived
  * service cycling through datasets must be able to drop every per-dataset
  * memo — cached tables, shingle/pair frames, decoded-thumbnail and
  * signature caches, pagerank checkpoint blocks, fitted ANN/k-means models
  * — so repeated (query-sweep → clearAll) cycles hold executor storage
  * FLAT instead of accreting one orphaned cached block per cache family
  * per cycle (the round-7/round-9 leak class, now gated here). */
class CacheLifecycleSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("repeated query-sweep + clearAll cycles hold persistent storage flat") {
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    // the cache-heavy families: memoized tables, shared shingle/pair
    // frames, pagerank checkpoints, media signature caches, fitted
    // k-means matrices
    val names = Seq("dedup_ngram_jaccard", "source_pagerank",
      "mm_image_neardup", "embed_kmeans", "cluster_silhouette", "pipeline_web")
    def sweep(): Unit = {
      graft.core.Tables.cacheTables = true
      try names.foreach(n => SparkEntry.queries(n)(spark, dir).count())
      finally graft.core.Tables.cacheTables = false
    }
    def persisted(): Int = {
      GraftCaches.clearAll()
      spark.sparkContext.getPersistentRDDs.size
    }
    sweep()
    val afterFirst = persisted()
    sweep()
    val afterSecond = persisted()
    sweep()
    val afterThird = persisted()
    assert(afterSecond <= afterFirst && afterThird <= afterSecond,
      s"persistent storage grows across clearAll cycles: " +
        s"$afterFirst -> $afterSecond -> $afterThird")
  }

  test("bucketed layout cache validates catalog hits and rebuilds after a lost catalog") {
    val dir = "/root/testdata/sf0.001"
    val expected = graft.operators.Formats.bucketedRevenue(spark, dir)
      .collect().map(_.toSeq).toSeq
    // simulate a session restart that lost the catalog entries while the
    // JVM-wide memo survived: a stale hit would name tables this session
    // doesn't know and throw at spark.table(); the validated hit rebuilds
    spark.catalog.listTables().collect()
      .filter(t => t.name.startsWith("graft_li_") || t.name.startsWith("graft_ord_"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${t.name}"))
    val again = graft.operators.Formats.bucketedRevenue(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(again == expected, "rebuilt bucketed layout must serve identical rows")
    graft.operators.Formats.clearCaches()
  }
}
