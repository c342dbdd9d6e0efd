package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Joins, Tables}

/** Scale-pattern joins: bucketed co-located joins (no exchange on the
  * bucketed sides) and salted joins for skew (row-identical to plain). */
class JoinStrategySpec extends AnyFunSuite {

  private lazy val warehouse = java.nio.file.Files.createTempDirectory("graft_wh").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ to expose exchanges
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables join without exchanges on the bucketed sides") {
    spark.sparkContext.setLogLevel("WARN")
    // the builder confs above are ignored if another suite created the
    // session first — force the runtime conf here and restore after
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // unique table names: suites may share a session whose default
      // warehouse dir survives across JVM runs (managed locations stick)
      val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
      val (ordersT, lineitemT) = (s"orders_b_$tag", s"lineitem_b_$tag")
      Tables.orders(spark, dir).write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(ordersT)
      Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_quantity"))
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(lineitemT)
      val joined = spark.table(lineitemT)
        .join(spark.table(ordersT), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be co-located (no shuffle):\n$plan")
      assert(joined.count() == Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join is row-identical to the plain join") {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_quantity"))
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(orders, "l_orderkey")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      .collect().map(_.toSeq).toSet
    val salted = Joins.saltedJoin(li, orders, "l_orderkey", salts = 6)
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      .collect().map(_.toSeq).toSet
    assert(plain == salted, "salting must not change join semantics")
  }
}
