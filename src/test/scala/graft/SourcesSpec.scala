package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.Relational

/** Source/sink coverage beyond parquet (SURVEY.md §2b "file formats"):
  * csv/json/orc roundtrips preserve the data, and the sketch aggregate
  * stays within its error bound. */
class SourcesSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("csv, json and orc sinks roundtrip the documents table") {
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir).orderBy("doc_id")
    val n = docs.count()
    val base = java.nio.file.Files.createTempDirectory("graft_sources").toString
    for (fmt <- Seq("csv", "json", "orc")) {
      val path = s"$base/$fmt"
      val writer = docs.write.mode("overwrite").format(fmt)
      (if (fmt == "csv") writer.option("header", "true") else writer).save(path)
      val reader = spark.read.format(fmt)
      val back = (if (fmt == "csv") reader.option("header", "true").option("inferSchema", "true")
                  else reader).load(path)
      assert(back.count() == n, s"$fmt roundtrip lost rows")
      val origIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
      val backIds = back.select(col("doc_id").cast("long")).collect().map(_.getLong(0)).toSet
      assert(backIds == origIds, s"$fmt roundtrip changed doc_ids")
    }
  }

  test("approx_count_distinct stays within 5% of exact") {
    val rows = Relational.approxDistinct(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("hll_ok"),
        s"${r.getString(0)}: HLL estimate outside 5% of ${r.getAs[Long]("exact_users")}")
    }
  }
}
