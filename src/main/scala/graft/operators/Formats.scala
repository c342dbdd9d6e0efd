package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** File-format surface as a hash-checked QUERY (SURVEY.md §2b file
  * formats): the CSV/JSON/ORC sink→source roundtrip emits per-format
  * content checksums the DuckDB oracle recomputes from the parquet
  * originals — identical rows prove the write+read path preserved every
  * doc_id, text byte, and char count through each format. (The spec
  * version of this check samples ids; the query hashes ALL text.)
  */
object Formats {

  /** One row per format: doc count, total chars, and an order-independent
    * text checksum (sum of 32-bit md5 prefixes — commutative, overflow-safe
    * to ~10⁹ docs) computed from the ROUNDTRIPPED data. Aggregates are
    * materialized before the temp dir is deleted. */
  def formatRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    val schema = docs.schema
    val basePath = java.nio.file.Files.createTempDirectory("graft_formats_")
    try {
      val rows = Seq("csv", "json", "orc").map { fmt =>
        val path = s"$basePath/$fmt"
        val w = docs.write.mode("overwrite").format(fmt)
        // CSV defaults are LOSSY for realistic text: leading/trailing
        // whitespace is trimmed on write and read, and embedded newlines
        // break the line-per-record reader — exactly the corruption this
        // gate exists to catch, so disable the trims and read multiLine
        // (quoting already covers the newlines on the write side)
        // null vs empty string must survive the roundtrip: with the default
        // nullValue="" an empty text writes as '' and reads back as NULL,
        // silently dropping it from md5/sum while the oracle hashes the
        // parquet original. A sentinel that cannot occur in text (contains
        // a 0x01 control byte) keeps empty and NULL distinct on write and read.
        val csvNull = "\u0001__GRAFT_NULL__\u0001"
        (if (fmt == "csv")
          w.option("header", "true")
            .option("ignoreLeadingWhiteSpace", "false")
            .option("ignoreTrailingWhiteSpace", "false")
            .option("nullValue", csvNull).option("emptyValue", "\"\"")
        else w).save(path)
        val r = spark.read.format(fmt).schema(schema)
        val back = (if (fmt == "csv")
          r.option("header", "true").option("multiLine", "true")
            .option("ignoreLeadingWhiteSpace", "false")
            .option("ignoreTrailingWhiteSpace", "false")
            .option("nullValue", csvNull).option("emptyValue", "")
        else r).load(path)
        val agg = back.agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")).as("text_sum"))
          .head()
        (fmt, agg.getLong(0), agg.getLong(1), agg.getLong(2))
      }
      rows.toDF("format", "n_docs", "total_chars", "text_sum").orderBy(col("format"))
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(basePath)
      // materialize before closing: the walk stream holds directory handles
      val paths = try walk.iterator().asScala.toList finally walk.close()
      paths.sortBy(-_.getNameCount)
        .foreach(p => scala.util.Try(java.nio.file.Files.deleteIfExists(p)))
    }
  }
}
