package graft

import org.apache.spark.sql.SparkSession

/** Time a SEQUENCE of registered queries in one JVM — the in-context
  * triage twin of [[QueryTime]] (which isolates one query): bench-context
  * regressions that vanish in isolation come from state a PRIOR query
  * leaves behind, and this reproduces exactly that with a minimal prefix.
  * Usage: runMain graft.BenchSeq q1,q2,... [sfDir] [cpus]
  */
object BenchSeq {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq).getOrElse(
      sys.error("usage: BenchSeq q1,q2,... [sfDir] [cpus]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(2).map(_.toInt)
      .orElse(sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // 220+ distinct plans in one JVM overflow the 100-entry generated-
      // class cache (see Bench.scala) — size it to the suite
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.cacheTables = true
    spark.range(1L << 20).selectExpr("sum(id * 2)").collect()
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name' — see SparkEntry.queries"))
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count() catch { case e: Throwable =>
        println(s"[benchseq] $name FAILED: ${e.getMessage.take(200)}"); -1L }
      println(f"[benchseq] $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.4f")
    }
    spark.stop()
  }
}
