package graft

import org.apache.spark.sql.SparkSession

/** Repeat-runs one registered query and prints per-iteration wall times —
  * separates steady-state plan cost from one-off JVM/codegen/cache-warm cost
  * that the shared-JVM [[Bench]] attributes to whichever query runs first.
  * Usage: runMain graft.QueryBench <query_name> [iters] [sfDir]
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_pricing_summary")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = args.lift(2).orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.cacheTables = true
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    for (i <- 1 to iters) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[qbench] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
