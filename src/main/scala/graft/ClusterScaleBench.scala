package graft

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Clustering

/** 10×-and-beyond scale evidence for the k-means path — `ScaleBench` covers
  * ANN serve, `DedupScaleBench` covers dedup; this drives
  * [[Clustering.kmeansAssignOf]] on a DISTRIBUTED synthetic blob corpus
  * (seeded per-id RNG in mapPartitions, never on the driver) and checks
  * exact planted-structure recovery at each size: point i belongs to blob
  * (i mod k), blob centers are far apart relative to jitter, and vec_ids
  * 0..k-1 are one per blob so the lowest-ids init seeds every blob — Lloyd
  * must recover the planted partition exactly, at every n.
  *
  * What the sweep demonstrates for the 100 TB posture: per-iteration cost
  * is ONE corpus scan (broadcast centroid literals into the codegen long
  * kernel) plus a k·dim-cell aggregate — so wall time must grow ~linearly
  * in n while the driver never holds more than the k·dim centroid matrix.
  *
  * Usage: runMain graft.ClusterScaleBench [nList] [dim] [k] [cpus]
  * e.g.   runMain graft.ClusterScaleBench 10000,100000,1000000 64 8 32
  * Prints one JSON line per n; recorded in BASELINE_REPRO.md.
  */
object ClusterScaleBench {

  /** Planted-blob corpus, already integer-quantized: center coords in
    * ±5·10⁶ (≫ jitter ±10⁴), so dim·maxDiff² stays far below 2⁶³ and the
    * exact-long kernel cannot overflow. */
  def plantedBlobs(spark: SparkSession, n: Long, dim: Int, k: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { it =>
      it.map { id =>
        val b = (id % k).toInt
        val crng = new Random(b * 1234567L + 7L)
        val rng = new Random(id * 0x9e3779b97f4a7c15L + 99L)
        val q = Array.fill(dim)(
          (crng.nextInt(2000001) - 1000000).toLong * 5L +
            (rng.nextInt(20001) - 10000).toLong)
        (id, q)
      }
    }.toDF("vec_id", "q")
  }

  def main(args: Array[String]): Unit = {
    val ns = args.headOption.map(_.split(",").map(_.toLong).toSeq)
      .getOrElse(Seq(10000L, 100000L, 1000000L))
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val k = args.lift(2).map(_.toInt).getOrElse(8)
    val cpus = args.lift(3).map(_.toInt)
      .orElse(sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- ns) {
      val pts = plantedBlobs(spark, n, dim, k)
      val t0 = System.nanoTime()
      val assigned = Clustering.kmeansAssignOf(spark, pts, k, iters = 3)
        .withColumn("blob", col("vec_id") % k)
      // exact recovery: the (cluster, blob) contingency must be a
      // permutation matrix — k distinct pairs, each pure
      val pairs = assigned.groupBy(col("cluster"), col("blob"))
        .agg(count(lit(1)).as("m")).collect()
      val fitS = (System.nanoTime() - t0) / 1e9
      val recovered = pairs.length == k &&
        pairs.map(_.getLong(1)).distinct.length == k &&
        pairs.map(_.getLong(0)).distinct.length == k
      println(f"""{"bench":"kmeans_scale","n":$n,"dim":$dim,"k":$k,"iters":3,""" +
        f""""fit_s":${math.rint(fitS * 100) / 100}%.2f,"recovered":$recovered}""")
    }
    spark.stop()
  }
}
