package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Clustering

/** Scale gate for the k-means path over `ClusterScaleBench`'s planted-blob
  * corpus: at 10× the sf0.1 embedding count the distributed Lloyd loop must
  * recover the planted partition exactly — the (cluster, blob) contingency
  * is a permutation matrix. The 10×/100×/500× timing sweep lives in
  * `graft.ClusterScaleBench` + BASELINE_REPRO.md. */
class ClusterScaleSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("kmeans at 20k planted points: exact blob recovery, permutation contingency") {
    spark.sparkContext.setLogLevel("WARN")
    val n = 20000L
    val k = 8
    val pts = ClusterScaleBench.plantedBlobs(spark, n, dim = 64, k = k)
    val pairs = Clustering.kmeansAssignOf(spark, pts, k, iters = 3)
      .withColumn("blob", col("vec_id") % k)
      .groupBy(col("cluster"), col("blob"))
      .agg(count(lit(1)).as("m"))
      .collect()
    assert(pairs.length == k, s"contingency not diagonal: ${pairs.toSeq}")
    assert(pairs.map(_.getLong(0)).distinct.length == k &&
      pairs.map(_.getLong(1)).distinct.length == k,
      s"cluster/blob mapping not a permutation: ${pairs.toSeq}")
    assert(pairs.map(_.getLong(2)).sum == n)
  }

  test("minibatch fit recovers the planted blobs from 20% samples") {
    val n = 5000L
    val k = 8
    val pts = ClusterScaleBench.plantedBlobs(spark, n, dim = 64, k = k)
    val centroids = Clustering.kmeansFitMinibatchOf(spark, pts, k, rounds = 2, pct = 20)
    val pairs = Clustering.assignToCentroids(spark, pts, centroids)
      .withColumn("blob", col("vec_id") % k)
      .groupBy(col("cluster"), col("blob"))
      .agg(count(lit(1)).as("m"))
      .collect()
    assert(pairs.length == k &&
      pairs.map(_.getLong(0)).distinct.length == k &&
      pairs.map(_.getLong(1)).distinct.length == k,
      s"minibatch fit lost planted structure: ${pairs.toSeq}")
  }
}
