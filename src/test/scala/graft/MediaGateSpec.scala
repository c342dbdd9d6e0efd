package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** The planted media near-dup gates must be NON-VACUOUS (at least one
  * planted mutant lands in the Hamming 1..3 near band) and fully recovered
  * by the production pigeonhole pair join at every scale the driver runs
  * (sf0.001 here for speed; Verify exercises sf0.01, Bench sf0.1). */
class MediaGateSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def checkGate(df: org.apache.spark.sql.DataFrame): Unit = {
    val r = df.collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) >= 1, "no eligible candidates")
    assert(row.getBoolean(1), "exact planted pair missing from the pair output")
    assert(row.getBoolean(2), "near planted pair missing or at the wrong Hamming")
    assert(row.getBoolean(3), "no mutant landed in the 1..3 near band — gate is vacuous")
  }

  test("audio planted near-dup gate recovers exact and near pairs") {
    spark.sparkContext.setLogLevel("WARN")
    checkGate(Multimodal.audioNearDupGate(spark, "/root/testdata/sf0.001"))
  }

  test("video planted near-dup gate recovers exact and near pairs") {
    checkGate(Multimodal.videoNearDupGate(spark, "/root/testdata/sf0.001"))
  }
}
