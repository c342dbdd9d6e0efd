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

  test("pHash is EXACTLY invariant under a uniform brightness shift; aHash-style structure holds") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // deterministic ASCII "image" bytes in 'A'..'x' so a +1 shift stays
    // ASCII-eligible; 8 rows of 24*8 bytes → w=64 grid base
    val base = (0 until 1536).map(i => ('A' + (i * 37 % 56)).toChar).mkString
    val shifted = base.map(c => (c + 1).toChar).mkString
    val docs = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    val ph = Multimodal.phashOf(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ph.size == 2, "both synthetic images must be grid-eligible")
    assert(ph(1L).length == 63 && ph(1L).exists(_ == '1') && ph(1L).exists(_ == '0'),
      "pHash must be a non-degenerate 63-bit signature")
    // uniform +1 per byte = +3 per grid cell: every AC coefficient moves by
    // 3·(Σ C_u)(Σ C_v) = 0 under the sum-corrected table — bit-for-bit equal
    assert(ph(1L) == ph(2L), "brightness shift changed the pHash — table correction broken")
    // sanity: the registered query shape is consistent with ahash's
    val q = Multimodal.imagePhash(spark, "/root/testdata/sf0.001")
    assert(q.columns.toSeq == Seq("doc_id", "phash", "n_same_hash", "is_dup"))
    assert(q.count() > 0)
  }

  test("native phash_native expression is bit-identical to the Scala spec twin on the full corpus") {
    import org.apache.spark.sql.functions.col
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    // production path (codegen expression) vs the encoder-route spec twin
    val native = Multimodal.phashOf(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(native.nonEmpty, "no eligible docs at sf0.001 — fixture broken")
    val spark2 = spark
    import spark2.implicits._
    val twin = docs.select(col("doc_id").cast("long"), col("text"))
      .where(Multimodal.phashEligible)
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> Multimodal.phashOfText(t) }.toMap
    assert(native.keySet == twin.keySet, "eligibility drifted between the two paths")
    native.foreach { case (id, h) =>
      assert(h == twin(id), s"doc $id: native pHash diverged from the spec twin")
    }
    // ineligible input through the raw SQL surface returns empty, not a crash
    val short = graft.functions.PhashImpl.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("tiny"))
    assert(short.toString == "")
  }

  test("audio planted near-dup gate recovers exact and near pairs") {
    spark.sparkContext.setLogLevel("WARN")
    checkGate(Multimodal.audioNearDupGate(spark, "/root/testdata/sf0.001"))
  }

  test("video planted near-dup gate recovers exact and near pairs") {
    checkGate(Multimodal.videoNearDupGate(spark, "/root/testdata/sf0.001"))
  }
}
