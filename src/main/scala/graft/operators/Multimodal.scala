package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Feature-extraction record produced by the stubbed decoder (top-level so
  * the Dataset encoder stays codegen-compatible). */
case class MediaFeatures(doc_id: Long, n_bytes: Long, mean_byte: Double, head_hash: String)

/** Multimodal-column operators: text ⋈ vector join and opaque-binary payload
  * plumbing (north-star surface, SURVEY.md §2b).
  *
  * The binary path treats media as `binary` columns with typed metadata.
  * This container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic STUB ([[decodeStub]]) — what is real and
  * tested is the Spark-side plumbing: schema, batching via mapPartitions,
  * partition-local feature extraction, and the metadata join — exactly the
  * shape a real decoder (e.g. a Pandas-UDF/JNI codec) would slot into.
  */
object Multimodal {

  /** Text ⋈ embedding modality join on doc_id = vec_id, aggregated per
    * (lang, label): the "align modalities then profile" pipeline step. */
  def multimodalJoin(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .groupBy(col("lang"), col("label"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        min(col("doc_id")).as("min_doc_id"))
      .orderBy(col("lang"), col("label"))
  }

  /** Binary payload metadata: documents carried as opaque utf-8 blobs with
    * byte-level stats — the oracle-checkable half of the binary path. */
  def binaryStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"), col("source"))
      .select(
        col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("payload_md5"),
        col("source"))
      .orderBy(col("doc_id"))

  /** STUB decoder: stands in for image/audio decode (no codecs in this
    * container). Deterministic fake features from the raw bytes — byte
    * count, mean byte value, hash of the first 16 bytes. A real codec
    * replaces ONLY the body of this function; the batching, schema and
    * partitioning around it are production-shaped. */
  private def decodeStub(docId: Long, payload: Array[Byte]): MediaFeatures = {
    var s = 0L
    var i = 0
    while (i < payload.length) { s += payload(i) & 0xff; i += 1 }
    val mean = if (payload.isEmpty) 0.0 else s.toDouble / payload.length
    val head = payload.take(16)
    val md = java.security.MessageDigest.getInstance("MD5").digest(head)
    MediaFeatures(docId, payload.length.toLong, math.rint(mean * 1e4) / 1e4,
      md.map("%02x".format(_)).mkString)
  }

  /** Partition-parallel media feature extraction over binary payloads —
    * rows-only check (the stub's numbers are not worth oracling; the
    * plumbing is what's under test, see MultimodalSpec). */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => decodeStub(id, bytes) } }
      .toDF()
      .orderBy(col("doc_id"))
  }
}
