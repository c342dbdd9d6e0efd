package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for the perceptual DCT hash (pHash) of a synthetic-image
  * document — the per-row hot loop of media ingest dedup. Semantics are
  * EXACTLY [[graft.operators.Multimodal.phashOfText]] (the Dataset-encoder
  * spec twin, bit-identity asserted in MediaGateSpec): 8×8 luma grid of
  * byte-triple sums over the UTF-8 bytes, 2D DCT-II through the shared
  * sum-corrected fixed-point cosine table
  * ([[graft.operators.Multimodal.DctTable]]), 63 AC coefficients
  * thresholded at their exact integer median (rank-32 of the sorted 63),
  * emitted as a 63-char bit string.
  *
  * Why an expression and not the `mapPartitions` it replaces: the encoder
  * route deserializes every row to a Scala tuple and re-serializes the
  * result — an InternalRow→JVM→InternalRow round-trip per document on the
  * ingest hot path — and it breaks whole-stage codegen around the scan.
  * This kernel is one static call inside the generated code (the
  * [[WinnowImpl]] / TokenSetCount lesson), reading the scan's UTF8String
  * bytes directly with no String materialization at all.
  *
  * Input contract: callers filter through
  * [[graft.operators.Multimodal.phashEligible]] first (≥24 single-byte
  * chars, grid width ≤2²⁰ — same as the spec twin, whose array indexing
  * assumes it). Ineligible input (<24 bytes) returns the empty string
  * rather than throwing, so a raw SQL call can't crash a stage.
  */
object PhashImpl {

  private val Dct: Array[Array[Long]] = graft.operators.Multimodal.DctTable

  def compute(text: UTF8String): UTF8String = {
    val raw = text.getBytes
    if (raw.length < 24) return UTF8String.EMPTY_UTF8
    val w = raw.length / 3 / 8
    val gv = new Array[Long](64)
    var p = 0
    while (p < 64) {
      val off = 3 * ((p / 8) * w + (p % 8) * w / 8)
      gv(p) = (raw(off) & 255) + (raw(off + 1) & 255) + (raw(off + 2) & 255)
      p += 1
    }
    // coefs in row-major (u,v) order; index 0 is the DC coefficient
    val coefs = new Array[Long](64)
    var u = 0
    while (u < 8) {
      val du = Dct(u)
      var v = 0
      while (v < 8) {
        val dv = Dct(v)
        var s = 0L
        var q = 0
        while (q < 64) {
          s += gv(q) * du(q % 8) * dv(q / 8)
          q += 1
        }
        coefs(u * 8 + v) = s
        v += 1
      }
      u += 1
    }
    val ac = new Array[Long](63)
    System.arraycopy(coefs, 1, ac, 0, 63)
    java.util.Arrays.sort(ac)
    val med = ac(31)
    val bits = new Array[Byte](63)
    var i = 0
    while (i < 63) {
      bits(i) = if (coefs(i + 1) > med) '1' else '0'
      i += 1
    }
    UTF8String.fromBytes(bits)
  }
}

/** Codegen'd `phash_native(text): string` (63-char bit string). */
case class PhashNative(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "phash_native"

  override def nullSafeEval(input: Any): Any =
    PhashImpl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PhashImpl.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Session registration + Column factory — the [[WinnowExpressions]]
  * pattern (FunctionRegistry + call_function, no private Spark API). */
object PhashExpressions {
  @volatile private var registered = Set.empty[SparkSession]

  def register(spark: SparkSession): Unit = synchronized {
    if (!registered.contains(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "phash_native", exprs => PhashNative(exprs.head), "scala_udf")
      registered += spark
    }
  }

  private[graft] def clearRegistry(): Unit = synchronized { registered = Set.empty }

  /** Perceptual DCT hash of a text column, native kernel. */
  def phashNative(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("phash_native", text.cast("string"))
  }
}
