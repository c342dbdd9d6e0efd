package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for the MOSS winnowing fingerprint set of one document —
  * the hot loop of corpus indexing and streaming copy-detection. The
  * higher-order-function derivation ([[graft.operators.Dedup.winnowFpStructs]])
  * is semantically identical but every `transform` lambda is
  * CodegenFallback: at 50k × ~100-token docs the interpreted pass costs
  * ~31 s, this kernel ~1-2 s (the TokenSetCount / L2Squared lesson a third
  * time: never leave a lambda in a per-row hot path). The HOF form stays as
  * the executable spec twin; `NativeExpressionSpec`-style equivalence is
  * asserted in StreamingSpec, and the `winnow_rowform_gate` oracle
  * hash-checks this kernel against DuckDB's window-function derivation.
  *
  * Pinned semantics (all three derivations agree bit-for-bit):
  * tokens = `\s+` split of the lowercased text (Java regex, limit −1, the
  * `split` builtin's contract); gram hash = first 15 hex chars of
  * md5(5-gram joined by ' ') parsed base-16 (the shared 60-bit surrogate);
  * per window of 4 consecutive gram hashes select the MINIMUM, ties to the
  * RIGHTMOST 1-based gram position; distinct (fp, selpos) pairs in
  * first-occurrence order (`array_distinct`). */
object WinnowImpl {
  private val K = 5
  private val W = 4

  def compute(text: UTF8String): ArrayData = {
    val s = text.toLowerCase.toString
    val toks = s.split("\\s+", -1)
    val m = toks.length - (K - 1)
    if (m < W) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[Long](m)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var t = 0
      while (t < K) {
        if (t > 0) sb.append(' ')
        sb.append(toks(i + t))
        t += 1
      }
      md.reset()
      val dig = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars = high 60 bits of the digest
      var h = 0L
      var b = 0
      while (b < 8) {
        h = (h << 8) | (dig(b) & 0xffL)
        b += 1
      }
      hs(i) = h >>> 4 // 64 bits accumulated, keep the top 60 (15 hex chars)
      i += 1
    }
    val seen = scala.collection.mutable.HashSet.empty[(Long, Int)]
    val out = new java.util.ArrayList[Any]
    var j = 0
    val nw = m - (W - 1)
    while (j < nw) {
      var mn = hs(j)
      var sel = j
      var t = 1
      while (t < W) {
        if (hs(j + t) <= mn) { mn = hs(j + t); sel = j + t }
        t += 1
      }
      // distinct (fp, selpos) pairs, first-occurrence order; selpos 1-based
      if (seen.add((mn, sel + 1))) out.add(new GenericInternalRow(Array[Any](mn, sel + 1)))
      j += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Codegen'd `winnow_fps(text): array<struct<fp:bigint,selpos:int>>`. */
case class WinnowFingerprints(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("fp", LongType, nullable = false),
      StructField("selpos", IntegerType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(input: Any): Any =
    WinnowImpl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowImpl.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Session registration + Column factory — the [[TextExpressions]] pattern. */
object WinnowExpressions {
  @volatile private var registered = Set.empty[SparkSession]

  def register(spark: SparkSession): Unit = synchronized {
    if (!registered.contains(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "winnow_fps", exprs => WinnowFingerprints(exprs.head), "scala_udf")
      registered += spark
    }
  }

  private[graft] def clearRegistry(): Unit = synchronized { registered = Set.empty }

  /** Winnow fingerprint structs of a text column, native kernel. */
  def winnowFps(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("winnow_fps", text.cast("string"))
  }
}
