package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A frozen one-vs-rest char-bigram language stack as ONE per-row kernel —
  * the ingest-hot-path form of
  * [[graft.operators.LangClassifier.predictExpr]] (the HOF spec twin,
  * bit-identity asserted in LangClassifierSpec). The composed-expression
  * form pays ~180 interpreted md5 lambda steps plus K interpreted margin
  * aggregates per row (stream_langid measured 2.3k rows/s even after
  * let-binding); this kernel is one static call inside whole-stage
  * codegen, streaming the md5 bigram buckets straight into the K margin
  * accumulators with no intermediate array.
  *
  * Pinned semantics (all shared with the HOF twin):
  *   - text lowercased via UTF8String.toLowerCase (exactly Spark's
  *     `lower`), positions/substrings counted in CODEPOINTS (exactly
  *     Spark's `substr`);
  *   - one bigram per position 1..max(len−1, 1): 2 codepoints, truncated
  *     at the end (len 1 → the single char; len 0 → the empty bigram);
  *   - bucket = first 15 hex chars of md5("lang:" + bigram) as base-16
  *     (= top 60 bits of the digest) mod width;
  *   - margin_l = floor(Σ wq_l[bucket] / nt) + floor(wq_l[width]·nt/100)
  *     + wq_l[width+1], with the SAME double-floor arithmetic;
  *   - argmax with ties to the first language in declaration order.
  */
final class LangPredictKernel(val width: Int, val langs: Array[String],
    val wq: Array[Array[Long]]) extends Serializable {

  def predict(text: UTF8String): UTF8String = {
    val lower = text.toLowerCase.toString
    val cps = lower.codePoints().toArray
    val len = cps.length
    val n = math.max(len - 1, 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val sums = new Array[Long](wq.length)
    var i = 0
    while (i < n) {
      val take = math.min(2, math.max(len - i, 0))
      val bg = if (take <= 0) "" else new String(cps, i, take)
      md.reset()
      val dig = md.digest(("lang:" + bg).getBytes(StandardCharsets.UTF_8))
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
      val bucket = ((h >>> 4) % width).toInt
      var l = 0
      while (l < wq.length) { sums(l) += wq(l)(bucket); l += 1 }
      i += 1
    }
    var best = 0
    var bestM = Long.MinValue
    var l = 0
    while (l < wq.length) {
      val w = wq(l)
      val m = math.floor(sums(l).toDouble / n).toLong +
        math.floor(w(w.length - 2).toDouble * n / 100).toLong +
        w(w.length - 1)
      if (m > bestM) { bestM = m; best = l }
      l += 1
    }
    UTF8String.fromString(langs(best))
  }
}

/** Codegen'd `lang_predict_native(text): string` over a frozen kernel.
  * The kernel rides the plan as a reference object
  * (`ctx.addReferenceObj`), so the generated code stays one static-shaped
  * call and the weights never serialize into the source text. */
case class LangPredict(child: Expression, kernel: LangPredictKernel)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_predict_native"

  override def nullSafeEval(input: Any): Any =
    kernel.predict(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langKernel", kernel,
      classOf[LangPredictKernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.predict($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Session registration + Column factory. Registration is per
  * (session, kernel): a refit model re-registers (createOrReplace), so the
  * SQL name always serves the CURRENT fitted stack of that session. */
object LangExpressions {
  @volatile private var registered = Map.empty[SparkSession, LangPredictKernel]

  def register(spark: SparkSession, kernel: LangPredictKernel): Unit = synchronized {
    if (!registered.get(spark).contains(kernel)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "lang_predict_native", exprs => LangPredict(exprs.head, kernel), "scala_udf")
      registered += spark -> kernel
    }
  }

  private[graft] def clearRegistry(): Unit = synchronized { registered = Map.empty }

  /** Language prediction of a text column through the frozen kernel. */
  def langPredict(spark: SparkSession, kernel: LangPredictKernel, text: Column): Column = {
    register(spark, kernel)
    call_function("lang_predict_native", text.cast("string"))
  }
}
