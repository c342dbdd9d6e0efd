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

/** Session registration + Column factory. The registered function NAME
  * carries a content fingerprint of the fitted stack (the
  * [[SetProbeExpressions]] pattern), so two fitted stacks live in one
  * session bind DIFFERENT names — a plan analyzed after a second model's
  * registration can never silently score through the wrong weights, and a
  * streaming plan restarted from checkpoint re-resolves to the same stack
  * it was built against. Names are memoized per (session, kernel identity)
  * through a weak-keyed session map so stopped sessions release their
  * kernels. */
object LangExpressions {
  private val sessions =
    new java.util.WeakHashMap[SparkSession, java.util.WeakHashMap[LangPredictKernel, String]]()

  /** MD5 over (width, langs, every weight row), hex — identical fitted
    * stacks from two objects share one name; distinct stacks collide only
    * under an MD5 collision. */
  private def contentFingerprint(k: LangPredictKernel): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = java.nio.ByteBuffer.allocate(8 * 1024)
    def putLongs(xs: Array[Long]): Unit = {
      var i = 0
      while (i < xs.length) {
        buf.clear()
        val end = math.min(i + 1024, xs.length)
        while (i < end) { buf.putLong(xs(i)); i += 1 }
        md.update(buf.array(), 0, buf.position())
      }
    }
    putLongs(Array(k.width.toLong, k.langs.length.toLong))
    k.langs.foreach(l => md.update(l.getBytes(StandardCharsets.UTF_8)))
    k.wq.foreach(putLongs)
    md.digest().map("%02x".format(_)).mkString
  }

  /** Register (or reuse) the kernel's fingerprinted function; returns the
    * full function name. */
  def register(spark: SparkSession, kernel: LangPredictKernel): String = synchronized {
    val byKernel = {
      val existing = sessions.get(spark)
      if (existing != null) existing
      else {
        val fresh = new java.util.WeakHashMap[LangPredictKernel, String]()
        sessions.put(spark, fresh); fresh
      }
    }
    val cached = byKernel.get(kernel)
    if (cached != null) cached
    else {
      val name = s"lang_predict_native_${contentFingerprint(kernel)}"
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, exprs => LangPredict(exprs.head, kernel), "scala_udf")
      byKernel.put(kernel, name)
      name
    }
  }

  private[graft] def clearRegistry(): Unit = synchronized { sessions.clear() }

  /** Language prediction of a text column through the frozen kernel. */
  def langPredict(spark: SparkSession, kernel: LangPredictKernel, text: Column): Column =
    call_function(register(spark, kernel), text.cast("string"))
}
