package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** The engine's one SimHash definition: bit i of the 64-bit signature is the
  * sign of Σ over distinct shingles of (2·d_i − 15), where d_i is the i-th
  * hex digit of the shingle's digest pair — md5(s) supplies digits 0..31,
  * md5(s ++ "#") digits 32..63. One definition shared by the narrow
  * expression below and the SQL aggregate twin (bit-identity spec-asserted);
  * the DuckDB oracle mirrors the same arithmetic, so the signature is
  * portable across engines. Integer sums are exact and order-independent —
  * the signature is identical under any partitioning.
  *
  * 64 bits (not 16, as before round 6) because the candidate join pigeonholes
  * the signature into 4 chunks: at 16 bits a chunk is a nibble and the whole
  * corpus shares 4×16 = 64 join keys — a disguised cross-join at scale — and
  * the 65,536-value signature space birthday-collides long before 10⁸ docs.
  * At 64 bits each chunk is 16 bits (4×65,536 keys) and Hamming ≤ 3 means
  * near-exact duplicates, the standard simhash operating point
  * (Manku et al., WWW'07). */
object SimhashFamily {

  val Bits = 64

  /** Salt appended for the second digest (bits 32..63). SQL twin: `s || '#'`. */
  val Salt = "#"

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 64-bit signature of a shingle set, MSB = hex digit 0 of md5(s). Empty
    * input → all sums 0, no positive bit, signature 0 (the SQL twin's
    * aggregate over zero rows is never consulted: callers guard on >=3
    * tokens). The MSB enters via `<<|` so the sign bit needs no special
    * casing here; the SQL twins fold 63 bits and add Long.MinValue for the
    * sign bit instead, because their arithmetic is overflow-checked. */
  def sigOf(shingles: Iterator[String]): Long = {
    val sums = new Array[Int](Bits)
    val md = digest.get()
    while (shingles.hasNext) {
      val s = shingles.next()
      md.reset()
      val b1 = md.digest(s.getBytes("UTF-8"))
      md.reset()
      val b2 = md.digest((s + Salt).getBytes("UTF-8"))
      var i = 0
      while (i < 16) {
        val x1 = b1(i) & 0xff
        sums(2 * i) += 2 * (x1 >>> 4) - 15
        sums(2 * i + 1) += 2 * (x1 & 0xf) - 15
        val x2 = b2(i) & 0xff
        sums(32 + 2 * i) += 2 * (x2 >>> 4) - 15
        sums(32 + 2 * i + 1) += 2 * (x2 & 0xf) - 15
        i += 1
      }
    }
    var sig = 0L
    var i = 0
    while (i < Bits) { sig = (sig << 1) | (if (sums(i) > 0) 1L else 0L); i += 1 }
    sig
  }
}

/** Codegen-integrated SimHash signature: array<string> shingles → 64-bit long
  * — the NARROW form of the signature stage. The SQL pipeline (explode →
  * md5 per shingle row → groupBy doc_id with 64 bit-sum aggregates) shuffles
  * every exploded shingle row just to reassemble per-doc sums; this
  * expression computes the identical signature inside the row's own
  * projection, so signature generation needs no exchange at all — the same
  * shuffle [[MinhashSigs]] deleted from the minhash stage. */
case class SimhashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(input: Any): Any =
    SimhashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimhashSig.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashSig {

  /** Static entry point shared by eval and generated code. Null array
    * elements are skipped, matching the SQL aggregate twin where
    * md5(null) is null and the bit-sums ignore it. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val it = (0 until n).iterator
      .filterNot(arr.isNullAt)
      .map(i => arr.getUTF8String(i).toString)
    SimhashFamily.sigOf(it)
  }

  @volatile private var registered = Set.empty[SparkSession]

  def register(spark: SparkSession): Unit = synchronized {
    if (!registered.contains(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "simhash_sig", exprs => SimhashSig(exprs.head), "scala_udf")
      registered += spark
    }
  }

  private[graft] def clearRegistry(): Unit = synchronized { registered = Set.empty }

  /** 64-bit SimHash of a distinct-shingle array column. */
  def simhashSig(spark: SparkSession, shingles: Column): Column = {
    register(spark)
    call_function("simhash_sig", shingles.cast("array<string>"))
  }
}
