package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType}

/** The engine's one SimHash definition: bit i of the 16-bit signature is the
  * sign of Σ over distinct shingles of (2·d_i − 15), where d_i is the i-th
  * hex digit of md5(shingle). One definition shared by the narrow expression
  * below and the SQL aggregate twin (bit-identity spec-asserted); the DuckDB
  * oracle mirrors the same arithmetic, so the signature is portable across
  * engines. Integer sums are exact and order-independent — the signature is
  * identical under any partitioning. */
object SimhashFamily {

  val Bits = 16

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 16-bit signature of a shingle set, MSB = hex digit 0. Empty input →
    * all sums 0, no positive bit, signature 0 (the SQL twin's aggregate
    * over zero rows is never consulted: callers guard on >=3 tokens). */
  def sigOf(shingles: Iterator[String]): Int = {
    val sums = new Array[Int](Bits)
    val md = digest.get()
    while (shingles.hasNext) {
      md.reset()
      val bytes = md.digest(shingles.next().getBytes("UTF-8"))
      // first 16 hex chars = first 8 bytes, high nibble first
      var i = 0
      while (i < 8) {
        val b = bytes(i) & 0xff
        sums(2 * i) += 2 * (b >>> 4) - 15
        sums(2 * i + 1) += 2 * (b & 0xf) - 15
        i += 1
      }
    }
    var sig = 0
    var i = 0
    while (i < Bits) { sig = sig * 2 + (if (sums(i) > 0) 1 else 0); i += 1 }
    sig
  }
}

/** Codegen-integrated SimHash signature: array<string> shingles → 16-bit int
  * — the NARROW form of the signature stage. The SQL pipeline (explode →
  * md5 per shingle row → groupBy doc_id with 16 bit-sum aggregates) shuffles
  * every exploded shingle row just to reassemble per-doc sums; this
  * expression computes the identical signature inside the row's own
  * projection, so signature generation needs no exchange at all — the same
  * shuffle [[MinhashSigs]] deleted from the minhash stage. */
case class SimhashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
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
  def compute(arr: ArrayData): Int = {
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

  /** 16-bit SimHash of a distinct-shingle array column. */
  def simhashSig(spark: SparkSession, shingles: Column): Column = {
    register(spark)
    call_function("simhash_sig", shingles.cast("array<string>"))
  }
}
