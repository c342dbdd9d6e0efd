package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The engine's one MinHash family, defined once: the i-th min-hash of a
  * shingle set is min over shingles of (a_i·(s mod p) + b_i) mod p, where
  * s is the 60-bit md5 surrogate and p the Mersenne prime 2^31−1. Every
  * consumer — the SQL pipeline in Dedup, its DuckDB oracle twin, the
  * streaming per-row hasher, and the [[MinhashSigs]] expression — derives
  * from these constants, so they cannot drift apart. Products stay under
  * 2^62: exact in BIGINT/Long arithmetic everywhere.
  */
object MinhashFamily {

  val Prime: Long = 2147483647L // 2^31 - 1

  val Params: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L), (1588635695L, 731279361L),
    (1203248318L, 402381575L), (1052085601L, 1779033703L),
    (1013904223L, 1664525L), (997063745L, 321868901L),
    (1790989107L, 731485389L), (1483828171L, 159727421L),
    (622729787L, 1013343295L), (1394671207L, 203550103L),
    (1751078229L, 55555333L), (921469001L, 909090909L),
    (1120048813L, 123123123L), (634031983L, 777777777L),
    (2027875061L, 246813579L), (1171049071L, 192837465L))

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5 as a 60-bit long — the shared surrogate
    * (identical to `conv(substring(md5(s),1,15),16,10)` in SQL). */
  def surrogate60(s: String): Long = {
    val md = digest.get()
    md.reset()
    val bytes = md.digest(s.getBytes("UTF-8"))
    // 15 hex chars = 7.5 bytes: fold the first 8 bytes, drop the low nibble
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** All 16 min-hashes of a shingle multiset in one pass (duplicates can't
    * change a min, so no distinct needed). Empty input → all-p sentinel
    * (every real min-hash is in [0, p), so p marks "no shingles" while
    * keeping later products bounded — `minhash_sigs` is a registered SQL
    * function, so empty arrays CAN reach it even though the dedup pipeline
    * guards on >=3 tokens). */
  def sigsOf(shingles: Iterator[String]): Array[Long] = {
    val mins = Array.fill(Params.length)(Prime)
    val as = Params.map(_._1).toArray
    val bs = Params.map(_._2).toArray
    while (shingles.hasNext) {
      val h = surrogate60(shingles.next()) % Prime
      var i = 0
      while (i < mins.length) {
        val v = (as(i) * h + bs(i)) % Prime
        if (v < mins(i)) mins(i) = v
        i += 1
      }
    }
    mins
  }
}

/** Codegen-integrated MinHash signatures: array<string> shingles →
  * array<long>(16) mins of the [[MinhashFamily]] — the NARROW form of the
  * signature stage. The SQL pipeline (explode → md5 per row → groupBy
  * doc_id with 16 min aggregates) shuffles every exploded shingle row just
  * to bring each doc's hashes back together; this expression computes the
  * same 16 mins inside the row's own projection, so signature generation
  * needs no exchange at all. md5 dominates the cost either way — the win
  * is the deleted shuffle, not the hashing. Equality with the aggregate
  * pipeline is spec-asserted over the whole corpus.
  */
case class MinhashSigs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(input: Any): Any =
    MinhashSigs.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinhashSigs.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSigs {

  /** Static entry point shared by eval and generated code. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val it = (0 until n).iterator.map(i => arr.getUTF8String(i).toString)
    new GenericArrayData(MinhashFamily.sigsOf(it))
  }

  @volatile private var registered = Set.empty[SparkSession]

  def register(spark: SparkSession): Unit = synchronized {
    if (!registered.contains(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "minhash_sigs", exprs => MinhashSigs(exprs.head), "scala_udf")
      registered += spark
    }
  }

  private[graft] def clearRegistry(): Unit = synchronized { registered = Set.empty }

  /** 16 min-hashes of a distinct-shingle array column. */
  def minhashSigs(spark: SparkSession, shingles: Column): Column = {
    register(spark)
    call_function("minhash_sigs", shingles.cast("array<string>"))
  }
}
