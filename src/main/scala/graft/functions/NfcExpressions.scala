package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, StringType}

/** Unicode NFC normalization as a codegen expression — the text
  * canonicalization stage a multilingual ingest pipeline runs BEFORE any
  * content hashing: the same visible string can arrive precomposed
  * (U+00E9) or decomposed (U+0065 U+0301), and every byte-keyed stage
  * downstream (exact dedup, shingles, URL keys) silently treats them as
  * different documents. Both engines implement the same Unicode standard
  * (java.text.Normalizer here, utf8proc in DuckDB's `nfc_normalize`), so
  * normalized strings hash-match across engines — the oracle contract.
  *
  * The JDK call is the kernel; the fast path for the overwhelmingly
  * common already-NFC ASCII case is `Normalizer.isNormalized`, which is
  * O(n) with no allocation. One static-shaped call inside whole-stage
  * codegen, no encoder round-trip. */
object NfcKernel extends Serializable {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Codegen'd `nfc_native(text): string`. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_native"

  override def nullSafeEval(input: Any): Any =
    NfcKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.NfcKernel.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Session registration + Column factory (the WinnowExpressions pattern). */
object NfcExpressions {
  @volatile private var registered = Set.empty[SparkSession]

  def register(spark: SparkSession): Unit = synchronized {
    if (!registered.contains(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "nfc_native", exprs => NfcNormalize(exprs.head), "scala_udf")
      registered += spark
    }
  }

  private[graft] def clearRegistry(): Unit = synchronized { registered = Set.empty }

  /** NFC normalization of a string column. */
  def nfc(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("nfc_native", text.cast("string"))
  }
}
