package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd distance kernels — the engine's answer to the reference's
  * one hot loop, ComputeDistance (vamana.h:694-702; auto-vectorized there by
  * -O3, CMakeLists.txt:5). Here the same loop is emitted into whole-stage
  * codegen via doGenCode, so the JIT sees a tight primitive float loop with
  * no per-element Catalyst expression dispatch — ~10x over the interpreted
  * `aggregate(zip_with(...))` composition on cross-join workloads.
  *
  * SEMANTICS CONTRACT: bit-identical to [[VectorFunctions.l2sq]]/
  * [[VectorFunctions.dot]] — promote float32→double exactly, combine, then
  * sequential left-to-right sum. That is what keeps the DuckDB oracle
  * comparisons valid after the swap-in (asserted in NativeExpressionSpec).
  */
abstract class VectorFold extends BinaryExpression {
  // no ExpectsInputTypes (AbstractDataType is private[sql] in Spark 4):
  // the Column factories below cast both sides to array<float> explicitly.
  override def dataType: DataType = DoubleType

  protected def combineJava(a: String, b: String): String
  protected def combineScala(a: Double, b: Double): Double

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += combineScala(x.getFloat(i).toDouble, y.getFloat(i).toDouble)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double va = (double) $a.getFloat($i);
         |  double vb = (double) $b.getFloat($i);
         |  $s += ${combineJava("va", "vb")};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
}

/** Σ (aᵢ−bᵢ)² over two array<float> columns. */
case class L2Squared(left: Expression, right: Expression) extends VectorFold {
  override protected def combineJava(a: String, b: String): String = s"($a - $b) * ($a - $b)"
  override protected def combineScala(a: Double, b: Double): Double = (a - b) * (a - b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "l2sq_native"
}

/** Σ aᵢ·bᵢ over two array<float> columns. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override protected def combineJava(a: String, b: String): String = s"$a * $b"
  override protected def combineScala(a: Double, b: Double): Double = a * b
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "dot_native"
}

/** Σ (aᵢ−bᵢ)² over two array<bigint> columns, in EXACT long arithmetic —
  * the distance kernel of the integer-quantized k-means ([[graft.operators
  * .Clustering]]). Integer math is what makes the fixpoint bit-identical
  * across engines and partitionings (the same reason the pagerank loop is
  * integer): no float summation order to disagree on. Magnitude contract:
  * callers quantize coordinates so that dim · maxDiff² < 2⁶³ (1e6-scaled
  * unit-range embeddings at dim 64 peak near 8·10¹³). */
case class L2SquaredLong(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "l2sq_long_native"
}

/** Session registration + Column factories (the public surface). Uses the
  * FunctionRegistry + call_function so no private Spark API is touched. */
object NativeVectorFunctions {
  @volatile private var registered = Set.empty[SparkSession]

  def register(spark: SparkSession): Unit = synchronized {
    if (!registered.contains(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "l2sq_native", exprs => L2Squared(exprs.head, exprs(1)), "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "dot_native", exprs => DotProduct(exprs.head, exprs(1)), "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "l2sq_long_native", exprs => L2SquaredLong(exprs.head, exprs(1)), "scala_udf")
      registered += spark
    }
  }

  /** Drop the registration memo (it strongly holds SparkSessions);
    * re-registration is idempotent, so clearing is always safe. */
  private[graft] def clearRegistry(): Unit = synchronized { registered = Set.empty }

  /** Codegen'd squared L2; falls back to the session-registered function. */
  def l2sqNative(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("l2sq_native", a.cast("array<float>"), b.cast("array<float>"))
  }

  def dotNative(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("dot_native", a.cast("array<float>"), b.cast("array<float>"))
  }

  /** Codegen'd exact-long squared L2 over array<bigint> columns. */
  def l2sqLongNative(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("l2sq_long_native", a.cast("array<bigint>"), b.cast("array<bigint>"))
  }

  def normNative(spark: SparkSession, a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotNative(spark, a, a))
}
