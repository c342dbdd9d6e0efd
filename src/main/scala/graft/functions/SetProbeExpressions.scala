package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType}

/** A frozen long-key set as a per-row membership probe — the
  * "trained-model-as-literal" pattern done at the right complexity: the
  * set rides the plan ONCE as a sorted array reference object and each
  * row's probe is |arr|·log|set| binary searches.
  *
  * Why not `arrays_overlap(arr, lit(set))`: Spark's ArraysOverlap
  * iterates the LARGER side per row (it builds its hash set from the
  * smaller), so a big frozen set — a benchmark n-gram index is millions
  * of 60-bit surrogates once the eval suite has tens of thousands of
  * documents — costs O(|set|) per arriving row. Measured on the
  * streaming web-ingest path at 500k rows over a ~1M-gram set
  * (stream_web in StreamBench): 965 rows/s with the literal vs 16,236
  * with this kernel. Exact semantics are
  * IDENTICAL to arrays_overlap over non-null longs (spec-asserted), so
  * batch/stream bit-identity contracts are unchanged. */
final class LongSetKernel(set: Array[Long]) extends Serializable {
  /** defensive copy, dedup'd + sorted once at construction */
  val sorted: Array[Long] = {
    val s = set.clone()
    java.util.Arrays.sort(s)
    // in-place dedup of the sorted copy
    var w = 0
    var i = 0
    while (i < s.length) {
      if (w == 0 || s(w - 1) != s(i)) { s(w) = s(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(s, w)
  }

  def overlaps(arr: ArrayData): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (java.util.Arrays.binarySearch(sorted, arr.getLong(i)) >= 0) return true
      i += 1
    }
    false
  }
}

/** Codegen'd `overlaps_long_set(array<long>): boolean` over a frozen
  * kernel. The sorted set rides the plan as a reference object
  * (`ctx.addReferenceObj`) — one static-shaped call inside whole-stage
  * codegen, the set never serializes into the generated source. */
case class OverlapsLongSet(child: Expression, kernel: LongSetKernel)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "overlaps_long_set"

  override def nullSafeEval(input: Any): Any =
    kernel.overlaps(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("longSetKernel", kernel,
      classOf[LongSetKernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.overlaps($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Session registration + Column factory (the LangExpressions shape:
  * per-(session, kernel) createOrReplace — a running stream keeps its
  * already-bound kernel; new plans get the current one). */
object SetProbeExpressions {
  @volatile private var registered = Map.empty[SparkSession, LongSetKernel]

  private def register(spark: SparkSession, kernel: LongSetKernel): Unit = synchronized {
    if (!registered.get(spark).contains(kernel)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "overlaps_long_set", exprs => OverlapsLongSet(exprs.head, kernel), "scala_udf")
      registered += spark -> kernel
    }
  }

  private[graft] def clearRegistry(): Unit = synchronized { registered = Map.empty }

  /** TRUE iff the array<long> column shares any element with the frozen
    * set — `arrays_overlap(arr, lit(set))` semantics at
    * O(|arr|·log|set|) per row instead of O(|set|). */
  def overlapsLongSet(spark: SparkSession, arr: Column, set: Array[Long]): Column = {
    register(spark, new LongSetKernel(set))
    call_function("overlaps_long_set", arr.cast("array<long>"))
  }
}
