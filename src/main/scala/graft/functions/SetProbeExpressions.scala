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

  /** Number of array POSITIONS whose value is in the set (occurrences,
    * not distinct values — the substring-dedup n_dup_windows contract). */
  def hits(arr: ArrayData): Long = {
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (java.util.Arrays.binarySearch(sorted, arr.getLong(i)) >= 0) c += 1
      i += 1
    }
    c
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

/** Codegen'd `hits_in_long_set(array<long>): long` — occurrence count of
  * array elements present in the frozen kernel (the counting sibling of
  * [[OverlapsLongSet]]; same reference-object plumbing). */
case class HitsInLongSet(child: Expression, kernel: LongSetKernel)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "hits_in_long_set"

  override def nullSafeEval(input: Any): Any =
    kernel.hits(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("longSetKernel", kernel,
      classOf[LongSetKernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.hits($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Session registration + Column factory. The registered function NAME
  * carries a content fingerprint of the set, so two streams in one session
  * probing DIFFERENT frozen sets bind different names — a plan analyzed
  * (started, or restarted from checkpoint) after another kernel's
  * registration can never silently swap sets. Kernels are memoized per
  * (session, content fingerprint): identical content reuses ONE kernel and
  * one pair of registrations even from fresh array objects, and a
  * weak-keyed reference fast path lets a caller that re-invokes with the
  * same array object (e.g. per micro-batch) skip the defensive clone +
  * O(n log n) sort. Both maps hang off the session through a
  * `WeakHashMap`, so a stopped, dereferenced session releases its kernels
  * and their sets instead of pinning them for the JVM lifetime. */
object SetProbeExpressions {
  /** Per-session memo state. `fpByRef` is a weak IDENTITY map (arrays only
    * compare eq under `equals`, and WeakHashMap keys by equals), so cached
    * arrays stay collectable; `byFp` pins one kernel per distinct content,
    * which is exactly the set of live registered functions. */
  private final class SessionKernels {
    val fpByRef = new java.util.WeakHashMap[Array[Long], String]()
    var byFp = Map.empty[String, LongSetKernel]
  }
  private val sessions = new java.util.WeakHashMap[SparkSession, SessionKernels]()

  private[graft] def clearRegistry(): Unit = synchronized { sessions.clear() }

  /** Content fingerprint over the sorted, dedup'd set: MD5 of the
    * big-endian long stream (digested in bounded chunks — no
    * 8·|set|-byte buffer), hex, plus the length. Identical content from
    * two different array objects yields the same name and reuses the same
    * kernel; distinct content yields distinct names except under an MD5
    * collision — the multiplier-31 polynomial this replaced had trivially
    * constructible collisions ({x, y} vs {x+1, y−31}) that would silently
    * rebind a shared function name to the newer kernel. */
  private def contentFingerprint(sorted: Array[Long]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = java.nio.ByteBuffer.allocate(8 * 1024)
    var i = 0
    while (i < sorted.length) {
      buf.clear()
      val end = math.min(i + 1024, sorted.length)
      while (i < end) { buf.putLong(sorted(i)); i += 1 }
      md.update(buf.array(), 0, buf.position())
    }
    md.digest().map("%02x".format(_)).mkString + "_" + sorted.length
  }

  /** Register (or reuse) the kernel's two fingerprinted functions; returns
    * the fingerprint suffix both names share. */
  private def ensureRegistered(spark: SparkSession, set: Array[Long]): String =
    synchronized {
      val st = {
        val existing = sessions.get(spark)
        if (existing != null) existing
        else { val fresh = new SessionKernels; sessions.put(spark, fresh); fresh }
      }
      val cached = st.fpByRef.get(set)
      if (cached != null) cached
      else {
        val kernel = new LongSetKernel(set)
        val fp = contentFingerprint(kernel.sorted)
        if (!st.byFp.contains(fp)) {
          spark.sessionState.functionRegistry.createOrReplaceTempFunction(
            s"overlaps_long_set_$fp",
            exprs => OverlapsLongSet(exprs.head, kernel), "scala_udf")
          spark.sessionState.functionRegistry.createOrReplaceTempFunction(
            s"hits_in_long_set_$fp",
            exprs => HitsInLongSet(exprs.head, kernel), "scala_udf")
          st.byFp += fp -> kernel
        }
        st.fpByRef.put(set, fp)
        fp
      }
    }

  /** TRUE iff the array<long> column shares any element with the frozen
    * set — `arrays_overlap(arr, lit(set))` semantics at
    * O(|arr|·log|set|) per row instead of O(|set|). */
  def overlapsLongSet(spark: SparkSession, arr: Column, set: Array[Long]): Column =
    call_function(s"overlaps_long_set_${ensureRegistered(spark, set)}",
      arr.cast("array<long>"))

  /** Occurrence count of the array<long> column's elements in the frozen
    * set — `size(filter(arr, x -> array_contains(lit(set), x)))` semantics
    * at O(|arr|·log|set|) per row; the per-doc duplicated-window counter
    * of the streaming span-dedup twin. */
  def hitsInLongSet(spark: SparkSession, arr: Column, set: Array[Long]): Column =
    call_function(s"hits_in_long_set_${ensureRegistered(spark, set)}",
      arr.cast("array<long>"))
}
