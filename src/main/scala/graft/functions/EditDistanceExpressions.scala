package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity, DuckDB-compatible: the fuzzy-match score
  * entity resolution blocks on after an exact blocking join. Semantics are
  * pinned to DuckDB's `jaro_winkler_similarity` (rapidfuzz lineage),
  * verified by a 30k-case random fuzz against DuckDB at build time of this
  * file's oracle queries:
  *
  *   - either side empty → 0.0 (NOT the textbook 1.0 for two empties);
  *   - match window = max(⌊max(l1,l2)/2⌋ − 1, 0);
  *   - transpositions = half the matched-but-out-of-order count;
  *   - Winkler prefix boost (common prefix ≤ 4, weight 0.1) applied only
  *     when jaro > 0.7.
  *
  * Spark ships `levenshtein` but no Jaro-Winkler; the higher-order-function
  * route can't express the two-pointer matching loop at all. The kernel is a
  * static Java-callable method so `doGenCode` stays inside whole-stage
  * codegen as a single static call — the same shape Spark's own
  * `levenshtein` uses (`UTF8String.levenshteinDistance`). Operates on
  * Unicode CODE POINTS (not UTF-16 code units), so supplementary-plane
  * input (emoji, rare CJK) matches DuckDB's codepoint semantics too, not
  * just the BMP.
  */
object JaroWinklerImpl {

  def compute(a: UTF8String, b: UTF8String): Double =
    computeStr(a.toString, b.toString)

  def computeStr(s1: String, s2: String): Double =
    computeCp(s1.codePoints().toArray, s2.codePoints().toArray)

  private def computeCp(s1: Array[Int], s2: Array[Int]): Double = {
    val j = jaro(s1, s2)
    if (j > 0.7) {
      var p = 0
      val pMax = math.min(4, math.min(s1.length, s2.length))
      while (p < pMax && s1(p) == s2(p)) p += 1
      j + p * 0.1 * (1.0 - j)
    } else j
  }

  private def jaro(s1: Array[Int], s2: Array[Int]): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
  }
}

/** Codegen'd binary expression: `jaro_winkler(a, b): double`. */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerImpl.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session registration + Column factory — the [[TextExpressions]] pattern
  * (FunctionRegistry + call_function, no private Spark API). */
object EditDistanceExpressions {
  @volatile private var registered = Set.empty[SparkSession]

  def register(spark: SparkSession): Unit = synchronized {
    if (!registered.contains(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "jaro_winkler",
        exprs => JaroWinkler(exprs(0), exprs(1)),
        "scala_udf")
      registered += spark
    }
  }

  /** Drop the registration memo (it strongly holds SparkSessions). */
  private[graft] def clearRegistry(): Unit = synchronized { registered = Set.empty }

  /** DuckDB-compatible Jaro-Winkler similarity of two string columns. */
  def jaroWinkler(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("jaro_winkler", a.cast("string"), b.cast("string"))
  }
}
