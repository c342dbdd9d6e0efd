package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{array, call_function, lit}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd count of whitespace-delimited tokens present in a small fixed
  * set — the text-path twin of [[VectorFold]]. Semantically identical to
  *
  * {{{ size(filter(split(lowered, "\\s+"), tk => array_contains(set, tk))) }}}
  *
  * but the higher-order-function form is CodegenFallback: every stopword /
  * language score pays an interpreted pass plus an array materialization per
  * row, and that is the hot loop of quality scoring and language ID on a
  * 100 TB corpus. Here the tokenizer is one fused scan (whitespace defined
  * exactly as Java regex `\s` = [ \t\n\f\r], matching `split`), with
  * set membership against a broadcast-small HashSet.
  *
  * The caller passes the ALREADY-lowercased text column so `lower`'s
  * codegen'd implementation stays authoritative. Equality with the composed
  * form is asserted over the whole documents table in NativeExpressionSpec.
  */
case class TokenSetCount(child: Expression, tokens: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_set_count"

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    tokens.foreach(s.add)
    s
  }

  /** Matches Java regex \s — the separator class `split` uses. */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override def nullSafeEval(input: Any): Any = {
    val str = input.asInstanceOf[UTF8String].toString
    var cnt = 0
    var i = 0
    val n = str.length
    while (i < n) {
      while (i < n && isWs(str.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(str.charAt(i))) i += 1
      if (i > start && set.contains(str.substring(start, i))) cnt += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("tokenSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val start = ctx.freshName("start")
      // isWs inlined twice; char class matches Java regex \s exactly
      def ws(expr: String) =
        s"($expr == ' ' || $expr == '\\t' || $expr == '\\n' || $expr == '\\u000B' || $expr == '\\f' || $expr == '\\r')"
      s"""
         |java.lang.String $str = $c.toString();
         |int $cnt = 0;
         |int $i = 0;
         |int $n = $str.length();
         |while ($i < $n) {
         |  while ($i < $n && ${ws(s"$str.charAt($i)")}) $i++;
         |  int $start = $i;
         |  while ($i < $n && !${ws(s"$str.charAt($i)")}) $i++;
         |  if ($i > $start && $setRef.contains($str.substring($start, $i))) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Session registration + Column factory (FunctionRegistry + call_function,
  * no private Spark API — same pattern as [[NativeVectorFunctions]]). The
  * token set rides in as a foldable array literal and is extracted at
  * function-build time. */
object TextExpressions {
  @volatile private var registered = Set.empty[SparkSession]

  def register(spark: SparkSession): Unit = synchronized {
    if (!registered.contains(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "token_set_count",
        exprs => {
          val arr = exprs(1)
          require(arr.foldable, "token_set_count: the token set must be a literal array")
          val tokens = arr.eval().asInstanceOf[ArrayData]
            .toObjectArray(StringType).map(_.toString).toSeq
          TokenSetCount(exprs.head, tokens)
        },
        "scala_udf")
      registered += spark
    }
  }

  /** Drop the registration memo (it strongly holds SparkSessions);
    * re-registration is idempotent, so clearing is always safe. */
  private[graft] def clearRegistry(): Unit = synchronized { registered = Set.empty }

  /** Count of `lowered`'s whitespace tokens that appear in `words`. */
  def tokenSetCount(spark: SparkSession, lowered: Column, words: Seq[String]): Column = {
    register(spark)
    call_function("token_set_count", lowered.cast("string"), array(words.map(lit): _*))
  }
}
