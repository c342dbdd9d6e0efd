package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, L2Squared, MinhashSigs, SimhashSig}

/** Config-driven injection of the engine's native expressions into every
  * session, for SQL-only users:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * spark.sql("SELECT l2sq_native(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * Code-first users get the same functions per-session through
  * [[graft.functions.NativeVectorFunctions.register]] (which the Column
  * factories call implicitly). Both paths register the identical builders,
  * so the SQL name and the Column DSL cannot drift apart.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  /** Arity-checked builder: a wrong-arity SQL call gets a clean error naming
    * the function and its signature, not an IndexOutOfBoundsException. */
  private def binary(name: String, f: (Expression, Expression) => Expression,
      sig: String = "array<float>, array<float>")
      : Seq[Expression] => Expression = { exprs =>
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"$name expects exactly 2 arguments ($sig); got ${exprs.length}")
    f(exprs(0), exprs(1))
  }

  private def unary(name: String, arg: String, f: Expression => Expression)
      : Seq[Expression] => Expression = { exprs =>
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"$name expects exactly 1 argument ($arg); got ${exprs.length}")
    f(exprs(0))
  }

  private[graft] val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("l2sq_native",
      new ExpressionInfo(classOf[L2Squared].getName, "l2sq_native"),
      binary("l2sq_native", L2Squared(_, _))),
    ("dot_native",
      new ExpressionInfo(classOf[DotProduct].getName, "dot_native"),
      binary("dot_native", DotProduct(_, _))),
    ("minhash_sigs",
      new ExpressionInfo(classOf[MinhashSigs].getName, "minhash_sigs"),
      unary("minhash_sigs", "array<string>", MinhashSigs(_))),
    ("simhash_sig",
      new ExpressionInfo(classOf[SimhashSig].getName, "simhash_sig"),
      unary("simhash_sig", "array<string>", SimhashSig(_))),
    ("winnow_fps",
      new ExpressionInfo(classOf[graft.functions.WinnowFingerprints].getName, "winnow_fps"),
      unary("winnow_fps", "string", graft.functions.WinnowFingerprints(_))),
    ("phash_native",
      new ExpressionInfo(classOf[graft.functions.PhashNative].getName, "phash_native"),
      unary("phash_native", "string", graft.functions.PhashNative(_))),
    ("nfc_native",
      new ExpressionInfo(classOf[graft.functions.NfcNormalize].getName, "nfc_native"),
      unary("nfc_native", "string", graft.functions.NfcNormalize(_))),
    ("jaro_winkler",
      new ExpressionInfo(classOf[graft.functions.JaroWinkler].getName, "jaro_winkler"),
      binary("jaro_winkler", graft.functions.JaroWinkler(_, _), "string, string")),
    ("zvalue_native",
      new ExpressionInfo(graft.functions.ZValueExpressions.getClass.getName, "zvalue_native"),
      { exprs =>
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"zvalue_native expects exactly 2 arguments (bigint, bigint); got ${exprs.length}")
        graft.functions.ZValueExpressions.zvalueExpr(exprs(0), exprs(1))
      }))
}
