package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.functions.{NativeVectorFunctions, VectorFunctions}

/** The codegen'd distance expressions must be BIT-IDENTICAL to the built-in
  * higher-order-function composition (same promote/combine/sum order) —
  * that contract is what keeps the DuckDB oracle valid after the swap-in. */
class NativeExpressionSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("l2sq_native is bit-identical to the aggregate(zip_with) composition") {
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.embeddings(spark, dir)
    val a = e.select(col("vec_id"), col("embedding").as("va"))
    val b = e.select(col("vec_id") + 250 as "vec_id", col("embedding").as("vb"))
    val joined = a.join(b, "vec_id")
    val diff = joined.select(
      VectorFunctions.l2sq(col("va"), col("vb")).as("composed"),
      NativeVectorFunctions.l2sqNative(spark, col("va"), col("vb")).as("native"))
      .where(col("composed") =!= col("native"))
    assert(diff.count() == 0, "native l2sq diverged from composed form")
  }

  test("dot_native is bit-identical to the composition") {
    val e = Tables.embeddings(spark, dir)
    val a = e.select(col("vec_id"), col("embedding").as("va"))
    val b = e.select(col("vec_id") + 100 as "vec_id", col("embedding").as("vb"))
    val diff = a.join(b, "vec_id").select(
      VectorFunctions.dot(col("va"), col("vb")).as("composed"),
      NativeVectorFunctions.dotNative(spark, col("va"), col("vb")).as("native"))
      .where(col("composed") =!= col("native"))
    assert(diff.count() == 0)
  }

  test("token_set_count matches the lambda composition on every document") {
    val docsDir = "/root/testdata/sf0.01"
    val words = graft.operators.TextAnalysis.StopwordsEn
    val t = split(lower(col("text")), "\\s+")
    val composed = size(filter(t, tk => array_contains(array(words.map(lit): _*), tk)))
    val diff = Tables.documents(spark, docsDir)
      .select(
        composed.as("composed"),
        graft.functions.TextExpressions.tokenSetCount(spark, lower(col("text")), words).as("native"))
      .where(col("composed") =!= col("native"))
    assert(diff.count() == 0, "token_set_count diverged from size(filter(...))")
    // whitespace edge cases, incl. the regex \s class and leading/trailing runs
    import spark.implicits._
    val edge = Seq("", " ", "the", " the\tthe\nof  a ", "x the", "THE the tHe")
      .toDF("text")
    val got = edge.select(
      graft.functions.TextExpressions.tokenSetCount(spark, lower(col("text")), words).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 0, 1, 4, 1, 3), s"got $got")
  }

  test("native expressions are callable from plain SQL after registration") {
    graft.functions.NativeVectorFunctions.register(spark)
    val d = spark.sql(
      "SELECT l2sq_native(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS d").head().getDouble(0)
    assert(d == 4.0)
    val ip = spark.sql(
      "SELECT dot_native(array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)), " +
        "array(CAST(4.0 AS FLOAT), CAST(5.0 AS FLOAT))) AS ip").head().getDouble(0)
    assert(ip == 23.0)
    // the config-driven path (spark.sql.extensions=graft.GraftExtensions)
    // injects the same builders; assert it wires up without error
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("native expression participates in whole-stage codegen") {
    val e = Tables.embeddings(spark, dir)
    val df = e.select(NativeVectorFunctions.l2sqNative(spark, col("embedding"), col("embedding")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // WholeStageCodegen spans print as "*(n)" in the executed plan
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"expected codegen in plan:\n$plan")
    // and the expression must NOT be a CodegenFallback
    assert(!graft.functions.L2Squared(null, null).isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback])
  }

  test("minhash_sigs expression stays codegen-compatible and matches the shared family") {
    import graft.functions.{MinhashFamily, MinhashSigs}
    assert(!MinhashSigs(null).isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback])
    import spark.implicits._
    val df = Seq((1L, Array("a b c", "b c d")), (2L, Array("x y z")))
      .toDF("doc_id", "sh")
      .select(col("doc_id"), MinhashSigs.minhashSigs(spark, col("sh")).as("sigs"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    assert(got(1L).sameElements(MinhashFamily.sigsOf(Iterator("a b c", "b c d"))))
    assert(got(2L).sameElements(MinhashFamily.sigsOf(Iterator("x y z"))))
    assert(got(1L).length == 16 && got(1L).forall(v => v >= 0 && v < MinhashFamily.Prime))
  }

  test("minhash of an empty shingle set is the all-Prime sentinel, not Long.MaxValue") {
    import graft.functions.{MinhashFamily, MinhashSigs}
    val s = MinhashFamily.sigsOf(Iterator.empty)
    assert(s.length == 16 && s.forall(_ == MinhashFamily.Prime),
      "empty input must yield the documented in-bound sentinel")
    // the registered SQL function can receive empty arrays from any caller
    import spark.implicits._
    val viaSql = Seq((1L, Array.empty[String])).toDF("doc_id", "sh")
      .select(MinhashSigs.minhashSigs(spark, col("sh")).as("sigs"))
      .collect().head.getSeq[Long](0)
    assert(viaSql.forall(_ == MinhashFamily.Prime))
  }

  test("simhash_sig expression is codegen-compatible, bit-identical to the SQL aggregate form") {
    import graft.functions.{SimhashFamily, SimhashSig}
    assert(!SimhashSig(null).isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback])
    // the narrow expression must reproduce the portable aggregate pipeline
    // (the arithmetic the DuckDB oracle runs) on the whole sf0.01 corpus
    val d = "/root/testdata/sf0.01"
    val narrow = graft.operators.Dedup.simhashSignatures(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = graft.operators.Dedup.simhashSignaturesAgg(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(narrow.nonEmpty && narrow == agg,
      "narrow simhash_sig must be bit-identical to the aggregate pipeline")
    // 64-bit signatures use the full long range incl. the sign bit; what
    // matters is spread — distinct signatures per distinct doc (no 16-bit
    // birthday collapse)
    assert(SimhashFamily.Bits == 64)
    assert(narrow.values.toSet.size > narrow.size * 9 / 10,
      "64-bit signatures must not collide across non-duplicate docs")
    assert(SimhashFamily.sigOf(Iterator.empty) == 0L, "empty set: no positive bit")
  }

  test("simhash_sig skips null array elements (matches SQL aggregate null-skip, no NPE)") {
    import graft.functions.SimhashSig
    import spark.implicits._
    val withNull = Seq((1L, Seq(Some("alpha"), None, Some("beta"))))
      .toDF("doc_id", "shingles")
    val without = Seq((1L, Seq("alpha", "beta"))).toDF("doc_id", "shingles")
    val a = withNull.select(SimhashSig.simhashSig(spark, col("shingles"))).head().getLong(0)
    val b = without.select(SimhashSig.simhashSig(spark, col("shingles"))).head().getLong(0)
    assert(a == b, "null shingles must be ignored, not NPE or perturb the signature")
  }

  test("nfc_native composes decomposed forms, is idempotent, and fixture pairs resolve") {
    import spark.implicits._
    // (input, expected-NFC) pairs: Latin combining marks, Hangul jamo
    // (algorithmic composition), non-BMP base + combining, already-NFC,
    // empty — the Unicode edge set
    val cases = Seq(
      ("e\u0301", "\u00e9"),
      ("o\u0308", "\u00f6"),
      ("\u1100\u1161\u11a8", "\uac01"),
      ("caf\u00e9 page 7", "caf\u00e9 page 7"),
      ("\ud83d\ude00e\u0301", "\ud83d\ude00\u00e9"),
      ("", ""))
    val got = cases.map(_._1).toDF("s")
      .select(graft.functions.NfcExpressions.nfc(spark, col("s")))
      .collect().map(_.getString(0))
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"nfc('${in.codePoints.toArray.mkString("+")}') wrong")
      // idempotence: normalizing the output is a no-op
      assert(java.text.Normalizer.isNormalized(g, java.text.Normalizer.Form.NFC))
    }
    // the registered query's structural invariant: every odd doc is the
    // decomposed twin of doc-1 (changed, dup_of = even twin), evens clean
    val rows = graft.operators.TextAnalysis.nfcDedup(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))
    rows.foreach { case (id, rawLen, nfcLen, changed, dupOf) =>
      if (id % 2 == 0) { assert(changed == 0 && dupOf == id && rawLen == nfcLen) }
      else { assert(changed == 1 && dupOf == id - 1 && rawLen > nfcLen) }
    }
  }

  test("extension SQL builders reject wrong arity with an error naming the function") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    for ((name, _, builder) <- GraftExtensions.functions) {
      // 3 args is wrong for every registered function (unary and binary)
      val e = intercept[IllegalArgumentException](
        builder(Seq(Literal(1), Literal(2), Literal(3))))
      assert(e.getMessage.contains(name), s"error must name $name: ${e.getMessage}")
      assert(e.getMessage.contains("argument"))
    }
  }

  test("zvalue_native SQL matches the Column-level Morton interleave bit-for-bit") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    for ((name, info, builder) <- GraftExtensions.functions if name == "zvalue_native")
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info, builder)
    // known value: x=3 plants bits {0,2} -> 5; y=5 plants bits {1,5} -> 34
    assert(spark.sql("SELECT zvalue_native(3L, 5L)").head().getLong(0) == 39L)
    // SQL surface vs the layout operator's Column composition over real keys
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_partkey") % 65536, col("l_suppkey") % 65536)
      .toDF("x", "y").limit(500)
    val both = li.select(
      graft.operators.Formats.zValue(col("x"), col("y")).as("zc"),
      org.apache.spark.sql.functions.expr("zvalue_native(x, y)").as("zs")).collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"Column ${r.getLong(0)} != SQL ${r.getLong(1)}"))
  }

  test("overlaps_long_set agrees with arrays_overlap on every doc, incl. empty arrays") {
    spark.sparkContext.setLogLevel("WARN")
    // real surrogate arrays + the real benchmark gram set — the exact
    // frozen-probe deployment shape of streamingWebIngest
    val grams = graft.operators.CorpusPipeline.benchmarkNgramIndex(spark, dir)
      .collect().map(_.getLong(0))
    assert(grams.nonEmpty)
    val surro = graft.operators.CorpusPipeline.ngramSurrogates(
      graft.operators.Dedup.tokens(col("text")), graft.operators.CorpusPipeline.DecontamN)
    val both = Tables.documents(spark, dir)
      .select(
        graft.functions.SetProbeExpressions.overlapsLongSet(spark, surro, grams).as("kernel"),
        arrays_overlap(surro, typedlit(grams)).as("builtin"))
      .collect()
    assert(both.nonEmpty)
    assert(both.exists(_.getBoolean(1)), "fixture vacuous — no overlap anywhere")
    assert(both.exists(!_.getBoolean(1)), "fixture vacuous — everything overlaps")
    both.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1),
      s"kernel ${r.getBoolean(0)} != arrays_overlap ${r.getBoolean(1)}"))
    // short docs produce EMPTY surrogate arrays -> must be false, not null/true
    val empty = spark.sql("SELECT 1").select(
      graft.functions.SetProbeExpressions.overlapsLongSet(
        spark, typedlit(Array.empty[Long]), grams).as("k")).head()
    assert(!empty.getBoolean(0))
    // the counting sibling: occurrence count (repeats counted per position)
    val hitBoth = Tables.documents(spark, dir)
      .select(
        graft.functions.SetProbeExpressions.hitsInLongSet(spark, surro, grams).as("kernel"),
        size(filter(surro, x => array_contains(typedlit(grams), x))).as("builtin"))
      .collect()
    assert(hitBoth.exists(_.getInt(1) > 0), "fixture vacuous — zero hits everywhere")
    hitBoth.foreach(r => assert(r.getLong(0) == r.getInt(1).toLong,
      s"hits kernel ${r.getLong(0)} != filter-count ${r.getInt(1)}"))
  }

  test("two frozen sets in one session bind independent kernels (no silent swap)") {
    // the round-13 advice finding: one session-wide function name rebound to
    // the latest kernel meant a plan analyzed after another registration
    // silently probed the WRONG set. Names now carry a content fingerprint;
    // both columns must answer from their OWN set even when built
    // interleaved and evaluated in one plan.
    val setA = Array(10L, 20L, 30L)
    val setB = Array(40L, 50L, 60L)
    val colA = graft.functions.SetProbeExpressions.overlapsLongSet(
      spark, typedlit(Array(10L, 99L)), setA)
    val colB = graft.functions.SetProbeExpressions.overlapsLongSet(
      spark, typedlit(Array(10L, 99L)), setB)
    val r = spark.sql("SELECT 1").select(colA.as("a"), colB.as("b")).head()
    assert(r.getBoolean(0), "kernel A must see 10 in its own set")
    assert(!r.getBoolean(1), "kernel B must NOT see 10 — it bound A's set (the swap bug)")
    // same content from a DIFFERENT array object resolves to the same
    // fingerprinted name and identical semantics
    val colA2 = graft.functions.SetProbeExpressions.overlapsLongSet(
      spark, typedlit(Array(10L, 99L)), Array(10L, 20L, 30L))
    assert(spark.sql("SELECT 1").select(colA2.as("a")).head().getBoolean(0))
  }

  test("identical frozen-set content from fresh array objects reuses ONE registered kernel") {
    // the round-14 advice finding: the memo keyed by array REFERENCE meant
    // every fresh array object (even identical content) accumulated a
    // kernel + registration for the JVM lifetime. Content-keyed now: the
    // fingerprint is computed over the sorted dedup'd set, so permuted /
    // repeated spellings of the same set are the same kernel.
    val reg = spark.sessionState.functionRegistry
    def probeNames = reg.listFunction().map(_.funcName)
      .filter(_.startsWith("hits_in_long_set_")).toSet
    val before = probeNames
    graft.functions.SetProbeExpressions.hitsInLongSet(
      spark, typedlit(Array(7L)), Array(7L, 11L, 13L))
    graft.functions.SetProbeExpressions.hitsInLongSet(
      spark, typedlit(Array(7L)), Array(13L, 7L, 11L, 7L)) // permuted + repeated
    val added = probeNames -- before
    assert(added.size == 1,
      s"identical content must bind exactly one new kernel name, got $added")
    // distinct content still binds a distinct name (no fingerprint merge)
    graft.functions.SetProbeExpressions.hitsInLongSet(
      spark, typedlit(Array(7L)), Array(7L, 11L, 14L))
    assert((probeNames -- before).size == 2)
  }

  test("minhash_sigs and simhash_sig are callable through the extensions registry") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    for ((name, info, builder) <- GraftExtensions.functions
         if name == "minhash_sigs" || name == "simhash_sig") {
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info, builder)
    }
    val r = spark.sql(
      "SELECT simhash_sig(array('alpha','beta')) AS sh, minhash_sigs(array('alpha','beta')) AS mh")
      .head()
    assert(r.getLong(0) == graft.functions.SimhashFamily.sigOf(Iterator("alpha", "beta")))
    assert(r.getSeq[Long](1).length == 16)
  }
}
