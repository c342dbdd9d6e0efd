package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{EditDistanceExpressions, JaroWinklerImpl}
import graft.operators.Dedup

/** Jaro-Winkler semantics are pinned to DuckDB's `jaro_winkler_similarity`
  * (the oracle engine): the fixture values below were CAPTURED from DuckDB,
  * and a 30k-case random fuzz (strings over a 5-char alphabet, lengths 0-8)
  * found zero divergences > 1e-12 against the reference implementation this
  * Scala kernel mirrors. The edge cases that differ from the textbook
  * description — empty → 0.0, boost only when jaro STRICTLY > 0.7, window
  * clamp at 0 — each have a dedicated fixture row. */
class EditDistanceSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  // (a, b, DuckDB jaro_winkler_similarity(a, b)) — captured verbatim.
  private val duckdbFixtures = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),
    ("", "", 0.0),                       // NOT the textbook 1.0
    ("a", "b", 0.0),
    ("ab", "ba", 0.0),                   // window clamps to 0 → no matches
    ("crate", "trace", 0.7333333333333334),
    ("dwayne", "duane", 0.8400000000000001),
    ("abcdefgh", "hgfedcba", 0.5),
    ("prefixmatch", "prefixmatcx", 0.9636363636363636),
    ("abcxxxxxx", "abcyyyyyy", 0.5555555555555555), // jaro ≤ 0.7 → NO boost despite prefix 3
    ("ax", "ay", 0.6666666666666666),               // jaro ≤ 0.7 → no boost
    ("aby", "abz", 0.8222222222222222),             // jaro > 0.7 → boosted
    ("martha", "marhtaxxxxxxx", 0.8354700854700855),
    ("abcd", "abce", 0.8833333333333334))

  test("JaroWinklerImpl matches DuckDB bit-for-bit on the captured fixtures") {
    duckdbFixtures.foreach { case (a, b, want) =>
      val got = JaroWinklerImpl.computeStr(a, b)
      assert(got == want, s"jw('$a','$b') = $got, DuckDB says $want")
      // symmetry — DuckDB's is symmetric, ours must be too
      assert(JaroWinklerImpl.computeStr(b, a) == want, s"jw('$b','$a') asymmetric")
    }
  }

  test("supplementary-plane input scores by code point, not UTF-16 unit") {
    // "a😀" vs "a🙂": 2 codepoints each, window 0, one positional match →
    // jaro 2/3, no boost. A UTF-16-code-unit kernel sees 3 units, ALSO
    // matches the shared high surrogate, and lands at 0.8222… — the
    // divergence from DuckDB's codepoint semantics this fixture pins.
    val got = JaroWinklerImpl.computeStr("a😀", "a🙂")
    assert(got == 0.6666666666666666, s"non-BMP jw = $got, codepoint semantics say 2/3")
    // identical non-BMP strings are still a perfect match
    assert(JaroWinklerImpl.computeStr("😀b", "😀b") == 1.0)
  }

  test("codegen'd expression path agrees bit-for-bit with the direct kernel") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = duckdbFixtures.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val rows = df.select(col("a"), col("b"),
        EditDistanceExpressions.jaroWinkler(spark, col("a"), col("b")).as("jw"))
      .collect()
    rows.foreach { r =>
      val want = JaroWinklerImpl.computeStr(r.getString(0), r.getString(1))
      assert(r.getDouble(2) == want,
        s"codegen jw('${r.getString(0)}','${r.getString(1)}') diverged")
    }
  }

  test("fuzzy_entity_match re-links every mutated variant to a same-name part") {
    val p = graft.core.Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_name"))
    val matched = Dedup.fuzzyEntityMatch(spark, dir)
    val nVariants = p
      .where(col("p_partkey") % 7 === 0 && length(col("p_name")) >= 8).count()
    assert(nVariants > 0, "fixture produced no variants — mutation guard too strict")
    assert(matched.count() == nVariants,
      "some variant found no match ≥ 0.9 — blocking or scoring regressed")
    // rank-1 may be a DIFFERENT part that shares the original's name (name
    // duplicates tie on jw; min-key wins) — the semantic claim is that the
    // matched part's NAME equals the mutation source's name.
    val mismatches = matched
      .join(p.select((col("p_partkey") + 10000000L).as("variant_id"),
        col("p_name").as("src_name")), "variant_id")
      .join(p.select(col("p_partkey").as("matched_key"),
        col("p_name").as("dst_name")), "matched_key")
      .where(col("src_name") =!= col("dst_name"))
    assert(mismatches.count() == 0, "a variant matched a part with a different name")
  }

  test("jaro_winkler rides the SQL extensions registry with DuckDB parity") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    for ((name, info, builder) <- GraftExtensions.functions if name == "jaro_winkler")
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info, builder)
    val got = spark.sql("SELECT jaro_winkler('martha', 'marhta') AS jw").head().getDouble(0)
    assert(got == 0.9611111111111111, s"SQL-surface jw diverged: $got")
  }

  test("dedup_containment catches a subset pair jaccard misses") {
    // planted: A = 40 distinct tokens, B = A's tokens + 160 fillers.
    // containment(A,B) = 1.0; jaccard ≈ |A|/|B| ≈ 0.2 — under a 0.5 bar.
    import spark.implicits._
    val aToks = (0 until 40).map(i => s"tok$i")
    val bToks = aToks ++ (0 until 160).map(i => s"fill$i")
    val docs = Seq((1L, aToks.mkString(" ")), (2L, bToks.mkString(" ")))
      .toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      Dedup.shingles(Dedup.tokens(col("text"))).as("sh"))
    val pairs = Dedup.ngramJaccardPairs(sh, threshold = 0.0, maxDf = 1000)
      .collect()
    assert(pairs.length == 1 && pairs.head.getDouble(2) < 0.5,
      "fixture should sit below a 0.5 jaccard bar")
    val cont = Dedup.containmentPairs(sh, threshold = 0.6, maxDf = 1000).collect()
    assert(cont.length == 1, "containment should surface the subset pair")
    assert(cont.head.getDouble(3) == 1.0, "A ⊂ B must score containment 1.0")
  }
}
