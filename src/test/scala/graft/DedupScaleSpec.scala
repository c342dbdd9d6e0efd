package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Scale gate for the dedup path over `DedupScaleBench`'s synthetic corpus
  * (planted mutation chains + hot boilerplate): the pair join, capped
  * minhash, simhash chunk join, and forced-DISTRIBUTED fixpoint CC must all
  * complete at 4× the sf0.1 doc count and produce the planted structure.
  * Slow by suite standards (~30 s); the 10×/100× sweep lives in
  * `graft.DedupScaleBench` + BASELINE_REPRO.md. */
class DedupScaleSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("dedup path at 20k synthetic docs: planted chains collapse, boilerplate stays capped") {
    spark.sparkContext.setLogLevel("WARN")
    val n = 20000L
    val sh = DedupScaleBench.shingledOf(DedupScaleBench.syntheticDocs(spark, n))
      .repartition(4).cache()
    assert(sh.count() == n)

    // exact pair join: every 10-doc chain is one 45-pair clique-or-chain;
    // boilerplate-only pairs (true jaccard ~0.06) never reach the output
    val pairs = Dedup.ngramJaccardPairs(sh, threshold = 0.2, maxDf = 1000).cache()
    val nChains = n / 100
    assert(pairs.count() == nChains * 45,
      s"expected ${nChains * 45} chain pairs, got ${pairs.count()}")
    // hot-boilerplate shingles hit df = 0.2n = 4000 > maxDf and are cut:
    // no pair may join two docs from DIFFERENT chains
    val crossChain = pairs
      .where((col("id_a") / 100).cast("long") =!= (col("id_b") / 100).cast("long"))
      .count()
    assert(crossChain == 0, s"$crossChain cross-chain pairs — boilerplate leaked through the cutoff")

    // forced-distributed fixpoint CC: each chain collapses to its head
    val surv = Dedup.survivorsOf(spark, pairs, sh.select(col("doc_id")), driverCcMaxPairs = 0L)
      .cache()
    assert(surv.where(col("is_survivor") === 1).count() == n - nChains * 9)
    val badCanon = surv.where(col("doc_id") % 100 < 10 &&
      col("canonical_id") =!= (col("doc_id") / 100).cast("long") * 100).count()
    assert(badCanon == 0, s"$badCanon chain members not labeled with their chain head")

    // capped minhash + simhash complete and stay within the exact pair set
    val mh = Dedup.dedupMinhashFrame(spark, sh).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs.select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.nonEmpty && mh.subsetOf(exact), "minhash pairs must verify against true jaccard")
    val shPairs = Dedup.dedupSimhashFrame(spark, sh).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(shPairs.subsetOf(exact), "simhash near-exact pairs are a subset of the jaccard pairs")
    pairs.unpersist()
    surv.unpersist()
    sh.unpersist()
  }

  test("text path at 20k synthetic docs: shuffle-join LM, OOV, corpus-proportional boilerplate") {
    val n = 20000L
    val docs = DedupScaleBench.syntheticDocs(spark, n).repartition(4).cache()
    // shuffle-join LM model (50k vocab makes the count tables far beyond a
    // broadcast at real scale); scoring must cover every doc
    val lm = graft.operators.TextAnalysis.lmPerplexityOf(spark, docs, broadcastModel = false)
    assert(lm.count() == n)
    // every token appears ~n*100/50000 = 40 >= minCount -> zero OOV under a
    // floor of 10, all-OOV under an impossible floor: the vocab floor is
    // doing the work, not an accident of the corpus
    val oovLow = graft.operators.TextAnalysis.oovRateOf(spark, docs, minCount = 10)
    assert(oovLow.agg(sum(col("n_oov"))).head().getLong(0) == 0L)
    // boilerplate with cutoff n/10: ONLY the planted sentence is hot —
    // exactly the 20% of docs carrying it score > 0
    val bp = graft.operators.TextAnalysis.boilerplateScoreOf(spark, docs, dfCutoff = n / 10)
    val flagged = bp.where(col("n_boiler") > 0).count()
    assert(flagged == n / 5, s"expected ${n / 5} boilerplate docs, got $flagged")
    // substring-span dedup recovers the planted structure exactly: the
    // shared 14-token boiler sentence contributes >= 14-8+1 = 7 duplicated
    // windows to each carrier; chain members share their unrewritten body
    // windows; docs outside both structures are seeded-random over a 50k
    // vocab, where an 8-gram collision is (1/50000)^8-impossible -> their
    // dup count must be exactly zero
    val ss = Dedup.substringDedupOf(spark, docs, w = 8).cache()
    val boilerOnly = ss.where(col("doc_id") % 5 === 0 && col("doc_id") % 100 >= 10)
    assert(boilerOnly.where(col("n_dup_windows") < 7).count() == 0,
      "every non-chain boiler carrier shares the sentence's 7 windows")
    val unique = ss.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 100 >= 10)
    assert(unique.where(col("n_dup_windows") =!= 0).count() == 0,
      "random-body docs cannot share an 8-gram")
    ss.unpersist()
    // DSIR with a derived 25% en slice: weights exist for every doc and the
    // model join stays bucket-bounded (the count is the scale property;
    // separation is PipelineSpec's real-corpus assertion)
    val docsL = docs.withColumn("lang",
      when(col("doc_id") % 4 === 0, "en").otherwise("xx"))
    assert(graft.operators.CorpusPipeline.dsirWeightOf(spark, docsL, 1024, "en").count() == n)
    docs.unpersist()
  }

  test("frozen-probe size gate: over-limit collect fails loudly; dispatcher falls back row-identically") {
    // The duplicated-window index is corpus-proportional (boilerplate is
    // pervasive in web corpora), so its driver collect is the one
    // scale-killer-class collect in this module — it must be gated.
    // w=5 keeps this test's memo key disjoint from the w=8 production path.
    val dir = "/root/testdata/sf0.001"
    val w = 5
    val n = Dedup.duplicatedWindowIndex(spark, dir, w).count()
    assert(n >= 2, "fixture vacuous — no cross-doc duplicated windows at w=5")

    // (1) over-limit collect fails LOUDLY, naming the distributed alternative
    val e = intercept[IllegalArgumentException] {
      Dedup.duplicatedWindowSet(spark, dir, w, maxSize = 1)
    }
    assert(e.getMessage.contains("substringDedupFrozenJoinOf"),
      s"gate error must name the distributed alternative, got: ${e.getMessage}")

    // (2) the gated dispatcher under an impossible budget falls back to the
    // distributed join form — row-identical to the driver-probe form AND to
    // the original aggregate form
    def toMap(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_windows", "n_dup_windows", "dup_fraction").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val viaJoin = toMap(Dedup.substringDedupFrozen(spark, dir, w, maxSize = 1))
    val viaProbe = toMap(Dedup.substringDedupFrozen(spark, dir, w)) // fits: collected probe
    val batch = toMap(Dedup.substringDedup(spark, dir, w))
    assert(viaJoin.values.exists(_._2 > 0), "fixture vacuous — no doc has dup windows")
    assert(viaJoin == viaProbe,
      s"join-fallback drift vs probe on ${(viaJoin.toSet diff viaProbe.toSet).take(3)}")
    assert(viaProbe == batch,
      s"probe drift vs aggregate form on ${(viaProbe.toSet diff batch.toSet).take(3)}")
    // the under-limit call memoized the standing set with the full index
    assert(Dedup.duplicatedWindowSet(spark, dir, w).length == n)
  }
}
