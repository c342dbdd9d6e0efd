package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Learned-sparse retrieval (the SPLADE / uniCOIL / DeepImpact serving
  * class): documents are encoded as PRUNED sparse term-impact vectors, the
  * index is the posting-list layout of those impacts, and serving is an
  * inverted-index dot product — the third retrieval modality next to the
  * lexical BM25 leg ([[TextAnalysis.bm25Retrieval]]) and the dense ANN leg
  * (Similarity / vamana). A real learned-sparse encoder scores terms with a
  * masked-LM head; this engine's encoder is the deterministic surrogate
  * `impact = (1 + ln(tf)) · ln((N+1)/(df+1))` over the SAME whitespace
  * tokenization as the BM25 leg ([[TextAnalysis.toks]]) — the Spark-side
  * plumbing (encode → prune → index → serve → prune-the-server) is the real
  * design; the scoring head is swappable arithmetic.
  *
  * Scale shape (the reason sparse serving survives 100 TB):
  *  - document-side pruning (top-`m` impacts per doc, `r <= m` over a
  *    doc-keyed window) bounds the index to m·N postings REGARDLESS of
  *    document length — the index size is a design constant, not a corpus
  *    property;
  *  - every window here is KEYED (doc_id for pruning, term for champion
  *    lists) — hash-partitioned shuffles, never a global sort;
  *  - the query side is a literal-bounded dictionary frame joined
  *    broadcast, so serving never shuffles the corpus: the only corpus-wide
  *    work is the posting-list equi-join, and champion lists
  *    ([[sparseChampionGate]]) bound even that to c rows per query term —
  *    the classic index-elimination trade priced honestly as overlap@k;
  *  - all scoring is integer-statistics arithmetic rounded to 6 dp and
  *    summed as DECIMAL(18,6) (the bm25/lm_perplexity determinism
  *    contract), so ranks are bit-identical across engines and
  *    partitionings.
  */
object SparseRetrieval {

  /** Document-side pruning width: keep the top-m impacts per document. */
  val PruneM = 8

  /** Champion-list widths priced by [[sparseChampionGate]] — a small
    * curve, not one point, because the right c is a corpus property (this
    * engine's synthetic corpus has a 31-term uniform vocabulary, the
    * worst case for index elimination: no rare terms → no free
    * truncation, so the cheap end is honestly lossy here). */
  val ChampionCs = Seq(10, 50, 120)

  /** Pruned posting frame (doc_id, term, w, r) memoized + persisted per
    * (session, dir) — encode/stats/topk/champion all fold it, and its base
    * (the per-doc term counts) is the SAME memoized frame the BM25 leg
    * scans, so adding the sparse modality costs zero extra corpus passes.
    * Cleared by [[clearCaches]]. */
  private val postingsCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  /** One-row (nd) corpus-size frame — crossJoin-broadcast like bm25's. */
  private def docCount(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.lexDocLens(spark, dir)
      .agg(count(lit(1)).cast("double").as("nd"))

  /** THE document impact expression — the one scoring head both the
    * dir-memoized path and the generic/scale path share so the encoder
    * cannot fork. */
  private[graft] def impactOf(c: org.apache.spark.sql.Column,
      nd: org.apache.spark.sql.Column, df: org.apache.spark.sql.Column) =
    round((lit(1.0) + log(c)) * log((nd + 1.0) / (df + 1.0)), 6)

  /** The query-side weight head (query tf = 1 → idf only). */
  private[graft] def queryWeightOf(nd: org.apache.spark.sql.Column,
      df: org.apache.spark.sql.Column) =
    round(log((nd + 1.0) / (coalesce(df, lit(0L)) + 1.0)), 6)

  /** Generic per-(doc, term) counts of an arbitrary docs frame — the
    * scale-bench entry point; the registry path reuses the BM25 leg's
    * memoized frame instead. */
  private[graft] def termCountsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(TextAnalysis.toks(col("text"))).as("term"))
      .where(col("term") =!= "")
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))

  /** Generic positive-impact postings from a term-count frame. */
  private[graft] def fullPostingsOf(tc: DataFrame): DataFrame = {
    val dfs = tc.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = tc.select(col("doc_id")).distinct()
      .agg(count(lit(1)).cast("double").as("nd"))
    tc.join(dfs, Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"),
        impactOf(col("c"), col("nd"), col("df")).as("w"))
      .where(col("w") > 0)
  }

  /** Generic document-side pruning: top-m per doc by (w desc, term asc),
    * rank exposed as `r`. */
  private[graft] def prunedPostingsOf(full: DataFrame, m: Int): DataFrame = {
    val win = Window.partitionBy(col("doc_id"))
      .orderBy(col("w").desc, col("term").asc)
    full.withColumn("r", row_number().over(win)).where(col("r") <= m)
  }

  /** All positive-impact postings (doc_id, term, w) BEFORE document-side
    * pruning — the "full" side of the stats/mass accounting. */
  private def fullPostings(spark: SparkSession, dir: String): DataFrame = {
    val tc = TextAnalysis.lexTermCounts(spark, dir)
    val dfs = TextAnalysis.lexTermDfs(spark, dir)
    tc.join(dfs, Seq("term"))
      .crossJoin(broadcast(docCount(spark, dir)))
      .select(col("doc_id"), col("term"),
        impactOf(col("c"), col("nd"), col("df")).as("w"))
      .where(col("w") > 0)
  }

  /** The pruned index: per doc, the top-[[PruneM]] impacts by
    * (w desc, term asc) — rank exposed as `r` so the encode query can show
    * the kept order. */
  private[graft] def prunedPostings(spark: SparkSession, dir: String): DataFrame =
    postingsCache.getOrElseUpdate((spark, dir),
      prunedPostingsOf(fullPostings(spark, dir), PruneM).persist())

  /** Query-side term weights for the standing literal query set:
    * wq = ln((N+1)/(df+1)) — the idf head of the document impact (query
    * terms appear once, so the tf factor is 1). A ≤|q|-row frame however
    * large the vocabulary: always broadcastable. */
  private def queryWeights(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qt = TextAnalysis.Bm25Queries
      .flatMap { case (q, ts) => ts.map(t => (q, t)) }.toDF("qid", "term")
    qt.join(TextAnalysis.lexTermDfs(spark, dir), Seq("term"), "left_outer")
      .crossJoin(broadcast(docCount(spark, dir)))
      .select(col("qid"), col("term"),
        queryWeightOf(col("nd"), col("df")).as("wq"))
  }

  /** Generic query weights for an arbitrary corpus — the scale-bench
    * twin of [[queryWeights]], same weight head. */
  private[graft] def queryWeightsOf(spark: SparkSession,
      queries: Seq[(Long, Seq[String])], tc: DataFrame): DataFrame = {
    import spark.implicits._
    val qt = queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }.toDF("qid", "term")
    val dfs = tc.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = tc.select(col("doc_id")).distinct()
      .agg(count(lit(1)).cast("double").as("nd"))
    qt.join(dfs, Seq("term"), "left_outer")
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("term"),
        queryWeightOf(col("nd"), col("df")).as("wq"))
  }

  /** The encoded index itself: (doc_id, rank, term, w) — every kept
    * posting in kept order. The user-facing "what does my sparse encoder
    * emit for this doc" surface. */
  def sparseEncode(spark: SparkSession, dir: String): DataFrame =
    prunedPostings(spark, dir)
      .select(col("doc_id"), col("r").cast("long").as("rank"),
        col("term"), col("w"))
      .orderBy(col("doc_id"), col("rank"))

  /** Index-size observables — the capacity-planning row a 100 TB
    * deployment reads before sizing the serving tier: how many postings
    * the pruning kept, over how many terms, carrying what fraction of the
    * total impact mass, with how long a worst-case posting list. */
  def sparseIndexStats(spark: SparkSession, dir: String): DataFrame = {
    val full = fullPostings(spark, dir)
    val pruned = prunedPostings(spark, dir)
    val fullAgg = full.agg(
      count(lit(1)).as("postings_full"),
      countDistinct(col("term")).as("vocab_full"),
      sum(col("w").cast("decimal(18,6)")).cast("double").as("mass_full"))
    val prunedAgg = pruned.agg(
      count(lit(1)).as("postings_kept"),
      countDistinct(col("doc_id")).as("n_docs"),
      countDistinct(col("term")).as("vocab_kept"),
      sum(col("w").cast("decimal(18,6)")).cast("double").as("mass_kept_sum"))
    val maxList = pruned.groupBy(col("term")).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("max_list_kept"))
    prunedAgg.crossJoin(broadcast(fullAgg)).crossJoin(broadcast(maxList))
      .select(col("n_docs"), col("vocab_full"), col("vocab_kept"),
        col("postings_full"), col("postings_kept"),
        round(col("mass_kept_sum") / col("mass_full"), 4).as("mass_kept"),
        col("max_list_kept"))
  }

  /** Inverted-index top-k dot product over the pruned index — exact sparse
    * serving. Contributions round to 6 dp and sum as DECIMAL(18,6); ranks
    * ride the bounded [[graft.functions.TopKAggregator]] heap (k rows per
    * partition per query cross the shuffle, never a corpus-wide window). */
  def sparseTopk(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    topkOver(spark, prunedPostings(spark, dir), queryWeights(spark, dir), k)

  private[graft] def topkOver(spark: SparkSession, postings: DataFrame,
      qw: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    import graft.functions.{Scored, TopKAggregator}
    postings.join(broadcast(qw), Seq("term"))
      .select(col("qid"), col("doc_id"),
        round(col("wq") * col("w"), 6).cast("decimal(18,6)").as("contrib"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("contrib")).as("s"))
      .select(col("qid"), (-round(col("s"), 4).cast("double")).as("dist"),
        col("doc_id").as("id"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, dist, id) => Scored(dist, id) }
      .agg(new TopKAggregator(k).toColumn.name("topk"))
      .toDF("qid", "topk")
      .select(col("qid"), posexplode(col("topk")).as(Seq("r", "s")))
      .select(col("qid"), (col("r") + 1).cast("long").as("rank"),
        col("s.id").as("doc_id"), (-col("s.dist")).as("score"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Champion-list serving priced against exact, as a CURVE: for each c in
    * [[ChampionCs]], keep only the top-c postings per term (w desc,
    * doc_id asc — the index-elimination trade every sparse server at scale
    * makes), run the SAME top-5, and report per (qid, c) the top-5 overlap
    * with exact plus the postings each side touched. The overlap is
    * measured, not asserted — on some corpora champion lists are lossless,
    * on others they trade recall for the bounded join; the honest curve is
    * the point (here: a uniform tiny vocabulary makes the cheap end lossy
    * and the 86 %-work end exact). Every column is deterministic integer
    * arithmetic → fully DuckDB-oracled. */
  def sparseChampionGate(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    val pruned = prunedPostings(spark, dir)
    val qw = queryWeights(spark, dir)
    val champWin = Window.partitionBy(col("term"))
      .orderBy(col("w").desc, col("doc_id").asc)
    val ranked = pruned.select(col("doc_id"), col("term"), col("w"))
      .withColumn("rc", row_number().over(champWin))
    def touched(postings: DataFrame, name: String): DataFrame =
      postings.join(broadcast(qw), Seq("term"))
        .groupBy(col("qid")).agg(count(lit(1)).as(name))
    val exact = sparseTopk(spark, dir, k).select(col("qid"), col("doc_id"))
    val qids = TextAnalysis.Bm25Queries.map(_._1).toDF("qid")
    val fullTouched = touched(pruned, "tf")
    ChampionCs.map { c =>
      val champions = ranked.where(col("rc") <= c)
      val approx = topkOver(spark, champions, qw, k).select(col("qid"), col("doc_id"))
      val overlap = exact.join(approx, Seq("qid", "doc_id"))
        .groupBy(col("qid")).agg(count(lit(1)).as("ov"))
      qids
        .join(overlap, Seq("qid"), "left_outer")
        .join(fullTouched, Seq("qid"), "left_outer")
        .join(touched(champions, "tc"), Seq("qid"), "left_outer")
        .select(col("qid"), lit(c.toLong).as("c"),
          coalesce(col("ov"), lit(0L)).as("overlap"),
          coalesce(col("tf"), lit(0L)).as("touched_full"),
          coalesce(col("tc"), lit(0L)).as("touched_champion"))
    }.reduce(_ unionAll _)
      .orderBy(col("qid"), col("c"))
  }

  /** Sparse query-by-example scored frame: the query doc's OWN pruned
    * impact vector (its top-m encode) against the pruned index — the
    * learned-sparse analogue of "embed the query with the same encoder".
    * Self-hit excluded; (qid, dist = −score, id) for the shared heap. */
  private def sparseQbeScored(spark: SparkSession, dir: String,
      nQueries: Int): DataFrame = {
    val pruned = prunedPostings(spark, dir)
    val qsp = pruned.where(col("doc_id") < nQueries)
      .select(col("doc_id").as("qid"), col("term"), col("w").as("wq"))
    pruned.join(broadcast(qsp), Seq("term"))
      .where(col("doc_id") =!= col("qid"))
      .select(col("qid"), col("doc_id"),
        round(col("wq") * col("w"), 6).cast("decimal(18,6)").as("contrib"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("contrib")).as("s"))
      .select(col("qid"), (-round(col("s"), 4).cast("double")).as("dist"),
        col("doc_id").as("id"))
  }

  /** Tri-modal reciprocal-rank fusion — the full retrieval-stack combiner
    * over all three modalities this engine serves: the lexical BM25 leg,
    * the dense cosine leg (both the hybrid_retrieval legs, same shared
    * code), and the learned-sparse leg (query-by-example over the pruned
    * inverted index). Each leg ends in the bounded TopK heap; the fusion
    * is rrf = Σ_legs 1/(60 + rank) with each term rounded to 6 dp and the
    * sum carried as DECIMAL(18,6) (exact, order-free — a three-way double
    * sum would be association-sensitive across engines); final ranks
    * break ties by doc_id. The fused frame is ≤ 3k rows per query by
    * construction — the only corpus-scale work is the three legs
    * themselves, each already scale-shaped. */
  def trimodalFusion(spark: SparkSession, dir: String, nQueries: Int = 5,
      k: Int = 10, kRrf: Int = 60): DataFrame = {
    val lex = TextAnalysis.rankHeapTopK(
      TextAnalysis.lexScores(spark, dir, nQueries)
        .select(col("qid"), col("dist"), col("id")), k, "lex_rank")
    val vec = TextAnalysis.rankHeapTopK(
      TextAnalysis.vecCosineScored(spark, dir, nQueries), k, "vec_rank")
    val sp = TextAnalysis.rankHeapTopK(
      sparseQbeScored(spark, dir, nQueries), k, "sparse_rank")
    def term(c: org.apache.spark.sql.Column) =
      coalesce(round(lit(1.0) / (lit(kRrf) + c), 6), lit(0.0)).cast("decimal(18,6)")
    val fused = lex
      .join(vec, Seq("qid", "doc_id"), "full_outer")
      .join(sp, Seq("qid", "doc_id"), "full_outer")
      .select(col("qid"), col("doc_id"),
        coalesce(col("lex_rank"), lit(-1L)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(-1L)).as("vec_rank"),
        coalesce(col("sparse_rank"), lit(-1L)).as("sparse_rank"),
        (term(col("lex_rank")) + term(col("vec_rank")) + term(col("sparse_rank")))
          .as("rrfd"))
    val w = Window.partitionBy(col("qid")).orderBy(col("rrfd").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc_id"),
        col("rrfd").cast("double").as("rrf"),
        col("lex_rank"), col("vec_rank"), col("sparse_rank"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Frozen encoder model for the streaming ingest twin: corpus size plus
    * the term → df dictionary. The dictionary is MODEL-vocabulary-sized by
    * design — a learned-sparse head scores a fixed vocab (SPLADE: the 30k
    * BERT wordpieces), not the corpus's open vocabulary — so shipping it
    * to executors as plan literals is the deployment shape, and the
    * driver-side collect is bounded by the model, never the corpus (the
    * guard refuses anything else). */
  case class SparseModel(nd: Double, dfs: Map[String, Long])

  def fitSparseModel(spark: SparkSession, dir: String): SparseModel = {
    val nd = TextAnalysis.lexDocLens(spark, dir).count().toDouble
    fitFromDfs(TextAnalysis.lexTermDfs(spark, dir), nd)
  }

  /** Generic fit from any docs-frame term counts — the scale/stream-bench
    * entry point (the dir path reuses the memoized BM25 frames instead). */
  def fitSparseModelOf(tc: DataFrame): SparseModel = {
    val nd = tc.select(col("doc_id")).distinct().count().toDouble
    fitFromDfs(tc.groupBy(col("term")).agg(count(lit(1)).as("df")), nd)
  }

  private def fitFromDfs(dfs: DataFrame, nd: Double): SparseModel = {
    val rows = dfs.collect()
    require(rows.length <= 200000,
      s"sparse dictionary has ${rows.length} terms — a learned-sparse model " +
        "vocabulary is fixed and small; refusing a corpus-sized collect")
    SparseModel(nd, rows.map(r => (r.getString(0), r.getLong(1))).toMap)
  }

  /** Unpersist + drop the memoized posting frame (bench family-eviction +
    * dataset-cycling lifecycle — see [[graft.GraftCaches]]). */
  def clearCaches(): Unit = {
    postingsCache.values.foreach(df => try df.unpersist() catch { case _: Throwable => })
    postingsCache.clear()
  }
}
