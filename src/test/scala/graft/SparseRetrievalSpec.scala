package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparseRetrieval

/** Learned-sparse retrieval invariants beyond the oracle hash-match:
  * pruning bounds, champion containment, heap-vs-window rank agreement,
  * and the stats row's internal consistency. */
class SparseRetrievalSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  test("sparse_encode: per-doc pruning bound, positive impacts, kept order") {
    val enc = SparseRetrieval.sparseEncode(spark, dir)
    val perDoc = enc.groupBy("doc_id").agg(
      count(lit(1)).as("n"), min(col("w")).as("wmin"), max(col("rank")).as("rmax"))
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      assert(r.getAs[Long]("n") <= SparseRetrieval.PruneM, s"doc ${r.get(0)} kept > m postings")
      assert(r.getAs[Long]("n") == r.getAs[Long]("rmax"), "rank is not dense 1..n")
      assert(r.getAs[Double]("wmin") > 0, "non-positive impact survived the encode")
    }
    // kept order: within a doc, rank ascends exactly as w descends (term asc ties)
    val bad = enc.selectExpr("doc_id", "rank", "w", "term",
        "lag(w) over (partition by doc_id order by rank) as wprev",
        "lag(term) over (partition by doc_id order by rank) as tprev")
      .where(col("wprev").isNotNull &&
        (col("wprev") < col("w") || (col("wprev") === col("w") && col("tprev") >= col("term"))))
      .count()
    assert(bad == 0, "kept order violates (w desc, term asc)")
  }

  test("sparse_index_stats: the one-row capacity summary is internally consistent") {
    val s = SparseRetrieval.sparseIndexStats(spark, dir).collect()(0)
    val nDocs = s.getAs[Long]("n_docs")
    assert(nDocs > 0)
    assert(s.getAs[Long]("vocab_kept") <= s.getAs[Long]("vocab_full"))
    assert(s.getAs[Long]("postings_kept") <= s.getAs[Long]("postings_full"))
    assert(s.getAs[Long]("postings_kept") <= nDocs * SparseRetrieval.PruneM,
      "index exceeded the m-per-doc design bound")
    val mass = s.getAs[Double]("mass_kept")
    assert(mass > 0 && mass <= 1.0, s"mass_kept=$mass outside (0,1]")
    assert(s.getAs[Long]("max_list_kept") <= nDocs)
  }

  test("sparse_topk: bounded-heap ranks equal a full window sort") {
    val heap = SparseRetrieval.sparseTopk(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // independent rank path: full scoring + a corpus-wide window
    val pruned = SparseRetrieval.prunedPostings(spark, dir)
    import spark.implicits._
    val qw = graft.operators.TextAnalysis.Bm25Queries
      .flatMap { case (q, ts) => ts.map(t => (q, t)) }.toDF("qid", "term")
      .join(graft.operators.TextAnalysis.lexTermDfs(spark, dir), Seq("term"), "left_outer")
      .crossJoin(graft.operators.TextAnalysis.lexDocLens(spark, dir)
        .agg(count(lit(1)).cast("double").as("nd")))
      .select(col("qid"), col("term"),
        round(log((col("nd") + 1.0) / (coalesce(col("df"), lit(0L)) + 1.0)), 6).as("wq"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("s4").desc, col("doc_id").asc)
    val windowed = pruned.join(qw, Seq("term"))
      .select(col("qid"), col("doc_id"),
        round(col("wq") * col("w"), 6).cast("decimal(18,6)").as("contrib"))
      .groupBy("qid", "doc_id").agg(round(sum(col("contrib")), 4).as("s4"))
      .withColumn("rank", row_number().over(win).cast("long"))
      .where(col("rank") <= 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"), r.getAs[Long]("doc_id"))).toSet
    assert(heap == windowed, "TopKAggregator ranking diverges from the window-sort ranking")
  }

  test("trimodal_fusion: rrf recomputes from the emitted ranks; all three legs contribute") {
    val rows = SparseRetrieval.trimodalFusion(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    // exactly k rows per query: each leg alone supplies 10 distinct candidates
    rows.groupBy(_._1).foreach { case (qid, qr) =>
      assert(qr.length == 10, s"qid=$qid emitted ${qr.length} rows")
      assert(qr.map(_._2).sorted.sameElements(1L to 10L), s"qid=$qid ranks not dense")
    }
    // the emitted rrf is exactly the decimal sum of the per-leg 6-dp terms
    rows.foreach { case (qid, _, doc, rrf, lr, vr, sr) =>
      def term(x: Long): BigDecimal =
        if (x > 0) BigDecimal(1.0 / (60 + x)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        else BigDecimal(0)
      val expect = (term(lr) + term(vr) + term(sr)).doubleValue
      assert(math.abs(rrf - expect) < 1e-9,
        s"qid=$qid doc=$doc rrf=$rrf != recomputed $expect from ranks ($lr,$vr,$sr)")
      assert(lr > 0 || vr > 0 || sr > 0, "a fused row with no leg rank")
    }
    // every modality surfaces in the fused top-10 somewhere on this corpus
    assert(rows.exists(_._5 > 0), "lexical leg never contributes")
    assert(rows.exists(_._6 > 0), "dense leg never contributes")
    assert(rows.exists(_._7 > 0), "sparse leg never contributes")
  }

  test("sparse_champion_gate: the pricing curve is bounded, monotone in work, and bites") {
    val rows = SparseRetrieval.sparseChampionGate(spark, dir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("c"), r.getAs[Long]("overlap"),
        r.getAs[Long]("touched_full"), r.getAs[Long]("touched_champion")))
    assert(rows.length ==
      graft.operators.TextAnalysis.Bm25Queries.length * SparseRetrieval.ChampionCs.length)
    rows.foreach { case (qid, c, ov, tf, tc) =>
      assert(ov >= 0 && ov <= 5)
      assert(tc <= tf, "champion serving touched more postings than exact")
      val nTerms = graft.operators.TextAnalysis.Bm25Queries.find(_._1 == qid).get._2.length
      assert(tc <= nTerms.toLong * c, "champion join exceeded the c-per-term design bound")
    }
    // per qid: touched postings are monotone in c (a wider champion list
    // only adds postings), and the curve's expensive end recovers at least
    // as much of exact top-5 as its cheap end
    rows.groupBy(_._1).foreach { case (qid, qr) =>
      val byC = qr.sortBy(_._2)
      byC.sliding(2).foreach {
        case Array((_, _, _, _, tcLo), (_, _, _, _, tcHi)) =>
          assert(tcLo <= tcHi, s"qid=$qid: touched_champion not monotone in c")
        case _ =>
      }
      assert(byC.last._3 >= byC.head._3, s"qid=$qid: overlap shrank as c grew")
    }
    // the cheap end must actually truncate on this corpus (else the gate prices nothing)
    val cheap = rows.filter(_._2 == SparseRetrieval.ChampionCs.min)
    assert(cheap.forall(r => r._5 < r._4),
      "champion truncation removed no postings at the cheapest c")
  }
}
