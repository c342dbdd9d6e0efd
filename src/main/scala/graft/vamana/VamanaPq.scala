package graft.vamana

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Knn, Quantization}
import graft.operators.Quantization.PqCodebooks

/** DiskANN's actual disk-serving design (Subramanya et al., NeurIPS'19 §3),
  * which the reference's in-memory kernel omits: keep only PQ codes of the
  * stored vectors in fast memory and let the GREEDY TRAVERSAL run on
  * asymmetric-distance (ADC) lookups — m table probes per node instead of a
  * dim-length float loop — then rerank the visited pool with full-precision
  * vectors (on SSD in the paper; here the broadcast index). At 100 TB this is
  * the difference between holding 256 bytes/vector and m=16 bytes/vector in
  * serving memory: the graph + codes fit where the raw vectors cannot.
  *
  * Correctness anchor: [[VamanaKernel.greedySearchScored]]'s full-beam
  * theorem. With beam = n the beam never evicts, so the pool is the whole
  * connected component REGARDLESS of the (approximate) traversal scores, and
  * the exact rerank of that pool is exact kNN — so `vamana_pq_gate` states
  * per-query overlap == k as a hash-checked invariant, the same theorem
  * `vamana_search_overlap` uses, now composed with quantized traversal.
  * At the default beam the PQ guidance is lossy; that quality is gated by a
  * recall floor (flag literal) like the other approximate families.
  */
object VamanaPq {

  /** Per-dataset serving state: the fitted broadcast-regime index, the PQ
    * codebooks trained on the shared bounded sample, and one m-byte code row
    * per stored point (positional, parallel to `idx.points`). Cleared by
    * [[clearCaches]]. */
  private val cache = TrieMap.empty[String, (LocalIndex, PqCodebooks, Array[Array[Int]])]

  def clearCaches(): Unit = cache.clear()

  private def pqState(spark: SparkSession, dir: String): (LocalIndex, PqCodebooks, Array[Array[Int]]) =
    cache.getOrElseUpdate(dir, {
      val idx = VamanaOps.model(spark, dir).localIndex.getOrElse(sys.error(
        "vamana_pq_search serves the broadcast regime; beyond maxLocalPoints " +
          "the fanout shards hold their own codes (same kernel, per shard)"))
      val cb = Quantization.pqTrain(spark, dir)
      val codes = idx.points.map(encode(_, cb))
      (idx, cb, codes)
    })

  private def encode(v: Array[Float], cb: PqCodebooks): Array[Int] =
    Array.tabulate(cb.m)(s =>
      Quantization.nearest(java.util.Arrays.copyOfRange(v, s * cb.subDim, (s + 1) * cb.subDim),
        cb.books(s)))

  /** Per-query ADC lookup table: lut(s)(c) = ||query_sub − centroid||², float
    * accumulate to match the kernel's l2sq discipline. */
  private def adcLut(q: Array[Float], cb: PqCodebooks): Array[Array[Float]] =
    Array.tabulate(cb.m, cb.k) { (s, c) =>
      var d = 0.0f
      var i = 0
      val cen = cb.books(s)(c)
      while (i < cb.subDim) {
        val x = q(s * cb.subDim + i) - cen(i)
        d += x * x
        i += 1
      }
      d
    }

  /** PQ-guided top-k: traversal on ADC scores, exact rerank of the visited
    * pool. Same 10-query fixture as `knn_exact`/`vamana_search` so the three
    * serving paths are directly comparable. Distributed over the query
    * batch (mapPartitions + broadcast state) like every serving path; the
    * per-query work is hops × m table probes + |pool| exact distances. */
  def search(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 10,
      fullBeam: Boolean = false): DataFrame = {
    import spark.implicits._
    val (idx, cb, codes) = pqState(spark, dir)
    val bc = spark.sparkContext.broadcast((idx, cb, codes))
    val queries = Knn.queriesFromPoints(Tables.embeddings(spark, dir), nQueries)
      .select(col("query_id").cast("long"), col("query_vec").cast("array<float>"))
      .as[(Long, Array[Float])]
    queries.flatMap { case (qid, qv) =>
      val (index, books, cds) = bc.value
      val lut = adcLut(qv, books)
      val m = books.m
      val score: Int => Float = { node =>
        val row = cds(node)
        var d = 0.0f
        var s = 0
        while (s < m) { d += lut(s)(row(s)); s += 1 }
        d
      }
      val kk = math.min(k, index.size)
      val beamL = if (fullBeam) index.size else math.max(index.params.efSearch, kk)
      val (poolIds, _) = VamanaKernel.greedySearchScored(score, index.graph, index.medoid, beamL)
      poolIds
        .map(p => (index.ids(p), VamanaKernel.l2sq(index.points(p), qv)))
        .sortBy { case (id, d) => (d, id) }
        .take(kk)
        .zipWithIndex
        .map { case ((id, d), r) => (qid, (r + 1).toLong, id, math.rint(d * 1e4) / 1e4) }
    }.toDF("query_id", "rank", "id", "dist")
      .orderBy(col("query_id"), col("rank"))
  }

  /** One-row hash-checked gate for the PQ-guided serving path:
    *  - `overlap_exact_ok`: full-beam PQ traversal + exact rerank matches
    *    exact kNN on every query — TRUE by the greedySearchScored theorem,
    *    so any kernel/codes/LUT regression flips it (hash mismatch);
    *  - `recall_ok`: default-beam PQ guidance clears `recallFloor` vs exact
    *    kNN — the lossy-regime quality floor (catastrophic-regression
    *    detector, set below the measured value like pq_gate's).
    * n_queries is oracle-recomputed from parquet; flags are invariants. */
  def gate(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 10,
      recallFloor: Double = 0.5): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val exact = Knn.knnExact(emb, Knn.queriesFromPoints(emb, nQueries), k)
      .select(col("query_id"), col("id"))
    val full = search(spark, dir, nQueries, k, fullBeam = true)
      .select(col("query_id"), col("id"))
    val approx = search(spark, dir, nQueries, k)
      .select(col("query_id"), col("id"))
    val exactOk = exact.join(full, Seq("query_id", "id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("overlap"))
      .agg(count(lit(1)).as("n_queries"),
        (count(when(col("overlap") === k, 1)) === count(lit(1))).as("overlap_exact_ok"))
    val rec = exact.withColumn("in_exact", lit(1))
      .join(approx.withColumn("in_approx", lit(1)), Seq("query_id", "id"), "full_outer")
      .agg(count(col("in_exact")).as("n_exact"),
        count(when(col("in_exact").isNotNull && col("in_approx").isNotNull, 1)).as("n_hit"))
      .select((col("n_hit") >= col("n_exact") * recallFloor).as("recall_ok"))
    exactOk.crossJoin(rec)
      .select(col("n_queries"), col("overlap_exact_ok"), col("recall_ok"))
  }
}
