package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Scalar quantization (int8) of the embedding column — the standard
  * compression step before a vector index at 100 TB (4 bytes/dim → 1).
  *
  * Two passes, both scan-shaped: (1) per-dimension global min/max — one
  * shuffle of dim×partitions partial aggregates; (2) row-wise encode against
  * the broadcast dimension stats. Codes use `floor(t·255 + 0.5)` (not
  * `round`) so Spark and DuckDB agree bit-for-bit at .5 boundaries; the
  * reconstruction error is a sequential double fold like every other
  * cross-engine number here.
  */
object Quantization {

  /** Per-dimension (min, max) as two broadcastable array columns. */
  private def dimStats(emb: DataFrame): DataFrame =
    emb.select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .orderBy(col("pos"))
      .agg(collect_list(col("mn")).as("mins"), collect_list(col("mx")).as("maxs"))

  /** (vec_id, codes: array<int> in 0..255, recon_err: mean abs dequant
    * error, rounded) — deterministic, oracle-checked. */
  def sqQuantize(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val stats = dimStats(emb)
    val x = col("embedding")
    // t in [0,1]; guard degenerate dims (mx == mn) to 0
    def tExpr = transform(sequence(lit(1), size(x)),
      i => {
        val mn = element_at(col("mins"), i).cast("double")
        val mx = element_at(col("maxs"), i).cast("double")
        val v = element_at(x, i).cast("double")
        when(mx === mn, lit(0.0)).otherwise((v - mn) / (mx - mn))
      })
    emb.crossJoin(broadcast(stats))
      .withColumn("codes", transform(tExpr, t => floor(t * 255.0 + 0.5).cast("int")))
      .withColumn("recon_err", round(
        aggregate(
          zip_with(
            transform(col("codes"), c => c.cast("double") / 255.0),
            tExpr,
            (q, t) => abs(q - t)),
          lit(0.0), (acc, v) => acc + v) / size(x), 6))
      // codes emitted as a comma-joined string: stable cross-engine hashing
      // without array-typed output columns
      .select(col("vec_id"),
        array_join(transform(col("codes"), c => c.cast("string")), ",").as("codes"),
        col("recon_err"))
      .orderBy(col("vec_id"))
  }

  /** Aggregate quality report over the quantized corpus. */
  def sqReport(spark: SparkSession, dir: String): DataFrame =
    sqQuantize(spark, dir)
      .agg(
        count(lit(1)).as("n_vectors"),
        round(avg(col("recon_err")), 6).as("avg_recon_err"),
        round(max(col("recon_err")), 6).as("max_recon_err"))

  // ---- binary quantization ---------------------------------------------------

  /** Sign-bit code of a dim-64 embedding packed into ONE long (MSB = dim 0):
    * bit i = embedding[i] > 0. The most aggressive standard compression
    * (256 bytes → 8) and the one whose SEARCH stage is also exactly
    * oracle-checkable — sign comparisons and bit arithmetic are
    * deterministic in both engines, unlike k-means codebooks. Bits 1..63
    * enter as a flat weighted sum and the sign bit as Long.MinValue (the
    * same ANSI-safe assembly as the 64-bit simhash twins). For dim > 64
    * the same packing applies per 64-dim block. */
  private def bqCode(emb: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val rest = (1 until 64).foldLeft(lit(0L): org.apache.spark.sql.Column) { (acc, i) =>
      acc + when(element_at(emb, i + 1) > lit(0f), lit(1L << (63 - i))).otherwise(lit(0L))
    }
    when(element_at(emb, 1) > lit(0f), lit(Long.MinValue)).otherwise(lit(0L)) + rest
  }

  /** (vec_id, code) — the packed sign-bit code per vector, hash-checked. */
  def bqQuantize(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), bqCode(col("embedding")).as("code"))
      .orderBy(col("vec_id"))

  /** Hamming top-k over the binary codes, same 10-query fixture as
    * knn_exact: one broadcast of the 10 query codes, one narrow pass
    * computing bit_count(xor) per row, one per-query top-k — the
    * 100 TB-shaped scan (8 bytes/vector of working set). Deterministic
    * (integer distances, ties by id) → fully hash-checked, unlike the
    * recall-gated PQ/IVF paths. */
  def bqSearch(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val codes = Tables.embeddings(spark, dir)
      .select(col("vec_id"), bqCode(col("embedding")).as("code"))
    val q = codes.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("code").as("qcode"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("hamming").asc, col("id").asc)
    codes.crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id").as("id"),
        bit_count(col("code").bitwiseXOR(col("qcode"))).cast("long").as("hamming"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("hamming"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Two-stage retrieval — the standard coarse-to-fine serving pattern:
    * a Hamming shortlist over the 8-byte binary codes scans the corpus,
    * then exact L2 reranks ONLY the shortlist (full 256-byte vectors touch
    * `shortlist` rows per query, not n). Both stages are deterministic
    * (integer Hamming and the shared double-fold distance, ties by id), so
    * the composed pipeline is hash-checked end-to-end — the quantization
    * error surfaces as the difference vs `knn_exact`, visible in the same
    * output shape. */
  def bqRerankSearch(spark: SparkSession, dir: String, k: Int = 10,
      shortlist: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.NativeVectorFunctions.l2sqNative
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val codes = emb.select(col("vec_id"), bqCode(col("embedding")).as("code"))
    val q = codes.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("code").as("qcode"))
    val wH = Window.partitionBy(col("query_id")).orderBy(col("hamming").asc, col("id").asc)
    val cand = codes.crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id").as("id"),
        bit_count(col("code").bitwiseXOR(col("qcode"))).cast("long").as("hamming"))
      .withColumn("hrank", row_number().over(wH))
      .where(col("hrank") <= shortlist)
      .select(col("query_id"), col("id"))
    val qv = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val wD = Window.partitionBy(col("query_id")).orderBy(col("dist").asc, col("id").asc)
    cand
      .join(emb.select(col("vec_id").as("id"), col("embedding").as("vec")), "id")
      .join(broadcast(qv), "query_id")
      .select(col("query_id"), col("id"), l2sqNative(spark, col("vec"), col("qvec")).as("dist"))
      .withColumn("rank", row_number().over(wD).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), round(col("dist"), 4).as("dist"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ---- product quantization --------------------------------------------------

  /** Seeded deterministic k-means for one subspace: evenly-spaced sample
    * points as init, `iters` Lloyd passes. Driver-side over a bounded
    * sample — the standard way PQ codebooks are trained at any scale. */
  private[graft] def kmeans(points: Array[Array[Float]], k: Int, iters: Int): Array[Array[Float]] = {
    var centroids = (0 until k).map(i => points((i * points.length) / k)).toArray
    for (_ <- 0 until iters) {
      val dim = centroids(0).length
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      points.foreach { p =>
        val c = nearest(p, centroids)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += p(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c) else sums(c).map(v => (v / counts(c)).toFloat)
      }.toArray
    }
    centroids
  }

  private[graft] def nearest(p: Array[Float], cs: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0
      var i = 0
      while (i < p.length) { val x = p(i) - cs(c)(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Trained PQ codebooks: `m` subspaces × `k` centroids each. */
  final case class PqCodebooks(m: Int, k: Int, subDim: Int, books: Array[Array[Array[Float]]])
    extends Serializable

  /** Train codebooks on a bounded sample (vec_id < 4096, seed-stable). */
  def pqTrain(spark: SparkSession, dir: String, m: Int = 16, k: Int = 32): PqCodebooks = {
    import spark.implicits._
    val sample = Tables.embeddings(spark, dir)
      .where(col("vec_id") < 4096)
      .select(col("vec_id"), col("embedding").cast("array<float>"))
      .as[(Long, Array[Float])].collect().sortBy(_._1).map(_._2)
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    val books = (0 until m).map { s =>
      kmeans(sample.map(v => v.slice(s * subDim, (s + 1) * subDim)), k, iters = 3)
    }.toArray
    PqCodebooks(m, k, subDim, books)
  }

  /** PQ encode: one code (0..k-1) per subspace per vector — dim·4 bytes →
    * m bytes. Deterministic (seeded codebooks) but k-means is not
    * SQL-expressible → rows-only driver check; quality gated in specs. */
  def pqQuantize(spark: SparkSession, dir: String, m: Int = 16, k: Int = 32): DataFrame = {
    import spark.implicits._
    val cb = pqTrain(spark, dir, m, k)
    val bc = spark.sparkContext.broadcast(cb)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<float>"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val b = bc.value
        val codes = (0 until b.m).map { s =>
          nearest(v.slice(s * b.subDim, (s + 1) * b.subDim), b.books(s))
        }
        (id, codes.mkString(","))
      }
      .toDF("vec_id", "pq_codes")
      .orderBy(col("vec_id"))
  }

  /** ADC (asymmetric distance) top-k over PQ codes: per query build the
    * m×k lookup table of exact subspace distances, then score each stored
    * vector as the sum of m table lookups — the memory-bound scan shape PQ
    * exists for. Rows-only; recall vs exact kNN gated in specs. */
  def pqSearch(spark: SparkSession, dir: String, nQueries: Int = 10, kTop: Int = 10,
      m: Int = 16, k: Int = 32): DataFrame = {
    import spark.implicits._
    val cb = pqTrain(spark, dir, m, k)
    val bcCb = spark.sparkContext.broadcast(cb)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<float>"))
      .as[(Long, Array[Float])]
    val queries = emb.filter(_._1 < nQueries).collect().sortBy(_._1)
    val bcQ = spark.sparkContext.broadcast(queries)
    val scored = emb.mapPartitions { it =>
      val b = bcCb.value
      // per-query LUT: luts(q)(s)(c) = ||query_sub - centroid||^2
      val luts = bcQ.value.map { case (qid, qv) =>
        (qid, Array.tabulate(b.m, b.k) { (s, c) =>
          var d = 0.0
          var i = 0
          val cen = b.books(s)(c)
          while (i < b.subDim) {
            val x = qv(s * b.subDim + i) - cen(i)
            d += x * x
            i += 1
          }
          d
        })
      }
      it.flatMap { case (id, v) =>
        val codes = (0 until b.m).map(s => nearest(v.slice(s * b.subDim, (s + 1) * b.subDim), b.books(s)))
        luts.iterator.map { case (qid, lut) =>
          var d = 0.0
          var s = 0
          while (s < b.m) { d += lut(s)(codes(s)); s += 1 }
          (qid, id, math.rint(d * 1e4) / 1e4)
        }
      }
    }.toDF("query_id", "id", "dist")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("dist").asc, col("id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= kTop)
      .select(col("query_id"), col("rank"), col("id"), col("dist"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Hash-checked gate for [[pqSearch]] vs exact kNN over the same query
    * fixture — see the gate block in [[Similarity]] for the pattern (the
    * k-means codebooks are seed-derived, so only the exact baseline and a
    * recall-floor boolean are oracle-computable). */
  def pqGate(spark: SparkSession, dir: String, nQueries: Int = 10, kTop: Int = 10,
      recallFloor: Double = 0.3): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    // the floor is a CATASTROPHIC-regression detector, set well below the
    // measured recall (0.48-0.51 on the test corpora — ADC over m=16/k=32
    // codebooks; the >=0.5 quality bound lives in PipelineSpec where a
    // near-boundary flip fails a test, not the driver's correctness gate)
    Similarity.topkGate(
      Knn.knnExact(emb, Knn.queriesFromPoints(emb, nQueries), kTop)
        .select(col("query_id"), col("id")),
      pqSearch(spark, dir, nQueries, kTop).select(col("query_id"), col("id")),
      recallFloor)
  }
}
