package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.RegistrySqlParts._

/** Vector/similarity registered queries (top-k, LSH/IVF/PQ/SQ/BQ gates, SemDeDup, embedding ETL) with their DuckDB oracle SQL. Split from the monolithic PipelineRegistry; the
  * aggregate surface (and entry order) lives there. */
private[graft] object RegistryVector {

  private[graft] def entries: Seq[(String, QFn, Option[String])] = Seq(
    simCosineTopK, simIpTopK, simJoinThreshold, mmrRerankQ, mmrAnnGateQ, simRangeSearchQ, maxsimTopKQ, matryoshkaSearchQ, matryoshkaGateQ, vamanaRangeSearchQ, vamanaRangeGateQ, vamanaRangeFanoutGateQ, vamanaRoutedRangeGateQ, vamanaRangeFilteredGateQ, maxsimRerankGateQ, bitextMiningQ, bitextAnnGateQ, lshCosineGateQ, lshL2GateQ, ivfGateQ, pqGateQ, vamanaPqGateQ, vamanaPqSearchQ, vamanaPqFanoutQ, vamanaPqFanoutGateQ, vamanaPqFanoutFilteredGateQ, semdedupGateQ, prototypeGateQ, embedDimStatsQ, embedDimCovQ, sqQuantize, sqReport, bqQuantizeQ, bqSearchQ, bqRerankQ, embedNormalizeQ, hardNegativesQ, hardNegativesFanoutQ, hardNegativesFanoutGateQ, embedKmeansQ, embedKmeansGreedyQ, embedKmeansStatsQ, clusterSampleBalancedQ, clusterSilhouetteQ, clusterCuratedDocsQ, splitDriftQ, embedKmeansIncrementalQ, embedKmeansMinibatchQ, embedNormOutliersQ)

  // ---- range / multi-vector / truncated-prefix retrieval --------------------

  /** Sub-vector dot product for the MaxSim oracle: query group `ai` ×
    * doc group `bj` of [[Similarity.MaxSimGroups]] equal contiguous
    * slices (g = len//groups, element t of a slice is 1 + group·g + t) —
    * ascending accumulation, the same operation sequence as the Spark
    * `dotNative`-over-`slice` side. Shared with rag_rerank's oracle via
    * [[RegistrySqlParts]]. */
  private def dotSubSql(a: String, ai: Int, b: String, bj: Int): String =
    RegistrySqlParts.dotSubSql(a, ai, b, bj)

  /** Prefix squared-L2 over the first `p` dimensions (the Matryoshka
    * ranking stage) — range-indexed, no list slicing. */
  private def prefL2Sql(a: String, b: String, p: Int): String =
    s"list_sum(list_transform(range(1, ${p + 1}), x -> " +
      s"(($a[x]::DOUBLE) - ($b[x]::DOUBLE)) * (($a[x]::DOUBLE) - ($b[x]::DOUBLE))))"

  private val simRangeSearchQ: (String, QFn, Option[String]) = (
    "sim_range_search",
    (s, d) => Similarity.rangeSearchExact(s, d),
    Some(s"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 10),
      sc AS (SELECT q.query_id, e.vec_id AS id, ${l2Sql("e.embedding", "q.qvec")} AS dist
             FROM embeddings e CROSS JOIN q)
      SELECT query_id, id, round(dist, 4) AS dist FROM sc WHERE dist <= 1.5
      ORDER BY query_id, id
    """.trim))

  private val maxsimTopKQ: (String, QFn, Option[String]) = {
    val score = (0 until Similarity.MaxSimGroups).map { i =>
      (0 until Similarity.MaxSimGroups)
        .map(j => dotSubSql("q.qvec", i, "e.embedding", j))
        .mkString("greatest(", ", ", ")")
    }.mkString(" + ")
    ("maxsim_topk",
      (s, d) => Similarity.maxSimTopK(s, d),
      Some(s"""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 10),
        sc AS (SELECT q.query_id, e.vec_id AS id, $score AS score
               FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
        r AS (SELECT query_id, id, score,
                     row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id ASC) AS rank
              FROM sc)
        SELECT query_id, rank, id, round(score, 4) AS score FROM r WHERE rank <= 5
        ORDER BY query_id, rank
      """.trim))
  }

  /** The MRL-weighted corpus view CTE (see [[Similarity.MrlWeights]]):
    * element j = float(emb_j · w_j), the float-rounding matching the Spark
    * side bit-for-bit. The weight list is formatted at 17 significant
    * digits (exact double round-trip) from the ONE Scala constant. */
  private val weCte: String = {
    val wlist = Similarity.MrlWeights
      .map(w => String.format(java.util.Locale.ROOT, "%.17g", Double.box(w)))
      .mkString("[", ", ", "]")
    s"""we AS (SELECT vec_id, list_transform(range(1, len(embedding)+1),
       x -> CAST((embedding[x]::DOUBLE) * ($wlist)[x] AS FLOAT)) AS wv
       FROM embeddings)"""
  }

  private val matryoshkaSearchQ: (String, QFn, Option[String]) = (
    "matryoshka_search",
    (s, d) => Similarity.matryoshkaSearch(s, d),
    // the oracle is the DIRECT full weighted kNN: the lower-bound-pruned
    // escalating scan must equal it exactly (the pruning theorem)
    Some(s"""
      WITH $weCte,
      q AS (SELECT vec_id AS query_id, wv AS qv FROM we WHERE vec_id < 10),
      fd AS (SELECT q.query_id, e.vec_id AS id, ${l2Sql("e.wv", "q.qv")} AS dist
             FROM we e CROSS JOIN q),
      r AS (SELECT query_id, id, dist,
                   row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, id ASC) AS rank
            FROM fd)
      SELECT query_id, rank, id, round(dist, 4) AS dist FROM r WHERE rank <= 10
      ORDER BY query_id, rank
    """.trim))

  private val matryoshkaGateQ: (String, QFn, Option[String]) = (
    "matryoshka_gate",
    (s, d) => Similarity.matryoshkaGate(s, d),
    Some(s"""
      WITH $weCte,
      q AS (SELECT vec_id AS query_id, wv AS qv FROM we WHERE vec_id < 10),
      fd AS (SELECT q.query_id, e.vec_id AS id, ${l2Sql("e.wv", "q.qv")} AS dist
             FROM we e CROSS JOIN q),
      kth AS (SELECT query_id, dist AS dk FROM (
                SELECT query_id, id, dist,
                       row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, id ASC) AS r
                FROM fd) WHERE r = 10),
      pre AS (SELECT q.query_id, e.vec_id AS id,
                     ${prefL2Sql("e.wv", "q.qv", Similarity.MatryoshkaPrefix)} AS pdist
              FROM we e CROSS JOIN q),
      nn AS (SELECT count(*) AS n FROM embeddings)
      SELECT p.query_id, CAST(10 AS BIGINT) AS k, nn.n AS n,
             count(*) AS n_required, round(count(*)::DOUBLE / nn.n, 4) AS fetch_frac
      FROM pre p JOIN kth USING (query_id) CROSS JOIN nn
      WHERE p.pdist <= kth.dk
      GROUP BY p.query_id, nn.n ORDER BY p.query_id
    """.trim))

  /** Range-set oracle shared by the two full-beam ANN range gates — the
    * exact in-range ids from the parquet ground truth (the full-beam
    * traversal's provable answer on both serving regimes). */
  private val rangeIdsOracle: String = s"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 10),
      sc AS (SELECT q.query_id, e.vec_id AS id, ${l2Sql("e.embedding", "q.qvec")} AS dist
             FROM embeddings e CROSS JOIN q)
      SELECT query_id, id FROM sc WHERE dist <= 1.5
      ORDER BY query_id, id
    """.trim

  private val vamanaRangeSearchQ: (String, QFn, Option[String]) = (
    "vamana_range_search",
    (s, d) => graft.vamana.VamanaOps.vamanaRangeSearch(s, d),
    None)

  private val vamanaRangeGateQ: (String, QFn, Option[String]) = (
    "vamana_range_gate",
    (s, d) => graft.vamana.VamanaOps.vamanaRangeGate(s, d),
    Some(rangeIdsOracle))

  private val vamanaRangeFanoutGateQ: (String, QFn, Option[String]) = (
    "vamana_range_fanout_gate",
    (s, d) => graft.vamana.VamanaOps.vamanaRangeFanoutGate(s, d),
    Some(rangeIdsOracle))

  /** Ball-pruned routed range search: pruning is lossless (triangle
    * inequality), so the deployed pruned config must EQUAL the exact
    * range scan — the same oracle as the broadcast and fanout regimes. */
  private val vamanaRoutedRangeGateQ: (String, QFn, Option[String]) = (
    "vamana_routed_range_gate",
    (s, d) => graft.vamana.VamanaOps.vamanaRoutedRangeGate(s, d),
    Some(rangeIdsOracle))

  private val maxsimRerankGateQ: (String, QFn, Option[String]) = (
    "maxsim_rerank_gate",
    (s, d) => graft.vamana.VamanaOps.maxsimRerankGate(s, d),
    Some("""
      SELECT count(DISTINCT vec_id) AS n_queries, TRUE AS recall_ok
      FROM embeddings WHERE vec_id < 10
    """.trim))

  private val vamanaRangeFilteredGateQ: (String, QFn, Option[String]) = (
    "vamana_range_filtered_gate",
    (s, d) => graft.vamana.VamanaOps.vamanaRangeFilteredGate(s, d),
    Some(s"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 10),
      sc AS (SELECT q.query_id, e.vec_id AS id, ${l2Sql("e.embedding", "q.qvec")} AS dist
             FROM embeddings e CROSS JOIN q)
      SELECT sc.query_id, sc.id FROM sc JOIN documents d ON sc.id = d.doc_id
      WHERE sc.dist <= 1.5 AND d.lang = 'en'
      ORDER BY sc.query_id, sc.id
    """.trim))

  private val bitextAnnGateQ: (String, QFn, Option[String]) = (
    "bitext_ann_gate",
    (s, d) => graft.vamana.VamanaOps.bitextAnnGate(s, d),
    Some("""
      SELECT count(*) AS n_queries, TRUE AS recall_ok
      FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id WHERE d.lang = 'en'
    """.trim))

  private val bitextMiningQ: (String, QFn, Option[String]) = (
    "bitext_mining",
    (s, d) => Similarity.bitextMining(s, d),
    Some(s"""
      WITH e AS (SELECT e.vec_id, d.lang, e.embedding,
                        sqrt(${dotSql("e.embedding", "e.embedding")}) AS nrm
                 FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
      s AS (SELECT vec_id AS src_id, embedding AS sv, nrm AS sn FROM e WHERE lang = 'en'),
      t AS (SELECT vec_id AS tgt_id, embedding AS tv, nrm AS tn FROM e WHERE lang = 'de'),
      p AS (SELECT s.src_id, t.tgt_id, ${dotSql("s.sv", "t.tv")} / (s.sn * t.tn) AS cos
            FROM s CROSS JOIN t),
      m AS (SELECT *, CAST(floor(cos * 1000000) AS BIGINT) AS mcos,
                   row_number() OVER (PARTITION BY src_id ORDER BY cos DESC, tgt_id ASC) AS rs,
                   row_number() OVER (PARTITION BY tgt_id ORDER BY cos DESC, src_id ASC) AS rt
            FROM p),
      sx AS (SELECT src_id, CAST(sum(mcos) AS BIGINT) AS sx FROM m WHERE rs <= 4 GROUP BY src_id),
      sy AS (SELECT tgt_id, CAST(sum(mcos) AS BIGINT) AS sy FROM m WHERE rt <= 4 GROUP BY tgt_id),
      g AS (SELECT m.src_id, m.tgt_id, m.cos, (m.mcos * 8) / (sx.sx + sy.sy) AS margin
            FROM m JOIN sx USING (src_id) JOIN sy USING (tgt_id)),
      b AS (SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id ASC) AS rk
            FROM g)
      SELECT src_id, tgt_id, round(cos, 4) AS cos, round(margin, 4) AS margin,
             margin > 1.05 AS accepted
      FROM b WHERE rk = 1 ORDER BY src_id
    """.trim))

  // ---- similarity -----------------------------------------------------------

  /** Unrolled k-step greedy chain (the Lloyd / pagerank oracle pattern):
    * step t scores every unselected candidate λ·rel − (1−λ)·max(sim to the
    * selected set p{t−1}) and takes the row_number=1 pick with ascending-id
    * ties, exactly the Spark-side greedy loop. λ and its complement are the
    * same two literals on both engines (`1 − 0.7` ≠ `0.3` in doubles). */
  private val mmrRerankQ: (String, QFn, Option[String]) = (
    "mmr_rerank",
    (s, d) => Similarity.mmrRerank(s, d),
    Some(s"""
      WITH e AS (SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS nrm
                 FROM embeddings),
      q AS (SELECT vec_id AS query_id, embedding AS qvec, nrm AS qn FROM e WHERE vec_id % 50 = 0),
      sc AS (SELECT q.query_id, e.vec_id AS id, e.embedding AS vec,
                    ${dotSql("e.embedding", "q.qvec")} / (e.nrm * q.qn) AS rel
             FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
      cand AS (SELECT query_id, id, vec, rel FROM (
                 SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY rel DESC, id ASC) AS rk FROM sc) WHERE rk <= 20),
      cs AS (SELECT a.query_id, a.id AS ia, b.id AS ib,
                    ${dotSql("a.vec", "b.vec")} /
                      (sqrt(${dotSql("a.vec", "a.vec")}) * sqrt(${dotSql("b.vec", "b.vec")})) AS sim
             FROM cand a JOIN cand b ON a.query_id = b.query_id AND a.id <> b.id),
      ${mmrChainSql()}
      ${mmrEmitSql()}
      ORDER BY query_id, mmr_rank
    """.trim))

  /** Selected-set agreement of ANN-served MMR vs the exact form — the gate
    * pattern: n_queries is oracle-recomputable, the floor flag a literal. */
  private val mmrAnnGateQ: (String, QFn, Option[String]) = (
    "mmr_ann_gate",
    (s, d) => graft.vamana.VamanaOps.mmrAnnGate(s, d),
    Some("""
      SELECT count(DISTINCT vec_id) AS n_queries, TRUE AS recall_ok
      FROM embeddings WHERE vec_id % 50 = 0
    """.trim))

  private val simCosineTopK: (String, QFn, Option[String]) = (
    "sim_cosine_topk",
    (s, d) => Similarity.bruteCosineTopK(s, d),
    Some(s"""
      WITH e AS (SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS nrm
                 FROM embeddings),
      q AS (SELECT vec_id AS query_id, embedding AS qvec, nrm AS qn FROM e WHERE vec_id < 10),
      sc AS (SELECT q.query_id, e.vec_id AS id,
                    ${dotSql("e.embedding", "q.qvec")} / (e.nrm * q.qn) AS cos
             FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
      r AS (SELECT query_id, id, cos,
                   row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id ASC) AS rank
            FROM sc)
      SELECT query_id, rank, id, round(cos, 4) AS cos FROM r WHERE rank <= 5
      ORDER BY query_id, rank
    """.trim))

  private val simIpTopK: (String, QFn, Option[String]) = (
    "sim_ip_topk",
    (s, d) => Similarity.bruteIpTopK(s, d),
    Some(s"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 10),
      sc AS (SELECT q.query_id, e.vec_id AS id, ${dotSql("e.embedding", "q.qvec")} AS ip
             FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
      r AS (SELECT query_id, id, ip,
                   row_number() OVER (PARTITION BY query_id ORDER BY ip DESC, id ASC) AS rank
            FROM sc)
      SELECT query_id, rank, id, round(ip, 4) AS ip FROM r WHERE rank <= 5
      ORDER BY query_id, rank
    """.trim))

  private val simJoinThreshold: (String, QFn, Option[String]) = (
    "sim_join_threshold",
    (s, d) => Similarity.similarityJoinExact(s, d),
    Some(s"""
      WITH p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                        ${l2Sql("a.embedding", "b.embedding")} AS dist
                 FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
      SELECT id_a, id_b, round(dist, 4) AS dist FROM p WHERE dist < 1.1 ORDER BY id_a, id_b
    """.trim))

  private val lshCosineGateQ: (String, QFn, Option[String]) = (
    "lsh_cosine_gate",
    (s, d) => Similarity.lshCosineGate(s, d),
    Some(s"""
      WITH e AS (SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS nrm
                 FROM embeddings),
      p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
            FROM e a JOIN e b ON a.vec_id < b.vec_id)
      SELECT count(*) AS n_exact_pairs, TRUE AS subset_ok, TRUE AS recall_ok
      FROM p WHERE cos >= 0.4
    """.trim))

  private val lshL2GateQ: (String, QFn, Option[String]) = (
    "lsh_l2_gate",
    (s, d) => Similarity.lshL2Gate(s, d),
    Some(s"""
      WITH p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ${l2Sql("a.embedding", "b.embedding")} AS dist
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
      SELECT count(*) AS n_exact_pairs, TRUE AS subset_ok, TRUE AS recall_ok
      FROM p WHERE dist < 1.1
    """.trim))

  private val ivfGateQ: (String, QFn, Option[String]) = (
    "ivf_gate",
    (s, d) => Similarity.ivfGate(s, d),
    Some("""
      SELECT count(DISTINCT vec_id) AS n_queries, TRUE AS recall_ok
      FROM embeddings WHERE vec_id < 10
    """.trim))

  private val pqGateQ: (String, QFn, Option[String]) = (
    "pq_gate",
    (s, d) => Quantization.pqGate(s, d),
    Some("""
      SELECT count(DISTINCT vec_id) AS n_queries, TRUE AS recall_ok
      FROM embeddings WHERE vec_id < 10
    """.trim))

  /** DiskANN disk-design gate: full-beam PQ-guided traversal + exact rerank
    * is provably exact kNN ([[graft.vamana.VamanaKernel.greedySearchScored]]
    * theorem), so `overlap_exact_ok` is a hash-checked invariant; the
    * default-beam recall floor is the lossy-regime quality flag. */
  private val vamanaPqGateQ: (String, QFn, Option[String]) = (
    "vamana_pq_gate",
    (s, d) => graft.vamana.VamanaPq.gate(s, d),
    Some("""
      SELECT count(DISTINCT vec_id) AS n_queries,
             TRUE AS overlap_exact_ok, TRUE AS recall_ok
      FROM embeddings WHERE vec_id < 10
    """.trim))

  /** The PQ-guided serving path as a ROWS entry (same 10-query fixture as
    * knn_exact / vamana_search / vamana_fanout_search, so the three serving
    * regimes — exact beam, fanout, PQ-guided — are directly comparable in
    * BENCH_FULL). Graph traversal → rows-only; exactness carried by
    * vamana_pq_gate. */
  private val vamanaPqSearchQ: (String, QFn, Option[String]) = (
    "vamana_pq_search",
    (s, d) => graft.vamana.VamanaPq.search(s, d),
    None)

  /** PQ-guided traversal in the FANOUT regime (per-shard codebooks +
    * codes) — rows entry; exactness carried by vamana_pq_fanout_gate. */
  private val vamanaPqFanoutQ: (String, QFn, Option[String]) = (
    "vamana_pq_fanout",
    (s, d) => graft.vamana.VamanaPq.searchFanout(s, d),
    None)

  /** Fanout twin of vamana_pq_gate: full-beam per-shard PQ traversal +
    * exact rerank merges to exact kNN (1-of-s shard membership), so
    * overlap_exact_ok is a hash-checked invariant. */
  private val vamanaPqFanoutGateQ: (String, QFn, Option[String]) = (
    "vamana_pq_fanout_gate",
    (s, d) => graft.vamana.VamanaPq.gateFanout(s, d),
    Some("""
      SELECT count(DISTINCT vec_id) AS n_queries,
             TRUE AS overlap_exact_ok, TRUE AS recall_ok
      FROM embeddings WHERE vec_id < 10
    """.trim))

  /** Serving-matrix completion gate: filtered search × PQ serving memory
    * × beyond-broadcast fanout. Full per-shard ADC beam + exact rerank +
    * predicate is exactly filtered kNN, so per-query overlap with the
    * exact filtered scan is min(k, n_allowed) — the
    * vamana_fanout_filtered_gate statement with m-byte traversal. */
  private val vamanaPqFanoutFilteredGateQ: (String, QFn, Option[String]) = (
    "vamana_pq_fanout_filtered_gate",
    (s, d) => graft.vamana.VamanaPq.gateFanoutFiltered(s, d),
    Some("""
      SELECT vec_id AS query_id,
             LEAST(10, (SELECT count(*) FROM documents WHERE lang = 'en'))::BIGINT AS overlap
      FROM embeddings WHERE vec_id < 10 ORDER BY query_id
    """.trim))

  /** SemDeDup's recall gate rides the SAME exact-cosine baseline as
    * lsh_cosine_gate (threshold 0.4), so the oracle SQL is shared shape. */
  private val semdedupGateQ: (String, QFn, Option[String]) = (
    "semdedup_gate",
    (s, d) => Similarity.semdedupGate(s, d),
    Some(s"""
      WITH e AS (SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS nrm
                 FROM embeddings),
      p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
            FROM e a JOIN e b ON a.vec_id < b.vec_id)
      SELECT count(*) AS n_exact_pairs, TRUE AS subset_ok, TRUE AS recall_ok
      FROM p WHERE cos >= 0.4
    """.trim))

  /** Structural gate: corpus count oracle-recomputed; per-cell exact keep
    * counts and the distance-prefix property asserted as literal flags. */
  private val prototypeGateQ: (String, QFn, Option[String]) = (
    "prototype_gate",
    (s, d) => Similarity.prototypeGate(s, d),
    Some("""
      SELECT count(*) AS n_total, TRUE AS frac_ok, TRUE AS prefix_ok FROM embeddings
    """.trim))

  // Hash-checked gates for the seeded generators (hyperplane LSH, E2LSH,
  // IVF, PQ): the oracle recomputes the exact baseline count and asserts
  // the subset/recall booleans as literals (vamana_search_overlap
  // pattern). The raw pair / top-k forms stay available as library
  // functions (the gates and specs run them on every pass), but are NOT
  // separately registered — their output is the seeded candidate set
  // itself, which DuckDB cannot re-derive, and a rows-only registry entry
  // adds no check the gate doesn't already make.

  /** Micro-unit longs (half-up floor) make the per-dim sums exact; DuckDB
    * ordinality is 1-based where posexplode is 0-based. Σvm² is exact in
    * DECIMAL/HUGEINT internally but EMITTED as hi/lo BIGINTs — decimal
    * output canonicalization diverges between engines (the r6 red row). */
  private val embedDimStatsQ: (String, QFn, Option[String]) = (
    "embed_dim_stats",
    (s, d) => Similarity.embedDimStats(s, d),
    Some("""
      WITH ex AS (SELECT i - 1 AS pos, e.embedding[i] AS v,
                    floor(e.embedding[i]::DOUBLE * 1e6 + 0.5)::BIGINT AS vm
                  FROM embeddings e, unnest(range(1, len(e.embedding) + 1)) AS r(i))
      SELECT pos, count(*)::BIGINT AS n, sum(vm)::BIGINT AS sum_micro,
             (sum(vm * vm) // 1000000000000000000)::BIGINT AS sumsq_hi,
             (sum(vm * vm) % 1000000000000000000)::BIGINT AS sumsq_lo,
             round(min(v)::DOUBLE, 4) AS min_v, round(max(v)::DOUBLE, 4) AS max_v
      FROM ex GROUP BY pos ORDER BY pos
    """.trim))

  /** Signed exact sums ride as strings: HUGEINT::VARCHAR and Spark's
    * decimal(38,0)→string both render a plain integer. */
  private val embedDimCovQ: (String, QFn, Option[String]) = (
    "embed_dim_cov",
    (s, d) => Similarity.embedDimCov(s, d),
    Some("""
      WITH e AS (SELECT list_transform(embedding, v -> floor(v::DOUBLE * 1e6 + 0.5)::BIGINT) AS vm
                 FROM embeddings),
      p AS (SELECT a.i, b.j, vm[a.i + 1] * vm[b.j + 1] AS prod
            FROM e, unnest(range(0, len(vm) - 1)) AS a(i), unnest(range(0, len(vm))) AS b(j)
            WHERE b.j > a.i)
      SELECT i, j, count(*) AS n, sum(prod)::VARCHAR AS sumprod
      FROM p GROUP BY i, j ORDER BY i, j
    """.trim))

  // ---- quantization ---------------------------------------------------------

  private val sqStatsCte =
    """SELECT list(mn ORDER BY pos) AS mins, list(mx ORDER BY pos) AS maxs
      |FROM (SELECT pos, min(v) AS mn, max(v) AS mx
      |      FROM (SELECT unnest(embedding) AS v, generate_subscripts(embedding, 1) AS pos
      |            FROM embeddings)
      |      GROUP BY pos)""".stripMargin

  private val sqQuantizeSql = s"""
      WITH st AS ($sqStatsCte),
      q AS (
        SELECT vec_id,
          list_transform(range(1, len(embedding)+1),
            i -> CASE WHEN st.maxs[i] = st.mins[i] THEN 0
                 ELSE floor(((embedding[i]::DOUBLE - st.mins[i]::DOUBLE) /
                             (st.maxs[i]::DOUBLE - st.mins[i]::DOUBLE)) * 255.0 + 0.5)::INT END) AS codes,
          list_transform(range(1, len(embedding)+1),
            i -> CASE WHEN st.maxs[i] = st.mins[i] THEN 0.0
                 ELSE (embedding[i]::DOUBLE - st.mins[i]::DOUBLE) /
                      (st.maxs[i]::DOUBLE - st.mins[i]::DOUBLE) END) AS ts
        FROM embeddings CROSS JOIN st),
      r AS (
        SELECT vec_id,
          array_to_string(codes, ',') AS codes,
          round(list_sum(list_transform(range(1, len(codes)+1),
            i -> abs(codes[i]::DOUBLE / 255.0 - ts[i]))) / len(codes), 6) AS recon_err
        FROM q)""".trim

  private val sqQuantize: (String, QFn, Option[String]) = (
    "sq_quantize",
    (s, d) => Quantization.sqQuantize(s, d),
    Some(s"""
      $sqQuantizeSql
      SELECT vec_id, codes, recon_err FROM r ORDER BY vec_id
    """.trim))

  private val sqReport: (String, QFn, Option[String]) = (
    "sq_report",
    (s, d) => Quantization.sqReport(s, d),
    Some(s"""
      $sqQuantizeSql
      SELECT count(*) AS n_vectors,
             round(avg(recon_err), 6) AS avg_recon_err,
             round(max(recon_err), 6) AS max_recon_err
      FROM r
    """.trim))

  /** Sign-bit packing twin of [[Quantization.bqCode]]: bit i = emb[i] > 0,
    * MSB first, sign bit as −2⁶³, hi/lo split against the binder depth cap
    * (the same flat-sum assembly as the 64-bit simhash twin). */
  private val bqCodeSql: String = {
    def term(i: Int, w: Long) = s"CASE WHEN embedding[${i + 1}] > 0 THEN ${w}::BIGINT ELSE 0 END"
    val hi = (1 until 32).map(i => term(i, 1L << (31 - i))).mkString(" + ")
    val lo = (32 until 64).map(i => term(i, 1L << (63 - i))).mkString(" + ")
    s"""((CASE WHEN embedding[1] > 0 THEN -9223372036854775807 - 1 ELSE 0 END)
        + ($hi) * 4294967296 + ($lo))::BIGINT"""
  }

  private val bqQuantizeQ: (String, QFn, Option[String]) = (
    "bq_quantize",
    (s, d) => Quantization.bqQuantize(s, d),
    Some(s"""
      SELECT vec_id, $bqCodeSql AS code FROM embeddings ORDER BY vec_id
    """.trim))

  private val bqSearchQ: (String, QFn, Option[String]) = (
    "bq_search",
    (s, d) => Quantization.bqSearch(s, d),
    Some(s"""
      WITH b AS (SELECT vec_id, $bqCodeSql AS code FROM embeddings),
      q AS (SELECT vec_id AS query_id, code AS qcode FROM b WHERE vec_id < 10),
      s AS (SELECT q.query_id, b.vec_id AS id,
                   bit_count(xor(b.code, q.qcode))::BIGINT AS hamming
            FROM b CROSS JOIN q),
      r AS (SELECT query_id, id, hamming,
                   row_number() OVER (PARTITION BY query_id ORDER BY hamming ASC, id ASC) AS rank
            FROM s)
      SELECT query_id, rank, id, hamming FROM r WHERE rank <= 10
      ORDER BY query_id, rank
    """.trim))

  private val bqRerankQ: (String, QFn, Option[String]) = (
    "bq_rerank_search",
    (s, d) => Quantization.bqRerankSearch(s, d),
    Some(s"""
      WITH b AS (SELECT vec_id, $bqCodeSql AS code FROM embeddings),
      q AS (SELECT vec_id AS query_id, code AS qcode FROM b WHERE vec_id < 10),
      s AS (SELECT q.query_id, b.vec_id AS id,
                   bit_count(xor(b.code, q.qcode))::BIGINT AS hamming
            FROM b CROSS JOIN q),
      cand AS (SELECT query_id, id FROM (
                 SELECT query_id, id,
                        row_number() OVER (PARTITION BY query_id ORDER BY hamming ASC, id ASC) AS hrank
                 FROM s) WHERE hrank <= 100),
      qv AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 10),
      d AS (SELECT cand.query_id, cand.id,
                   ${l2Sql("e.embedding", "qv.qvec")} AS dist
            FROM cand JOIN embeddings e ON cand.id = e.vec_id
                      JOIN qv ON cand.query_id = qv.query_id),
      r AS (SELECT query_id, id, dist,
                   row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, id ASC) AS rank
            FROM d)
      SELECT query_id, rank, id, round(dist, 4) AS dist FROM r WHERE rank <= 10
      ORDER BY query_id, rank
    """.trim))

  private val embedNormalizeQ: (String, QFn, Option[String]) = (
    "embed_normalize",
    (s, d) => Similarity.embedNormalize(s, d),
    Some(s"""
      WITH e AS (SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS nrm
                 FROM embeddings)
      SELECT vec_id, round(nrm, 4) AS norm,
             array_to_string(list_transform(embedding,
               x -> round((x::DOUBLE) / nrm * 10000)::INT), ',') AS unit_x1e4
      FROM e ORDER BY vec_id
    """.trim))

  /** Hard-negative mining: nearest cross-label neighbors per query — the
    * exact contrastive-pair oracle form (ANN at scale). */
  private val hardNegativesQ: (String, QFn, Option[String]) = (
    "hard_negatives",
    (s, d) => Similarity.hardNegatives(s, d),
    Some(s"""
      WITH e AS (SELECT vec_id, embedding, label, sqrt(${dotSql("embedding", "embedding")}) AS nrm
                 FROM embeddings),
      q AS (SELECT vec_id AS query_id, embedding AS qvec, label AS qlabel, nrm AS qn
            FROM e WHERE vec_id < 10),
      sc AS (SELECT q.query_id, q.qlabel::BIGINT AS qlabel, e.vec_id AS neg_id,
                    e.label::BIGINT AS neg_label,
                    ${dotSql("e.embedding", "q.qvec")} / (e.nrm * q.qn) AS cos
             FROM e CROSS JOIN q WHERE e.label <> q.qlabel),
      r AS (SELECT query_id, qlabel, neg_id, neg_label, cos,
                   row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neg_id ASC) AS rank
            FROM sc)
      SELECT query_id, qlabel, rank::BIGINT AS rank, neg_id, neg_label, round(cos, 4) AS cos
      FROM r WHERE rank <= 5 ORDER BY query_id, rank
    """.trim))

  /** The ANN-served mining join (rows-only; exactness carried by the gate
    * twin below, the vamana_fanout_filtered pattern). */
  private val hardNegativesFanoutQ: (String, QFn, Option[String]) = (
    "hard_negatives_fanout",
    (s, d) => graft.vamana.VamanaOps.hardNegativesFanout(s, d),
    None)

  /** Full-beam fanout filtered search under the cos reduction is exact
    * different-label cosine kNN, so every per-query overlap with the
    * brute-force hard_negatives must be min(k, n_other_label). */
  private val hardNegativesFanoutGateQ: (String, QFn, Option[String]) = (
    "hard_negatives_fanout_gate",
    (s, d) => graft.vamana.VamanaOps.hardNegativesFanoutGate(s, d),
    Some("""
      SELECT e.vec_id AS query_id,
             LEAST(5, (SELECT count(*) FROM embeddings x WHERE x.label <> e.label))::BIGINT AS overlap
      FROM embeddings e WHERE e.vec_id < 10 ORDER BY query_id
    """.trim))

  // ---- k-means clustering ---------------------------------------------------

  /** Unrolled Lloyd's k-means as DuckDB CTEs, mirroring
    * [[Clustering.kmeansAssignOf]] step for step: exact 1e6-quantized long
    * coordinates, init = k lowest vec_ids, argmin ties to the lowest
    * cluster id, per-dim floor(sum/count) centroid update, empty clusters
    * keep their previous row. `finalSelect` reads the last assignment CTE
    * a{iters-1} (vec_id, cid, dist). */
  /** c0 from the k lowest vec_ids (the naive deterministic init). */
  private def naiveInitSql(k: Int): String = s"""
      c0 AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, q AS c
        FROM (SELECT vec_id, q FROM e ORDER BY vec_id LIMIT $k) t
      )"""

  /** c0 by deterministic farthest-point traversal over the bounded
    * candidate set (vec_id < 4096, the semdedup sample convention):
    * seed = lowest id; each step adds the candidate maximizing its min
    * distance to the chosen set, ties to the lowest id; cid = selection
    * order. Unrolled k−1 steps, exact long arithmetic throughout —
    * replays [[Clustering.greedyInit]] bit for bit. */
  private def greedyInitSql(k: Int): String = {
    val sb = new StringBuilder
    sb ++= """
      cand AS (SELECT vec_id, q FROM e WHERE vec_id < 4096),
      ch1 AS (SELECT CAST(0 AS BIGINT) AS ord, vec_id, q
              FROM cand ORDER BY vec_id LIMIT 1)"""
    for (t <- 1 until k) {
      sb ++= s""",
      p${t + 1} AS (
        SELECT c.vec_id,
               MIN(CAST(list_sum(list_transform(range(1, len(c.q) + 1),
                    i -> (c.q[i] - ch.q[i]) * (c.q[i] - ch.q[i]))) AS BIGINT)) AS dmin
        FROM cand c CROSS JOIN ch$t ch GROUP BY c.vec_id
      ),
      ch${t + 1} AS (
        SELECT * FROM ch$t UNION ALL
        SELECT CAST($t AS BIGINT) AS ord, c.vec_id, c.q
        FROM cand c JOIN (SELECT vec_id FROM p${t + 1}
                          ORDER BY dmin DESC, vec_id LIMIT 1) w USING (vec_id)
      )"""
    }
    sb ++= s""",
      c0 AS (SELECT ord AS cid, q AS c FROM ch$k)"""
    sb.toString
  }

  private def kmeansSql(k: Int, iters: Int, finalSelect: String,
      initSql: String = null): String = {
    val sb = new StringBuilder
    sb ++= s"""
      WITH e AS (
        SELECT vec_id,
               list_transform(embedding,
                 v -> CAST(floor(CAST(v AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS q
        FROM embeddings
      ),"""
    sb ++= (if (initSql == null) naiveInitSql(k) else initSql)
    for (t <- 0 until iters) {
      sb ++= s""",
      d$t AS (
        SELECT e.vec_id, c$t.cid,
               CAST(list_sum(list_transform(range(1, len(e.q) + 1),
                    i -> (e.q[i] - c$t.c[i]) * (e.q[i] - c$t.c[i]))) AS BIGINT) AS dist
        FROM e CROSS JOIN c$t
      ),
      a$t AS (
        SELECT vec_id, cid, dist FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d$t
        ) r WHERE rn = 1
      )"""
      if (t < iters - 1) sb ++= s""",
      u$t AS (
        SELECT a$t.cid, r.i,
               CAST(floor(CAST(SUM(e.q[r.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
        FROM a$t JOIN e USING (vec_id), unnest(range(1, len(e.q) + 1)) AS r(i)
        GROUP BY a$t.cid, r.i
      ),
      c${t + 1} AS (
        SELECT c$t.cid, COALESCE(n.c, c$t.c) AS c
        FROM c$t LEFT JOIN
          (SELECT cid, list(m ORDER BY i) AS c FROM u$t GROUP BY cid) n USING (cid)
      )"""
    }
    sb ++= "\n      " + finalSelect
    sb.toString.trim
  }

  private val embedKmeansQ: (String, QFn, Option[String]) = (
    "embed_kmeans",
    (s, d) => Clustering.kmeansAssign(s, d),
    Some(kmeansSql(8, 2,
      "SELECT vec_id, cid AS cluster, dist FROM a1 ORDER BY vec_id")))

  private val embedKmeansGreedyQ: (String, QFn, Option[String]) = (
    "embed_kmeans_greedy",
    (s, d) => Clustering.kmeansAssignGreedy(s, d),
    Some(kmeansSql(8, 2,
      "SELECT vec_id, cid AS cluster, dist FROM a1 ORDER BY vec_id",
      initSql = greedyInitSql(8))))

  private val embedKmeansStatsQ: (String, QFn, Option[String]) = (
    "embed_kmeans_stats",
    (s, d) => Clustering.kmeansStats(s, d),
    Some(kmeansSql(8, 2,
      """SELECT cid AS cluster, COUNT(*)::BIGINT AS n, CAST(SUM(dist) AS BIGINT) AS inertia,
               MIN(dist) AS min_dist, MAX(dist) AS max_dist
         FROM a1 GROUP BY cid ORDER BY cluster""")))

  private val clusterSampleBalancedQ: (String, QFn, Option[String]) = (
    "cluster_sample_balanced",
    (s, d) => Clustering.clusterBalancedSample(s, d),
    Some(kmeansSql(8, 2,
      """SELECT vec_id, cluster, rn FROM (
           SELECT vec_id, cid AS cluster,
                  CAST(row_number() OVER (PARTITION BY cid
                       ORDER BY CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS DOUBLE),
                                vec_id) AS BIGINT) AS rn
           FROM a1) s
         WHERE rn <= 40 ORDER BY vec_id""")))

  /** Simplified silhouette off the final iteration's full distance frame
    * (d1 holds every (point, centroid) distance): a = rank-1 by (dist,cid),
    * b = rank-2 — the same tie rule as assignment. */
  private val clusterSilhouetteQ: (String, QFn, Option[String]) = (
    "cluster_silhouette",
    (s, d) => Clustering.kmeansSilhouette(s, d),
    Some(kmeansSql(8, 2,
      """, r AS (
           SELECT vec_id, cid, dist,
                  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
           FROM d1
         ),
         sil AS (
           SELECT f.vec_id, f.cid AS cluster,
                  CASE WHEN g.dist = 0 THEN 0.0
                       ELSE round(CAST(g.dist - f.dist AS DOUBLE) / CAST(g.dist AS DOUBLE), 4)
                  END AS s
           FROM (SELECT * FROM r WHERE rn = 1) f
           JOIN (SELECT * FROM r WHERE rn = 2) g USING (vec_id)
         )
         SELECT cluster, COUNT(*)::BIGINT AS n,
                round(CAST(SUM(CAST(s AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS mean_silhouette
         FROM sil GROUP BY cluster ORDER BY cluster""")))

  /** Cross-modal curation: k-means diversity × textStats quality — the
    * top-30-by-quality docs of each embedding cluster (ties to doc_id;
    * quality_score is the textStats oracle's own formula verbatim). */
  private val clusterCuratedDocsQ: (String, QFn, Option[String]) = (
    "cluster_curated_docs",
    (s, d) => Clustering.clusterCuratedDocs(s, d),
    Some(kmeansSql(8, 2,
      s""", tk AS ($toksCte),
         qual AS (
           SELECT doc_id,
                  round(least(len(toks)::DOUBLE / 100.0, 1.0) * 0.6 +
                        (1.0 - (len(text) - len(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')))::DOUBLE / len(text)) * 0.2 +
                        least(len(list_filter(toks, x -> list_contains($stopwordsList, x)))::DOUBLE / len(toks) * 5.0, 1.0) * 0.2,
                        4) AS quality_score
           FROM tk
         ),
         jq AS (
           SELECT a1.vec_id AS doc_id, a1.cid AS cluster, q.quality_score
           FROM a1 JOIN qual q ON q.doc_id = a1.vec_id
         ),
         rr AS (
           SELECT *, CAST(row_number() OVER (PARTITION BY cluster
                ORDER BY quality_score DESC, doc_id) AS BIGINT) AS rank
           FROM jq
         )
         SELECT doc_id, cluster, rank, quality_score
         FROM rr WHERE rank <= 30 ORDER BY doc_id""")))

  /** Split-wise per-dim mean drift: the splitAssign hash rule + the shared
    * half-up micro quantizer, floor-div means, max pairwise |diff|. */
  /** Embedding-norm MAD outliers: the oracle replays the norm-squared
    * fold (the shared distance arithmetic), the planted straggler/dead
    * mutations, and the interpolated median/MAD per label, so every cell
    * — including the non-zero outlier counts — hash-matches. */
  private val embedNormOutliersQ: (String, QFn, Option[String]) = (
    "embed_norm_outliers",
    (s, d) => Similarity.embedNormOutliers(s, d),
    Some("""
      WITH r AS (SELECT vec_id, label::BIGINT AS label,
               list_sum(list_transform(range(1, len(embedding)+1),
                 i -> (embedding[i]::DOUBLE) * (embedding[i]::DOUBLE))) AS raw
             FROM embeddings),
      v AS (SELECT label,
               round(CASE WHEN vec_id % 29 = 0 THEN raw * 9.0
                          WHEN vec_id % 31 = 0 THEN 0.0
                          ELSE raw END, 4) AS n2
            FROM r),
      med AS (SELECT label, median(n2) AS m FROM v GROUP BY 1),
      dev AS (SELECT v.label, abs(v.n2 - med.m) AS dv, med.m AS m
              FROM v JOIN med USING (label)),
      mad AS (SELECT label, median(dv) AS md FROM dev GROUP BY 1)
      SELECT dev.label,
             count(*)::BIGINT AS n_vecs,
             any_value(dev.m)::DOUBLE AS med_norm2,
             any_value(mad.md)::DOUBLE AS mad_norm2,
             (count(*) FILTER (dev.dv > 3 * mad.md))::BIGINT AS n_outliers
      FROM dev JOIN mad USING (label)
      GROUP BY 1 ORDER BY 1
    """.trim))

  private val splitDriftQ: (String, QFn, Option[String]) = (
    "split_drift",
    (s, d) => Similarity.splitDrift(s, d),
    Some("""
      WITH e AS (
        SELECT list_transform(embedding,
                 v -> CAST(floor(CAST(v AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS q,
               CASE WHEN b < 98 THEN 'train' WHEN b = 98 THEN 'val' ELSE 'test' END AS split
        FROM (SELECT vec_id, embedding,
                ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT % 100 AS b
              FROM embeddings)
      ),
      cells AS (
        SELECT split, r.i AS dim,
               CAST(floor(CAST(SUM(q[r.i + 1]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mean_q
        FROM e, unnest(range(0, len(q))) AS r(i)
        GROUP BY split, r.i
      ),
      p AS (
        SELECT dim,
               MAX(CASE WHEN split = 'train' THEN mean_q END) AS mean_train,
               MAX(CASE WHEN split = 'val' THEN mean_q END) AS mean_val,
               MAX(CASE WHEN split = 'test' THEN mean_q END) AS mean_test
        FROM cells GROUP BY dim
      )
      SELECT dim, mean_train, mean_val, mean_test,
             greatest(abs(coalesce(mean_train, 0) - coalesce(mean_val, 0)),
                      abs(coalesce(mean_train, 0) - coalesce(mean_test, 0)),
                      abs(coalesce(mean_val, 0) - coalesce(mean_test, 0))) AS max_drift
      FROM p ORDER BY dim
    """.trim))

  /** Nightly-fit / daily-assign: Lloyd over the even-id historical slice
    * (1 update round), then the odd-id batch scored against the frozen
    * matrix — the same recurrence as the shared builder, with the fit and
    * assignment sources split. */
  private val embedKmeansIncrementalQ: (String, QFn, Option[String]) = (
    "embed_kmeans_incremental",
    (s, d) => Clustering.kmeansAssignIncremental(s, d),
    Some("""
      WITH e AS (
        SELECT vec_id,
               list_transform(embedding,
                 v -> CAST(floor(CAST(v AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS q
        FROM embeddings
      ),
      eh AS (SELECT * FROM e WHERE vec_id % 2 = 0),
      eb AS (SELECT * FROM e WHERE vec_id % 2 = 1),
      c0 AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, q AS c
        FROM (SELECT vec_id, q FROM eh ORDER BY vec_id LIMIT 8) t
      ),
      d0 AS (
        SELECT eh.vec_id, c0.cid,
               CAST(list_sum(list_transform(range(1, len(eh.q) + 1),
                    i -> (eh.q[i] - c0.c[i]) * (eh.q[i] - c0.c[i]))) AS BIGINT) AS dist
        FROM eh CROSS JOIN c0
      ),
      a0 AS (
        SELECT vec_id, cid, dist FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d0
        ) r WHERE rn = 1
      ),
      u0 AS (
        SELECT a0.cid, r.i,
               CAST(floor(CAST(SUM(eh.q[r.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
        FROM a0 JOIN eh USING (vec_id), unnest(range(1, len(eh.q) + 1)) AS r(i)
        GROUP BY a0.cid, r.i
      ),
      c1 AS (
        SELECT c0.cid, COALESCE(n.c, c0.c) AS c
        FROM c0 LEFT JOIN
          (SELECT cid, list(m ORDER BY i) AS c FROM u0 GROUP BY cid) n USING (cid)
      ),
      db AS (
        SELECT eb.vec_id, c1.cid,
               CAST(list_sum(list_transform(range(1, len(eb.q) + 1),
                    i -> (eb.q[i] - c1.c[i]) * (eb.q[i] - c1.c[i]))) AS BIGINT) AS dist
        FROM eb CROSS JOIN c1
      ),
      ab AS (
        SELECT vec_id, cid, dist FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM db
        ) r WHERE rn = 1
      )
      SELECT vec_id, cid AS cluster, dist FROM ab ORDER BY vec_id
    """.trim))

  /** Mini-batch fit: each update round recomputes centroids from the
    * deterministic 20% bucket md5(vec_id:round) % 100 < 20, final
    * assignment over the full corpus — the fit recurrence replayed batch
    * for batch. */
  private val embedKmeansMinibatchQ: (String, QFn, Option[String]) = (
    "embed_kmeans_minibatch",
    (s, d) => Clustering.kmeansAssignMinibatch(s, d),
    Some("""
      WITH e AS (
        SELECT vec_id,
               list_transform(embedding,
                 v -> CAST(floor(CAST(v AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS q
        FROM embeddings
      ),
      c0 AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, q AS c
        FROM (SELECT vec_id, q FROM e ORDER BY vec_id LIMIT 8) t
      ),
      b0 AS (SELECT * FROM e
             WHERE ('0x' || substr(md5(vec_id::VARCHAR || ':0'), 1, 15))::BIGINT % 100 < 20),
      d0 AS (
        SELECT b0.vec_id, c0.cid,
               CAST(list_sum(list_transform(range(1, len(b0.q) + 1),
                    i -> (b0.q[i] - c0.c[i]) * (b0.q[i] - c0.c[i]))) AS BIGINT) AS dist
        FROM b0 CROSS JOIN c0
      ),
      a0 AS (
        SELECT vec_id, cid, dist FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d0
        ) r WHERE rn = 1
      ),
      u0 AS (
        SELECT a0.cid, r.i,
               CAST(floor(CAST(SUM(b0.q[r.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
        FROM a0 JOIN b0 USING (vec_id), unnest(range(1, len(b0.q) + 1)) AS r(i)
        GROUP BY a0.cid, r.i
      ),
      c1 AS (
        SELECT c0.cid, COALESCE(n.c, c0.c) AS c
        FROM c0 LEFT JOIN
          (SELECT cid, list(m ORDER BY i) AS c FROM u0 GROUP BY cid) n USING (cid)
      ),
      b1 AS (SELECT * FROM e
             WHERE ('0x' || substr(md5(vec_id::VARCHAR || ':1'), 1, 15))::BIGINT % 100 < 20),
      d1 AS (
        SELECT b1.vec_id, c1.cid,
               CAST(list_sum(list_transform(range(1, len(b1.q) + 1),
                    i -> (b1.q[i] - c1.c[i]) * (b1.q[i] - c1.c[i]))) AS BIGINT) AS dist
        FROM b1 CROSS JOIN c1
      ),
      a1 AS (
        SELECT vec_id, cid, dist FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d1
        ) r WHERE rn = 1
      ),
      u1 AS (
        SELECT a1.cid, r.i,
               CAST(floor(CAST(SUM(b1.q[r.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
        FROM a1 JOIN b1 USING (vec_id), unnest(range(1, len(b1.q) + 1)) AS r(i)
        GROUP BY a1.cid, r.i
      ),
      c2 AS (
        SELECT c1.cid, COALESCE(n.c, c1.c) AS c
        FROM c1 LEFT JOIN
          (SELECT cid, list(m ORDER BY i) AS c FROM u1 GROUP BY cid) n USING (cid)
      ),
      da AS (
        SELECT e.vec_id, c2.cid,
               CAST(list_sum(list_transform(range(1, len(e.q) + 1),
                    i -> (e.q[i] - c2.c[i]) * (e.q[i] - c2.c[i]))) AS BIGINT) AS dist
        FROM e CROSS JOIN c2
      ),
      aa AS (
        SELECT vec_id, cid, dist FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM da
        ) r WHERE rn = 1
      )
      SELECT vec_id, cid AS cluster, dist FROM aa ORDER BY vec_id
    """.trim))

}
