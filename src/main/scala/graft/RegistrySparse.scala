package graft

import graft.operators._
import graft.RegistrySqlParts._

/** Learned-sparse retrieval registered queries (impact encode, index
  * stats, inverted-index top-k, champion-list pricing) with their DuckDB
  * oracle SQL. Split per-family like the other Registry* objects; the
  * aggregate surface lives in [[PipelineRegistry]]. */
private[graft] object RegistrySparse {

  private[graft] def entries: Seq[(String, QFn, Option[String])] = Seq(
    sparseEncodeQ, sparseIndexStatsQ, sparseTopkQ, sparseChampionGateQ,
    trimodalFusionQ)

  /** Shared CTE chain — the encoder both engines agree on: whitespace
    * tokens (the BM25 leg's tokenization), impact = (1+ln(tf))·ln((N+1)/
    * (df+1)) rounded 6 dp, positive impacts only, top-8 per doc by
    * (w desc, term asc). Constants and expression shapes are spelled
    * identically to the Spark side so the IEEE arithmetic is
    * bit-identical (the bm25_retrieval contract). */
  private val sparseCtes = """
      t AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term FROM documents),
      tc AS (SELECT doc_id, term, count(*) AS c FROM t WHERE term <> '' GROUP BY doc_id, term),
      st AS (SELECT count(*)::DOUBLE AS nd FROM (SELECT DISTINCT doc_id FROM tc)),
      dfs AS (SELECT term, count(*) AS df FROM tc GROUP BY term),
      w AS (SELECT doc_id, term, w FROM (
              SELECT tc.doc_id, tc.term,
                     round((1.0 + ln(tc.c)) * ln((st.nd + 1.0) / (dfs.df + 1.0)), 6) AS w
              FROM tc JOIN dfs USING (term) CROSS JOIN st)
            WHERE w > 0),
      pruned AS (SELECT doc_id, term, w, r FROM (
                   SELECT doc_id, term, w,
                          row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, term ASC) AS r
                   FROM w)
                 WHERE r <= 8)""".trim

  /** Query-side CTEs: the standing literal query set with idf-head weights
    * (query tf = 1), then the exact inverted-index top-5. */
  private val sparseServeCtes = s"""
      $sparseCtes,
      qt(qid, term) AS (VALUES (1, 'hash'), (1, 'join'),
                               (2, 'vector'), (2, 'scan'), (2, 'fast'),
                               (3, 'window'), (3, 'agg'), (3, 'merge')),
      qw AS (SELECT qt.qid, qt.term,
                    round(ln((st.nd + 1.0) / (coalesce(dfs.df, 0) + 1.0)), 6) AS wq
             FROM qt LEFT JOIN dfs USING (term) CROSS JOIN st),
      co AS (SELECT qw.qid, pruned.doc_id,
                    round(qw.wq * pruned.w, 6)::DECIMAL(18,6) AS contrib
             FROM pruned JOIN qw USING (term)),
      sc AS (SELECT qid, doc_id, round(sum(contrib), 4) AS s4 FROM co GROUP BY qid, doc_id),
      r AS (SELECT qid, doc_id, s4,
                   row_number() OVER (PARTITION BY qid ORDER BY s4 DESC, doc_id ASC) AS rank
            FROM sc)""".trim

  private val sparseEncodeQ: (String, QFn, Option[String]) = (
    "sparse_encode",
    (s, d) => SparseRetrieval.sparseEncode(s, d),
    Some(s"""
      WITH $sparseCtes
      SELECT doc_id, r::BIGINT AS rank, term, w
      FROM pruned ORDER BY doc_id, rank
    """.trim))

  private val sparseIndexStatsQ: (String, QFn, Option[String]) = (
    "sparse_index_stats",
    (s, d) => SparseRetrieval.sparseIndexStats(s, d),
    Some(s"""
      WITH $sparseCtes
      SELECT (SELECT count(DISTINCT doc_id) FROM w)::BIGINT AS n_docs,
             (SELECT count(DISTINCT term) FROM w)::BIGINT AS vocab_full,
             (SELECT count(DISTINCT term) FROM pruned)::BIGINT AS vocab_kept,
             (SELECT count(*) FROM w)::BIGINT AS postings_full,
             (SELECT count(*) FROM pruned)::BIGINT AS postings_kept,
             round((SELECT sum(w::DECIMAL(18,6)) FROM pruned)::DOUBLE /
                   (SELECT sum(w::DECIMAL(18,6)) FROM w)::DOUBLE, 4) AS mass_kept,
             (SELECT max(n) FROM (SELECT term, count(*) AS n FROM pruned GROUP BY term))::BIGINT AS max_list_kept
    """.trim))

  private val sparseTopkQ: (String, QFn, Option[String]) = (
    "sparse_topk",
    (s, d) => SparseRetrieval.sparseTopk(s, d),
    Some(s"""
      WITH $sparseServeCtes
      SELECT qid::BIGINT AS qid, rank, doc_id, s4::DOUBLE AS score
      FROM r WHERE rank <= 5 ORDER BY qid, rank
    """.trim))

  private val sparseChampionGateQ: (String, QFn, Option[String]) = (
    "sparse_champion_gate",
    (s, d) => SparseRetrieval.sparseChampionGate(s, d),
    Some(s"""
      WITH $sparseServeCtes,
      cs(cval) AS (VALUES (10), (50), (120)),
      chr AS (SELECT doc_id, term, w,
                     row_number() OVER (PARTITION BY term ORDER BY w DESC, doc_id ASC) AS rc
              FROM pruned),
      cco AS (SELECT cs.cval, qw.qid, chr.doc_id,
                     round(qw.wq * chr.w, 6)::DECIMAL(18,6) AS contrib
              FROM chr JOIN qw USING (term) CROSS JOIN cs
              WHERE chr.rc <= cs.cval),
      csc AS (SELECT cval, qid, doc_id, round(sum(contrib), 4) AS s4
              FROM cco GROUP BY cval, qid, doc_id),
      cr AS (SELECT cval, qid, doc_id,
                    row_number() OVER (PARTITION BY cval, qid ORDER BY s4 DESC, doc_id ASC) AS rank
             FROM csc),
      ex AS (SELECT qid, doc_id FROM r WHERE rank <= 5),
      cx AS (SELECT cval, qid, doc_id FROM cr WHERE rank <= 5),
      ov AS (SELECT cval, qid, count(*)::BIGINT AS ovl
             FROM (SELECT cx.cval, cx.qid FROM cx JOIN ex USING (qid, doc_id))
             GROUP BY cval, qid),
      tf AS (SELECT qid, count(*)::BIGINT AS tfull FROM co GROUP BY qid),
      tch AS (SELECT cval, qid, count(*)::BIGINT AS tchamp FROM cco GROUP BY cval, qid),
      grid AS (SELECT cs.cval, q.qid FROM cs CROSS JOIN (SELECT DISTINCT qid FROM qt) q)
      SELECT grid.qid::BIGINT AS qid, grid.cval::BIGINT AS c,
             coalesce(ov.ovl, 0) AS overlap,
             coalesce(tf.tfull, 0) AS touched_full,
             coalesce(tch.tchamp, 0) AS touched_champion
      FROM grid
      LEFT JOIN ov ON grid.qid = ov.qid AND grid.cval = ov.cval
      LEFT JOIN tf ON grid.qid = tf.qid
      LEFT JOIN tch ON grid.qid = tch.qid AND grid.cval = tch.cval
      ORDER BY qid, c
    """.trim))

  /** Tri-modal RRF: the hybrid_retrieval lex/vec CTEs verbatim (same
    * query-by-example ids < 5), plus the sparse query-by-example leg over
    * the pruned index; rrf terms rounded 6 dp and summed as
    * DECIMAL(18,6) so the three-way sum is exact and order-free. */
  private val trimodalFusionQ: (String, QFn, Option[String]) = (
    "trimodal_fusion",
    (s, d) => SparseRetrieval.trimodalFusion(s, d),
    Some(s"""
      WITH t AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term FROM documents),
      tc AS (SELECT doc_id, term, count(*) AS c FROM t WHERE term <> '' GROUP BY doc_id, term),
      dl AS (SELECT doc_id, sum(c) AS n FROM tc GROUP BY doc_id),
      st AS (SELECT count(*)::DOUBLE AS nd, sum(n)::DOUBLE / count(*) AS avgdl FROM dl),
      dfs AS (SELECT term, count(*) AS df FROM tc GROUP BY term),
      qt AS (SELECT DISTINCT doc_id AS qid, term FROM t WHERE term <> '' AND doc_id < 5),
      qi AS (SELECT qt.qid, qt.term,
                    ln((st.nd - coalesce(dfs.df, 0) + 0.5) /
                       (coalesce(dfs.df, 0) + 0.5) + 1.0) AS idf,
                    st.avgdl
             FROM qt LEFT JOIN dfs USING (term) CROSS JOIN st),
      co AS (SELECT qi.qid, tc.doc_id,
                    round(qi.idf * (tc.c * (1.2 + 1.0)) /
                          (tc.c + 1.2 * (1.0 - 0.75 + 0.75 *
                            (dl.n::DOUBLE / qi.avgdl))), 6)::DECIMAL(18,6) AS contrib
             FROM tc JOIN qi USING (term) JOIN dl USING (doc_id)
             WHERE tc.doc_id <> qi.qid),
      lsc AS (SELECT qid, doc_id, round(sum(contrib), 4) AS s4 FROM co GROUP BY qid, doc_id),
      lex AS (SELECT qid, doc_id, lrank FROM (
                SELECT qid, doc_id,
                       row_number() OVER (PARTITION BY qid ORDER BY s4 DESC, doc_id ASC) AS lrank
                FROM lsc) WHERE lrank <= 10),
      e AS (SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS nrm
            FROM embeddings),
      qv AS (SELECT vec_id AS qid, embedding AS qvec, nrm AS qn FROM e WHERE vec_id < 5),
      vs AS (SELECT qv.qid, e.vec_id AS doc_id,
                    ${dotSql("e.embedding", "qv.qvec")} / (e.nrm * qv.qn) AS cos
             FROM e CROSS JOIN qv WHERE e.vec_id <> qv.qid),
      vec AS (SELECT qid, doc_id, vrank FROM (
                SELECT qid, doc_id,
                       row_number() OVER (PARTITION BY qid ORDER BY cos DESC, doc_id ASC) AS vrank
                FROM vs) WHERE vrank <= 10),
      w AS (SELECT doc_id, term, w FROM (
              SELECT tc.doc_id, tc.term,
                     round((1.0 + ln(tc.c)) * ln((st.nd + 1.0) / (dfs.df + 1.0)), 6) AS w
              FROM tc JOIN dfs USING (term) CROSS JOIN st)
            WHERE w > 0),
      pruned AS (SELECT doc_id, term, w FROM (
                   SELECT doc_id, term, w,
                          row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, term ASC) AS r
                   FROM w)
                 WHERE r <= 8),
      qsp AS (SELECT doc_id AS qid, term, w AS wq FROM pruned WHERE doc_id < 5),
      co3 AS (SELECT qsp.qid, pruned.doc_id,
                     round(qsp.wq * pruned.w, 6)::DECIMAL(18,6) AS contrib
              FROM pruned JOIN qsp USING (term)
              WHERE pruned.doc_id <> qsp.qid),
      sc3 AS (SELECT qid, doc_id, round(sum(contrib), 4) AS s4 FROM co3 GROUP BY qid, doc_id),
      sp AS (SELECT qid, doc_id, sprank FROM (
               SELECT qid, doc_id,
                      row_number() OVER (PARTITION BY qid ORDER BY s4 DESC, doc_id ASC) AS sprank
               FROM sc3) WHERE sprank <= 10),
      legs AS (SELECT qid, doc_id, 0 AS leg, lrank AS rnk FROM lex
               UNION ALL SELECT qid, doc_id, 1, vrank FROM vec
               UNION ALL SELECT qid, doc_id, 2, sprank FROM sp),
      fused AS (SELECT qid, doc_id,
                       sum(round(1.0 / (60 + rnk), 6)::DECIMAL(18,6)) AS rrfd,
                       coalesce(max(CASE WHEN leg = 0 THEN rnk END), -1)::BIGINT AS lex_rank,
                       coalesce(max(CASE WHEN leg = 1 THEN rnk END), -1)::BIGINT AS vec_rank,
                       coalesce(max(CASE WHEN leg = 2 THEN rnk END), -1)::BIGINT AS sparse_rank
                FROM legs GROUP BY qid, doc_id),
      r3 AS (SELECT qid, doc_id, rrfd, lex_rank, vec_rank, sparse_rank,
                    row_number() OVER (PARTITION BY qid ORDER BY rrfd DESC, doc_id ASC) AS rank
             FROM fused)
      SELECT qid::BIGINT AS qid, rank, doc_id, rrfd::DOUBLE AS rrf,
             lex_rank, vec_rank, sparse_rank
      FROM r3 WHERE rank <= 10 ORDER BY qid, rank
    """.trim))
}
