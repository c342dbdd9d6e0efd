package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.RegistrySqlParts._

/** Dedup-family registered queries (exact/minhash/simhash/ngram/paragraph/substring/line/chunk dedup, survivors, contamination, source overlap + pagerank) with their DuckDB oracle SQL. Split from the monolithic PipelineRegistry; the
  * aggregate surface (and entry order) lives there. */
private[graft] object RegistryDedup {

  private[graft] def entries: Seq[(String, QFn, Option[String])] = Seq(
    dedupExact, dedupNgram, dedupMinhash, dedupSimhash, dedupEmbedding, dedupSurvivorsQ, dedupIncrementalQ, bloomDedupQ, dedupEmbSurvivorsQ, contaminationQ, dedupParagraphQ, dedupParagraphSurvivorsQ, dedupClusterStatsQ, dedupSoftWeightsQ, sourceOverlapQ, ngramNoveltyQ, chunkDedupQ, textSimTopKQ, decontaminateQ, substringDedupQ, substringDedupFrozenQ, substringDedupJoinQ, lineDedupQ, sourcePagerankQ, winnowFingerprintQ, winnowOverlapQ, winnowRowformGateQ, dedupContainmentQ, fuzzyEntityMatchQ, softWeightSampleQ)

  // ---- dedup ----------------------------------------------------------------

  private[graft] val dedupExact: (String, QFn, Option[String]) = (
    "dedup_exact",
    (s, d) => Dedup.dedupExact(s, d),
    Some("""
      WITH n AS (SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash
                 FROM documents)
      SELECT min(doc_id) AS doc_id, content_hash, count(*) AS n_copies
      FROM n GROUP BY content_hash ORDER BY doc_id
    """.trim))

  /** Inverted-index n-gram jaccard with the document-frequency cutoff —
    * mirrors [[Dedup.ngramJaccardPairs]] exactly (intersection counted over
    * surviving shingles only; |A|/|B| stay full shingle counts). Ends in a
    * `pr(id_a, id_b, jaccard)` CTE. */
  private[graft] def ngramPairsCtes(maxDf: Int): String =
    s"""ex AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS s
             FROM (SELECT doc_id, unnest(sh) AS s FROM s)),
      rare AS (SELECT s FROM (SELECT s, count(*) AS df FROM ex GROUP BY s) WHERE df <= $maxDf),
      exf AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s)),
      cnt AS (SELECT doc_id, len(sh) AS n FROM s),
      ic AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
             FROM exf a JOIN exf b ON a.s = b.s AND a.doc_id < b.doc_id
             GROUP BY a.doc_id, b.doc_id),
      pr AS (SELECT id_a, id_b, ic.c::DOUBLE / (na.n + nb.n - ic.c) AS jaccard
             FROM ic JOIN cnt na ON id_a = na.doc_id JOIN cnt nb ON id_b = nb.doc_id)"""

  /** Asymmetric retrieval twin of the pair CTEs: query side restricted to
    * doc_id ≡ 0 (mod 100), rank on the RAW double (integer inputs + one
    * division — bit-identical in both engines), ties broken by match id. */
  private val textSimTopKQ: (String, QFn, Option[String]) = (
    "text_sim_topk",
    (s, d) => Dedup.textSimTopK(s, d),
    Some(s"""
      WITH s AS ($shingledCte),
      ex AS (SELECT doc_id, ('0x' || substr(md5(sh1), 1, 15))::BIGINT AS s
             FROM (SELECT doc_id, unnest(sh) AS sh1 FROM s)),
      rare AS (SELECT s FROM (SELECT s, count(*) AS df FROM ex GROUP BY s)
               WHERE df <= ${Dedup.DefaultMaxShingleDf}),
      exf AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s)),
      cnt AS (SELECT doc_id, len(sh) AS n FROM s),
      ic AS (SELECT a.doc_id AS qid, b.doc_id AS did, count(*) AS c
             FROM exf a JOIN exf b ON a.s = b.s AND a.doc_id != b.doc_id
             WHERE a.doc_id % 100 = 0
             GROUP BY a.doc_id, b.doc_id),
      sc AS (SELECT qid, did, ic.c::DOUBLE / (nq.n + nd.n - ic.c) AS jaccard
             FROM ic JOIN cnt nq ON qid = nq.doc_id JOIN cnt nd ON did = nd.doc_id),
      r AS (SELECT qid, did, jaccard,
              row_number() OVER (PARTITION BY qid ORDER BY jaccard DESC, did ASC) AS rank
            FROM sc)
      SELECT qid AS query_doc, rank::BIGINT AS rank, did AS match_doc,
             round(jaccard, 4) AS jaccard
      FROM r WHERE rank <= 5 ORDER BY query_doc, rank
    """.trim))

  private val dedupNgram: (String, QFn, Option[String]) = (
    "dedup_ngram_jaccard",
    (s, d) => Dedup.dedupNgramJaccard(s, d),
    Some(s"""
      WITH s AS ($shingledCte),
      ${ngramPairsCtes(Dedup.DefaultMaxShingleDf)}
      SELECT id_a, id_b, round(jaccard, 4) AS jaccard
      FROM pr WHERE jaccard >= 0.2 ORDER BY id_a, id_b
    """.trim))

  /** Subset-duplication twin of the jaccard pairs: shared / min(|A|,|B|).
    * Same `ic`/`cnt` CTEs (and df cutoff), different final score — catches
    * the short-doc-pasted-into-long-doc shape jaccard structurally misses. */
  private val dedupContainmentQ: (String, QFn, Option[String]) = (
    "dedup_containment",
    (s, d) => Dedup.dedupContainment(s, d),
    Some(s"""
      WITH s AS ($shingledCte),
      ${ngramPairsCtes(Dedup.DefaultMaxShingleDf)},
      ct AS (SELECT id_a, id_b, ic.c AS shared,
                    ic.c::DOUBLE / least(na.n, nb.n) AS containment
             FROM ic JOIN cnt na ON id_a = na.doc_id JOIN cnt nb ON id_b = nb.doc_id)
      SELECT id_a, id_b, shared, round(containment, 4) AS containment
      FROM ct WHERE containment >= 0.6 ORDER BY id_a, id_b
    """.trim))

  /** Blocked fuzzy entity resolution over deterministically-mutated part
    * names; DuckDB's `jaro_winkler_similarity` is the scoring oracle for the
    * codegen'd [[graft.functions.JaroWinkler]] (semantics fuzz-verified:
    * empty→0, window = max(l)/2−1, boost only when jaro > 0.7). */
  private val fuzzyEntityMatchQ: (String, QFn, Option[String]) = (
    "fuzzy_entity_match",
    (s, d) => Dedup.fuzzyEntityMatch(s, d),
    Some("""
      WITH p AS (SELECT p_partkey, p_name FROM part),
      v AS (SELECT (p_partkey + 10000000)::BIGINT AS variant_id,
                   substr(p_name, 1, (p_partkey % 3 + 5)::INT - 1) ||
                   substr(p_name, (p_partkey % 3 + 5)::INT + 1, 1000000) AS vname
            FROM p WHERE p_partkey % 7 = 0 AND length(p_name) >= 8),
      sc AS (SELECT variant_id, p_partkey, vname, p_name,
                    jaro_winkler_similarity(vname, p_name) AS jw
             FROM v JOIN p ON substr(vname, 1, 4) = substr(p_name, 1, 4)
                          AND substr(vname, length(vname), 1) = substr(p_name, length(p_name), 1)
                          AND abs(length(vname) - length(p_name)) <= 2),
      f AS (SELECT *, row_number() OVER (PARTITION BY variant_id
                        ORDER BY jw DESC, p_partkey ASC) AS rk
            FROM sc WHERE jw >= 0.9)
      SELECT variant_id, p_partkey AS matched_key,
             levenshtein(vname, p_name)::BIGINT AS edit_distance,
             round(jw, 4) AS jw
      FROM f WHERE rk = 1 ORDER BY variant_id
    """.trim))

  /** Paragraph-level near-dup spans: the document-level `s` CTE swapped for
    * one whose "documents" are packed (doc_id << 20 | para_idx) token
    * windows — the pair CTEs are reused verbatim. */
  private val dedupParagraphQ: (String, QFn, Option[String]) = (
    "dedup_paragraph",
    (s, d) => Dedup.dedupParagraph(s, d),
    Some(s"""
      WITH t AS ($toksCte),
      w AS (SELECT doc_id, unnest(range(1, greatest(len(toks),1)+1, 32)) AS st, toks FROM t),
      p AS (SELECT doc_id, CAST((st-1)//32 AS BIGINT) AS para_idx,
                   list_slice(toks, st, st+31) AS ptoks FROM w),
      s AS (SELECT doc_id * 1048576 + para_idx AS doc_id,
                   list_distinct(list_transform(range(1, len(ptoks)-1),
                     i -> ptoks[i] || ' ' || ptoks[i+1] || ' ' || ptoks[i+2])) AS sh
            FROM p WHERE len(ptoks) >= 3),
      ${ngramPairsCtes(Dedup.DefaultMaxShingleDf)},
      d AS (SELECT id_b, min(id_a) AS dup_of FROM pr WHERE jaccard >= 0.5 GROUP BY id_b)
      SELECT id_b // 1048576 AS doc_id, CAST(id_b % 1048576 AS BIGINT) AS para_idx,
             dup_of // 1048576 AS dup_of_doc, CAST(dup_of % 1048576 AS BIGINT) AS dup_of_para
      FROM d ORDER BY doc_id, para_idx
    """.trim))

  /** Span-level survivor canonicalization — the paragraph pair graph
    * through the same fixpoint CC pass, recursive-CTE oracle like
    * dedup_survivors. */
  private val dedupParagraphSurvivorsQ: (String, QFn, Option[String]) = (
    "dedup_paragraph_survivors",
    (s, d) => Dedup.dedupParagraphSurvivors(s, d),
    Some(s"""
      WITH RECURSIVE
      t AS ($toksCte),
      w AS (SELECT doc_id, unnest(range(1, greatest(len(toks),1)+1, 32)) AS st, toks FROM t),
      p AS (SELECT doc_id, CAST((st-1)//32 AS BIGINT) AS para_idx,
                   list_slice(toks, st, st+31) AS ptoks FROM w),
      s AS (SELECT doc_id * 1048576 + para_idx AS doc_id,
                   list_distinct(list_transform(range(1, len(ptoks)-1),
                     i -> ptoks[i] || ' ' || ptoks[i+1] || ' ' || ptoks[i+2])) AS sh
            FROM p WHERE len(ptoks) >= 3),
      ${ngramPairsCtes(Dedup.DefaultMaxShingleDf)},
      e AS (SELECT id_a AS a, id_b AS b FROM pr WHERE jaccard >= 0.5
            UNION ALL SELECT id_b AS a, id_a AS b FROM pr WHERE jaccard >= 0.5),
      reach AS (SELECT doc_id AS id, doc_id AS r FROM s
                UNION SELECT e.b AS id, reach.r FROM reach JOIN e ON e.a = reach.id),
      lab AS (SELECT id, min(r) AS c FROM reach GROUP BY id)
      SELECT id // 1048576 AS doc_id, CAST(id % 1048576 AS BIGINT) AS para_idx,
             c // 1048576 AS canonical_doc, CAST(c % 1048576 AS BIGINT) AS canonical_para,
             CASE WHEN id = c THEN 1 ELSE 0 END AS is_survivor
      FROM lab ORDER BY doc_id, para_idx
    """.trim))

  private val minhashSigSql: String = {
    val p = Dedup.MinhashPrime
    val mins = Dedup.MinhashParams.zipWithIndex
      .map { case ((a, b), i) => s"min(($a * h + $b) % $p) AS h$i" }
      .mkString(",\n        ")
    val bands = (0 until 4).map { b =>
      val hs = (b * 4 until b * 4 + 4).map(i => s"h$i::VARCHAR").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, ('0x' || substr(md5($hs), 1, 15))::BIGINT AS bsig FROM sig"
    }.mkString("\n        UNION ALL ")
    s"""ex AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT % $p AS h
             FROM (SELECT doc_id, unnest(sh) AS s FROM s)),
      sig AS (SELECT doc_id,
        $mins
        FROM ex GROUP BY doc_id),
      bands AS ($bands)"""
  }

  private val dedupMinhash: (String, QFn, Option[String]) = (
    "dedup_minhash",
    (s, d) => Dedup.dedupMinhash(s, d),
    Some(s"""
      WITH s AS ($shingledCte),
      $minhashSigSql,
      capped AS (SELECT doc_id, band, bsig FROM (
                   SELECT doc_id, band, bsig,
                          count(*) OVER (PARTITION BY band, bsig) AS bucket_n
                   FROM bands) WHERE bucket_n <= ${Dedup.MaxBandBucket}),
      cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
               FROM capped a JOIN capped b
               ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
      j AS (SELECT id_a, id_b,
                   len(list_intersect(da.sh, db.sh))::DOUBLE /
                     (len(da.sh) + len(db.sh) - len(list_intersect(da.sh, db.sh))) AS jaccard
            FROM cand JOIN s da ON id_a = da.doc_id JOIN s db ON id_b = db.doc_id)
      SELECT id_a, id_b, round(jaccard, 4) AS jaccard
      FROM j WHERE jaccard >= 0.2 ORDER BY id_a, id_b
    """.trim))

  /** 64-bit signature twin of [[graft.functions.SimhashFamily]]: digits
    * 0..31 from md5(s), 32..63 from md5(s || '#'). The signature assembles
    * as a FLAT weighted sum (bit i carries 2^(63−i)), not a nested
    * `acc*2 + bit` fold — 63 nested levels blow DuckDB's 128-deep binder
    * recursion cap — and is split into hi/lo 32-bit halves to keep the
    * parse tree shallow. The sign bit enters as −2⁶³ because 2⁶³ itself
    * would overflow DuckDB's checked BIGINT arithmetic (same trick as the
    * Spark aggregate twin). */
  private val simhashSigSql: String = {
    val sums = (0 until 64).map { i =>
      val (h, pos) = if (i < 32) ("h1", i + 1) else ("h2", i - 31)
      s"sum(strpos('0123456789abcdef', substr($h, $pos, 1)) * 2 - 17) AS b$i"
    }.mkString(",\n        ")
    def term(i: Int, w: Long) = s"CASE WHEN b$i > 0 THEN ${w}::BIGINT ELSE 0 END"
    val hi = (1 until 32).map(i => term(i, 1L << (31 - i))).mkString(" + ")
    val lo = (32 until 64).map(i => term(i, 1L << (63 - i))).mkString(" + ")
    s"""ex AS (SELECT doc_id, md5(s) AS h1, md5(s || '#') AS h2
               FROM (SELECT doc_id, unnest(sh) AS s FROM s)),
      sums AS (SELECT doc_id,
        $sums
        FROM ex GROUP BY doc_id),
      sig AS (SELECT doc_id,
        ((CASE WHEN b0 > 0 THEN -9223372036854775807 - 1 ELSE 0 END)
         + ($hi) * 4294967296 + ($lo))::BIGINT AS sig
        FROM sums)"""
  }

  private val dedupSimhash: (String, QFn, Option[String]) = (
    "dedup_simhash",
    (s, d) => Dedup.dedupSimhash(s, d),
    Some(s"""
      WITH s AS ($shingledCte),
      $simhashSigSql,
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
      SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3 ORDER BY id_a, id_b
    """.trim))

  private val dedupEmbedding: (String, QFn, Option[String]) = (
    "dedup_embedding_cosine",
    (s, d) => Dedup.dedupEmbeddingCosine(s, d),
    Some(s"""
      WITH e AS (SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS nrm
                 FROM embeddings),
      p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
            FROM e a JOIN e b ON a.vec_id < b.vec_id)
      SELECT id_a, id_b, round(cos, 4) AS cos FROM p WHERE cos >= 0.4 ORDER BY id_a, id_b
    """.trim))

  private val dedupSurvivorsQ: (String, QFn, Option[String]) = (
    "dedup_survivors",
    (s, d) => Dedup.dedupSurvivors(s, d),
    Some(s"""
      WITH RECURSIVE
      s AS ($shingledCte),
      ${ngramPairsCtes(Dedup.DefaultMaxShingleDf)},
      e AS (SELECT id_a AS a, id_b AS b FROM pr WHERE jaccard >= 0.2
            UNION ALL
            SELECT id_b AS a, id_a AS b FROM pr WHERE jaccard >= 0.2),
      reach AS (
        SELECT doc_id AS id, doc_id AS r FROM documents
        UNION
        SELECT e.b AS id, reach.r FROM reach JOIN e ON e.a = reach.id),
      lab AS (SELECT id AS doc_id, min(r) AS canonical_id FROM reach GROUP BY id)
      SELECT doc_id, canonical_id,
             CASE WHEN doc_id = canonical_id THEN 1 ELSE 0 END AS is_survivor
      FROM lab ORDER BY doc_id
    """.trim))

  /** The CC/min-label survivor pass over the OTHER modality's pairs —
    * same recursive-CTE oracle shape as dedup_survivors, rooted at the
    * embedding universe. */
  private val dedupEmbSurvivorsQ: (String, QFn, Option[String]) = (
    "dedup_embedding_survivors",
    (s, d) => Dedup.dedupEmbeddingSurvivors(s, d),
    Some(s"""
      WITH RECURSIVE
      emb AS (SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS nrm
              FROM embeddings),
      p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM emb a JOIN emb b ON a.vec_id < b.vec_id
            WHERE ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.4),
      e AS (SELECT id_a AS a, id_b AS b FROM p
            UNION ALL
            SELECT id_b AS a, id_a AS b FROM p),
      reach AS (
        SELECT vec_id AS id, vec_id AS r FROM embeddings
        UNION
        SELECT e.b AS id, reach.r FROM reach JOIN e ON e.a = reach.id),
      lab AS (SELECT id AS doc_id, min(r) AS canonical_id FROM reach GROUP BY id)
      SELECT doc_id, canonical_id,
             CASE WHEN doc_id = canonical_id THEN 1 ELSE 0 END AS is_survivor
      FROM lab ORDER BY doc_id
    """.trim))

  private val dedupIncrementalQ: (String, QFn, Option[String]) = (
    "dedup_incremental",
    (s, d) => Dedup.dedupIncremental(s, d),
    Some("""
      WITH h AS (SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash
                 FROM documents),
      corpus AS (SELECT content_hash, min(doc_id) AS dup_of FROM h WHERE doc_id < 400 GROUP BY content_hash)
      SELECT b.doc_id, b.content_hash,
             coalesce(c.dup_of, -1) AS dup_of,
             CASE WHEN c.dup_of IS NOT NULL THEN 1 ELSE 0 END AS is_dup
      FROM h b LEFT JOIN corpus c USING (content_hash)
      WHERE b.doc_id >= 400 ORDER BY b.doc_id
    """.trim))

  /** Bloom prefilter replayed bit-for-bit: DuckDB derives the same 4
    * md5-substring positions mod 2^18, rebuilds the distinct-position set
    * from the historical slice, and re-evaluates membership per batch doc. */
  private val bloomDedupQ: (String, QFn, Option[String]) = (
    "bloom_dedup",
    (s, d) => Dedup.bloomDedup(s, d),
    Some("""
      WITH h AS (SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS hh
                 FROM documents),
      p AS (SELECT doc_id, hh, list_distinct([
              ('0x' || substr(hh, 1, 8))::BIGINT % 262144,
              ('0x' || substr(hh, 9, 8))::BIGINT % 262144,
              ('0x' || substr(hh, 17, 8))::BIGINT % 262144,
              ('0x' || substr(hh, 25, 8))::BIGINT % 262144]) AS bits
            FROM h),
      cb AS (SELECT DISTINCT unnest(bits) AS bit FROM p WHERE doc_id < 400),
      probe AS (SELECT doc_id, unnest(bits) AS bit FROM p WHERE doc_id >= 400),
      m AS (SELECT probe.doc_id,
                   (count(cb.bit) = count(*)) AS bloom_maybe
            FROM probe LEFT JOIN cb USING (bit) GROUP BY probe.doc_id),
      ch AS (SELECT DISTINCT hh FROM h WHERE doc_id < 400)
      SELECT p.doc_id, m.bloom_maybe,
             CASE WHEN ch.hh IS NOT NULL THEN 1 ELSE 0 END AS is_dup,
             (m.bloom_maybe AND ch.hh IS NULL) AS false_positive,
             (m.bloom_maybe OR ch.hh IS NULL) AS no_miss
      FROM p LEFT JOIN ch ON p.hh = ch.hh JOIN m ON p.doc_id = m.doc_id
      WHERE p.doc_id >= 400 ORDER BY p.doc_id
    """.trim))

  /** Cluster-size histogram over the SAME recursive-CTE component labels
    * as dedup_survivors. */
  private val dedupClusterStatsQ: (String, QFn, Option[String]) = (
    "dedup_cluster_stats",
    (s, d) => Dedup.dedupClusterStats(s, d),
    Some(s"""
      WITH RECURSIVE
      s AS ($shingledCte),
      ${ngramPairsCtes(Dedup.DefaultMaxShingleDf)},
      e AS (SELECT id_a AS a, id_b AS b FROM pr WHERE jaccard >= 0.2
            UNION ALL
            SELECT id_b AS a, id_a AS b FROM pr WHERE jaccard >= 0.2),
      reach AS (
        SELECT doc_id AS id, doc_id AS r FROM documents
        UNION
        SELECT e.b AS id, reach.r FROM reach JOIN e ON e.a = reach.id),
      lab AS (SELECT id AS doc_id, min(r) AS canonical_id FROM reach GROUP BY id),
      cs AS (SELECT canonical_id, count(*) AS cluster_size FROM lab GROUP BY canonical_id)
      SELECT cluster_size, count(*)::BIGINT AS n_clusters
      FROM cs GROUP BY cluster_size ORDER BY cluster_size
    """.trim))

  /** Soft dedup: same component labels as dedup_survivors, weight
    * 1/cluster_size per doc (reweight-instead-of-drop). */
  private val dedupSoftWeightsQ: (String, QFn, Option[String]) = (
    "dedup_soft_weights",
    (s, d) => Dedup.dedupSoftWeights(s, d),
    Some(s"""
      WITH RECURSIVE
      s AS ($shingledCte),
      ${ngramPairsCtes(Dedup.DefaultMaxShingleDf)},
      e AS (SELECT id_a AS a, id_b AS b FROM pr WHERE jaccard >= 0.2
            UNION ALL
            SELECT id_b AS a, id_a AS b FROM pr WHERE jaccard >= 0.2),
      reach AS (
        SELECT doc_id AS id, doc_id AS r FROM documents
        UNION
        SELECT e.b AS id, reach.r FROM reach JOIN e ON e.a = reach.id),
      lab AS (SELECT id AS doc_id, min(r) AS canonical_id FROM reach GROUP BY id),
      cs AS (SELECT canonical_id, count(*) AS cluster_size FROM lab GROUP BY canonical_id)
      SELECT lab.doc_id, lab.canonical_id, cs.cluster_size::BIGINT AS cluster_size,
             round(1.0::DOUBLE / cs.cluster_size, 4) AS weight
      FROM lab JOIN cs USING (canonical_id) ORDER BY lab.doc_id
    """.trim))

  /** A-ES weighted sampling from the soft-dedup weights: key =
    * ln(u)·cluster_size (monotone log form of u^(1/w), w = 1/size),
    * 6-dp-rounded before the rank, doc_id ties — ln is the only
    * transcendental, the bm25-idf precedent. */
  private val softWeightSampleQ: (String, QFn, Option[String]) = (
    "soft_weight_sample",
    (s, d) => Dedup.softWeightSample(s, d),
    Some(s"""
      WITH RECURSIVE
      s AS ($shingledCte),
      ${ngramPairsCtes(Dedup.DefaultMaxShingleDf)},
      e AS (SELECT id_a AS a, id_b AS b FROM pr WHERE jaccard >= 0.2
            UNION ALL
            SELECT id_b AS a, id_a AS b FROM pr WHERE jaccard >= 0.2),
      reach AS (
        SELECT doc_id AS id, doc_id AS r FROM documents
        UNION
        SELECT e.b AS id, reach.r FROM reach JOIN e ON e.a = reach.id),
      lab AS (SELECT id AS doc_id, min(r) AS canonical_id FROM reach GROUP BY id),
      cs AS (SELECT canonical_id, count(*) AS cluster_size FROM lab GROUP BY canonical_id),
      keyed AS (SELECT lab.doc_id, cs.cluster_size::BIGINT AS cluster_size,
                       round(ln(('0x' || substr(md5(lab.doc_id::VARCHAR), 1, 15))::BIGINT::DOUBLE
                               / 1152921504606846976.0) * cs.cluster_size, 6) AS skey
                FROM lab JOIN cs USING (canonical_id)),
      r AS (SELECT *, row_number() OVER (ORDER BY skey DESC, doc_id ASC) AS rank
            FROM keyed)
      SELECT rank, doc_id, cluster_size, skey
      FROM r WHERE rank <= 100 ORDER BY rank
    """.trim))

  /** Window hashes mirror doc_chunks' slice convention (list_slice is
    * 1-based inclusive; range excludes its stop). */
  private val substringDedupQ: (String, QFn, Option[String]) = (
    "substring_dedup",
    (s, d) => Dedup.substringDedup(s, d),
    Some("""
      WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS tk FROM documents),
      w AS (SELECT doc_id, md5(array_to_string(list_slice(tk, st, st + 7), ' ')) AS h
            FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 8 + 2)) AS st
                  FROM t WHERE len(tk) >= 8)),
      hd AS (SELECT h FROM w GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
      nd AS (SELECT doc_id, count(*) AS n_dup FROM w JOIN hd USING (h) GROUP BY doc_id),
      nw AS (SELECT doc_id, count(*) AS n_windows FROM w GROUP BY doc_id)
      SELECT nw.doc_id, nw.n_windows::BIGINT AS n_windows,
             coalesce(nd.n_dup, 0)::BIGINT AS n_dup_windows,
             round(coalesce(nd.n_dup, 0)::DOUBLE / nw.n_windows, 4) AS dup_fraction
      FROM nw LEFT JOIN nd USING (doc_id) ORDER BY doc_id
    """.trim))

  /** The FROZEN-index deployment of substring dedup: the corpus's
    * duplicated-window set (computed like yesterday's offline index build)
    * rides the plan as a sorted-array `hits_in_long_set` codegen kernel and
    * every doc scores in a pure narrow pass — no explode, no aggregate, no
    * shuffle; the incremental form a 100 TB pipeline actually serves. The
    * oracle replays the SAME 60-bit long-surrogate truncation (the
    * soft-weight-sample hex-prefix pattern), so the check is structurally
    * exact even under surrogate collisions; a spec additionally asserts
    * row-identity with the aggregate form and the streaming twin. */
  private val substringDedupFrozenQ: (String, QFn, Option[String]) = (
    "substring_dedup_frozen",
    (s, d) => Dedup.substringDedupFrozen(s, d, 8)
      .orderBy(org.apache.spark.sql.functions.col("doc_id")),
    Some("""
      WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS tk FROM documents),
      w AS (SELECT doc_id,
                   ('0x' || substr(md5(array_to_string(list_slice(tk, st, st + 7), ' ')), 1, 15))::BIGINT AS h
            FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 8 + 2)) AS st
                  FROM t WHERE len(tk) >= 8)),
      hd AS (SELECT h FROM w GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
      nd AS (SELECT doc_id, count(*) AS n_dup FROM w JOIN hd USING (h) GROUP BY doc_id),
      nw AS (SELECT doc_id, count(*) AS n_windows FROM w GROUP BY doc_id)
      SELECT nw.doc_id, nw.n_windows::BIGINT AS n_windows,
             coalesce(nd.n_dup, 0)::BIGINT AS n_dup_windows,
             round(coalesce(nd.n_dup, 0)::DOUBLE / nw.n_windows, 4) AS dup_fraction
      FROM nw LEFT JOIN nd USING (doc_id) ORDER BY doc_id
    """.trim))

  /** The over-budget FALLBACK of the frozen deployment: the standing
    * dup-window index kept DISTRIBUTED (a DataFrame, never a driver
    * array) and probed by explode + equi-join — the path
    * [[graft.operators.Dedup.substringDedupFrozen]] takes when the index
    * exceeds the driver-collect gate. Registered as its OWN query so the
    * fallback plan gets the same oracle hash check as the probe plan it
    * must be row-identical to (the oracle SQL is shared verbatim). */
  private val substringDedupJoinQ: (String, QFn, Option[String]) = (
    "substring_dedup_join",
    (s, d) => Dedup.substringDedupFrozenJoinOf(
        graft.core.Tables.documents(s, d),
        Dedup.duplicatedWindowIndexStanding(s, d), 8)
      .orderBy(org.apache.spark.sql.functions.col("doc_id")),
    substringDedupFrozenQ._3)

  /** Intra-doc span dedup: the oracle reconstructs "first occurrence of
    * each distinct chunk, in order" via min(ordinality) + ordered
    * string_agg — exactly what Spark's order-preserving `array_distinct`
    * computes in one narrow expression. */
  private val lineDedupQ: (String, QFn, Option[String]) = (
    "line_dedup",
    (s, d) => Dedup.lineDedupIntra(s, d),
    Some("""
      WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS tk FROM documents),
      c AS (SELECT doc_id, len(tk) AS n_tokens, i,
                   array_to_string(list_slice(tk, i*8 + 1, i*8 + 8), ' ') AS chunk
            FROM (SELECT doc_id, tk, unnest(range(0, (len(tk)-1)//8 + 1)) AS i FROM t)),
      k AS (SELECT doc_id, chunk, min(i) AS fi FROM c GROUP BY doc_id, chunk),
      a AS (SELECT doc_id, count(*) AS n_kept,
                   md5(string_agg(chunk, ' ' ORDER BY fi)) AS clean_md5
            FROM k GROUP BY doc_id),
      n AS (SELECT doc_id, any_value(n_tokens) AS n_tokens, count(*) AS n_chunks
            FROM c GROUP BY doc_id)
      SELECT n.doc_id, n.n_tokens::BIGINT AS n_tokens, n.n_chunks::BIGINT AS n_chunks,
             a.n_kept::BIGINT AS n_kept, a.clean_md5
      FROM n JOIN a USING (doc_id) ORDER BY doc_id
    """.trim))

  /** Reused-span detection on top of the CDC chunk CTE. */
  private lazy val chunkDedupQ: (String, QFn, Option[String]) = (
    "chunk_dedup",
    (s, d) => TextAnalysis.chunkDedup(s, d),
    Some(s"""
      WITH ch AS (${RegistryCorpus.docChunksCdcQ._3.get.replace("ORDER BY doc_id, chunk_id", "")}),
      g AS (SELECT chunk_hash, doc_id, chunk_id, n_tokens,
              count(*) OVER (PARTITION BY chunk_hash) AS n_copies,
              row_number() OVER (PARTITION BY chunk_hash ORDER BY doc_id, chunk_id) AS rk
            FROM ch WHERE n_tokens >= 4)
      SELECT doc_id, chunk_id, chunk_hash, n_tokens::BIGINT AS n_tokens,
             n_copies::BIGINT AS n_copies
      FROM g WHERE rk = 1 AND n_copies > 1 ORDER BY doc_id, chunk_id
    """.trim))

  /** Benchmark decontamination: train × held-out shingle overlap via the
    * same inverted-index join family, identical df cutoff both sides. */
  private val contaminationQ: (String, QFn, Option[String]) = (
    "contamination_check",
    (s, d) => Dedup.contaminationCheck(s, d),
    Some(s"""
      WITH s AS ($shingledCte),
      ex0 AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS s
              FROM (SELECT doc_id, unnest(sh) AS s FROM s)),
      rare AS (SELECT s FROM (SELECT s, count(*) AS df FROM ex0 GROUP BY s)
               WHERE df <= ${Dedup.DefaultMaxShingleDf}),
      ex AS (SELECT ex0.doc_id, ex0.s FROM ex0 JOIN rare USING (s)),
      tr AS (SELECT doc_id AS train_id, s FROM ex WHERE doc_id < 450),
      be AS (SELECT doc_id AS bench_id, s FROM ex WHERE doc_id >= 450)
      SELECT train_id, bench_id, count(*) AS n_shared
      FROM tr JOIN be USING (s)
      GROUP BY train_id, bench_id HAVING count(*) >= 3
      ORDER BY train_id, bench_id
    """.trim))

  /** The removal form reuses contamination_check's own CTE chain for the
    * dirty set, then anti-joins — oracle mirrored with NOT EXISTS. */
  private val decontaminateQ: (String, QFn, Option[String]) = (
    "decontaminate",
    (s, d) => Dedup.decontaminate(s, d),
    Some(s"""
      WITH s AS ($shingledCte),
      ex0 AS (SELECT doc_id, ('0x' || substr(md5(sh1), 1, 15))::BIGINT AS s
              FROM (SELECT doc_id, unnest(sh) AS sh1 FROM s)),
      rare AS (SELECT s FROM (SELECT s, count(*) AS df FROM ex0 GROUP BY s)
               WHERE df <= ${Dedup.DefaultMaxShingleDf}),
      ex AS (SELECT ex0.doc_id, ex0.s FROM ex0 JOIN rare USING (s)),
      tr AS (SELECT doc_id AS train_id, s FROM ex WHERE doc_id < 450),
      be AS (SELECT doc_id AS bench_id, s FROM ex WHERE doc_id >= 450),
      dirty AS (SELECT train_id FROM tr JOIN be USING (s)
                GROUP BY train_id, bench_id HAVING count(*) >= 3)
      SELECT doc_id, lang, len(text)::BIGINT AS n_chars
      FROM documents d
      WHERE doc_id < 450 AND NOT EXISTS (SELECT 1 FROM dirty WHERE train_id = d.doc_id)
      ORDER BY doc_id
    """.trim))

  private val ngramNoveltyQ: (String, QFn, Option[String]) = (
    "ngram_novelty",
    (s, d) => Dedup.ngramNovelty(s, d),
    Some(s"""
      WITH s AS ($shingledCte),
      exn AS (SELECT doc_id, ('0x' || substr(md5(shs), 1, 15))::BIGINT AS sg
              FROM (SELECT doc_id, unnest(sh) AS shs FROM s)),
      fo AS (SELECT sg, min(doc_id) AS first_doc FROM exn GROUP BY sg)
      SELECT exn.doc_id, count(*)::BIGINT AS n_shingles,
             sum(CASE WHEN fo.first_doc = exn.doc_id THEN 1 ELSE 0 END)::BIGINT AS n_novel,
             round(sum(CASE WHEN fo.first_doc = exn.doc_id THEN 1 ELSE 0 END)::DOUBLE
                   / count(*), 4) AS novelty
      FROM exn JOIN fo USING (sg) GROUP BY exn.doc_id ORDER BY exn.doc_id
    """.trim))

  private val sourceOverlapQ: (String, QFn, Option[String]) = (
    "source_overlap",
    (s, d) => Dedup.sourceOverlap(s, d),
    Some(s"""
      WITH s AS ($shingledCte),
      exx AS (SELECT doc_id, unnest(sh) AS shs FROM s),
      srcsh AS (SELECT DISTINCT d.source, ('0x' || substr(md5(exx.shs), 1, 15))::BIGINT AS sg
                FROM exx JOIN documents d USING (doc_id)),
      sizes AS (SELECT source, count(*) AS n FROM srcsh GROUP BY source),
      p AS (SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
            FROM srcsh a JOIN srcsh b ON a.sg = b.sg AND a.source < b.source
            GROUP BY 1, 2)
      SELECT source_a, source_b, n_shared, sa.n AS n_a, sb.n AS n_b,
             round(n_shared::DOUBLE / least(sa.n, sb.n), 4) AS containment
      FROM p JOIN sizes sa ON p.source_a = sa.source
             JOIN sizes sb ON p.source_b = sb.source
      ORDER BY source_a, source_b
    """.trim))

  /** PageRank over the source-overlap graph: the oracle replays the exact
    * integer power iteration as an unrolled CTE chain (r1..r10), each
    * stage one edge join + one floor-division contribution sum — the
    * bpe_merges pattern. All long math, so the fixpoint is bit-identical
    * across engines; the driver constants (node count, teleport base) are
    * recomputed in SQL from the same node set. */
  private val sourcePagerankQ: (String, QFn, Option[String]) = {
    val scale = graft.operators.Dedup.PagerankScale
    val stages = (1 to 10).map { i =>
      s"""r$i AS (SELECT nodes.source,
               ((SELECT (15 * $scale) // (100 * n) FROM nn)
                + (85 * COALESCE(c.contrib, 0)) // 100)::BIGINT AS rank
        FROM nodes LEFT JOIN (
          SELECT e.dst, sum((r.rank * e.r6) // 1000000)::BIGINT AS contrib
          FROM e JOIN r${i - 1} r ON r.source = e.src GROUP BY e.dst) c
        ON nodes.source = c.dst)"""
    }.mkString(",\n      ")
    ("source_pagerank",
      (s: SparkSession, d: String) => Dedup.sourcePagerank(s, d),
      Some(s"""
      WITH s AS ($shingledCte),
      exx AS (SELECT doc_id, unnest(sh) AS shs FROM s),
      srcsh AS (SELECT DISTINCT d.source, ('0x' || substr(md5(exx.shs), 1, 15))::BIGINT AS sg
                FROM exx JOIN documents d USING (doc_id)),
      p AS (SELECT a.source AS src, b.source AS dst, count(*)::BIGINT AS w
            FROM srcsh a JOIN srcsh b ON a.sg = b.sg AND a.source < b.source
            GROUP BY 1, 2),
      e0 AS (SELECT src, dst, w FROM p UNION ALL SELECT dst, src, w FROM p),
      ow AS (SELECT src, sum(w)::BIGINT AS outw FROM e0 GROUP BY src),
      e AS (SELECT e0.src, e0.dst, (e0.w * 1000000) // ow.outw AS r6
            FROM e0 JOIN ow USING (src)),
      nodes AS (SELECT DISTINCT source FROM documents),
      nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
      r0 AS (SELECT source, (SELECT $scale // n FROM nn)::BIGINT AS rank FROM nodes),
      $stages
      SELECT source, rank AS rank_e12 FROM r10 ORDER BY rank_e12 DESC, source
    """.trim))
  }

  // ---- winnowing (MOSS fingerprints) ----------------------------------------

  /** Shared winnowing CTE chain ending in wfps(doc_id, fp, selpos) — the
    * identical k-gram/window-min/rightmost-tie selection as
    * [[Dedup.winnowFps]], gram hashes on the shared 60-bit md5 surrogate. */
  private val winnowCtes: String = {
    val k = Dedup.WinnowK
    val w = Dedup.WinnowW
    val gram = (0 until k).map(o => s"toks[i + $o]").mkString(" || ' ' || ")
    s"""wt AS ($toksCte),
      wel AS (SELECT doc_id, toks, len(toks) - ${k - 1} AS m FROM wt
              WHERE len(toks) - ${k - 1} >= $w),
      wg AS (SELECT doc_id, m, i AS pos,
                    ('0x' || substr(md5($gram), 1, 15))::BIGINT AS h
             FROM wel, unnest(range(1, m + 1)) r(i)),
      wwd AS (SELECT doc_id, m, pos AS j,
                     min(h) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS wmin
              FROM wg),
      wsel AS (SELECT ww.doc_id, ww.wmin AS fp, max(g.pos) AS selpos
               FROM (SELECT doc_id, j, wmin FROM wwd WHERE j <= m - ${w - 1}) ww
               JOIN wg g ON g.doc_id = ww.doc_id AND g.h = ww.wmin
                         AND g.pos BETWEEN ww.j AND ww.j + ${w - 1}
               GROUP BY ww.doc_id, ww.wmin, ww.j),
      wfps AS (SELECT DISTINCT doc_id, fp, selpos FROM wsel)"""
  }

  private val winnowItemSql =
    "lpad(CAST(selpos AS VARCHAR), 6, '0') || ':' || lpad(CAST(fp AS VARCHAR), 19, '0')"

  private val winnowFingerprintSql: String = s"""
      WITH $winnowCtes,
      ng AS (SELECT doc_id, any_value(m)::BIGINT AS n_grams FROM wg GROUP BY doc_id),
      dg AS (SELECT doc_id, count(*) AS n_fp,
                    md5(string_agg($winnowItemSql, ',' ORDER BY $winnowItemSql)) AS fp_digest
             FROM wfps GROUP BY doc_id)
      SELECT doc_id, ng.n_grams, dg.n_fp, dg.fp_digest
      FROM ng JOIN dg USING (doc_id) ORDER BY doc_id
    """.trim

  private val winnowFingerprintQ: (String, QFn, Option[String]) = (
    "winnow_fingerprint",
    (s, d) => Dedup.winnowFingerprint(s, d),
    Some(winnowFingerprintSql))

  /** The SAME oracle as winnow_fingerprint, but the Spark side recomputes
    * every digest through the shuffle-free per-row expression form
    * ([[Dedup.winnowFpStructs]]) — a hash-checked proof that the streaming
    * ingest path's fingerprints are bit-identical to the window-function
    * derivation DuckDB mirrors. */
  private val winnowRowformGateQ: (String, QFn, Option[String]) = (
    "winnow_rowform_gate",
    (s, d) => Dedup.winnowRowFingerprint(s, d),
    Some(winnowFingerprintSql))

  private val winnowOverlapQ: (String, QFn, Option[String]) = (
    "winnow_overlap",
    (s, d) => Dedup.winnowOverlap(s, d),
    Some(s"""
      WITH $winnowCtes,
      wdf AS (SELECT DISTINCT doc_id, fp FROM wfps),
      wrare AS (SELECT fp FROM (SELECT fp, count(DISTINCT doc_id) AS df FROM wdf GROUP BY fp)
                WHERE df <= ${Dedup.DefaultMaxShingleDf}),
      wk AS (SELECT d.doc_id, d.fp FROM wdf d JOIN wrare USING (fp))
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
      FROM wk a JOIN wk b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING count(*) >= 2
      ORDER BY id_a, id_b
    """.trim))

}
