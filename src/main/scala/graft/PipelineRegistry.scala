package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Registry of the LLM-pipeline operators (dedup / text analysis /
  * similarity / multimodal) with their DuckDB oracle SQL. Shared SQL
  * fragments are built once so the Spark expression and its oracle twin
  * cannot drift apart silently.
  */
object PipelineRegistry {

  private type QFn = (SparkSession, String) => DataFrame

  // ---- shared DuckDB fragments ----------------------------------------------

  /** toks CTE: whitespace tokens of lowercased text. */
  private val toksCte =
    "SELECT doc_id, text, lang, string_split_regex(lower(text), '\\s+') AS toks FROM documents"

  /** shingled CTE body: distinct word-3-gram shingles, docs with >=3 tokens. */
  private val shingledCte =
    s"""SELECT doc_id, list_distinct(list_transform(range(1, len(toks)-1),
       |  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
       |FROM ($toksCte) WHERE len(toks) >= 3""".stripMargin

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> ($a[i]::DOUBLE) * ($b[i]::DOUBLE)))"

  private def l2Sql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> " +
      s"(($a[i]::DOUBLE) - ($b[i]::DOUBLE)) * (($a[i]::DOUBLE) - ($b[i]::DOUBLE))))"

  private val stopwordsList = TextAnalysis.StopwordsEn.map(w => s"'$w'").mkString("[", ",", "]")

  // ---- registry -------------------------------------------------------------

  def entries: Seq[(String, QFn, Option[String])] = Seq(
    dedupExact, dedupNgram, dedupMinhash, dedupSimhash, dedupEmbedding, dedupSurvivorsQ,
    dedupIncrementalQ, mmGzipQ,
    textStats, langId, tokenCount, docFingerprint,
    simCosineTopK, simIpTopK, simJoinThreshold,
    lshCosineGateQ, lshL2GateQ, ivfGateQ, pqGateQ, semdedupGateQ, prototypeGateQ,
    embedDimStatsQ, embedDimCovQ,
    sqQuantize, sqReport, bqQuantizeQ, bqSearchQ, bqRerankQ,
    mmJoin, mmBinaryStats, mmMediaFeatures, mmThumbnailQ, mmFrameSampleQ, mmAudioSampleQ,
    sampleHashQ, pipelineCleanQ, vocabTopKQ, lengthPctQ, percentileGateQ, embedNormalizeQ, tfIdfQ,
    asofJoinQ, sampleStratifiedQ, repetitionScoreQ, rangeJoinQ, dedupEmbSurvivorsQ,
    docChunksQ, contaminationQ, dedupParagraphQ, mmImageDecodeQ, mmAudioDecodeQ,
    packSequencesQ, dedupParagraphSurvivorsQ, bigramTopKQ,
    lmPerplexityQ, oovRateQ, boilerplateQ,
    sampleMixtureQ, piiRedactQ, dedupClusterStatsQ, sourceOverlapQ, qualityDecilesQ,
    corpusShuffleQ, lengthBucketsQ, formatRoundtripQ, ngramNoveltyQ, tokenEntropyQ,
    pipelineFullQ, docChunksCdcQ, chunkDedupQ, bucketedRevenueQ, partitionedRevenueQ,
    textSimTopKQ, shardManifestQ, decontaminateQ, splitAssignQ,
    bm25RetrievalQ, substringDedupQ, dsirWeightQ,
    lineDedupQ, corpusStatsQ, bpeMergesQ, bpeEncodeQ, mmImageAhashQ,
    mmAudioFingerprintQ, sourcePagerankQ, cmsTopkQ,
    domainCapQ, epochUpsampleQ, hardNegativesQ, zorderRevenueQ, gapfillHourlyQ,
    featureHashQ, mmImageNearDupQ, mmAudioNearDupQ)

  /** Buckets are md5-derived on both sides; the en-doc subset is DSIR's
    * target distribution stand-in. */
  private val dsirWeightQ: (String, QFn, Option[String]) = (
    "dsir_weight",
    (s, d) => CorpusPipeline.dsirWeight(s, d),
    Some("""
      WITH t AS (SELECT doc_id, lang, string_split_regex(lower(text), '\s+') AS tk FROM documents),
      uni AS (SELECT doc_id, lang, unnest(tk) AS f FROM t),
      bi AS (SELECT doc_id, lang, tk[i] || ' ' || tk[i+1] AS f
             FROM t, unnest(range(1, len(tk))) AS r(i) WHERE len(tk) >= 2),
      feats AS (SELECT doc_id, lang, ('0x' || substr(md5(f), 1, 8))::BIGINT % 1024 AS b
                FROM (SELECT * FROM uni WHERE f <> '' UNION ALL SELECT * FROM bi)),
      dc AS (SELECT doc_id, b, count(*) AS c FROM feats GROUP BY doc_id, b),
      raw AS (SELECT b, count(*) AS cr FROM feats GROUP BY b),
      tgt AS (SELECT b, count(*) AS ct FROM feats WHERE lang = 'en' GROUP BY b),
      tot AS (SELECT count(*) AS tr, count(*) FILTER (lang = 'en') AS tt FROM feats),
      model AS (SELECT raw.b,
                       round(ln(((coalesce(tgt.ct, 0) + 1.0) / (tot.tt + 1024)) /
                                ((raw.cr + 1.0) / (tot.tr + 1024))), 6)::DECIMAL(18,6) AS lr
                FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tot)
      SELECT dc.doc_id, sum(dc.c)::BIGINT AS n_feats,
             round(sum(dc.c * model.lr), 4)::DOUBLE AS logw
      FROM dc JOIN model USING (b)
      GROUP BY dc.doc_id ORDER BY dc.doc_id
    """.trim))

  /** Same integer-statistics determinism as lm_perplexity: contributions
    * round to 6 dp then sum as DECIMAL(18,6); ranks sort the exact sum.
    * Constants are spelled as the same double expressions on both sides
    * ((1.2 + 1.0), 1.0 - 0.75) so the IEEE arithmetic is bit-identical. */
  private val bm25RetrievalQ: (String, QFn, Option[String]) = (
    "bm25_retrieval",
    (s, d) => TextAnalysis.bm25Retrieval(s, d),
    Some("""
      WITH t AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term FROM documents),
      tc AS (SELECT doc_id, term, count(*) AS c FROM t WHERE term <> '' GROUP BY doc_id, term),
      dl AS (SELECT doc_id, sum(c) AS n FROM tc GROUP BY doc_id),
      st AS (SELECT count(*)::DOUBLE AS nd, sum(n)::DOUBLE / count(*) AS avgdl FROM dl),
      dfs AS (SELECT term, count(*) AS df FROM tc GROUP BY term),
      qt(qid, term) AS (VALUES (1, 'hash'), (1, 'join'),
                               (2, 'vector'), (2, 'scan'), (2, 'fast'),
                               (3, 'window'), (3, 'agg'), (3, 'merge')),
      qi AS (SELECT qt.qid, qt.term,
                    ln((st.nd - coalesce(dfs.df, 0) + 0.5) /
                       (coalesce(dfs.df, 0) + 0.5) + 1.0) AS idf,
                    st.avgdl
             FROM qt LEFT JOIN dfs USING (term) CROSS JOIN st),
      co AS (SELECT qi.qid, tc.doc_id,
                    round(qi.idf * (tc.c * (1.2 + 1.0)) /
                          (tc.c + 1.2 * (1.0 - 0.75 + 0.75 *
                            (dl.n::DOUBLE / qi.avgdl))), 6)::DECIMAL(18,6) AS contrib
             FROM tc JOIN qi USING (term) JOIN dl USING (doc_id)),
      sc AS (SELECT qid, doc_id, round(sum(contrib), 4) AS s4 FROM co GROUP BY qid, doc_id),
      r AS (SELECT qid, doc_id, s4,
                   row_number() OVER (PARTITION BY qid ORDER BY s4 DESC, doc_id ASC) AS rank
            FROM sc)
      SELECT qid::BIGINT AS qid, rank, doc_id, s4::DOUBLE AS score
      FROM r WHERE rank <= 5 ORDER BY qid, rank
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

  /** BPE merge training, oracle-mirrored by unrolling the k iterations as
    * a generated WITH RECURSIVE chain: stage i counts adjacent pairs over
    * the distinct-word symbol state, argmaxes with the same
    * (count desc, a, b) tie-break, and applies the merge by leftmost-first
    * iterated replacement on the ' '-joined symbol string — provably the
    * same result as Spark's greedy left-to-right fold because a merged
    * token can never recreate its own pair. */
  private val bpeMergesQ: (String, QFn, Option[String]) = (
    "bpe_merges",
    (s, d) => TextAnalysis.bpeMerges(s, d),
    Some(bpeOracleSql(5,
      (1 to 5).map(i =>
        s"SELECT $i::BIGINT AS merge_rank, a AS left_sym, b AS right_sym, c::BIGINT AS pair_count FROM b$i")
        .mkString("\n      UNION ALL ") + "\n      ORDER BY merge_rank")))

  /** The apply half: per-doc subword counts through the same unrolled
    * training chain (the oracle re-derives the segmented vocab s5 and
    * joins the doc words against it). */
  private val bpeEncodeQ: (String, QFn, Option[String]) = (
    "bpe_encode",
    (s, d) => TextAnalysis.bpeEncode(s, d),
    Some(bpeOracleSql(5, """dw AS (SELECT doc_id, w
            FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS w
                  FROM documents)
            WHERE w != ''),
      enc AS (SELECT doc_id, count(*) AS n_words,
                     sum(len(string_split(trim(s5.s), ' ')))::BIGINT AS n_bpe_tokens
              FROM dw JOIN s5 ON dw.w = s5.w GROUP BY doc_id)
      SELECT doc_id, n_words, n_bpe_tokens,
             round(n_bpe_tokens::DOUBLE / n_words, 4) AS subtokens_per_word
      FROM enc ORDER BY doc_id""", finalIsCte = true)))

  /** The k-iteration BPE training chain as generated SQL: stage i counts
    * adjacent pairs over the distinct-word symbol state, argmaxes with the
    * engine-mirrored (count desc, a, b) tie-break, and applies the merge
    * by leftmost-first iterated replacement (a recursive CTE) — provably
    * the same result as Spark's greedy left-to-right fold because a merged
    * token can never recreate its own pair. `finalSelect` consumes b1..bk
    * (the merge decisions) and s$k (the final segmented vocab). */
  private def bpeOracleSql(k: Int, finalSelect: String, finalIsCte: Boolean = false): String = {
    val stages = (1 to k).map { i =>
      s"""p$i AS (SELECT L[j] AS a, L[j+1] AS b, sum(cnt) AS c
             FROM (SELECT cnt, L, unnest(range(1, len(L))) AS j
                   FROM (SELECT cnt, string_split(trim(s), ' ') AS L FROM s${i - 1}))
             GROUP BY 1, 2),
      b$i AS (SELECT a, b, c FROM p$i ORDER BY c DESC, a ASC, b ASC LIMIT 1),
      m$i AS (
        SELECT w, cnt, s FROM s${i - 1}
        UNION ALL
        SELECT w, cnt, substr(s, 1, p - 1) || ' ' || a || b || ' ' ||
               substr(s, p + 3 + length(a) + length(b))
        FROM (SELECT w, cnt, s,
                     strpos(s, (SELECT ' ' || a || ' ' || b || ' ' FROM b$i)) AS p
              FROM m$i), b$i
        WHERE p > 0),
      s$i AS (SELECT w, cnt, s FROM m$i
              WHERE strpos(s, (SELECT ' ' || a || ' ' || b || ' ' FROM b$i)) = 0)"""
    }.mkString(",\n      ")
    val sep = if (finalIsCte) ",\n      " else "\n      "
    s"""
      WITH RECURSIVE
      s0 AS (SELECT w, cnt, ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS s
             FROM (SELECT w, count(*) AS cnt
                   FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
                         FROM documents)
                   WHERE w != '' GROUP BY w)),
      $stages$sep$finalSelect
    """.trim
  }

  /** One-row corpus data card; every aggregate combines map-side. */
  private val corpusStatsQ: (String, QFn, Option[String]) = (
    "corpus_stats",
    (s, d) => CorpusPipeline.corpusStats(s, d),
    Some("""
      SELECT count(*) AS n_docs,
             count(DISTINCT source) AS n_sources,
             count(DISTINCT lang) AS n_langs,
             sum(len(string_split_regex(lower(text), '\s+')))::BIGINT AS total_tokens,
             round(avg(len(string_split_regex(lower(text), '\s+'))), 4) AS avg_tokens,
             min(n_chars)::BIGINT AS min_chars,
             max(n_chars)::BIGINT AS max_chars
      FROM documents
    """.trim))

  /** Date-partitioned layout vs the unpartitioned oracle: the partition
    * filter `date(ts) in [Jan 8, Jan 15)` is exactly `ts in [Jan 8 00:00,
    * Jan 15 00:00)` on the raw column, so DuckDB recomputes the week from
    * the original file while Spark reads only 7 of 30 directories. */
  private val partitionedRevenueQ: (String, QFn, Option[String]) = (
    "partitioned_revenue",
    (s, d) => Formats.partitionedRevenue(s, d),
    Some("""
      SELECT event_type, count(*) AS n_events,
             round(sum(CAST(value AS DECIMAL(18,2))), 2)::DOUBLE AS sum_value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
      GROUP BY event_type ORDER BY event_type
    """.trim))

  /** Bucketed co-located join vs the plain-join oracle — hash-identical
    * output proves the bucketed write+read+join path is row-lossless (the
    * exchange-free plan shape is PlanSpec's half of the check). */
  private val bucketedRevenueQ: (String, QFn, Option[String]) = (
    "bucketed_revenue",
    (s, d) => Formats.bucketedRevenue(s, d),
    Some("""
      SELECT o_orderpriority,
             round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)::DOUBLE AS revenue,
             count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority
    """.trim))

  /** Reused-span detection on top of the CDC chunk CTE. */
  private lazy val chunkDedupQ: (String, QFn, Option[String]) = (
    "chunk_dedup",
    (s, d) => TextAnalysis.chunkDedup(s, d),
    Some(s"""
      WITH ch AS (${docChunksCdcQ._3.get.replace("ORDER BY doc_id, chunk_id", "")}),
      g AS (SELECT chunk_hash, doc_id, chunk_id, n_tokens,
              count(*) OVER (PARTITION BY chunk_hash) AS n_copies,
              row_number() OVER (PARTITION BY chunk_hash ORDER BY doc_id, chunk_id) AS rk
            FROM ch WHERE n_tokens >= 4)
      SELECT doc_id, chunk_id, chunk_hash, n_tokens::BIGINT AS n_tokens,
             n_copies::BIGINT AS n_copies
      FROM g WHERE rk = 1 AND n_copies > 1 ORDER BY doc_id, chunk_id
    """.trim))

  private val docChunksCdcQ: (String, QFn, Option[String]) = (
    "doc_chunks_cdc",
    (s, d) => TextAnalysis.docChunksCdc(s, d),
    Some("""
      WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents),
      tok AS (SELECT doc_id, i - 1 AS pos, toks[i] AS w
              FROM t, unnest(range(1, len(toks) + 1)) AS r(i)),
      b AS (SELECT doc_id, pos, w,
              CASE WHEN ('0x' || substr(md5(w), 1, 15))::BIGINT % 16 = 0 THEN 1 ELSE 0 END AS ib
            FROM tok),
      c AS (SELECT doc_id, pos, w,
              coalesce(sum(ib) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS chunk_id
            FROM b)
      SELECT doc_id, chunk_id, count(*)::BIGINT AS n_tokens,
             md5(string_agg(w, ' ' ORDER BY pos)) AS chunk_hash
      FROM c GROUP BY doc_id, chunk_id ORDER BY doc_id, chunk_id
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

  /** Entropy terms ride as half-up-floored micro-nat INTEGERS (the
    * sq_quantize trick) so the per-doc sum is an exact long. */
  private val tokenEntropyQ: (String, QFn, Option[String]) = (
    "token_entropy",
    (s, d) => TextAnalysis.tokenEntropy(s, d),
    Some("""
      WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS w
                   FROM documents),
      tc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w),
      dl AS (SELECT doc_id, sum(c)::BIGINT AS n FROM tc GROUP BY doc_id),
      t AS (SELECT tc.doc_id, dl.n,
              floor(-(tc.c::DOUBLE / dl.n) * ln(tc.c::DOUBLE / dl.n) * 1e6 + 0.5)::BIGINT AS term
            FROM tc JOIN dl USING (doc_id))
      SELECT doc_id, max(n) AS n_tokens, count(*)::BIGINT AS n_distinct,
             sum(term)::BIGINT AS entropy_unats
      FROM t GROUP BY doc_id ORDER BY doc_id
    """.trim))

  /** The oracle recomputes each format's checksums from the parquet
    * originals — rows can only match if the sink→source path was
    * byte-lossless for every doc. */
  private val formatRoundtripQ: (String, QFn, Option[String]) = (
    "format_roundtrip",
    (s, d) => Formats.formatRoundtrip(s, d),
    Some("""
      SELECT v.fmt AS format, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars,
             sum(('0x' || substr(md5(text), 1, 8))::BIGINT)::BIGINT AS text_sum
      FROM documents CROSS JOIN (VALUES ('csv'), ('json'), ('orc'),
                                        ('json_gzip'), ('csv_bzip2')) v(fmt)
      GROUP BY v.fmt ORDER BY v.fmt
    """.trim))

  private val corpusShuffleQ: (String, QFn, Option[String]) = (
    "corpus_shuffle",
    (s, d) => CorpusPipeline.corpusShuffle(s, d),
    Some("""
      SELECT doc_id,
             row_number() OVER (ORDER BY md5(doc_id::VARCHAR), doc_id) - 1 AS shuffle_pos
      FROM documents ORDER BY doc_id
    """.trim))

  private val lengthBucketsQ: (String, QFn, Option[String]) = (
    "length_buckets",
    (s, d) => CorpusPipeline.lengthBuckets(s, d),
    Some("""
      WITH t AS (SELECT len(string_split_regex(lower(text), '\s+'))::BIGINT AS n FROM documents),
      b AS (SELECT n, CAST(pow(2, length(bin(greatest(n, 1))) - 1) AS BIGINT) AS bucket_min FROM t)
      SELECT bucket_min, count(*)::BIGINT AS n_docs, sum(n)::BIGINT AS total_tokens
      FROM b GROUP BY bucket_min ORDER BY bucket_min
    """.trim))

  /** Decile machinery (q20's shape) over the quality score; the ts CTE is
    * textStats' own oracle, so score semantics cannot drift. (lazy: it
    * reads textStats' SQL, which initializes later in the file.) */
  private lazy val qualityDecilesQ: (String, QFn, Option[String]) = (
    "quality_deciles",
    (s, d) => TextAnalysis.qualityDeciles(s, d),
    Some(s"""
      WITH ts AS (${textStats._3.get}),
      r AS (SELECT doc_id, CAST(CAST(quality_score AS DECIMAL(9,4))*10000 AS BIGINT) AS q4,
              row_number() OVER (ORDER BY CAST(CAST(quality_score AS DECIMAL(9,4))*10000 AS BIGINT), doc_id) - 1 AS rk
            FROM ts),
      n AS (SELECT count(*) AS n FROM ts)
      SELECT rk*10//n AS decile, count(*)::BIGINT AS n_docs,
        round(min(q4)/10000.0, 4) AS min_q, round(max(q4)/10000.0, 4) AS max_q,
        round(sum(q4)::DOUBLE/10000.0/count(*), 4) AS avg_q
      FROM r, n GROUP BY decile ORDER BY decile
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

  /** Z-ordered layout box scan vs the unsorted original: hash-identical
    * aggregates prove the Morton rewrite row-lossless, and min_z/max_z
    * pin the 16-bit interleave arithmetic (the oracle recomputes z with
    * the same shift/mask/or terms). */
  private val zorderRevenueQ: (String, QFn, Option[String]) = {
    val zSql = (0 until 16).map { i =>
      s"((((l_partkey % 65536) >> $i) & 1) << ${2 * i}) | " +
        s"((((l_suppkey % 65536) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", ") | (", ")")
    ("zorder_revenue",
      (s: SparkSession, d: String) => Formats.zorderRevenue(s, d),
      Some(s"""
      WITH b AS (SELECT l_extendedprice, $zSql AS z
                 FROM lineitem
                 WHERE l_partkey >= 100 AND l_partkey < 200
                   AND l_suppkey >= 10 AND l_suppkey < 60)
      SELECT count(*)::BIGINT AS n_items,
             round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)::DOUBLE AS revenue,
             min(z)::BIGINT AS min_z, max(z)::BIGINT AS max_z
      FROM b
    """.trim))
  }

  /** Hashing-trick doc vectors: bucket 0 of the shared CMS family, so the
    * oracle rebuilds the identical feature space with no dictionary. */
  private val featureHashQ: (String, QFn, Option[String]) = (
    "feature_hash",
    (s, d) => TextAnalysis.featureHash(s, d),
    Some("""
      SELECT doc_id,
             ('0x' || substr(md5('0:' || token), 1, 15))::BIGINT % 64 AS bucket,
             count(*)::BIGINT AS cnt
      FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS token
            FROM documents)
      WHERE token != ''
      GROUP BY 1, 2 ORDER BY doc_id, bucket
    """.trim))

  /** Gap-filled resample: Spark's sequence-explode grid vs DuckDB's
    * generate_series — two different densification mechanisms that must
    * agree row-for-row, including the all-zero gap rows. */
  private val gapfillHourlyQ: (String, QFn, Option[String]) = (
    "gapfill_hourly",
    (s, d) => Temporal.gapfillHourly(s, d),
    Some("""
      WITH ev AS (SELECT user_id, date_trunc('hour', ts) AS h, value
                  FROM events WHERE user_id < 20),
      hourly AS (SELECT user_id, h, count(*)::BIGINT AS n_events,
                        round(sum(CAST(value AS DECIMAL(18,2))), 2)::DOUBLE AS sum_value
                 FROM ev GROUP BY 1, 2),
      grid AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
               FROM (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM ev GROUP BY user_id)),
      j AS (SELECT g.user_id, strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour,
                   COALESCE(hh.n_events, 0)::BIGINT AS n_events,
                   COALESCE(hh.sum_value, 0.0) AS sum_value
            FROM grid g LEFT JOIN hourly hh ON g.user_id = hh.user_id AND g.h = hh.h)
      SELECT * FROM j ORDER BY user_id, hour
    """.trim))

  /** Anti-domination cap: survivors decided by id-hash order, so the kept
    * set is partitioning-independent and the oracle replays it exactly. */
  private val domainCapQ: (String, QFn, Option[String]) = (
    "domain_cap",
    (s, d) => CorpusPipeline.domainCap(s, d),
    Some("""
      WITH r AS (SELECT doc_id, source,
                        row_number() OVER (PARTITION BY source
                          ORDER BY md5(doc_id::VARCHAR) ASC, doc_id ASC) AS keep_rank
                 FROM documents)
      SELECT doc_id, source, keep_rank::BIGINT AS keep_rank
      FROM r WHERE keep_rank <= 20 ORDER BY source, keep_rank
    """.trim))

  /** Epoch schedule: n_copies = mixture bucket + 1, same ANSI-safe 8-digit
    * source-index key the mixture rates ride. */
  private val epochUpsampleQ: (String, QFn, Option[String]) = (
    "epoch_upsample",
    (s, d) => CorpusPipeline.epochUpsample(s, d),
    Some("""
      WITH b AS (SELECT doc_id, source,
                        (CASE WHEN regexp_extract(source, '[0-9]+', 0) = '' THEN 0
                              ELSE right(regexp_extract(source, '[0-9]+', 0), 8)::INT % 4 END
                         + 1)::BIGINT AS n_copies
                 FROM documents)
      SELECT doc_id, source, n_copies, i AS copy_idx,
             md5(doc_id::VARCHAR || ':' || i::VARCHAR) AS shuffle_key
      FROM b, unnest(range(1, n_copies + 1)) AS u(i)
      ORDER BY doc_id, copy_idx
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

  /** Count-min sketch: md5-derived bucket hashes on both sides, so DuckDB
    * rebuilds the identical 4×1024 sketch and the estimates hash-match
    * exactly — a fully oracle-checked sketch, not a tolerance gate. */
  private val cmsTopkQ: (String, QFn, Option[String]) = (
    "cms_topk",
    (s, d) => TextAnalysis.cmsHeavyHitters(s, d),
    Some("""
      WITH t AS (SELECT token
                 FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
                       FROM documents)
                 WHERE token != ''),
      js AS (SELECT unnest([0, 1, 2, 3]) AS j),
      cells AS (SELECT j, ('0x' || substr(md5(j::VARCHAR || ':' || token), 1, 15))::BIGINT % 1024 AS b,
                       count(*)::BIGINT AS cnt
                FROM t CROSS JOIN js GROUP BY 1, 2),
      ex AS (SELECT token, count(*)::BIGINT AS exact_cnt FROM t GROUP BY token
             ORDER BY exact_cnt DESC, token ASC LIMIT 20),
      probe AS (SELECT ex.token, ex.exact_cnt, j,
                       ('0x' || substr(md5(j::VARCHAR || ':' || ex.token), 1, 15))::BIGINT % 1024 AS b
                FROM ex CROSS JOIN js),
      est AS (SELECT p.token, p.exact_cnt, min(c.cnt)::BIGINT AS cms_cnt
              FROM probe p JOIN cells c ON c.j = p.j AND c.b = p.b
              GROUP BY 1, 2)
      SELECT token, exact_cnt, cms_cnt, cms_cnt >= exact_cnt AS never_underestimates
      FROM est ORDER BY exact_cnt DESC, token ASC
    """.trim))

  private val sampleMixtureQ: (String, QFn, Option[String]) = (
    "sample_mixture",
    (s, d) => CorpusPipeline.sampleMixture(s, d),
    Some("""
      WITH r AS (
        SELECT doc_id, source,
               ([0.1, 0.3, 0.6, 1.0]::DOUBLE[])[(CASE WHEN regexp_extract(source, '[0-9]+', 0) = ''
                  THEN 0 ELSE right(regexp_extract(source, '[0-9]+', 0), 8)::INT % 4 END) + 1]
                 AS target_rate,
               (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT)::DOUBLE
                 / 1152921504606846976.0 AS u
        FROM documents)
      SELECT doc_id, source, target_rate FROM r WHERE u < target_rate ORDER BY doc_id
    """.trim))

  private val piiRedactQ: (String, QFn, Option[String]) = (
    "pii_redact",
    (s, d) => TextAnalysis.piiRedact(s, d),
    Some("""
      WITH p AS (SELECT doc_id,
          text || ' contact user' || doc_id::VARCHAR || '@example.com or call +1-555-' ||
          lpad((doc_id % 10000)::VARCHAR, 4, '0') AS t FROM documents)
      SELECT doc_id,
        len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))::BIGINT AS n_emails,
        len(regexp_extract_all(t, '\+1-555-[0-9]{4}'))::BIGINT AS n_phones,
        md5(regexp_replace(regexp_replace(t,
          '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
          '\+1-555-[0-9]{4}', '<PHONE>', 'g')) AS redacted_hash
      FROM p ORDER BY doc_id
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

  /** Bigram-LM scoring: per-bigram ln of an integer ratio rounded to 6 dp
    * and summed as DECIMAL — the order-independence trick that makes a
    * floating aggregate hash-checkable (see q13's variance oracle). */
  private val lmPerplexityQ: (String, QFn, Option[String]) = (
    "lm_perplexity",
    (s, d) => TextAnalysis.lmPerplexity(s, d),
    Some(s"""
      WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents),
      bg AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
             FROM t, unnest(range(1, len(toks))) AS r(i)
             WHERE len(toks) >= 2),
      cb AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
      cu AS (SELECT w1, count(*) AS cu FROM bg GROUP BY w1),
      v AS (SELECT count(DISTINCT w) AS vsz FROM (SELECT unnest(toks) AS w FROM t)),
      sc AS (SELECT bg.doc_id,
                round(ln((cb.cb + 1)::DOUBLE / (cu.cu + v.vsz)::DOUBLE), 6)::DECIMAL(18,6) AS logp
             FROM bg JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN v),
      agg AS (SELECT doc_id, count(*) AS n_bigrams, sum(logp) AS slp FROM sc GROUP BY doc_id)
      SELECT doc_id, n_bigrams, round((slp::DOUBLE) / n_bigrams, 4) AS avg_logp,
             round(exp(-round((slp::DOUBLE) / n_bigrams, 4)), 4) AS ppl
      FROM agg ORDER BY doc_id
    """.trim))

  private val oovRateQ: (String, QFn, Option[String]) = (
    "oov_rate",
    (s, d) => TextAnalysis.oovRate(s, d),
    Some(s"""
      WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS w
                   FROM documents),
      voc AS (SELECT w FROM (SELECT w, count(*) AS cnt FROM tok GROUP BY w) WHERE cnt >= 100),
      j AS (SELECT tok.doc_id, CASE WHEN voc.w IS NULL THEN 1 ELSE 0 END AS oov
            FROM tok LEFT JOIN voc ON tok.w = voc.w)
      SELECT doc_id, count(*)::BIGINT AS n_tokens, sum(oov)::BIGINT AS n_oov,
             round(sum(oov)::DOUBLE / count(*), 4) AS oov_rate
      FROM j GROUP BY doc_id ORDER BY doc_id
    """.trim))

  private val boilerplateQ: (String, QFn, Option[String]) = (
    "boilerplate_score",
    (s, d) => TextAnalysis.boilerplateScore(s, d),
    Some(s"""
      WITH s AS ($shingledCte),
      ex AS (SELECT doc_id, unnest(sh) AS sh FROM s),
      hot AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM ex GROUP BY sh) WHERE df > 5),
      j AS (SELECT ex.doc_id, CASE WHEN hot.sh IS NULL THEN 0 ELSE 1 END AS hb
            FROM ex LEFT JOIN hot ON ex.sh = hot.sh)
      SELECT doc_id, count(*)::BIGINT AS n_shingles, sum(hb)::BIGINT AS n_boiler,
             round(sum(hb)::DOUBLE / count(*), 4) AS boiler_ratio
      FROM j GROUP BY doc_id ORDER BY doc_id
    """.trim))

  /** Sequence packing (concat-then-chunk): the oracle's single-node window
    * cumsum must equal the distributed two-pass prefix sum exactly. */
  private val packSequencesQ: (String, QFn, Option[String]) = (
    "pack_sequences",
    (s, d) => CorpusPipeline.packSequences(s, d),
    Some(s"""
      WITH t AS (SELECT doc_id, len(string_split_regex(lower(text), '\\s+'))::BIGINT AS n_tokens FROM documents),
      c AS (SELECT doc_id, n_tokens, (sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens)::BIGINT AS start_offset FROM t)
      SELECT doc_id, n_tokens, start_offset, start_offset//2048 AS seq_id, start_offset%2048 AS offset_in_seq
      FROM c ORDER BY doc_id
    """.trim))

  // ---- dedup ----------------------------------------------------------------

  private val dedupExact: (String, QFn, Option[String]) = (
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
  private def ngramPairsCtes(maxDf: Int): String =
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

  /** Bigram frequency table — unigram vocab's n-gram-LM sibling. */
  private val bigramTopKQ: (String, QFn, Option[String]) = (
    "bigram_topk",
    (s, d) => TextAnalysis.bigramTopK(s, d),
    Some("""
      WITH t AS (SELECT string_split_regex(lower(text), '\s+') AS toks FROM documents),
      b AS (SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bigram
            FROM t WHERE len(toks) >= 2),
      c AS (SELECT bigram, count(*) AS n_occurrences FROM b GROUP BY bigram),
      r AS (SELECT bigram, n_occurrences,
                   row_number() OVER (ORDER BY n_occurrences DESC, bigram ASC) AS rank FROM c)
      SELECT rank, bigram, n_occurrences FROM r WHERE rank <= 30 ORDER BY rank
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

  private val mmGzipQ: (String, QFn, Option[String]) = (
    "mm_gzip_roundtrip",
    (s, d) => Multimodal.gzipRoundtripChecked(s, d),
    Some("""
      SELECT doc_id,
             octet_length(encode(text))::BIGINT AS n_raw,
             TRUE AS roundtrip_ok,
             md5(text) AS orig_md5
      FROM documents ORDER BY doc_id
    """.trim))

  /** Pixel decode hash-checked end to end: the query encodes doc bytes as a
    * real k×1 P6 PPM, decodes the pixels back, and emits per-channel
    * mean/σ; the oracle reproduces the identical integers from `ord()` over
    * the text (channel sums are exact longs → identical doubles). */
  /** Decimated sample j·16 is the little-endian int16 at text chars
    * 2(j·16)+1, 2(j·16)+2 — the oracle recomputes the kept samples from
    * the synthesis source, pinning the RIFF walk + LE16 reads + stride. */
  private val mmAudioSampleQ: (String, QFn, Option[String]) = (
    "mm_audio_sample",
    (s, d) => Multimodal.audioSample(s, d),
    Some("""
      WITH d AS (SELECT doc_id, text, len(text)//2 AS m FROM documents
                 WHERE len(text) >= 2 AND len(text) = octet_length(encode(text))),
      k AS (SELECT doc_id, m, (m + 15)//16 AS n_kept, text FROM d)
      SELECT doc_id, CAST(16000 AS BIGINT) AS sample_rate, m AS n_samples, n_kept,
             array_to_string(list_transform(range(0, n_kept), j ->
               (ord(substr(text, CAST(2*(j*16)+1 AS INT), 1)) +
                256*ord(substr(text, CAST(2*(j*16)+2 AS INT), 1)))::VARCHAR), ',') AS samples
      FROM k ORDER BY doc_id
    """.trim))

  /** Audio fingerprint from the same u16 sample formula as
    * mm_audio_sample; `size(vals)` on the Spark side is DuckDB's n_kept. */
  private val mmAudioFingerprintQ: (String, QFn, Option[String]) = (
    "mm_audio_fingerprint",
    (s, d) => Multimodal.audioFingerprint(s, d),
    Some("""
      WITH d AS (SELECT doc_id, text, len(text)//2 AS m FROM documents
                 WHERE len(text) >= 2 AND len(text) = octet_length(encode(text))),
      kk AS (SELECT doc_id, m, (m + 15)//16 AS n_kept, text FROM d),
      v AS (SELECT doc_id, n_kept, j,
                   ord(substr(text, CAST(2*(j*16)+1 AS INT), 1)) +
                   256*ord(substr(text, CAST(2*(j*16)+2 AS INT), 1)) AS s
            FROM kk, unnest(range(0, n_kept)) r(j)),
      t AS (SELECT doc_id, sum(s) AS total, any_value(n_kept) AS nk
            FROM v GROUP BY doc_id),
      h AS (SELECT v.doc_id,
                   string_agg(CASE WHEN s * nk >= total THEN '1' ELSE '0' END,
                              '' ORDER BY j) AS afp
            FROM v JOIN t USING (doc_id) GROUP BY v.doc_id),
      c AS (SELECT afp, count(*) AS n_same FROM h GROUP BY afp)
      SELECT h.doc_id, h.afp, c.n_same::BIGINT AS n_same_hash,
             c.n_same > 1 AS is_dup
      FROM h JOIN c USING (afp) ORDER BY doc_id
    """.trim))

  /** The schedule is pure integer arithmetic on the mvhd duration, which
    * the synthesized container sets to n_chars — the oracle recomputes it
    * from the text length, pinning the box-walk roundtrip. */
  private val mmFrameSampleQ: (String, QFn, Option[String]) = (
    "mm_frame_sample",
    (s, d) => Multimodal.frameSample(s, d),
    Some("""
      SELECT doc_id, i AS frame_idx, (i * len(text)) // 5 AS sample_ms,
             len(text)::BIGINT AS duration_ms
      FROM documents, unnest(range(0, 5)) r(i)
      ORDER BY doc_id, frame_idx
    """.trim))

  /** The thumbnail's sampled byte at (i,j,c) is the text char at
    * 3·⌊j·k/8⌋ + c — the oracle recomputes the REAL resize output via
    * substr/ord (rows repeat: the synthesized image is k×1). */
  private val mmThumbnailQ: (String, QFn, Option[String]) = (
    "mm_thumbnail",
    (s, d) => Multimodal.imageThumbnail(s, d),
    Some("""
      WITH kk AS (SELECT doc_id, text, len(text)//3 AS k FROM documents
                  WHERE len(text) >= 3 AND len(text) = octet_length(encode(text))
                    AND len(text)//3 <= 1048576)
      SELECT doc_id, k AS src_w, CAST(1 AS BIGINT) AS src_h,
             array_to_string(list_transform(range(0, 192), v ->
               ord(substr(text, CAST(3 * (((v % 24) // 3) * k // 8) + (v % 3) + 1 AS INT), 1))::VARCHAR), ',') AS thumb
      FROM kk ORDER BY doc_id
    """.trim))

  /** aHash mirrored from the same substr/ord pixel formula as
    * mm_thumbnail (k×1 source ⇒ row index vanishes; column j samples
    * source pixel j·k÷8). */
  private val mmImageAhashQ: (String, QFn, Option[String]) = (
    "mm_image_ahash",
    (s, d) => Multimodal.imageAhash(s, d),
    Some("""
      WITH kk AS (SELECT doc_id, text, len(text)//3 AS k FROM documents
                  WHERE len(text) >= 3 AND len(text) = octet_length(encode(text))
                    AND len(text)//3 <= 1048576),
      g AS (SELECT doc_id, p,
                   ord(substr(text, CAST(3 * ((p % 8) * k // 8) + 1 AS INT), 1)) +
                   ord(substr(text, CAST(3 * ((p % 8) * k // 8) + 2 AS INT), 1)) +
                   ord(substr(text, CAST(3 * ((p % 8) * k // 8) + 3 AS INT), 1)) AS gv
            FROM (SELECT doc_id, k, text, unnest(range(0, 64)) AS p FROM kk)),
      t AS (SELECT doc_id, sum(gv) AS total FROM g GROUP BY doc_id),
      h AS (SELECT doc_id,
                   string_agg(CASE WHEN gv * 64 >= total THEN '1' ELSE '0' END,
                              '' ORDER BY p) AS ahash
            FROM g JOIN t USING (doc_id) GROUP BY doc_id),
      c AS (SELECT ahash, count(*) AS n_same FROM h GROUP BY ahash)
      SELECT h.doc_id, h.ahash, c.n_same::BIGINT AS n_same_hash,
             c.n_same > 1 AS is_dup
      FROM h JOIN c USING (ahash) ORDER BY doc_id
    """.trim))

  /** Hamming-ball near-dup pairs over the aHash signatures: Spark finds
    * candidates via the pigeonhole quarter-chunk join; the oracle verifies
    * by BRUTE-FORCE pairwise Hamming over the same recomputed signatures
    * — a completeness check, not just a hash check (a missed candidate
    * class shows up as missing oracle rows). */
  private val mmImageNearDupQ: (String, QFn, Option[String]) = (
    "mm_image_neardup",
    (s, d) => Multimodal.imageNearDup(s, d),
    Some("""
      WITH kk AS (SELECT doc_id, text, len(text)//3 AS k FROM documents
                  WHERE len(text) >= 3 AND len(text) = octet_length(encode(text))
                    AND len(text)//3 <= 1048576),
      g AS (SELECT doc_id, p,
                   ord(substr(text, CAST(3 * ((p % 8) * k // 8) + 1 AS INT), 1)) +
                   ord(substr(text, CAST(3 * ((p % 8) * k // 8) + 2 AS INT), 1)) +
                   ord(substr(text, CAST(3 * ((p % 8) * k // 8) + 3 AS INT), 1)) AS gv
            FROM (SELECT doc_id, k, text, unnest(range(0, 64)) AS p FROM kk)),
      t AS (SELECT doc_id, sum(gv) AS total FROM g GROUP BY doc_id),
      h AS (SELECT doc_id,
                   string_agg(CASE WHEN gv * 64 >= total THEN '1' ELSE '0' END,
                              '' ORDER BY p) AS ahash
            FROM g JOIN t USING (doc_id) GROUP BY doc_id),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   list_sum(list_transform(range(1, CAST(len(a.ahash)+1 AS BIGINT)),
                     i -> CASE WHEN substr(a.ahash, i::INT, 1) <> substr(b.ahash, i::INT, 1)
                          THEN 1 ELSE 0 END))::BIGINT AS hamming
            FROM h a JOIN h b ON a.doc_id < b.doc_id AND len(a.ahash) = len(b.ahash))
      SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3 ORDER BY id_a, id_b
    """.trim))

  /** The audio twin: brute-force Hamming over equal-length fingerprints
    * (different durations are incomparable by construction). */
  private val mmAudioNearDupQ: (String, QFn, Option[String]) = (
    "mm_audio_neardup",
    (s, d) => Multimodal.audioNearDup(s, d),
    Some("""
      WITH d AS (SELECT doc_id, text, len(text)//2 AS m FROM documents
                 WHERE len(text) >= 2 AND len(text) = octet_length(encode(text))),
      kk AS (SELECT doc_id, m, (m + 15)//16 AS n_kept, text FROM d),
      v AS (SELECT doc_id, n_kept, j,
                   ord(substr(text, CAST(2*(j*16)+1 AS INT), 1)) +
                   256*ord(substr(text, CAST(2*(j*16)+2 AS INT), 1)) AS s
            FROM kk, unnest(range(0, n_kept)) r(j)),
      t AS (SELECT doc_id, sum(s) AS total, any_value(n_kept) AS nk
            FROM v GROUP BY doc_id),
      h AS (SELECT v.doc_id,
                   string_agg(CASE WHEN s * nk >= total THEN '1' ELSE '0' END,
                              '' ORDER BY j) AS afp
            FROM v JOIN t USING (doc_id) GROUP BY v.doc_id),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   list_sum(list_transform(range(1, CAST(len(a.afp)+1 AS BIGINT)),
                     i -> CASE WHEN substr(a.afp, i::INT, 1) <> substr(b.afp, i::INT, 1)
                          THEN 1 ELSE 0 END))::BIGINT AS hamming
            FROM h a JOIN h b ON a.doc_id < b.doc_id AND len(a.afp) = len(b.afp))
      SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3 ORDER BY id_a, id_b
    """.trim))

  private val mmImageDecodeQ: (String, QFn, Option[String]) = (
    "mm_image_decode",
    (s, d) => Multimodal.imageDecode(s, d),
    Some("""
      WITH kk AS (SELECT doc_id, text, len(text)//3 AS k FROM documents
                  WHERE len(text) >= 3 AND len(text) = octet_length(encode(text))
                    AND len(text)//3 <= 1048576),
      px AS (SELECT doc_id, k, text, unnest(range(1, 3*k+1)) AS i FROM kk),
      v AS (SELECT doc_id, k, CAST((i-1)%3 AS INT) AS ch, ord(substr(text, CAST(i AS INT), 1)) AS b FROM px),
      a AS (SELECT doc_id, any_value(k) AS k,
              sum(b) FILTER (WHERE ch=0)::BIGINT AS s_r, sum(b*b) FILTER (WHERE ch=0)::BIGINT AS q_r,
              sum(b) FILTER (WHERE ch=1)::BIGINT AS s_g, sum(b*b) FILTER (WHERE ch=1)::BIGINT AS q_g,
              sum(b) FILTER (WHERE ch=2)::BIGINT AS s_b, sum(b*b) FILTER (WHERE ch=2)::BIGINT AS q_b
            FROM v GROUP BY doc_id)
      SELECT doc_id, 'ppm' AS media_type, k::BIGINT AS width, CAST(1 AS BIGINT) AS height,
        round(s_r::DOUBLE/k, 4) AS mean_r, round(s_g::DOUBLE/k, 4) AS mean_g, round(s_b::DOUBLE/k, 4) AS mean_b,
        round(sqrt(q_r::DOUBLE/k - (s_r::DOUBLE/k)*(s_r::DOUBLE/k)), 4) AS sd_r,
        round(sqrt(q_g::DOUBLE/k - (s_g::DOUBLE/k)*(s_g::DOUBLE/k)), 4) AS sd_g,
        round(sqrt(q_b::DOUBLE/k - (s_b::DOUBLE/k)*(s_b::DOUBLE/k)), 4) AS sd_b
      FROM a ORDER BY doc_id
    """.trim))

  /** PCM sample decode hash-checked: the query encodes doc bytes as a real
    * 16-bit mono WAV, decodes the samples back, and the oracle reproduces
    * the identical values from `ord()` byte pairs (ASCII ⇒ every sample
    * positive; the signed path is spec-gated). */
  private val mmAudioDecodeQ: (String, QFn, Option[String]) = (
    "mm_audio_decode",
    (s, d) => Multimodal.audioDecode(s, d),
    Some("""
      WITH mm AS (SELECT doc_id, text, len(text)//2 AS m FROM documents
                  WHERE len(text) >= 2 AND len(text) = octet_length(encode(text))),
      sm AS (SELECT doc_id, m, text, unnest(range(1, m+1)) AS i FROM mm),
      v AS (SELECT doc_id, m, ord(substr(text, CAST(2*i-1 AS INT), 1)) + 256*ord(substr(text, CAST(2*i AS INT), 1)) AS v FROM sm),
      a AS (SELECT doc_id, any_value(m) AS m, sum(v)::BIGINT AS s, sum(v*v)::BIGINT AS q FROM v GROUP BY doc_id)
      SELECT doc_id, CAST(16000 AS BIGINT) AS sample_rate, CAST(1 AS BIGINT) AS n_channels,
        m::BIGINT AS n_samples, round(s::DOUBLE/m, 4) AS mean_amp,
        round(sqrt(q::DOUBLE/m - (s::DOUBLE/m)*(s::DOUBLE/m)), 4) AS sd_amp
      FROM a ORDER BY doc_id
    """.trim))

  // ---- text analysis --------------------------------------------------------

  private val textStats: (String, QFn, Option[String]) = (
    "text_stats",
    (s, d) => TextAnalysis.textStats(s, d),
    Some(s"""
      WITH t AS ($toksCte),
      m AS (SELECT doc_id,
              len(toks)::BIGINT AS n_tokens,
              list_sum(list_transform(toks, x -> len(x)))::DOUBLE / len(toks) AS avg_len,
              (len(text) - len(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')))::DOUBLE / len(text) AS punct_ratio,
              len(list_filter(toks, x -> list_contains($stopwordsList, x)))::DOUBLE / len(toks) AS stop_ratio
            FROM t)
      SELECT doc_id, n_tokens,
             round(avg_len, 4) AS avg_token_len,
             round(punct_ratio, 4) AS punct_ratio,
             round(stop_ratio, 4) AS stopword_ratio,
             round(least(n_tokens::DOUBLE / 100.0, 1.0) * 0.6 +
                   (1.0 - punct_ratio) * 0.2 +
                   least(stop_ratio * 5.0, 1.0) * 0.2, 4) AS quality_score
      FROM m ORDER BY doc_id
    """.trim))

  private val langId: (String, QFn, Option[String]) = (
    "lang_id",
    (s, d) => TextAnalysis.langId(s, d),
    Some(s"""
      WITH t AS ($toksCte),
      sc AS (SELECT doc_id, lang,
               len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein'], x))) AS s_de,
               len(list_filter(toks, x -> list_contains(['the','a','and','of','to','is'], x))) AS s_en,
               len(list_filter(toks, x -> list_contains(['el','la','los','y','es','un'], x))) AS s_es,
               len(list_filter(toks, x -> list_contains(['le','les','et','est','une','dans'], x))) AS s_fr
             FROM t),
      b1 AS (SELECT *, CASE WHEN s_en > s_de THEN s_en ELSE s_de END AS bs1,
                       CASE WHEN s_en > s_de THEN 'en' ELSE 'de' END AS bl1 FROM sc),
      b2 AS (SELECT *, CASE WHEN s_es > bs1 THEN s_es ELSE bs1 END AS bs2,
                       CASE WHEN s_es > bs1 THEN 'es' ELSE bl1 END AS bl2 FROM b1),
      b3 AS (SELECT *, CASE WHEN s_fr > bs2 THEN s_fr ELSE bs2 END AS bs3,
                       CASE WHEN s_fr > bs2 THEN 'fr' ELSE bl2 END AS bl3 FROM b2)
      SELECT doc_id,
             CASE WHEN bs3 > 0 THEN bl3 ELSE 'und' END AS pred_lang,
             lang AS label_lang,
             CASE WHEN (CASE WHEN bs3 > 0 THEN bl3 ELSE 'und' END) = lang THEN 1 ELSE 0 END AS is_match
      FROM b3 ORDER BY doc_id
    """.trim))

  private val tokenCount: (String, QFn, Option[String]) = (
    "token_count",
    (s, d) => TextAnalysis.tokenCount(s, d),
    Some("""
      SELECT doc_id,
             len(string_split_regex(lower(text), '\s+'))::BIGINT AS ws_tokens,
             len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))::BIGINT AS re_tokens,
             len(text)::BIGINT AS n_chars
      FROM documents ORDER BY doc_id
    """.trim))

  private val docFingerprint: (String, QFn, Option[String]) = (
    "doc_fingerprint",
    (s, d) => TextAnalysis.fingerprint(s, d),
    Some(s"""
      WITH s AS ($shingledCte)
      SELECT doc_id,
             array_to_string(list_sort(list_transform(sh, x -> md5(x)))[1:5], ',') AS fingerprint
      FROM s ORDER BY doc_id
    """.trim))

  // ---- similarity -----------------------------------------------------------

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

  // (pq_quantize / pq_search ride pq_gate — see the seeded-generator note
  // above; the functions remain exercised by the gate and QuantizationSpec.)

  // ---- multimodal -----------------------------------------------------------

  private val mmJoin: (String, QFn, Option[String]) = (
    "mm_join",
    (s, d) => Multimodal.multimodalJoin(s, d),
    Some("""
      SELECT lang, label, count(*) AS n_docs,
             round(avg(n_chars), 4) AS avg_chars,
             min(doc_id) AS min_doc_id
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      GROUP BY lang, label ORDER BY lang, label
    """.trim))

  private val mmBinaryStats: (String, QFn, Option[String]) = (
    "mm_binary_stats",
    (s, d) => Multimodal.binaryStats(s, d),
    Some("""
      SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
             md5(text) AS payload_md5, source
      FROM documents ORDER BY doc_id
    """.trim))

  /** The documents corpus is ASCII text → every payload decodes as `raw`,
    * and the raw path (byte count / mean byte / head hash) is exactly
    * SQL-expressible: per-char ord == byte value on ASCII, and the decoder
    * rounds half-up to match SQL round(). Header parsing for real formats
    * stays spec-gated with synthetic WAV/PPM/BMP/JPEG/PNG payloads. */
  private val mmMediaFeatures: (String, QFn, Option[String]) = (
    "mm_media_features",
    (s, d) => Multimodal.mediaFeatures(s, d),
    Some("""
      SELECT doc_id,
        length(text)::BIGINT AS n_bytes,
        'raw' AS media_type,
        0::BIGINT AS dim1, 0::BIGINT AS dim2,
        CASE WHEN length(text) = 0 THEN 0.0
             ELSE round(CAST(list_sum(list_transform(range(1, length(text)+1),
                    i -> ord(text[i]))) AS DOUBLE) / length(text), 4) END AS mean_byte,
        md5(substring(text, 1, 16)) AS head_hash
      FROM documents ORDER BY doc_id
    """.trim))

  // ---- corpus pipeline (declared last: composes the oracle SQL of the
  // single ops above, so those vals must already be initialized) ------------

  /** Spark lacks ASOF JOIN; the operator is the union-tag window form (one
    * shuffle by user, no join), and the oracle is DuckDB's NATIVE ASOF LEFT
    * JOIN — two entirely different algorithms that must agree row-for-row. */
  private val asofJoinQ: (String, QFn, Option[String]) = (
    "asof_join",
    (s, d) => Temporal.asofJoin(s, d),
    Some("""
      WITH r AS (SELECT user_id, ts, max(value) AS asof_value
                 FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      l AS (SELECT event_id, user_id, ts, value
            FROM events WHERE event_type = 'purchase')
      SELECT l.event_id, l.user_id, l.value, r.asof_value,
             epoch_us(l.ts) - epoch_us(r.ts) AS micros_since_match
      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
      ORDER BY l.event_id
    """.trim))

  /** Granule-bucketed interval join vs DuckDB's plain inequality join —
    * the Spark side must turn the BETWEEN predicate into a keyed equi-join
    * (PlanSpec asserts no nested-loop) yet agree row-for-row. */
  private val rangeJoinQ: (String, QFn, Option[String]) = (
    "range_join_sessions",
    (s, d) => Temporal.sessionRangeJoin(s, d),
    Some(s"""
      WITH e AS (
        SELECT user_id, event_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events WHERE event_type <> 'error'),
      m AS (SELECT *, CASE WHEN prev_ts IS NULL
                           OR epoch_us(ts) - epoch_us(prev_ts) > ${Temporal.RangeGapUs}
                           THEN 1 ELSE 0 END AS new_session FROM e),
      s AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM m),
      iv AS (SELECT user_id, session_id, min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us
             FROM s GROUP BY user_id, session_id),
      p AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'error')
      SELECT p.event_id, p.user_id, iv.session_id, p.us - iv.start_us AS us_into_session
      FROM p JOIN iv ON p.user_id = iv.user_id AND p.us BETWEEN iv.start_us AND iv.end_us
      ORDER BY p.event_id
    """.trim))

  private val sampleStratifiedQ: (String, QFn, Option[String]) = (
    "sample_stratified",
    (s, d) => CorpusPipeline.sampleStratified(s, d),
    Some("""
      WITH s AS (SELECT doc_id, lang, length(text)::BIGINT AS n_chars,
                        row_number() OVER (PARTITION BY lang
                          ORDER BY md5(doc_id::VARCHAR) ASC, doc_id ASC) AS stratum_rank
                 FROM documents)
      SELECT doc_id, lang, n_chars, stratum_rank
      FROM s WHERE stratum_rank <= 50 ORDER BY lang, stratum_rank
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

  /** 64-token chunks every 48 tokens — the pre-embedding chunking stage. */
  private val docChunksQ: (String, QFn, Option[String]) = (
    "doc_chunks",
    (s, d) => TextAnalysis.docChunks(s, d),
    Some(s"""
      WITH t AS ($toksCte),
      s AS (SELECT doc_id, toks, unnest(range(1, greatest(len(toks),1)+1, 48)) AS st FROM t),
      c AS (SELECT doc_id, CAST((st-1)//48 AS BIGINT) AS chunk_id,
                   list_slice(toks, st, st+63) AS chunk FROM s)
      SELECT doc_id, chunk_id, CAST(len(chunk) AS BIGINT) AS n_tokens,
             md5(array_to_string(chunk, ' ')) AS chunk_hash
      FROM c WHERE len(chunk) > 0 ORDER BY doc_id, chunk_id
    """.trim))

  private val repetitionScoreQ: (String, QFn, Option[String]) = (
    "repetition_score",
    (s, d) => TextAnalysis.repetitionScore(s, d),
    Some(s"""
      WITH t AS ($toksCte),
      c AS (SELECT doc_id, (len(toks)-2)::BIGINT AS n_ngrams,
                   len(list_distinct(list_transform(range(1, len(toks)-1),
                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))::BIGINT AS n_distinct
            FROM t WHERE len(toks) >= 3)
      SELECT doc_id, n_ngrams, n_distinct,
             round(1.0 - n_distinct::DOUBLE / n_ngrams, 4) AS repetition
      FROM c ORDER BY doc_id
    """.trim))

  private val sampleHashQ: (String, QFn, Option[String]) = (
    "sample_hash",
    (s, d) => CorpusPipeline.sampleByHash(s, d),
    Some("""
      SELECT doc_id, lang, len(text)::BIGINT AS n_chars
      FROM documents WHERE md5(doc_id::VARCHAR) < '1a' ORDER BY doc_id
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

  private val splitAssignQ: (String, QFn, Option[String]) = (
    "split_assign",
    (s, d) => CorpusPipeline.splitAssign(s, d),
    Some("""
      SELECT CASE WHEN b < 98 THEN 'train' WHEN b = 98 THEN 'val' ELSE 'test' END AS split,
             lang, count(*) AS n_docs, sum(len(text))::BIGINT AS total_chars
      FROM (SELECT lang, text,
              ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 AS b
            FROM documents)
      GROUP BY split, lang ORDER BY split, lang
    """.trim))

  private val shardManifestQ: (String, QFn, Option[String]) = (
    "shard_manifest",
    (s, d) => CorpusPipeline.shardManifest(s, d),
    Some("""
      SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 16 AS shard,
             count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars,
             sum(('0x' || substr(md5(text), 1, 8))::BIGINT)::BIGINT AS content_sum
      FROM documents GROUP BY shard ORDER BY shard
    """.trim))

  private val vocabTopKQ: (String, QFn, Option[String]) = (
    "vocab_topk",
    (s, d) => TextAnalysis.vocabTopK(s, d),
    Some("""
      WITH t AS (SELECT unnest(string_split_regex(lower(text), '\s+')) AS token FROM documents),
      c AS (SELECT token, count(*) AS n_occurrences FROM t WHERE token <> '' GROUP BY token),
      r AS (SELECT token, n_occurrences,
                   row_number() OVER (ORDER BY n_occurrences DESC, token ASC) AS rank
            FROM c)
      SELECT rank, token, n_occurrences FROM r WHERE rank <= 50 ORDER BY rank
    """.trim))

  private val lengthPctQ: (String, QFn, Option[String]) = (
    "length_percentiles",
    (s, d) => TextAnalysis.lengthPercentiles(s, d),
    Some("""
      WITH d AS (SELECT len(text)::BIGINT AS n_chars FROM documents),
      r AS (SELECT n_chars, row_number() OVER (ORDER BY n_chars) AS r FROM d),
      n AS (SELECT count(*) AS c FROM d)
      SELECT (SELECT c FROM n) AS n_docs,
             (SELECT n_chars FROM r WHERE r = CAST(ceil(0.5  * (SELECT c FROM n)) AS BIGINT)) AS p50_chars,
             (SELECT n_chars FROM r WHERE r = CAST(ceil(0.9  * (SELECT c FROM n)) AS BIGINT)) AS p90_chars,
             (SELECT n_chars FROM r WHERE r = CAST(ceil(0.99 * (SELECT c FROM n)) AS BIGINT)) AS p99_chars
    """.trim))

  /** q14's HLL-gate pattern applied to the percentile sketch. */
  private val percentileGateQ: (String, QFn, Option[String]) = (
    "percentile_gate",
    (s, d) => TextAnalysis.percentileGate(s, d),
    Some("""
      WITH d AS (SELECT len(text)::BIGINT AS n_chars FROM documents),
      r AS (SELECT n_chars, row_number() OVER (ORDER BY n_chars) AS r FROM d),
      n AS (SELECT count(*) AS c FROM d)
      SELECT (SELECT c FROM n) AS n_docs,
             (SELECT n_chars FROM r WHERE r = CAST(ceil(0.5  * (SELECT c FROM n)) AS BIGINT)) AS p50_chars,
             (SELECT n_chars FROM r WHERE r = CAST(ceil(0.9  * (SELECT c FROM n)) AS BIGINT)) AS p90_chars,
             (SELECT n_chars FROM r WHERE r = CAST(ceil(0.99 * (SELECT c FROM n)) AS BIGINT)) AS p99_chars,
             TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
    """.trim))

  private val tfIdfQ: (String, QFn, Option[String]) = (
    "tf_idf_top",
    (s, d) => TextAnalysis.tfIdfTop(s, d),
    Some("""
      WITH t AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term FROM documents),
      tc AS (SELECT doc_id, term, count(*) AS c FROM t WHERE term <> '' GROUP BY doc_id, term),
      dl AS (SELECT doc_id, sum(c) AS n FROM tc GROUP BY doc_id),
      dfs AS (SELECT term, count(*) AS df FROM tc GROUP BY term),
      nn AS (SELECT count(*)::DOUBLE AS nd FROM documents),
      w AS (SELECT tc.doc_id, tc.term,
                   (tc.c::DOUBLE / dl.n) * ln(nn.nd / dfs.df) AS wt
            FROM tc JOIN dl USING (doc_id) JOIN dfs USING (term) CROSS JOIN nn),
      r AS (SELECT doc_id, term, wt,
                   row_number() OVER (PARTITION BY doc_id ORDER BY wt DESC, term ASC) AS rank
            FROM w)
      SELECT doc_id, rank, term, round(wt, 4) AS tfidf FROM r WHERE rank <= 5
      ORDER BY doc_id, rank
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

  /** Composes the ALREADY-ORACLE-VERIFIED single-op SQL as CTE bodies —
    * the composed query cannot drift from its parts. */
  private val pipelineCleanQ: (String, QFn, Option[String]) = (
    "pipeline_clean",
    (s, d) => CorpusPipeline.cleanCorpus(s, d),
    Some(s"""
      WITH ts AS (${textStats._3.get}),
      li AS (${langId._3.get}),
      de AS (${dedupExact._3.get})
      SELECT ts.doc_id, ts.n_tokens, ts.quality_score
      FROM ts JOIN li ON ts.doc_id = li.doc_id JOIN de ON ts.doc_id = de.doc_id
      WHERE li.pred_lang = 'en' AND ts.quality_score >= 0.5
      ORDER BY ts.doc_id
    """.trim))

  /** The end-to-end prep pass: clean → mixture sample → pack. The clean
    * CTE IS pipeline_clean's oracle; the mixture predicate and the packing
    * cumsum are the single-op oracles' own expressions — composed
    * hash-checking, stage drift impossible. (lazy: reads sibling SQL.) */
  private lazy val pipelineFullQ: (String, QFn, Option[String]) = (
    "pipeline_full",
    (s, d) => CorpusPipeline.pipelineFull(s, d),
    Some(s"""
      WITH cleaned AS (${pipelineCleanQ._3.get.replace("ORDER BY ts.doc_id", "")}),
      mixk AS (SELECT c.doc_id, c.n_tokens FROM cleaned c JOIN documents d USING (doc_id)
               WHERE (('0x' || substr(md5(c.doc_id::VARCHAR), 1, 15))::BIGINT)::DOUBLE
                       / 1152921504606846976.0
                     < ([0.1, 0.3, 0.6, 1.0]::DOUBLE[])[(CASE WHEN regexp_extract(d.source, '[0-9]+', 0) = ''
                        THEN 0 ELSE right(regexp_extract(d.source, '[0-9]+', 0), 8)::INT % 4 END) + 1]),
      cum AS (SELECT doc_id, n_tokens,
                (sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens)::BIGINT AS start_offset
              FROM mixk)
      SELECT doc_id, n_tokens, start_offset, start_offset//2048 AS seq_id,
             start_offset%2048 AS offset_in_seq
      FROM cum ORDER BY doc_id
    """.trim))
}
