package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.RegistrySqlParts._

/** Corpus-pipeline registered queries (mixture, packing, shuffle, splits, manifests, DSIR, capping) with their DuckDB oracle SQL. Split from the monolithic PipelineRegistry; the
  * aggregate surface (and entry order) lives there. */
private[graft] object RegistryCorpus {

  private[graft] def entries: Seq[(String, QFn, Option[String])] = Seq(
    sampleHashQ, pipelineCleanQ, sampleStratifiedQ, docChunksQ, packSequencesQ, sampleMixtureQ, corpusShuffleQ, lengthBucketsQ, pipelineFullQ, docChunksCdcQ, shardManifestQ, splitAssignQ, splitLeakageSafeQ, dsirWeightQ, corpusStatsQ, domainCapQ, epochUpsampleQ, tokenBudgetQ, datasetDiffQ, urlCanonicalDedupQ, decontamQ, sampleTemperatureQ, pipelineWebQ, shardCompactionQ, sourceLangEntropyQ)

  /** Per-source language-mix audit: the oracle recomputes the exact
    * (source, lang) counts, the micro-nat entropy terms, and the dominant
    * share, so every cell hash-matches. */
  private val sourceLangEntropyQ: (String, QFn, Option[String]) = (
    "source_lang_entropy",
    (s, d) => CorpusPipeline.sourceLangEntropy(s, d),
    Some("""
      WITH sl AS (SELECT source, lang, count(*)::BIGINT AS c
                  FROM documents GROUP BY source, lang),
      t AS (SELECT source, sum(c)::BIGINT AS n FROM sl GROUP BY source)
      SELECT sl.source, count(*)::BIGINT AS n_langs, max(n)::BIGINT AS n_docs,
             sum(CAST(floor(-(c::DOUBLE / n) * ln(c::DOUBLE / n) * 1e6 + 0.5)
                      AS BIGINT))::BIGINT AS entropy_unats,
             round(max(c)::DOUBLE / max(n), 4) AS top_share
      FROM sl JOIN t USING (source)
      GROUP BY sl.source ORDER BY sl.source
    """.trim))

  /** Temperature resampling: the oracle replays the √p_l weights (IEEE
    * sqrt is correctly rounded → identical doubles → identical floors),
    * the HUGEINT rate division, and the 60-bit keep decision, so the kept
    * doc set hash-matches exactly. */
  private val sampleTemperatureQ: (String, QFn, Option[String]) = (
    "sample_temperature",
    (s, d) => CorpusPipeline.sampleTemperature(s, d),
    Some("""
      WITH per AS (SELECT lang, count(*)::BIGINT AS n_l FROM documents GROUP BY lang),
      w AS (SELECT lang, n_l,
              CAST(floor(sqrt((n_l * 1000000)::DOUBLE)) AS BIGINT) AS w_l FROM per),
      tot AS (SELECT sum(n_l)::BIGINT AS n_total, sum(w_l)::BIGINT AS w_total FROM w),
      r AS (SELECT lang, n_l,
              least(1000000,
                (((n_total::HUGEINT // 2) * w_l * 1000000)
                 // (n_l::HUGEINT * w_total))::BIGINT) AS rate_micro
            FROM w, tot)
      SELECT d.doc_id, d.lang, r.n_l, r.rate_micro
      FROM documents d JOIN r USING (lang)
      WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT::DOUBLE
              / 1152921504606846976.0 < rate_micro / 1000000.0
      ORDER BY d.doc_id
    """.trim))

  /** The decontamination CTE chain (t → grams → bench set → per-doc
    * hits), shared verbatim by `benchmark_decontam` and the composed
    * `pipeline_web` oracle so the two cannot drift. */
  private val decontamCtes: String = s"""t AS (SELECT doc_id,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 AS bucket,
             string_split_regex(lower(text), '\\s+') AS toks FROM documents),
      g AS (SELECT doc_id, bucket,
              unnest(list_distinct(list_transform(range(1, len(toks) - 6),
                i -> ('0x' || substr(md5(list_aggregate(toks[i:i+7], 'string_agg', ' ')), 1, 15))::BIGINT))) AS s
            FROM t WHERE len(toks) >= 8),
      b AS (SELECT DISTINCT s FROM g WHERE bucket >= 90),
      pd AS (SELECT g.doc_id, count(*)::BIGINT AS n_ngrams,
               sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits
             FROM g LEFT JOIN b ON g.s = b.s WHERE g.bucket < 90 GROUP BY g.doc_id)"""

  /** Benchmark n-gram decontamination: the oracle rebuilds the held-out
    * benchmark slice (md5 doc-id bucket ≥ 90), both sides' distinct word
    * 8-gram 60-bit surrogates, and the left-join hit counts — so the
    * contamination flags hash-match row-for-row, not just in aggregate.
    * Non-vacuous at sf0.01: the planted near-dup clusters straddle the
    * id-hash boundary, so real contaminated train docs exist. */
  private val decontamQ: (String, QFn, Option[String]) = (
    "benchmark_decontam",
    (s, d) => CorpusPipeline.decontaminate(s, d),
    Some(s"""
      WITH $decontamCtes
      SELECT t.doc_id, coalesce(pd.n_ngrams, 0)::BIGINT AS n_ngrams,
             coalesce(pd.n_hits, 0)::BIGINT AS n_hits,
             (coalesce(pd.n_hits, 0) > 0)::INT AS contaminated
      FROM t LEFT JOIN pd ON t.doc_id = pd.doc_id
      WHERE t.bucket < 90 ORDER BY t.doc_id
    """.trim))

  /** Web-pipeline stage zero: the raw URLs are a deterministic id-derived
    * fixture (eight surface spellings per canonical page — case, default
    * port, fragment, tracking params, `/./` segments), and the oracle
    * replays BOTH the derivation and every canonicalization rule in SQL,
    * so the canonical strings themselves hash-match, not just counts. */
  /** The raw-URL fixture + canonicalization CTE chain (raw → canon),
    * shared verbatim by `url_canonical_dedup` and the composed
    * `pipeline_web` oracle so the two cannot drift. */
  private val urlCanonCtes: String = """raw AS (
        SELECT doc_id,
          CASE doc_id % 8
            WHEN 0 THEN 'https://h' || (doc_id % 50)::VARCHAR || '.example.com/p' || (doc_id % 200)::VARCHAR
            WHEN 1 THEN 'HTTPS://H' || (doc_id % 50)::VARCHAR || '.EXAMPLE.COM/p' || (doc_id % 200)::VARCHAR
            WHEN 2 THEN 'https://h' || (doc_id % 50)::VARCHAR || '.example.com:443/p' || (doc_id % 200)::VARCHAR
            WHEN 3 THEN 'https://h' || (doc_id % 50)::VARCHAR || '.example.com/p' || (doc_id % 200)::VARCHAR || '#sec2'
            WHEN 4 THEN 'https://h' || (doc_id % 50)::VARCHAR || '.example.com/p' || (doc_id % 200)::VARCHAR || '?utm_source=feed&q=' || (doc_id % 3)::VARCHAR
            WHEN 5 THEN 'https://h' || (doc_id % 50)::VARCHAR || '.example.com/./p' || (doc_id % 200)::VARCHAR
            WHEN 6 THEN 'https://h' || (doc_id % 50)::VARCHAR || '.example.com/p' || (doc_id % 200)::VARCHAR || '?utm_campaign=x&utm_medium=cpc'
            ELSE 'HTTPS://H' || (doc_id % 50)::VARCHAR || '.EXAMPLE.COM:443/./p' || (doc_id % 200)::VARCHAR || '?fbclid=abc#frag'
          END AS raw_url
        FROM documents),
      c1 AS (
        SELECT doc_id, regexp_replace(raw_url, '#.*$', '') AS nf FROM raw),
      c2 AS (
        SELECT doc_id,
               lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
               regexp_replace(nf, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
        FROM c1),
      c3 AS (
        SELECT doc_id, scheme, rest,
               regexp_extract(rest, '^([^/?]*)', 1) AS hostport,
               regexp_replace(rest, '^[^/?]*', '') AS pathq
        FROM c2),
      c4 AS (
        SELECT doc_id, scheme, pathq,
               lower(regexp_extract(hostport, '^([^:]*)', 1)) AS host,
               regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
               regexp_extract(pathq, '^([^?]*)', 1) AS path0,
               CASE WHEN contains(pathq, '?') THEN regexp_replace(pathq, '^[^?]*\?', '') ELSE '' END AS q0
        FROM c3),
      c5 AS (
        SELECT doc_id, scheme, host,
               CASE WHEN port = '' OR (scheme = 'https' AND port = '443')
                      OR (scheme = 'http' AND port = '80')
                    THEN '' ELSE ':' || port END AS portpart,
               replace(replace(CASE WHEN path0 = '' THEN '/' ELSE path0 END,
                 '/./', '/'), '/./', '/') AS pathr,
               coalesce(array_to_string(list_filter(string_split(q0, '&'),
                 x -> NOT regexp_matches(x, '^(utm_|fbclid|gclid)') AND x <> ''), '&'), '') AS qk
        FROM c4),
      canon AS (
        SELECT doc_id, host,
               scheme || '://' || host || portpart || pathr ||
                 CASE WHEN qk = '' THEN '' ELSE '?' || qk END AS curl
        FROM c5)"""

  private val urlCanonicalDedupQ: (String, QFn, Option[String]) = (
    "url_canonical_dedup",
    (s, d) => CorpusPipeline.urlCanonicalDedup(s, d),
    Some(s"""
      WITH $urlCanonCtes
      SELECT host, count(*)::BIGINT AS n_raw,
             count(DISTINCT curl)::BIGINT AS n_canonical,
             (count(*) - count(DISTINCT curl))::BIGINT AS n_dup,
             min(curl) AS sample_url
      FROM canon GROUP BY host ORDER BY host
    """.trim))

  /** The composed web pipeline: URL dedup → decontamination → temperature
    * mix, each stage the shared CTE chain of its single-op oracle; the
    * temperature rates are recomputed over the SURVIVOR set exactly as
    * the Spark composition does. */
  private val pipelineWebQ: (String, QFn, Option[String]) = (
    "pipeline_web",
    (s, d) => CorpusPipeline.pipelineWeb(s, d),
    Some(s"""
      WITH $urlCanonCtes,
      urlk AS (SELECT min(doc_id) AS doc_id FROM canon GROUP BY curl),
      $decontamCtes,
      surv AS (SELECT d.doc_id, d.lang
               FROM documents d
               JOIN urlk ON d.doc_id = urlk.doc_id
               JOIN t ON t.doc_id = d.doc_id
               LEFT JOIN pd ON pd.doc_id = d.doc_id
               WHERE t.bucket < 90 AND coalesce(pd.n_hits, 0) = 0),
      per AS (SELECT lang, count(*)::BIGINT AS n_l FROM surv GROUP BY lang),
      w AS (SELECT lang, n_l,
              CAST(floor(sqrt((n_l * 1000000)::DOUBLE)) AS BIGINT) AS w_l FROM per),
      tot AS (SELECT sum(n_l)::BIGINT AS n_total, sum(w_l)::BIGINT AS w_total FROM w),
      r AS (SELECT lang,
              least(1000000,
                (((n_total::HUGEINT // 2) * w_l * 1000000)
                 // (n_l::HUGEINT * w_total))::BIGINT) AS rate_micro
            FROM w, tot)
      SELECT s.doc_id, s.lang, r.rate_micro
      FROM surv s JOIN r USING (lang)
      WHERE ('0x' || substr(md5(s.doc_id::VARCHAR), 1, 15))::BIGINT::DOUBLE
              / 1152921504606846976.0 < rate_micro / 1000000.0
      ORDER BY s.doc_id
    """.trim))

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

  private val sampleHashQ: (String, QFn, Option[String]) = (
    "sample_hash",
    (s, d) => CorpusPipeline.sampleByHash(s, d),
    Some("""
      SELECT doc_id, lang, len(text)::BIGINT AS n_chars
      FROM documents WHERE md5(doc_id::VARCHAR) < '1a' ORDER BY doc_id
    """.trim))

  /** Composes the ALREADY-ORACLE-VERIFIED single-op SQL as CTE bodies —
    * the composed query cannot drift from its parts. */
  private val pipelineCleanQ: (String, QFn, Option[String]) = (
    "pipeline_clean",
    (s, d) => CorpusPipeline.cleanCorpus(s, d),
    Some(s"""
      WITH ts AS (${RegistryText.textStats._3.get}),
      li AS (${RegistryText.langId._3.get}),
      de AS (${RegistryDedup.dedupExact._3.get})
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

  /** Cluster-atomic split: the recursive-CTE CC labels (the dedup_survivors
    * oracle) feed the SAME 60-bit md5 bucket arithmetic as split_assign,
    * taken over the canonical id; both leak counts are computed, not
    * asserted. */
  private val splitLeakageSafeQ: (String, QFn, Option[String]) = (
    "split_leakage_safe",
    (s, d) => CorpusPipeline.splitLeakageSafe(s, d),
    Some(s"""
      WITH RECURSIVE
      s AS ($shingledCte),
      ${RegistryDedup.ngramPairsCtes(graft.operators.Dedup.DefaultMaxShingleDf)},
      e AS (SELECT id_a AS a, id_b AS b FROM pr WHERE jaccard >= 0.2
            UNION ALL
            SELECT id_b AS a, id_a AS b FROM pr WHERE jaccard >= 0.2),
      reach AS (
        SELECT doc_id AS id, doc_id AS r FROM documents
        UNION
        SELECT e.b AS id, reach.r FROM reach JOIN e ON e.a = reach.id),
      lab AS (SELECT id AS doc_id, min(r) AS canonical_id FROM reach GROUP BY id),
      a AS (SELECT doc_id, canonical_id,
              CASE WHEN ('0x' || substr(md5(canonical_id::VARCHAR), 1, 15))::BIGINT % 100 < 90 THEN 'train'
                   WHEN ('0x' || substr(md5(canonical_id::VARCHAR), 1, 15))::BIGINT % 100 < 95 THEN 'val'
                   ELSE 'test' END AS split,
              CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 90 THEN 'train'
                   WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 95 THEN 'val'
                   ELSE 'test' END AS naive_split
            FROM lab),
      lk AS (SELECT coalesce(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END), 0)::BIGINT AS n_leaky_clusters,
                    coalesce(sum(CASE WHEN nn > 1 THEN 1 ELSE 0 END), 0)::BIGINT AS n_leaky_naive
             FROM (SELECT canonical_id, count(DISTINCT split) AS ns,
                          count(DISTINCT naive_split) AS nn
                   FROM a GROUP BY canonical_id))
      SELECT split, count(*)::BIGINT AS n_docs,
             count(DISTINCT canonical_id)::BIGINT AS n_clusters,
             lk.n_leaky_clusters, lk.n_leaky_naive
      FROM a, lk GROUP BY split, lk.n_leaky_clusters, lk.n_leaky_naive
      ORDER BY split
    """.trim))

  /** File-compaction planning over the 256-file manifest: the oracle
    * replays the running byte sum and the integral start-offset rule, so
    * group spans, byte totals and fill ratios hash-match exactly. */
  private val shardCompactionQ: (String, QFn, Option[String]) = (
    "shard_compaction",
    (s, d) => CorpusPipeline.shardCompaction(s, d),
    Some("""
      WITH f AS (
        SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 256 AS file_id,
               sum(n_chars)::BIGINT AS bytes
        FROM documents GROUP BY file_id),
      c AS (SELECT file_id, bytes,
              sum(bytes) OVER (ORDER BY file_id)::BIGINT AS cum FROM f)
      SELECT ((cum - bytes) // 8000)::BIGINT AS grp, count(*)::BIGINT AS n_files,
             min(file_id) AS first_file, max(file_id) AS last_file,
             sum(bytes)::BIGINT AS bytes,
             round(sum(bytes)::DOUBLE / 8000, 4) AS fill
      FROM c GROUP BY grp ORDER BY grp
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

  private[graft] val docChunksCdcQ: (String, QFn, Option[String]) = (
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

  /** Token-budget planning: per-source exact token mass, mixture weight,
    * the proportional slice of a fixed 10M-token budget, and the implied
    * epoch multiplier. Integral divisions mirror Spark's decimal(38) div
    * (exact floor in both engines on positive values). */
  private val tokenBudgetQ: (String, QFn, Option[String]) = (
    "token_budget",
    (s, d) => CorpusPipeline.tokenBudget(s, d),
    Some("""
      WITH t AS (SELECT source,
                   len(list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> x <> ''))::BIGINT AS nt,
                   (CASE WHEN regexp_extract(source, '[0-9]+', 0) = '' THEN 0
                         ELSE right(regexp_extract(source, '[0-9]+', 0), 8)::INT % 4 END) AS idx
                 FROM documents),
      s AS (SELECT source, count(*)::BIGINT AS n_docs, sum(nt)::BIGINT AS n_tokens,
                   ([100000, 300000, 600000, 1000000]::BIGINT[])[min(idx) + 1] AS rate_u
            FROM t GROUP BY source),
      w AS (SELECT *, ((n_tokens::HUGEINT * rate_u) // 1000000)::BIGINT AS weighted_tokens
            FROM s),
      tot AS (SELECT sum(weighted_tokens)::HUGEINT AS tw FROM w)
      SELECT source, n_docs, n_tokens,
             round(rate_u / 1000000.0, 4) AS rate,
             weighted_tokens,
             ((10000000::HUGEINT * weighted_tokens) // tw)::BIGINT AS alloc_tokens,
             round(weighted_tokens::DOUBLE / tw::DOUBLE, 4) AS share,
             round((((10000000::HUGEINT * weighted_tokens) // tw)::BIGINT)::DOUBLE
                   / n_tokens, 4) AS epochs
      FROM w, tot ORDER BY source
    """.trim))


  /** The v2 derivation rules mirror [[CorpusPipeline.datasetDiff]] exactly:
    * drop %31, append " [rev2]" to %37, add +1e6-offset copies of %41. */
  private val datasetDiffQ: (String, QFn, Option[String]) = (
    "dataset_diff",
    (s, d) => CorpusPipeline.datasetDiff(s, d),
    Some("""
      WITH v1 AS (SELECT doc_id, text FROM documents),
      v2 AS (SELECT doc_id,
                    CASE WHEN doc_id % 37 = 0 THEN text || ' [rev2]' ELSE text END AS text
             FROM v1 WHERE doc_id % 31 <> 0
             UNION ALL
             SELECT doc_id + 1000000, text FROM v1 WHERE doc_id % 41 = 0),
      a AS (SELECT doc_id, md5(text) AS h1 FROM v1),
      b AS (SELECT doc_id, md5(text) AS h2 FROM v2),
      j AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
                   CASE WHEN b.h2 IS NULL THEN 'removed'
                        WHEN a.h1 IS NULL THEN 'added'
                        WHEN a.h1 <> b.h2 THEN 'changed' END AS status
            FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
      SELECT doc_id, status FROM j WHERE status IS NOT NULL ORDER BY doc_id
    """.trim))
}
