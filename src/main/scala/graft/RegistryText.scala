package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.RegistrySqlParts._

/** Text-analysis registered queries (stats, language id, BM25, BPE, CMS, perplexity, quality) with their DuckDB oracle SQL. Split from the monolithic PipelineRegistry; the
  * aggregate surface (and entry order) lives there. */
private[graft] object RegistryText {

  private[graft] def entries: Seq[(String, QFn, Option[String])] = Seq(
    textStats, langId, tokenCount, docFingerprint, vocabTopKQ, lengthPctQ, lengthMadQ, percentileGateQ, tfIdfQ, repetitionScoreQ, bigramTopKQ, lmPerplexityQ, oovRateQ, boilerplateQ, piiRedactQ, qualityDecilesQ, tokenEntropyQ, bm25RetrievalQ, bm25PrfQ, bpeMergesQ, bpeEncodeQ, cmsTopkQ, featureHashQ, classifierGateQ, langClassifierGateQ, hybridRetrievalQ, ragRetrievalQ, ragRerankQ, gopherRulesQ, nfcDedupQ, blocklistQ, bpeFertilityQ)

  /** C4 "bad words" blocklist: the oracle recomputes each doc's token
    * list and the md5-prefix membership rule, so hit counts and drop
    * verdicts hash-match row-for-row. */
  private val blocklistQ: (String, QFn, Option[String]) = (
    "blocklist_filter",
    (s, d) => TextAnalysis.blocklistFilter(s, d),
    Some("""
      WITH t AS (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
             FROM documents)
      SELECT doc_id, len(toks)::BIGINT AS n_tokens,
             len(list_filter(toks, x -> substr(md5(x), 1, 2) = '0e'))::BIGINT AS n_hits,
             (len(list_filter(toks, x -> substr(md5(x), 1, 2) = '0e')) > 0)::INT AS blocked
      FROM t ORDER BY doc_id
    """.trim))

  /** Unicode-NFC dedup: both engines implement the same Unicode
    * composition standard (JDK Normalizer / utf8proc), so the normalized
    * strings, lengths, change flags, and dup links all hash-match. The
    * fixture pairs (2k, 2k+1) as composed/decomposed spellings of one
    * logical string across three composition families. */
  private val nfcDedupQ: (String, QFn, Option[String]) = (
    "nfc_dedup",
    (s, d) => TextAnalysis.nfcDedup(s, d),
    Some("""
      WITH raw AS (SELECT doc_id,
             'caf' || CASE WHEN doc_id % 2 = 0 THEN
                 CASE (doc_id // 2) % 3 WHEN 0 THEN chr(233) WHEN 1 THEN chr(246) ELSE chr(44033) END
               ELSE
                 CASE (doc_id // 2) % 3 WHEN 0 THEN 'e' || chr(769) WHEN 1 THEN 'o' || chr(776)
                   ELSE chr(4352) || chr(4449) || chr(4520) END
               END || ' page ' || (doc_id // 2)::VARCHAR AS raw
           FROM documents),
      n AS (SELECT doc_id, raw, nfc_normalize(raw) AS nfc FROM raw),
      g AS (SELECT md5(nfc) AS h, min(doc_id) AS dup_of FROM n GROUP BY 1)
      SELECT n.doc_id, length(n.raw)::BIGINT AS raw_len, length(n.nfc)::BIGINT AS nfc_len,
             (n.raw <> n.nfc)::INT AS changed, g.dup_of
      FROM n JOIN g ON md5(n.nfc) = g.h ORDER BY n.doc_id
    """.trim))

  // ---- text analysis --------------------------------------------------------

  private[graft] val textStats: (String, QFn, Option[String]) = (
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

  /** Gopher rule battery — all comparisons cross-multiplied to integers so
    * every flag is bit-deterministic in both engines (no float ratios). */
  private[graft] val gopherRulesQ: (String, QFn, Option[String]) = (
    "gopher_rules",
    (s, d) => TextAnalysis.gopherRules(s, d),
    Some(s"""
      WITH t AS ($toksCte),
      l AS (SELECT doc_id, toks, string_split(text, chr(10)) AS lines FROM t),
      m AS (SELECT doc_id,
              len(toks)::BIGINT AS n,
              list_sum(list_transform(toks, x -> len(x)))::BIGINT AS sum_len,
              len(list_filter(toks, x -> contains(x, '#') OR contains(x, '...')))::BIGINT AS sym,
              len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::BIGINT AS alpha,
              len(lines)::BIGINT AS n_lines,
              len(list_filter(lines, x -> starts_with(x, '- ') OR starts_with(x, '* ')))::BIGINT AS bullets,
              len(list_filter(lines, x -> ends_with(x, '...')))::BIGINT AS ell,
              len(list_intersect(list_distinct(toks), $stopwordsList))::BIGINT AS stop_hits
            FROM l)
      SELECT doc_id, n AS n_tokens,
             (n >= 50 AND n <= 100000) AS wc_ok,
             (sum_len >= n * 3 AND sum_len <= n * 10) AS wlen_ok,
             (sym * 10 <= n) AS symbol_ok,
             (bullets * 10 <= n_lines * 9) AS bullet_ok,
             (ell * 10 <= n_lines * 3) AS ellipsis_ok,
             (alpha * 5 >= n * 4) AS alpha_ok,
             (stop_hits >= 2) AS stop_ok,
             ((n >= 50 AND n <= 100000) AND (sum_len >= n * 3 AND sum_len <= n * 10)
               AND (sym * 10 <= n) AND (bullets * 10 <= n_lines * 9)
               AND (ell * 10 <= n_lines * 3) AND (alpha * 5 >= n * 4)
               AND (stop_hits >= 2)) AS gopher_pass
      FROM m ORDER BY doc_id
    """.trim))

  private[graft] val langId: (String, QFn, Option[String]) = (
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

  /** Robust per-language length-outlier filter: median/MAD are exact
    * binary fractions (halves then quarters) from the interpolated
    * quantile_cont(0.5) both engines share, so the 3·MAD flags are
    * bit-deterministic with no rounding contract. */
  private val lengthMadQ: (String, QFn, Option[String]) = (
    "length_mad_outliers",
    (s, d) => TextAnalysis.lengthMadOutliers(s, d),
    Some("""
      WITH d AS (SELECT lang, n_chars FROM documents),
      med AS (SELECT lang, median(n_chars) AS m FROM d GROUP BY 1),
      dev AS (SELECT d.lang, abs(d.n_chars - med.m) AS dv, med.m AS m
              FROM d JOIN med USING (lang)),
      mad AS (SELECT lang, median(dv) AS md FROM dev GROUP BY 1)
      SELECT dev.lang,
             count(*)::BIGINT AS n_docs,
             any_value(dev.m)::DOUBLE AS med_chars,
             any_value(mad.md)::DOUBLE AS mad_chars,
             (count(*) FILTER (dev.dv > 3 * mad.md))::BIGINT AS n_outliers
      FROM dev JOIN mad USING (lang)
      GROUP BY 1 ORDER BY 1
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

  /** RM3-lite pseudo-relevance feedback: pass-1 CTEs are bm25_retrieval's
    * verbatim; expansion terms ride the exact decimal c×idf sum with
    * term-asc ties; pass 2 re-runs the identical scoring over the
    * unioned query set. */
  private val bm25PrfQ: (String, QFn, Option[String]) = (
    "bm25_prf",
    (s, d) => TextAnalysis.bm25Prf(s, d),
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
            FROM sc),
      fb AS (SELECT qid, doc_id FROM r WHERE rank <= 3),
      ti AS (SELECT term, ln((st.nd - df + 0.5) / (df + 0.5) + 1.0) AS tidf
             FROM dfs CROSS JOIN st),
      cd AS (SELECT fb.qid, tc.term,
                    sum(round(tc.c * ti.tidf, 6)::DECIMAL(18,6)) AS tw
             FROM fb JOIN tc USING (doc_id) JOIN ti USING (term)
             LEFT JOIN qt ON qt.qid = fb.qid AND qt.term = tc.term
             WHERE qt.term IS NULL
             GROUP BY fb.qid, tc.term),
      ex AS (SELECT qid, term FROM (
               SELECT qid, term, row_number() OVER (PARTITION BY qid
                 ORDER BY tw DESC, term ASC) AS rk FROM cd) WHERE rk <= 5),
      qt2 AS (SELECT qid, term FROM qt UNION ALL SELECT qid, term FROM ex),
      qi2 AS (SELECT qt2.qid, qt2.term,
                     ln((st.nd - coalesce(dfs.df, 0) + 0.5) /
                        (coalesce(dfs.df, 0) + 0.5) + 1.0) AS idf,
                     st.avgdl
              FROM qt2 LEFT JOIN dfs USING (term) CROSS JOIN st),
      co2 AS (SELECT qi2.qid, tc.doc_id,
                     round(qi2.idf * (tc.c * (1.2 + 1.0)) /
                           (tc.c + 1.2 * (1.0 - 0.75 + 0.75 *
                             (dl.n::DOUBLE / qi2.avgdl))), 6)::DECIMAL(18,6) AS contrib
              FROM tc JOIN qi2 USING (term) JOIN dl USING (doc_id)),
      sc2 AS (SELECT qid, doc_id, round(sum(contrib), 4) AS s4 FROM co2 GROUP BY qid, doc_id),
      r2 AS (SELECT qid, doc_id, s4,
                    row_number() OVER (PARTITION BY qid ORDER BY s4 DESC, doc_id ASC) AS rank
             FROM sc2)
      SELECT qid::BIGINT AS qid, rank, doc_id, s4::DOUBLE AS score
      FROM r2 WHERE rank <= 5 ORDER BY qid, rank
    """.trim))

  /** Hybrid BM25 + cosine retrieval fused by reciprocal ranks; both legs
    * reuse their parent queries' determinism contracts (rounded-decimal
    * BM25 sums, raw-double cosine ranks). */
  /** Hybrid fusion CTE chain ending in `r(qid, doc_id, lex_rank, vec_rank,
    * rrf, rank)` — shared by hybrid_retrieval and the composed
    * rag_retrieval so the fusion arithmetic cannot drift between them. */
  private val hybridCtes: String = s"""t AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term FROM documents),
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
      fused AS (SELECT coalesce(lex.qid, vec.qid) AS qid,
                       coalesce(lex.doc_id, vec.doc_id) AS doc_id,
                       coalesce(lex.lrank, -1)::BIGINT AS lex_rank,
                       coalesce(vec.vrank, -1)::BIGINT AS vec_rank,
                       coalesce(round(1.0::DOUBLE / (60 + lex.lrank), 6), 0.0) +
                       coalesce(round(1.0::DOUBLE / (60 + vec.vrank), 6), 0.0) AS rrf
                FROM lex FULL OUTER JOIN vec
                  ON lex.qid = vec.qid AND lex.doc_id = vec.doc_id),
      r AS (SELECT qid, doc_id, lex_rank, vec_rank, rrf,
                   row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id ASC) AS rank
            FROM fused)"""

  private val hybridRetrievalQ: (String, QFn, Option[String]) = (
    "hybrid_retrieval",
    (s, d) => TextAnalysis.hybridRetrieval(s, d),
    Some(s"""
      WITH $hybridCtes
      SELECT qid, rank::BIGINT AS rank, doc_id, round(rrf, 6) AS rrf, lex_rank, vec_rank
      FROM r WHERE rank <= 10 ORDER BY qid, rank
    """.trim))

  /** Composed RAG retrieval: hybrid top-10 → per-query min-max
    * normalization of the fused score → the shared MMR greedy chain. */
  private val ragRetrievalQ: (String, QFn, Option[String]) = (
    "rag_retrieval",
    (s, d) => TextAnalysis.ragRetrieval(s, d),
    Some(s"""
      WITH $hybridCtes,
      hyb AS (SELECT qid, doc_id, round(rrf, 6) AS rrf FROM r WHERE rank <= 10),
      bounds AS (SELECT qid, min(rrf) AS mn, max(rrf) AS mx FROM hyb GROUP BY qid),
      cand AS (SELECT hyb.qid AS query_id, hyb.doc_id AS id,
                      CASE WHEN b.mx > b.mn THEN (hyb.rrf - b.mn) / (b.mx - b.mn)
                           ELSE 0.0 END AS rel,
                      e.embedding AS vec
               FROM hyb JOIN bounds b USING (qid) JOIN e ON e.vec_id = hyb.doc_id),
      cs AS (SELECT a.query_id, a.id AS ia, b.id AS ib,
                    ${dotSql("a.vec", "b.vec")} /
                      (sqrt(${dotSql("a.vec", "a.vec")}) * sqrt(${dotSql("b.vec", "b.vec")})) AS sim
             FROM cand a JOIN cand b ON a.query_id = b.query_id AND a.id <> b.id),
      ${mmrChainSql()}
      ${mmrEmitSql()}
      ORDER BY query_id, mmr_rank
    """.trim))

  /** Cross-encoder-shaped final rerank of the composed RAG context set:
    * the MMR picks (replayed through the same unrolled greedy chain) are
    * re-scored by the MaxSim pairwise arithmetic and re-ranked. The
    * oracle composes rag_retrieval's full CTE stack plus the shared
    * 16-sub-dot MaxSim expression ([[RegistrySqlParts.maxSimSql]]). */
  private val ragRerankQ: (String, QFn, Option[String]) = (
    "rag_rerank",
    (s, d) => TextAnalysis.ragRerank(s, d),
    Some(s"""
      WITH $hybridCtes,
      hyb AS (SELECT qid, doc_id, round(rrf, 6) AS rrf FROM r WHERE rank <= 10),
      bounds AS (SELECT qid, min(rrf) AS mn, max(rrf) AS mx FROM hyb GROUP BY qid),
      cand AS (SELECT hyb.qid AS query_id, hyb.doc_id AS id,
                      CASE WHEN b.mx > b.mn THEN (hyb.rrf - b.mn) / (b.mx - b.mn)
                           ELSE 0.0 END AS rel,
                      e.embedding AS vec
               FROM hyb JOIN bounds b USING (qid) JOIN e ON e.vec_id = hyb.doc_id),
      cs AS (SELECT a.query_id, a.id AS ia, b.id AS ib,
                    ${dotSql("a.vec", "b.vec")} /
                      (sqrt(${dotSql("a.vec", "a.vec")}) * sqrt(${dotSql("b.vec", "b.vec")})) AS sim
             FROM cand a JOIN cand b ON a.query_id = b.query_id AND a.id <> b.id),
      ${mmrChainSql()},
      picks AS (${(1 to 5).map(t =>
        s"SELECT query_id, CAST($t AS BIGINT) AS mmr_rank, id FROM s$t")
        .mkString("\n        UNION ALL ")}),
      ce AS (SELECT p.query_id, p.mmr_rank, p.id,
                    ${maxSimSql("qe.embedding", "de.embedding")} AS ces
             FROM picks p
             JOIN e qe ON qe.vec_id = p.query_id
             JOIN e de ON de.vec_id = p.id),
      rr AS (SELECT query_id, mmr_rank, id, ces,
                    row_number() OVER (PARTITION BY query_id ORDER BY ces DESC, id ASC) AS ce_rank
             FROM ce)
      SELECT query_id, ce_rank::BIGINT AS ce_rank, id, round(ces, 4) AS ce_score, mmr_rank
      FROM rr ORDER BY query_id, ce_rank
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

  /** Per-language tokenizer fertility: the oracle replays the FULL BPE
    * training chain (the bpe_encode CTEs verbatim) and then the
    * lang-keyed rollup, so fertility and chars-per-token hash-match. */
  private val bpeFertilityQ: (String, QFn, Option[String]) = (
    "bpe_fertility",
    (s, d) => TextAnalysis.bpeFertility(s, d),
    Some(bpeOracleSql(5, """dw AS (SELECT lang, w
            FROM (SELECT lang, unnest(string_split_regex(lower(text), '\s+')) AS w
                  FROM documents)
            WHERE w != ''),
      f AS (SELECT lang, count(*)::BIGINT AS n_words,
                   sum(len(string_split(trim(s5.s), ' ')))::BIGINT AS n_bpe_tokens,
                   sum(len(dw.w))::BIGINT AS n_chars
            FROM dw JOIN s5 ON dw.w = s5.w GROUP BY lang)
      SELECT lang, n_words, n_bpe_tokens,
             round(n_bpe_tokens::DOUBLE / n_words, 4) AS fertility,
             round(n_chars::DOUBLE / n_bpe_tokens, 4) AS chars_per_token
      FROM f ORDER BY lang""", finalIsCte = true)))

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

  /** Hashing-trick doc vectors: bucket 0 of the shared CMS family, so the
    * oracle rebuilds the identical feature space with no dictionary. */
  /** Trained-model gate: the oracle recomputes the SQL-derivable facts
    * (split sizes from the md5 id-hash, positive-label counts from the
    * same quality arithmetic as text_stats) and freezes the learning
    * claims — holdout-accuracy floors and beats-the-majority-class — as
    * TRUE literals the Spark side must earn. */
  private val classifierGateQ: (String, QFn, Option[String]) = (
    "quality_classifier_gate",
    (s, d) => graft.operators.DocClassifier.classifierGate(s, d),
    Some(s"""
      WITH ts AS (${textStats._3.get}),
      lab AS (SELECT ts.doc_id,
                CASE WHEN CAST(CAST(quality_score AS DECIMAL(9,4))*10000 AS BIGINT) >= 4000
                     THEN 1 ELSE 0 END AS y,
                ('0x' || substr(md5(ts.doc_id::VARCHAR), 1, 15))::BIGINT % 100 AS b
              FROM ts JOIN documents d ON ts.doc_id = d.doc_id
              WHERE len(list_filter(string_split_regex(lower(d.text), '\\s+'),
                                    x -> x <> '')) > 0)
      SELECT count(*) FILTER (b < 90)::BIGINT AS n_train,
             count(*) FILTER (b >= 90)::BIGINT AS n_test,
             sum(y) FILTER (b < 90)::BIGINT AS n_pos_train,
             sum(y) FILTER (b >= 90)::BIGINT AS n_pos_test,
             TRUE AS acc_train_ok, TRUE AS acc_test_ok, TRUE AS beats_majority
      FROM lab
    """.trim))

  /** Trained MULTI-LANGUAGE identification gate — one-vs-rest hashed
    * char-bigram linear models on the shared fixed-point GD core, trained
    * on the deterministic planted seed corpus (the testdata's own lang
    * column is unlearnable by construction: all languages share one
    * vocabulary). Oracle recomputes the split sizes from the identical
    * md5 id-hash over the literal seed size; the accuracy floors and the
    * beats-majority (1/5) check are TRUE literals the training must
    * earn. */
  private val langClassifierGateQ: (String, QFn, Option[String]) = (
    "lang_classifier_gate",
    (s, _) => graft.operators.LangClassifier.gate(s),
    Some("""
      SELECT count(*) FILTER (b < 90)::BIGINT AS n_train,
             count(*) FILTER (b >= 90)::BIGINT AS n_test,
             5::BIGINT AS n_langs,
             TRUE AS acc_train_ok, TRUE AS acc_test_ok, TRUE AS beats_majority
      FROM (SELECT ('0x' || substr(md5(range::VARCHAR), 1, 15))::BIGINT % 100 AS b
            FROM range(2000))
    """.trim))

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

}
