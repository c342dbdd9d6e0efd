package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.RegistrySqlParts._

/** Multimodal registered queries (container parsers, pixel/PCM decode, perceptual hashes + near-dup) with their DuckDB oracle SQL. Split from the monolithic PipelineRegistry; the
  * aggregate surface (and entry order) lives there. */
private[graft] object RegistryMultimodal {

  private[graft] def entries: Seq[(String, QFn, Option[String])] = Seq(
    mmGzipQ, mmJoin, mmBinaryStats, mmMediaFeatures, mmThumbnailQ, mmFrameSampleQ, mmAudioSampleQ, mmImageDecodeQ, mmAudioDecodeQ, mmImageAhashQ, imagePhashQ, imagePhashNearDupQ, mmAudioFingerprintQ, mmImageNearDupQ, mmAudioNearDupQ, mmAudioNearDupGateQ, mmVideoNearDupQ, mmVideoNearDupGateQ, mmNearDupIncrementalQ, mmNearDupSurvivorsQ, mmNearDupClusterStatsQ, mmSoftWeightsQ)

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

  /** The ONE image-signature CTE chain (aliases kk/g/t/h → h(doc_id,
    * ahash)), shared by every oracle that recomputes the perceptual
    * aHash. 2-D mirror of the Spark synthesis: bytes reshaped to an 8-row
    * w×8 image (w = len÷3÷8), thumb pixel p = (row p÷8, col p mod 8)
    * samples source pixel (p÷8)·w + (p mod 8)·w÷8 — all 64 bits carry
    * signal (the k×1 form collapsed to ~8 effective bits and made the
    * Hamming ball output-quadratic). */
  private def imgSigCtes(sigName: String, pre: String = ""): String = s"""
      ${pre}kk AS (SELECT doc_id, text, (len(text)//3)//8 AS w FROM documents
             WHERE len(text) >= 24 AND len(text) = octet_length(encode(text))
               AND (len(text)//3)//8 <= 1048576),
      ${pre}g AS (SELECT doc_id, p,
                   ord(substr(text, CAST(3 * ((p // 8) * w + (p % 8) * w // 8) + 1 AS INT), 1)) +
                   ord(substr(text, CAST(3 * ((p // 8) * w + (p % 8) * w // 8) + 2 AS INT), 1)) +
                   ord(substr(text, CAST(3 * ((p // 8) * w + (p % 8) * w // 8) + 3 AS INT), 1)) AS gv
            FROM (SELECT doc_id, w, text, unnest(range(0, 64)) AS p FROM ${pre}kk)),
      ${pre}t AS (SELECT doc_id, sum(gv) AS total FROM ${pre}g GROUP BY doc_id),
      ${pre}h AS (SELECT doc_id,
                   string_agg(CASE WHEN gv * 64 >= total THEN '1' ELSE '0' END,
                              '' ORDER BY p) AS $sigName
            FROM ${pre}g JOIN ${pre}t USING (doc_id) GROUP BY doc_id)"""

  /** The ONE video-signature CTE chain (aliases vvk/vfr/vg/vt/vh/vsg →
    * vsg(doc_id, sig)): 4 temporal byte slices, each reshaped to an 8-ROW
    * w×8 frame (the imgSigCtes rationale, per frame) and aHashed; the
    * 256-bit signature is the frame-hash concatenation. */
  private def vidSigCtes(sigName: String): String = s"""
      vvk AS (SELECT doc_id, text, len(text) AS L FROM documents
              WHERE len(text) >= 96 AND len(text) = octet_length(encode(text))
                AND len(text)//3 <= 1048576),
      vfr AS (SELECT doc_id, text, fx, fx*L//4 AS lo,
                     (((fx+1)*L//4 - fx*L//4)//3)//8 AS w
              FROM (SELECT doc_id, text, L, unnest(range(0, 4)) AS fx FROM vvk)),
      vg AS (SELECT doc_id, fx, p,
                   ord(substr(text, CAST(lo + 3 * ((p // 8) * w + (p % 8) * w // 8) + 1 AS INT), 1)) +
                   ord(substr(text, CAST(lo + 3 * ((p // 8) * w + (p % 8) * w // 8) + 2 AS INT), 1)) +
                   ord(substr(text, CAST(lo + 3 * ((p // 8) * w + (p % 8) * w // 8) + 3 AS INT), 1)) AS gv
            FROM (SELECT doc_id, fx, lo, w, text, unnest(range(0, 64)) AS p FROM vfr)),
      vt AS (SELECT doc_id, fx, sum(gv) AS total FROM vg GROUP BY doc_id, fx),
      vh AS (SELECT vg.doc_id, vg.fx,
                   string_agg(CASE WHEN gv * 64 >= total THEN '1' ELSE '0' END,
                              '' ORDER BY p) AS fsig
             FROM vg JOIN vt USING (doc_id, fx) GROUP BY vg.doc_id, vg.fx),
      vsg AS (SELECT doc_id, string_agg(fsig, '' ORDER BY fx) AS $sigName
              FROM vh GROUP BY doc_id)"""

  private val mmImageAhashQ: (String, QFn, Option[String]) = (
    "mm_image_ahash",
    (s, d) => Multimodal.imageAhash(s, d),
    Some(s"""
      WITH ${imgSigCtes("ahash")},
      c AS (SELECT ahash, count(*) AS n_same FROM h GROUP BY ahash)
      SELECT h.doc_id, h.ahash, c.n_same::BIGINT AS n_same_hash,
             c.n_same > 1 AS is_dup
      FROM h JOIN c USING (ahash) ORDER BY doc_id
    """.trim))

  /** pHash: the same 8×8 grid CTEs, then an exact-integer 2D DCT through
    * the SHARED fixed-point cosine table (emitted verbatim as a VALUES
    * literal — both engines use identical integers regardless of libm),
    * 63 AC coefficients thresholded at their rank-32 value. */
  /** pHash CTE chain ending in `ph(doc_id, phash)` — shared by the
    * signature query and its Hamming-ball near-dup twin. */
  private val phashCtes: String = {
    val ctab = (for (u <- 0 until 8; x <- 0 until 8)
      yield s"($u, $x, ${Multimodal.DctTable(u)(x)})").mkString(", ")
    s"""${imgSigCtes("ahash")},
      ctab(u, x, c) AS (VALUES $ctab),
      f AS (SELECT g.doc_id, cx.u AS u, cy.u AS v,
                   sum(g.gv::BIGINT * cx.c::BIGINT * cy.c::BIGINT) AS coef
            FROM g JOIN ctab cx ON cx.x = g.p % 8
                   JOIN ctab cy ON cy.x = g.p // 8
            GROUP BY g.doc_id, cx.u, cy.u),
      med AS (SELECT doc_id, coef AS m FROM (
                SELECT doc_id, coef, row_number() OVER (PARTITION BY doc_id
                  ORDER BY coef) AS rn
                FROM f WHERE NOT (u = 0 AND v = 0)) WHERE rn = 32),
      ph AS (SELECT f.doc_id,
                    string_agg(CASE WHEN coef > m THEN '1' ELSE '0' END,
                               '' ORDER BY u * 8 + v) AS phash
             FROM f JOIN med USING (doc_id)
             WHERE NOT (u = 0 AND v = 0) GROUP BY f.doc_id)"""
  }

  private val imagePhashQ: (String, QFn, Option[String]) = (
    "mm_image_phash",
    (s, d) => Multimodal.imagePhash(s, d),
    Some(s"""
      WITH $phashCtes,
      cnt AS (SELECT phash, count(*) AS n FROM ph GROUP BY phash)
      SELECT ph.doc_id, ph.phash, cnt.n::BIGINT AS n_same_hash, cnt.n > 1 AS is_dup
      FROM ph JOIN cnt USING (phash) ORDER BY doc_id
    """.trim))

  /** Hamming-ball near-dups over the 63-bit pHash through the SAME
    * pigeonhole chunk join as the aHash family (chunks 15/15/15/18);
    * brute-force pairwise Hamming as the completeness oracle. */
  private val imagePhashNearDupQ: (String, QFn, Option[String]) = (
    "mm_phash_neardup",
    (s, d) => Multimodal.phashNearDup(s, d),
    Some(s"""
      WITH $phashCtes,
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   list_sum(list_transform(range(1, CAST(len(a.phash)+1 AS BIGINT)),
                     i -> CASE WHEN substr(a.phash, i::INT, 1) <> substr(b.phash, i::INT, 1)
                          THEN 1 ELSE 0 END))::BIGINT AS hamming
            FROM ph a JOIN ph b ON a.doc_id < b.doc_id)
      SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3 ORDER BY id_a, id_b
    """.trim))

  /** Audio envelope fingerprint from the same u16 sample formula as
    * mm_audio_sample: 64 windows (sample i → window i*64//m), bit j =
    * window-j mean at or above the global mean (integer cross-multiply),
    * empty windows '0' — the afpOfWav formula recomputed from text. */
  private val afpCte = """
      d AS (SELECT doc_id, text, len(text)//2 AS m FROM documents
                 WHERE len(text) >= 2 AND len(text) = octet_length(encode(text))),
      v AS (SELECT doc_id, m, (i * 64) // m AS w,
                   ord(substr(text, CAST(2*i+1 AS INT), 1)) +
                   256*ord(substr(text, CAST(2*i+2 AS INT), 1)) AS s
            FROM d, unnest(range(0, m)) r(i)),
      t AS (SELECT doc_id, any_value(m) AS m, sum(s) AS total
            FROM v GROUP BY doc_id),
      ws AS (SELECT doc_id, w, sum(s) AS wsum, count(*) AS wc
             FROM v GROUP BY doc_id, w),
      h AS (SELECT g.doc_id,
                   string_agg(CASE WHEN ws.wsum * g.m >= g.total * ws.wc
                              THEN '1' ELSE '0' END, '' ORDER BY g.j) AS afp
            FROM (SELECT doc_id, m, total, unnest(range(0, 64)) AS j FROM t) g
            LEFT JOIN ws ON ws.doc_id = g.doc_id AND ws.w = g.j
            GROUP BY g.doc_id)"""

  private val mmAudioFingerprintQ: (String, QFn, Option[String]) = (
    "mm_audio_fingerprint",
    (s, d) => Multimodal.audioFingerprint(s, d),
    Some(s"""
      WITH $afpCte,
      c AS (SELECT afp, count(*) AS n_same FROM h GROUP BY afp)
      SELECT h.doc_id, h.afp, c.n_same::BIGINT AS n_same_hash,
             c.n_same > 1 AS is_dup
      FROM h JOIN c USING (afp) ORDER BY doc_id
    """.trim))

  /** Hamming-ball near-dup pairs over the aHash signatures: Spark finds
    * candidates via the pigeonhole quarter-chunk join; the oracle verifies
    * by BRUTE-FORCE pairwise Hamming over the same recomputed signatures
    * — a completeness check, not just a hash check (a missed candidate
    * class shows up as missing oracle rows). */
  /** Incremental media near-dup (the production daily-batch shape): per
    * batch doc the NEAREST corpus signature within Hamming <= 3, ties to
    * the lowest corpus id — the oracle replays it brute-force over the
    * recomputed aHashes. */
  private val mmNearDupIncrementalQ: (String, QFn, Option[String]) = (
    "mm_neardup_incremental",
    (s, d) => Multimodal.imageNearDupIncremental(s, d),
    Some(s"""
      WITH ${imgSigCtes("ahash")},
      cm AS (SELECT ahash, min(doc_id) AS cid FROM h WHERE doc_id < 400 GROUP BY ahash),
      b AS (SELECT doc_id, ahash FROM h WHERE doc_id >= 400),
      p AS (SELECT b.doc_id, cm.cid,
                   list_sum(list_transform(range(1, CAST(len(b.ahash)+1 AS BIGINT)),
                     i -> CASE WHEN substr(b.ahash, i::INT, 1) <> substr(cm.ahash, i::INT, 1)
                          THEN 1 ELSE 0 END))::BIGINT AS hm
            FROM b JOIN cm ON len(b.ahash) = len(cm.ahash)),
      q AS (SELECT doc_id, cid, hm FROM p WHERE hm <= 3),
      best AS (SELECT doc_id, min(hm) AS mh FROM q GROUP BY doc_id),
      pick AS (SELECT q.doc_id, q.hm, min(q.cid) AS cid
               FROM q JOIN best ON q.doc_id = best.doc_id AND q.hm = best.mh
               GROUP BY q.doc_id, q.hm)
      SELECT b.doc_id, b.ahash,
             coalesce(pick.cid, -1)::BIGINT AS dup_of,
             coalesce(pick.hm, -1)::BIGINT AS hamming,
             pick.cid IS NOT NULL AS is_dup
      FROM b LEFT JOIN pick USING (doc_id) ORDER BY doc_id
    """.trim))

  private val mmImageNearDupQ: (String, QFn, Option[String]) = (
    "mm_image_neardup",
    (s, d) => Multimodal.imageNearDup(s, d),
    Some(s"""
      WITH ${imgSigCtes("ahash")},
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   list_sum(list_transform(range(1, CAST(len(a.ahash)+1 AS BIGINT)),
                     i -> CASE WHEN substr(a.ahash, i::INT, 1) <> substr(b.ahash, i::INT, 1)
                          THEN 1 ELSE 0 END))::BIGINT AS hamming
            FROM h a JOIN h b ON a.doc_id < b.doc_id AND len(a.ahash) = len(b.ahash))
      SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3 ORDER BY id_a, id_b
    """.trim))

  /** The video member: 4-frame temporal slices, per-frame closed-form
    * aHash (the image CTE with slice-local offsets), 256-bit concatenated
    * signatures, brute-force pairwise Hamming — the completeness oracle
    * for the pigeonhole chunk join at 4x the signature width. */
  private val mmVideoNearDupQ: (String, QFn, Option[String]) = (
    "mm_video_neardup",
    (s, d) => Multimodal.videoNearDup(s, d),
    Some(s"""
      WITH ${vidSigCtes("vsig")},
      sig AS (SELECT doc_id, vsig FROM vsg),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   list_sum(list_transform(range(1, CAST(len(a.vsig)+1 AS BIGINT)),
                     i -> CASE WHEN substr(a.vsig, i::INT, 1) <> substr(b.vsig, i::INT, 1)
                          THEN 1 ELSE 0 END))::BIGINT AS hamming
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND len(a.vsig) = len(b.vsig))
      SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3 ORDER BY id_a, id_b
    """.trim))

  /** The audio twin: brute-force pairwise Hamming over the recomputed
    * 64-bit envelope fingerprints — a completeness check on the
    * pigeonhole candidate join, like the image form. */
  private val mmAudioNearDupQ: (String, QFn, Option[String]) = (
    "mm_audio_neardup",
    (s, d) => Multimodal.audioNearDup(s, d),
    Some(s"""
      WITH $afpCte,
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   list_sum(list_transform(range(1, CAST(len(a.afp)+1 AS BIGINT)),
                     i -> CASE WHEN substr(a.afp, i::INT, 1) <> substr(b.afp, i::INT, 1)
                          THEN 1 ELSE 0 END))::BIGINT AS hamming
            FROM h a JOIN h b ON a.doc_id < b.doc_id AND len(a.afp) = len(b.afp))
      SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3 ORDER BY id_a, id_b
    """.trim))

  /** Planted-mutation gates: the corpus plants no audio/video
    * near-duplicates at driver scale, so the pair queries above pass
    * vacuously (0 rows on both sides). These derive mutated copies of real
    * corpus media in-query, re-run the PRODUCTION pigeonhole pair join
    * over corpus ∪ planted, and assert recovery of every planted pair at
    * its measured Hamming — the flags are fixture+theorem invariants, and
    * n_candidates is the oracle-recomputable eligibility count. */
  private val mmAudioNearDupGateQ: (String, QFn, Option[String]) = (
    "mm_audio_neardup_gate",
    (s, d) => Multimodal.audioNearDupGate(s, d),
    Some("""
      SELECT count(*)::BIGINT AS n_candidates, TRUE AS exact_pairs_ok,
             TRUE AS near_pairs_ok, TRUE AS near_nonvacuous
      FROM (SELECT doc_id FROM documents
            WHERE len(text) >= 2 AND octet_length(encode(text)) = len(text)
            ORDER BY doc_id LIMIT 8)
    """.trim))

  private val mmVideoNearDupGateQ: (String, QFn, Option[String]) = (
    "mm_video_neardup_gate",
    (s, d) => Multimodal.videoNearDupGate(s, d),
    Some("""
      SELECT count(*)::BIGINT AS n_candidates, TRUE AS exact_pairs_ok,
             TRUE AS near_pairs_ok, TRUE AS near_nonvacuous
      FROM (SELECT doc_id FROM documents
            WHERE len(text) >= 96 AND octet_length(encode(text)) = len(text)
                  AND len(text) // 3 <= 1048576
            ORDER BY doc_id LIMIT 8)
    """.trim))

  /** Both modalities' brute-force pair sets (image aHash + audio envelope
    * fingerprint, Hamming <= 3 each) fed through the SAME recursive-CTE
    * min-label reachability as dedup_survivors — the oracle for the
    * shared-CC media survivor pass. */
  private val mediaCcCtes = s"""
      ${imgSigCtes("sig", "i")},
      ad AS (SELECT doc_id, text, len(text)//2 AS m FROM documents
             WHERE len(text) >= 2 AND len(text) = octet_length(encode(text))),
      av AS (SELECT doc_id, m, (i * 64) // m AS w,
                   ord(substr(text, CAST(2*i+1 AS INT), 1)) +
                   256*ord(substr(text, CAST(2*i+2 AS INT), 1)) AS s
            FROM ad, unnest(range(0, m)) r(i)),
      att AS (SELECT doc_id, any_value(m) AS m, sum(s) AS total
              FROM av GROUP BY doc_id),
      aws AS (SELECT doc_id, w, sum(s) AS wsum, count(*) AS wc
              FROM av GROUP BY doc_id, w),
      ah AS (SELECT g.doc_id,
                   string_agg(CASE WHEN aws.wsum * g.m >= g.total * aws.wc
                              THEN '1' ELSE '0' END, '' ORDER BY g.j) AS sig
             FROM (SELECT doc_id, m, total, unnest(range(0, 64)) AS j FROM att) g
             LEFT JOIN aws ON aws.doc_id = g.doc_id AND aws.w = g.j
             GROUP BY g.doc_id),
      ip AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
             FROM ih a JOIN ih b ON a.doc_id < b.doc_id AND len(a.sig) = len(b.sig)
             WHERE list_sum(list_transform(range(1, CAST(len(a.sig)+1 AS BIGINT)),
                     i -> CASE WHEN substr(a.sig, i::INT, 1) <> substr(b.sig, i::INT, 1)
                          THEN 1 ELSE 0 END)) <= 3),
      ap AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
             FROM ah a JOIN ah b ON a.doc_id < b.doc_id AND len(a.sig) = len(b.sig)
             WHERE list_sum(list_transform(range(1, CAST(len(a.sig)+1 AS BIGINT)),
                     i -> CASE WHEN substr(a.sig, i::INT, 1) <> substr(b.sig, i::INT, 1)
                          THEN 1 ELSE 0 END)) <= 3),
      ${vidSigCtes("sig")},
      vp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
             FROM vsg a JOIN vsg b ON a.doc_id < b.doc_id AND len(a.sig) = len(b.sig)
             WHERE list_sum(list_transform(range(1, CAST(len(a.sig)+1 AS BIGINT)),
                     i -> CASE WHEN substr(a.sig, i::INT, 1) <> substr(b.sig, i::INT, 1)
                          THEN 1 ELSE 0 END)) <= 3),
      e AS (SELECT id_a AS a, id_b AS b FROM ip
            UNION ALL SELECT id_b AS a, id_a AS b FROM ip
            UNION ALL SELECT id_a AS a, id_b AS b FROM ap
            UNION ALL SELECT id_b AS a, id_a AS b FROM ap
            UNION ALL SELECT id_a AS a, id_b AS b FROM vp
            UNION ALL SELECT id_b AS a, id_a AS b FROM vp),
      reach AS (
        SELECT doc_id AS id, doc_id AS r FROM documents
        UNION
        SELECT e.b AS id, reach.r FROM reach JOIN e ON e.a = reach.id),
      lab AS (SELECT id AS doc_id, min(r) AS canonical_id FROM reach GROUP BY id)"""

  private val mmNearDupSurvivorsQ: (String, QFn, Option[String]) = (
    "mm_neardup_survivors",
    (s, d) => Multimodal.mediaNearDupSurvivors(s, d),
    Some(s"""
      WITH RECURSIVE
      $mediaCcCtes
      SELECT doc_id, canonical_id,
             CASE WHEN doc_id = canonical_id THEN 1 ELSE 0 END AS is_survivor
      FROM lab ORDER BY doc_id
    """.trim))

  private val mmNearDupClusterStatsQ: (String, QFn, Option[String]) = (
    "mm_neardup_cluster_stats",
    (s, d) => Multimodal.mediaNearDupClusterStats(s, d),
    Some(s"""
      WITH RECURSIVE
      $mediaCcCtes,
      cs AS (SELECT canonical_id, count(*) AS cluster_size FROM lab GROUP BY canonical_id)
      SELECT cluster_size, count(*)::BIGINT AS n_clusters
      FROM cs GROUP BY cluster_size ORDER BY cluster_size
    """.trim))

  /** Media soft dedup: weight 1/cluster_size off the same cross-modal CC
    * labels — dedup_soft_weights' oracle shape over the media CTEs. */
  private val mmSoftWeightsQ: (String, QFn, Option[String]) = (
    "mm_soft_weights",
    (s, d) => Multimodal.mediaSoftWeights(s, d),
    Some(s"""
      WITH RECURSIVE
      $mediaCcCtes,
      cs AS (SELECT canonical_id, count(*) AS cluster_size FROM lab GROUP BY canonical_id)
      SELECT lab.doc_id, lab.canonical_id, cs.cluster_size::BIGINT AS cluster_size,
             round(1.0::DOUBLE / cs.cluster_size, 4) AS weight
      FROM lab JOIN cs USING (canonical_id) ORDER BY lab.doc_id
    """.trim))

}
