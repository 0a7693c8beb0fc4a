package graft
package oracles

/** DuckDB oracle SQL — multimodal columns and custom operators.
  *
  * Split from SparkEntry.oracleSql (round 12): entry text is verbatim;
  * SparkEntry remains the single-source registry and concatenates the
  * family maps. RegistrationGateSpec enforces key-set equality with
  * `queries`, and the split was verified by a byte-identical
  * oracle_sql.json dump before/after. */
private[graft] object OracleMultiOps {
  import graft.SparkEntryOracleUtil._
  private val AsofOracleSql: String =
    """WITH c AS (SELECT event_id click_id, user_id, epoch_us(ts) cts
      |           FROM events WHERE event_type = 'click'),
      |v AS (SELECT event_id vid, user_id, epoch_us(ts) vts
      |      FROM events WHERE event_type = 'view'),
      |j AS (SELECT c.click_id, c.user_id, c.cts, v.vid, v.vts,
      |      row_number() OVER (PARTITION BY c.click_id
      |                         ORDER BY v.vts DESC NULLS LAST, v.vid DESC) rn
      |      FROM c LEFT JOIN v ON c.user_id = v.user_id AND v.vts <= c.cts)
      |SELECT click_id, user_id, cts AS click_ts, vid AS view_id,
      |  vts AS view_ts, cts - vts AS gap_us
      |FROM j WHERE rn = 1
      |ORDER BY click_id""".stripMargin

  /** Shared q23-pipeline CTE prefix (shingles → 16 minhashes → band
    * keys → candidate pairs) for the dedup-observability oracles
    * q182/q183 — textually identical to the q23 oracle's chain. */

  private val AHashPairsCte: String =
    """dd AS (SELECT doc_id, text, (length(text) - 64)::BIGINT n_pix
      |      FROM documents WHERE length(text) - 64 >= 64),
      |px AS (SELECT doc_id, n_pix,
      |        ord(substr(text, (65 + p)::INT, 1))::BIGINT v, p
      |      FROM (SELECT doc_id, text, n_pix,
      |              unnest(generate_series(0, n_pix - 1)) p FROM dd)),
      |bl AS (SELECT doc_id, n_pix, (64 * p) // n_pix blk,
      |        sum(v)::BIGINT bsum, count(*)::BIGINT bcnt
      |      FROM px GROUP BY 1, 2, 3),
      |tt AS (SELECT doc_id, sum(bsum)::BIGINT tot FROM bl GROUP BY 1),
      |bits AS (SELECT bl.doc_id, blk,
      |        CASE WHEN bsum::HUGEINT * n_pix >= tot::HUGEINT * bcnt
      |          THEN 1::BIGINT ELSE 0::BIGINT END bt
      |      FROM bl JOIN tt ON tt.doc_id = bl.doc_id),
      |sg AS MATERIALIZED (SELECT doc_id,
      |        sum(CASE WHEN blk < 32 THEN bt << blk::INT ELSE 0 END)
      |          ::BIGINT lo,
      |        sum(CASE WHEN blk >= 32 THEN bt << (blk - 32)::INT
      |          ELSE 0 END)::BIGINT hi
      |      FROM bits GROUP BY 1),
      |ch AS MATERIALIZED (SELECT doc_id, lo, hi, c,
      |        ((CASE WHEN c < 5 THEN lo ELSE hi END)
      |          >> (CASE c % 5 WHEN 0 THEN 0 WHEN 1 THEN 7 WHEN 2 THEN 14
      |              WHEN 3 THEN 20 ELSE 26 END)::INT)
      |          & (CASE WHEN c % 5 < 2 THEN 127 ELSE 63 END) cv
      |      FROM sg, generate_series(0, 9) g(c)),
      |pr AS MATERIALIZED (SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b,
      |       (bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)))
      |         ::BIGINT dist
      |      FROM ch a JOIN ch b ON b.c = a.c AND b.cv = a.cv
      |        AND a.doc_id < b.doc_id
      |      WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
      |        <= 9)""".stripMargin
  val sql: Map[String, String] = Map(
    "q60_zorder_keys" -> {
      // same 32-term masked-shift sum as ZOrder.morton16 — pure integer
      // arithmetic, so the hashes match bit-for-bit
      val terms = (0 until 16).flatMap(i => Seq(
        s"(((cust_bits >> $i) & 1) << ${2 * i})",
        s"(((day_bits >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")
      s"""WITH t AS (SELECT o_orderkey, (o_custkey % 65536)::BIGINT AS cust_bits,
         |  (datediff('day', DATE '1992-01-01', o_orderdate::DATE) % 65536)::BIGINT AS day_bits
         |  FROM orders)
         |SELECT o_orderkey, cust_bits, day_bits, ($terms)::BIGINT AS zkey
         |FROM t ORDER BY o_orderkey""".stripMargin
    },
    "q65_incremental_hourly" ->
      """SELECT event_type,
        |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  count(*) AS n,
        |  sum(floor(value * 1000000)::BIGINT)::BIGINT AS sum_micro,
        |  floor(sum(floor(value * 1000000)::BIGINT) / count(*))::BIGINT AS avg_micro
        |FROM events
        |GROUP BY event_type, date_trunc('hour', ts)
        |ORDER BY event_type, hour""".stripMargin,
    "q32_media_metadata" ->
      s"""WITH t AS (SELECT doc_id, text, ${H("text")} AS h FROM documents)
         |SELECT doc_id, octet_length(text::BLOB)::BIGINT AS byte_len,
         |  (['jpeg', 'png', 'webp'])[(h % 3)::INT + 1] AS format,
         |  320 + (h % 8) * 160 AS width,
         |  240 + (h % 6) * 120 AS height,
         |  1 + octet_length(text::BLOB) % 24 AS n_frames,
         |  0::BIGINT AS sample_rate,
         |  0::BIGINT AS n_channels
         |FROM t ORDER BY doc_id""".stripMargin,
    // as-of: the oracle states the semantics directly (max prior view,
    // ties by greatest view id) — same rows the union+window pass emits
    "q44_asof_join" -> AsofOracleSql,
    // identical semantics through the custom physical operator
    "q67_asof_exec" -> AsofOracleSql,
    "q45_range_join_agg" ->
      """WITH c AS (SELECT event_id click_id, user_id, epoch_us(ts) cts
        |           FROM events WHERE event_type = 'click'),
        |v AS (SELECT user_id, epoch_us(ts) vts, value
        |      FROM events WHERE event_type = 'view'),
        |j AS (SELECT c.click_id, c.user_id, v.vts, v.value, c.cts
        |      FROM c LEFT JOIN v ON c.user_id = v.user_id
        |           AND v.vts <= c.cts AND c.cts - v.vts <= 600000000)
        |SELECT click_id, user_id, count(vts) AS n_views,
        |  min(cts - vts) AS min_gap_us, max(value) AS max_view_value
        |FROM j GROUP BY click_id, user_id
        |ORDER BY click_id""".stripMargin,
    "q68_merge_upsert" ->
      """WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        |              FROM orders),
        |u AS (SELECT o_orderkey,
        |        (round(o_totalprice * 100)::BIGINT * 11 // 10)::DOUBLE / 100.0
        |          AS o_totalprice,
        |        'U' AS o_orderstatus
        |      FROM base WHERE o_orderkey % 7 = 0),
        |i AS (SELECT o_orderkey + 20000000 AS o_orderkey,
        |        1000.0 AS o_totalprice, 'N' AS o_orderstatus
        |      FROM base WHERE o_orderkey % 97 = 0),
        |ch AS (SELECT * FROM u UNION ALL SELECT * FROM i)
        |SELECT coalesce(ch.o_orderkey, base.o_orderkey) AS o_orderkey,
        |  base.o_custkey AS o_custkey,
        |  coalesce(ch.o_totalprice, base.o_totalprice) AS o_totalprice,
        |  coalesce(ch.o_orderstatus, base.o_orderstatus) AS o_orderstatus
        |FROM base FULL OUTER JOIN ch ON base.o_orderkey = ch.o_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "q72_interval_pairs" ->
      """WITH c AS (SELECT event_id click_id, user_id, epoch_us(ts) cts
        |           FROM events WHERE event_type = 'click'),
        |v AS (SELECT event_id view_id, user_id, epoch_us(ts) vts
        |      FROM events WHERE event_type = 'view')
        |SELECT c.click_id, c.user_id, v.view_id, c.cts - v.vts AS gap_us
        |FROM c JOIN v ON c.user_id = v.user_id
        |     AND v.vts <= c.cts AND c.cts - v.vts <= 600000000
        |ORDER BY click_id, view_id""".stripMargin,
    "q79_cdc_apply" ->
      """WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        |              FROM orders),
        |u1 AS (SELECT o_orderkey,
        |       (round(o_totalprice * 100)::BIGINT + 100000)::DOUBLE / 100.0
        |         AS o_totalprice,
        |       'U1' AS o_orderstatus, 'U' AS op, 1::BIGINT AS seq
        |       FROM base WHERE o_orderkey % 5 = 0),
        |d2 AS (SELECT o_orderkey, NULL::DOUBLE, NULL::VARCHAR, 'D', 2::BIGINT
        |       FROM base WHERE o_orderkey % 15 = 0),
        |u3 AS (SELECT o_orderkey,
        |       (round(o_totalprice * 100)::BIGINT * 2)::DOUBLE / 100.0,
        |       'U3', 'U', 3::BIGINT
        |       FROM base WHERE o_orderkey % 25 = 0),
        |ch AS (SELECT * FROM u1 UNION ALL SELECT * FROM d2
        |       UNION ALL SELECT * FROM u3),
        |latest AS (SELECT * FROM (
        |  SELECT ch.*, row_number() OVER (PARTITION BY o_orderkey
        |                                  ORDER BY seq DESC) rn FROM ch)
        |  WHERE rn = 1),
        |ups AS (SELECT o_orderkey, o_totalprice, o_orderstatus
        |        FROM latest WHERE op = 'U'),
        |dels AS (SELECT o_orderkey FROM latest WHERE op = 'D'),
        |merged AS (
        |  SELECT coalesce(u.o_orderkey, b.o_orderkey) AS o_orderkey,
        |    b.o_custkey AS o_custkey,
        |    coalesce(u.o_totalprice, b.o_totalprice) AS o_totalprice,
        |    coalesce(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus
        |  FROM base b FULL OUTER JOIN ups u ON b.o_orderkey = u.o_orderkey)
        |SELECT m.* FROM merged m
        |WHERE m.o_orderkey NOT IN (SELECT o_orderkey FROM dels)
        |ORDER BY o_orderkey""".stripMargin,
    // q166: q32's pseudo-decode arithmetic + the endpoints-inclusive
    // uniform sample rule, one generate_series fan-out per item.
    "q166_frame_sample_plan" ->
      s"""WITH t AS (SELECT doc_id, text, ${H("text")} AS h FROM documents),
         |m AS (SELECT doc_id,
         |      (['jpeg', 'png', 'webp'])[(h % 3)::INT + 1] AS format,
         |      320 + (h % 8) * 160 AS width,
         |      240 + (h % 6) * 120 AS height,
         |      1 + octet_length(text::BLOB) % 24 AS n_frames FROM t)
         |SELECT doc_id, format, n_frames::BIGINT AS n_frames,
         |  slot::BIGINT AS slot,
         |  ((slot * (n_frames - 1)) // 3)::BIGINT AS frame_idx,
         |  (64 + ((slot * (n_frames - 1)) // 3) * width * height * 3)::BIGINT
         |    AS byte_offset
         |FROM m, unnest(generate_series(0, 3)) AS g(slot)
         |ORDER BY doc_id, slot""".stripMargin,
    // q225: the q32 pseudo-decode replay + ceil-division tiling.
    "q225_tile_grid_plan" ->
      s"""WITH t AS (SELECT doc_id, text, ${H("text")} AS h FROM documents),
         |m AS (SELECT doc_id,
         |      (['jpeg', 'png', 'webp'])[(h % 3)::INT + 1] AS format,
         |      320 + (h % 8) * 160 AS width,
         |      240 + (h % 6) * 120 AS height FROM t),
         |g AS (SELECT doc_id, format, width, height,
         |      (width + 223) // 224 tx, (height + 223) // 224 ty FROM m)
         |SELECT doc_id, format, width::BIGINT AS width,
         |  height::BIGINT AS height, tx::BIGINT AS tiles_x,
         |  ty::BIGINT AS tiles_y, (tx * ty)::BIGINT AS n_tiles,
         |  (tx * 224 - width)::BIGINT AS pad_right,
         |  (ty * 224 - height)::BIGINT AS pad_bottom,
         |  (tx * ty * 196)::BIGINT AS n_patches,
         |  (tx * ty * 224 * 224 * 3)::BIGINT AS decode_bytes
         |FROM g ORDER BY doc_id""".stripMargin,
    // q226: the virtual-PCM contract (s16le mono 16 kHz, 64-byte
    // header) on the text-byte corpus; window 10 ms, hop 8 ms.
    "q226_audio_chunk_plan" ->
      """WITH t AS (SELECT doc_id, octet_length(text::BLOB)::BIGINT bl
        |           FROM documents),
        |a AS (SELECT doc_id, 16000::BIGINT sr, 1::BIGINT ch,
        |        greatest(bl - 64, 0) // 2 AS n_samples FROM t),
        |b AS (SELECT doc_id, sr, ch,
        |        ((1000 * n_samples) // sr)::BIGINT AS duration_ms
        |      FROM a WHERE (1000 * n_samples) // sr > 0),
        |c AS (SELECT doc_id, sr, ch, duration_ms,
        |        1 + (greatest(duration_ms - 10, 0) + 7) // 8 AS n_chunks
        |      FROM b),
        |x AS (SELECT doc_id, sr, ch, duration_ms,
        |        unnest(generate_series(0, n_chunks - 1)) chunk FROM c)
        |SELECT doc_id, sr, ch, duration_ms, chunk::BIGINT AS chunk,
        |  (chunk * 8)::BIGINT AS start_ms,
        |  least(chunk * 8 + 10, duration_ms)::BIGINT AS end_ms,
        |  (64 + ((chunk * 8 * sr) // 1000) * 2 * ch)::BIGINT AS start_byte,
        |  (((least(chunk * 8 + 10, duration_ms) - chunk * 8) * sr)
        |   // 1000 * 2 * ch)::BIGINT AS n_bytes
        |FROM x ORDER BY doc_id, chunk""".stripMargin,
    // q245: the virtual pixel stream (bytes after the 64-byte header),
    // 64 grid cells by (64·p)//n_pix, cross-multiplied mean threshold,
    // the 64-bit hash as two 32-bit halves, 10-chunk pigeonhole join,
    // exact Hamming ≤ 9 verify — the full aHash replay.
    "q245_image_ahash_neardup" ->
      s"""WITH $AHashPairsCte
         |SELECT doc_a, doc_b, dist FROM pr
         |ORDER BY doc_a, doc_b""".stripMargin,
    // q246: the q226 virtual-PCM contract (s16le mono after the 64-byte
    // header, signed decode), 32 temporal bands by (32·k)//n_s, energy
    // mean threshold cross-multiplied in HUGEINT, 5-chunk pigeonhole,
    // exact Hamming ≤ 4 verify.
    "q246_audio_energy_neardup" ->
      """WITH dd AS (SELECT * FROM (SELECT doc_id, text,
        |        (greatest(length(text) - 64, 0) // 2)::BIGINT n_s
        |      FROM documents) WHERE n_s >= 32),
        |sm AS (SELECT doc_id, n_s, k,
        |        ord(substr(text, (65 + 2 * k)::INT, 1))
        |          + 256 * ord(substr(text, (66 + 2 * k)::INT, 1)) raw
        |      FROM (SELECT doc_id, text, n_s,
        |              unnest(generate_series(0, n_s - 1)) k FROM dd)),
        |sv AS (SELECT doc_id, n_s, k,
        |        (CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END)
        |          ::BIGINT v
        |      FROM sm),
        |bd AS (SELECT doc_id, n_s, (32 * k) // n_s band,
        |        sum(v * v)::BIGINT e, count(*)::BIGINT bcnt
        |      FROM sv GROUP BY 1, 2, 3),
        |tt AS (SELECT doc_id, sum(e)::BIGINT tot FROM bd GROUP BY 1),
        |bits AS (SELECT bd.doc_id, band,
        |        CASE WHEN e::HUGEINT * n_s >= tot::HUGEINT * bcnt
        |          THEN 1::BIGINT ELSE 0::BIGINT END bt
        |      FROM bd JOIN tt ON tt.doc_id = bd.doc_id),
        |sg AS MATERIALIZED (SELECT doc_id, sum(bt << band::INT)::BIGINT s
        |      FROM bits GROUP BY 1),
        |ch AS MATERIALIZED (SELECT doc_id, s, c,
        |        CASE c WHEN 0 THEN s & 127 WHEN 1 THEN (s >> 7) & 127
        |          WHEN 2 THEN (s >> 14) & 63 WHEN 3 THEN (s >> 20) & 63
        |          ELSE (s >> 26) & 63 END cv
        |      FROM sg, generate_series(0, 4) g(c))
        |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       bit_count(xor(a.s, b.s))::BIGINT AS dist
        |FROM ch a JOIN ch b ON b.c = a.c AND b.cv = a.cv
        |  AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.s, b.s)) <= 4
        |ORDER BY doc_a, doc_b""".stripMargin,
    // q250: the shared q245 pair chain, then the q49-style recursive
    // closure (symmetrized edges, reach, min-label), then cluster-
    // keyed edge stats.
    "q250_media_dup_clusters" ->
      s"""WITH RECURSIVE $AHashPairsCte,
         |edges AS (SELECT doc_a s, doc_b t2 FROM pr
         |      UNION ALL SELECT doc_b, doc_a FROM pr),
         |reach AS (SELECT doc_id AS src, doc_id AS dst FROM dd
         |      UNION
         |      SELECT r.src, e.t2 FROM reach r JOIN edges e ON r.dst = e.s),
         |lbl AS (SELECT src AS doc_id, min(dst) AS cluster_id
         |      FROM reach GROUP BY src),
         |cn AS (SELECT cluster_id, count(*)::BIGINT n_docs FROM lbl
         |      GROUP BY 1),
         |ed AS (SELECT l.cluster_id, count(*)::BIGINT n_edges,
         |        sum(CASE WHEN pr.dist = 0 THEN 1 ELSE 0 END)::BIGINT
         |          n_exact_edges,
         |        max(pr.dist)::BIGINT max_dist
         |      FROM pr JOIN lbl l ON l.doc_id = pr.doc_a GROUP BY 1)
         |SELECT cn.cluster_id, cn.n_docs, ed.n_edges, ed.n_exact_edges,
         |       ed.max_dist
         |FROM cn JOIN ed ON ed.cluster_id = cn.cluster_id
         |WHERE cn.n_docs >= 2 ORDER BY cn.cluster_id""".stripMargin,
    // q254: the q245 hash chain through sg, then a 64-way bit fan-out
    // and one bit-keyed agg (pr goes unreferenced → unevaluated).
    "q254_media_bit_balance" ->
      s"""WITH $AHashPairsCte,
         |pb AS (SELECT t.bit,
         |    CASE WHEN t.bit < 32 THEN (sg.lo >> t.bit::INT) & 1
         |      ELSE (sg.hi >> (t.bit - 32)::INT) & 1 END b
         |  FROM sg, generate_series(0, 63) t(bit))
         |SELECT bit::BIGINT AS bit, count(*)::BIGINT AS n_docs,
         |       sum(b)::BIGINT AS n_set,
         |       ((1000 * sum(b)) // count(*))::BIGINT AS share_pm
         |FROM pb GROUP BY 1 ORDER BY bit""".stripMargin,
    // q255: the q23 text pair chain (NearDupClusterCte through
    // `pairs`; the closure CTEs go unreferenced) + the q245 media
    // chain, full-outer joined on the pair key, one-row agg.
    "q255_dedup_modality_agreement" ->
      s"""WITH $NearDupClusterCte,
         |$AHashPairsCte,
         |fo AS (SELECT
         |   sum(CASE WHEN p.da IS NOT NULL AND m.doc_a IS NULL
         |     THEN 1 ELSE 0 END)::BIGINT n_text_only,
         |   sum(CASE WHEN p.da IS NULL AND m.doc_a IS NOT NULL
         |     THEN 1 ELSE 0 END)::BIGINT n_media_only,
         |   sum(CASE WHEN p.da IS NOT NULL AND m.doc_a IS NOT NULL
         |     THEN 1 ELSE 0 END)::BIGINT n_both
         |  FROM pairs p FULL OUTER JOIN pr m
         |    ON m.doc_a = p.da AND m.doc_b = p.db)
         |SELECT n_text_only, n_media_only, n_both,
         |       ((1000 * n_both) //
         |        greatest(n_text_only + n_media_only + n_both, 1))::BIGINT
         |         AS jaccard_pm
         |FROM fo""".stripMargin,
    // q259: q23's text pair set (both endpoints hash-eligible = the dd
    // doc set) against the aHash pair relation, unrolled over every
    // Hamming threshold via the per-pair τ-suffix fan-out.
    "q259_media_threshold_curve" ->
      s"""WITH $NearDupClusterCte,
         |$AHashPairsCte,
         |tpe AS MATERIALIZED (SELECT da, db FROM pairs
         |      JOIN dd x ON x.doc_id = da JOIN dd y ON y.doc_id = db),
         |ntx AS (SELECT count(*)::BIGINT n_text_pairs FROM tpe),
         |fl AS (SELECT pr.dist,
         |      (CASE WHEN tpe.da IS NOT NULL THEN 1 ELSE 0 END)::BIGINT t
         |      FROM pr LEFT JOIN tpe ON tpe.da = pr.doc_a AND tpe.db = pr.doc_b),
         |bt AS (SELECT tau, count(*)::BIGINT n_pairs, sum(t)::BIGINT n_confirmed
         |      FROM (SELECT unnest(generate_series(dist, 9)) tau, t FROM fl)
         |      GROUP BY 1)
         |SELECT g.tau::BIGINT AS tau,
         |  coalesce(bt.n_pairs, 0)::BIGINT AS n_pairs,
         |  coalesce(bt.n_confirmed, 0)::BIGINT AS n_confirmed,
         |  ntx.n_text_pairs,
         |  ((1000000 * coalesce(bt.n_confirmed, 0)) //
         |   greatest(coalesce(bt.n_pairs, 0), 1))::BIGINT AS precision_ppm,
         |  ((1000000 * coalesce(bt.n_confirmed, 0)) //
         |   greatest(ntx.n_text_pairs, 1))::BIGINT AS recall_ppm
         |FROM generate_series(0, 9) g(tau) LEFT JOIN bt ON bt.tau = g.tau, ntx
         |ORDER BY tau""".stripMargin,
    // q264: the q245 block-hash arithmetic per (doc, frame) slice —
    // pixel p of frame f is payload byte f·flen + p, 64 blocks per
    // frame, (lo, hi) packed halves join on exact equality, df cap,
    // shared-count pairing.
    "q264_frame_containment" ->
      s"""WITH fd AS (SELECT doc_id, text,
         |        ((length(text) - 64) // ${Multimodal.FrameCount})::BIGINT flen
         |      FROM documents
         |      WHERE (length(text) - 64) // ${Multimodal.FrameCount} >= 64),
         |ff AS (SELECT doc_id, text, flen,
         |        unnest(generate_series(0, ${Multimodal.FrameCount - 1})) f
         |      FROM fd),
         |fpx AS (SELECT doc_id, f, flen, p,
         |        ord(substr(text, (65 + f * flen + p)::INT, 1))::BIGINT v
         |      FROM (SELECT doc_id, text, flen, f,
         |              unnest(generate_series(0, flen - 1)) p FROM ff)),
         |fbl AS (SELECT doc_id, f, flen, (64 * p) // flen blk,
         |        sum(v)::BIGINT bsum, count(*)::BIGINT bcnt
         |      FROM fpx GROUP BY 1, 2, 3, 4),
         |ftt AS (SELECT doc_id, f, sum(bsum)::BIGINT tot FROM fbl GROUP BY 1, 2),
         |fbits AS (SELECT fbl.doc_id, fbl.f, blk,
         |        CASE WHEN bsum::HUGEINT * flen >= tot::HUGEINT * bcnt
         |          THEN 1::BIGINT ELSE 0::BIGINT END bt
         |      FROM fbl JOIN ftt ON ftt.doc_id = fbl.doc_id AND ftt.f = fbl.f),
         |fsg AS MATERIALIZED (SELECT doc_id, f,
         |        sum(CASE WHEN blk < 32 THEN bt << blk::INT ELSE 0 END)::BIGINT lo,
         |        sum(CASE WHEN blk >= 32 THEN bt << (blk - 32)::INT
         |          ELSE 0 END)::BIGINT hi
         |      FROM fbits GROUP BY 1, 2),
         |fh AS MATERIALIZED (SELECT DISTINCT doc_id, lo, hi FROM fsg),
         |fdf AS (SELECT lo, hi FROM fh GROUP BY lo, hi
         |        HAVING count(*) <= ${Multimodal.FrameDfCap}),
         |fidx AS (SELECT fh.* FROM fh JOIN fdf USING (lo, hi)),
         |fsz AS (SELECT doc_id, count(*)::BIGINT nf FROM fh GROUP BY 1),
         |fpr AS (SELECT a.doc_id da, b.doc_id db, count(*)::BIGINT n_shared
         |      FROM fidx a JOIN fidx b
         |        ON a.lo = b.lo AND a.hi = b.hi AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2 HAVING count(*) >= 2)
         |SELECT da AS doc_a, db AS doc_b, n_shared,
         |  ((1000 * n_shared) // least(x.nf, y.nf))::BIGINT AS containment_pm
         |FROM fpr JOIN fsz x ON x.doc_id = da JOIN fsz y ON y.doc_id = db
         |ORDER BY doc_a, doc_b""".stripMargin,
    // q281: the q246 virtual-PCM decode CTE (shared contract), one
    // per-doc agg, floored milli divisions; crest guards Σ|s| = 0.
    "q281_audio_loudness_audit" -> {
      val clip = graft.functions.PerceptualHash.ClipThreshold
      s"""WITH dd AS (SELECT * FROM (SELECT doc_id, text,
         |        (greatest(length(text) - 64, 0) // 2)::BIGINT n_s
         |      FROM documents) WHERE n_s >= 32),
         |sm AS (SELECT doc_id, n_s, k,
         |        ord(substr(text, (65 + 2 * k)::INT, 1))
         |          + 256 * ord(substr(text, (66 + 2 * k)::INT, 1)) raw
         |      FROM (SELECT doc_id, text, n_s,
         |              unnest(generate_series(0, n_s - 1)) k FROM dd)),
         |sv AS (SELECT doc_id, n_s,
         |        (CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END)
         |          ::BIGINT v
         |      FROM sm),
         |ag AS (SELECT doc_id, n_s, sum(abs(v))::BIGINT sa,
         |        sum(v * v)::BIGINT sq, max(abs(v))::BIGINT pk,
         |        sum(CASE WHEN abs(v) >= $clip THEN 1 ELSE 0 END)::BIGINT cl
         |      FROM sv GROUP BY 1, 2)
         |SELECT doc_id, n_s AS n_samples,
         |       ((1000 * sa) // n_s)::BIGINT AS mean_abs_milli,
         |       sq AS energy, pk AS peak_abs,
         |       ((1000 * cl) // n_s)::BIGINT AS clip_pm,
         |       (CASE WHEN sa > 0 THEN (1000 * pk * n_s) // sa ELSE 0 END)
         |         ::BIGINT AS crest_milli
         |FROM ag ORDER BY doc_id""".stripMargin
    },
    // q291: the q264 per-frame relational aHash chain at 8 frames,
    // adjacent-frame join, split-half Hamming.
    "q291_scene_cuts" -> {
      val sf = Multimodal.SceneFrames
      s"""WITH fd AS (SELECT doc_id, text,
         |        ((length(text) - 64) // $sf)::BIGINT flen
         |      FROM documents
         |      WHERE (length(text) - 64) // $sf >= 64),
         |ff AS (SELECT doc_id, text, flen,
         |        unnest(generate_series(0, ${sf - 1})) f FROM fd),
         |fpx AS (SELECT doc_id, f, flen, p,
         |        ord(substr(text, (65 + f * flen + p)::INT, 1))::BIGINT v
         |      FROM (SELECT doc_id, text, flen, f,
         |              unnest(generate_series(0, flen - 1)) p FROM ff)),
         |fbl AS (SELECT doc_id, f, flen, (64 * p) // flen blk,
         |        sum(v)::BIGINT bsum, count(*)::BIGINT bcnt
         |      FROM fpx GROUP BY 1, 2, 3, 4),
         |ftt AS (SELECT doc_id, f, sum(bsum)::BIGINT tot FROM fbl
         |      GROUP BY 1, 2),
         |fbits AS (SELECT fbl.doc_id, fbl.f, blk,
         |        CASE WHEN bsum::HUGEINT * flen >= tot::HUGEINT * bcnt
         |          THEN 1::BIGINT ELSE 0::BIGINT END bt
         |      FROM fbl JOIN ftt ON ftt.doc_id = fbl.doc_id
         |        AND ftt.f = fbl.f),
         |fsg AS MATERIALIZED (SELECT doc_id, f,
         |        sum(CASE WHEN blk < 32 THEN bt << blk::INT ELSE 0 END)
         |          ::BIGINT lo,
         |        sum(CASE WHEN blk >= 32 THEN bt << (blk - 32)::INT
         |          ELSE 0 END)::BIGINT hi
         |      FROM fbits GROUP BY 1, 2)
         |SELECT a.doc_id, b.f::BIGINT AS frame,
         |       (bit_count(xor(a.lo, b.lo))
         |         + bit_count(xor(a.hi, b.hi)))::BIGINT AS dist,
         |       (CASE WHEN bit_count(xor(a.lo, b.lo))
         |           + bit_count(xor(a.hi, b.hi)) > ${Multimodal.SceneCutBits}
         |         THEN 1 ELSE 0 END)::BIGINT AS is_cut
         |FROM fsg a JOIN fsg b ON b.doc_id = a.doc_id AND b.f = a.f + 1
         |ORDER BY a.doc_id, frame""".stripMargin
    },
    // q334: q44's as-of oracle plus the TTL CASE columns.
    "q334_asof_tolerance" -> {
      val tol = operators.TemporalJoins.AsofToleranceUs
      s"""WITH c AS (SELECT event_id click_id, user_id, epoch_us(ts) cts
         |           FROM events WHERE event_type = 'click'),
         |v AS (SELECT event_id vid, user_id, epoch_us(ts) vts
         |      FROM events WHERE event_type = 'view'),
         |j AS (SELECT c.click_id, c.user_id, c.cts, v.vid, v.vts,
         |      row_number() OVER (PARTITION BY c.click_id
         |                         ORDER BY v.vts DESC NULLS LAST, v.vid DESC) rn
         |      FROM c LEFT JOIN v ON c.user_id = v.user_id AND v.vts <= c.cts)
         |SELECT click_id, user_id, cts AS click_ts,
         |  (CASE WHEN cts - vts <= $tol THEN vid END)::BIGINT AS view_id,
         |  (CASE WHEN cts - vts <= $tol THEN vts END)::BIGINT AS view_ts,
         |  (CASE WHEN cts - vts <= $tol THEN cts - vts END)::BIGINT
         |    AS fresh_gap_us,
         |  (CASE WHEN vts IS NULL THEN -1
         |    WHEN cts - vts <= $tol THEN 1 ELSE 0 END)::BIGINT AS matched
         |FROM j WHERE rn = 1
         |ORDER BY click_id""".stripMargin
    },
  )
}
