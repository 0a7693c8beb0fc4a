package graft
package oracles

/** DuckDB oracle SQL — curation pipeline and quality scoring.
  *
  * Split from SparkEntry.oracleSql (round 12): entry text is verbatim;
  * SparkEntry remains the single-source registry and concatenates the
  * family maps. RegistrationGateSpec enforces key-set equality with
  * `queries`, and the split was verified by a byte-identical
  * oracle_sql.json dump before/after. */
private[graft] object OracleCuration {
  import graft.SparkEntryOracleUtil._
  val sql: Map[String, String] = Map(
    "q58_source_stats" ->
      """WITH t AS (SELECT source, lang, n_chars,
        |           len(string_split(text, ' '))::BIGINT n_tok FROM documents)
        |SELECT source, count(*) AS n_docs, sum(n_tok)::BIGINT AS sum_tok,
        |       (sum(n_tok) * 1000 // count(*))::BIGINT AS avg_tok_milli,
        |       count(DISTINCT lang) AS n_langs,
        |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM t GROUP BY source ORDER BY source""".stripMargin,
    "q59_curriculum" ->
      s"""WITH t AS (SELECT doc_id, lang, len(string_split(text, ' '))::BIGINT n_tok,
         |           ${H("'shuffle42:' || text")} % 1000000 AS shuffle_key FROM documents),
         |b AS (SELECT doc_id, lang, shuffle_key,
         |      (CASE WHEN n_tok < 40 THEN 0 WHEN n_tok < 70 THEN 1 ELSE 2 END)::BIGINT AS band
         |      FROM t)
         |SELECT doc_id, lang, band, shuffle_key,
         |       row_number() OVER (PARTITION BY lang
         |         ORDER BY band, shuffle_key, doc_id)::BIGINT AS train_rank
         |FROM b ORDER BY doc_id""".stripMargin,
    "q129_importance_weights" ->
      s"""WITH t AS (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) AS w
         |           FROM documents),
         |tb AS (SELECT doc_id, ${H("w")} % 1024 AS b FROM t),
         |bc AS (SELECT b, count(*) FILTER (doc_id % 97 = 0)::BIGINT AS tb,
         |              count(*) FILTER (doc_id % 97 != 0)::BIGINT AS rb
         |       FROM tb GROUP BY 1),
         |st AS (SELECT sum(tb)::BIGINT AS tt, sum(rb)::BIGINT AS rt FROM bc),
         |wt AS (SELECT b, ((1000::HUGEINT * (tb + 1) * (rt + 1024))
         |                   // ((rb + 1)::HUGEINT * (tt + 1024)))::BIGINT AS wm
         |       FROM bc, st)
         |SELECT tb.doc_id, count(*)::BIGINT AS n_tok,
         |       (sum(wm) // count(*))::BIGINT AS affinity_milli
         |FROM tb JOIN wt ON wt.b = tb.b WHERE tb.doc_id % 97 != 0
         |GROUP BY tb.doc_id ORDER BY tb.doc_id""".stripMargin,
    "q134_quality_calibration" ->
      """WITH t AS (SELECT doc_id, source, regexp_split_to_array(text, ' ') tk FROM documents),
        |s AS (SELECT doc_id, source, len(tk)::BIGINT n_tok,
        |      len(list_distinct(tk))::BIGINT n_uniq,
        |      len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in')))::BIGINT n_stop
        |      FROM t),
        |sc AS (SELECT doc_id, source,
        |       ((500 * n_uniq) // n_tok + (200 * n_stop) // n_tok
        |        + (300 * least(n_tok, 200)) // 200)::BIGINT AS score_milli FROM s),
        |r AS (SELECT doc_id, source, score_milli,
        |      row_number() OVER (PARTITION BY source ORDER BY score_milli, doc_id)::BIGINT AS rn,
        |      count(*) OVER (PARTITION BY source)::BIGINT AS nsrc FROM sc)
        |SELECT doc_id, source, score_milli,
        |  (CASE WHEN nsrc > 1 THEN (1000 * (rn - 1)) // (nsrc - 1) ELSE 500 END)::BIGINT AS cal_permille
        |FROM r ORDER BY doc_id""".stripMargin,
    "q135_dsir_select" ->
      s"""WITH t AS (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) AS w
         |           FROM documents),
         |tb AS (SELECT doc_id, ${H("w")} % 1024 AS b FROM t),
         |bc AS (SELECT b, count(*) FILTER (doc_id % 97 = 0)::BIGINT AS tb,
         |              count(*) FILTER (doc_id % 97 != 0)::BIGINT AS rb
         |       FROM tb GROUP BY 1),
         |st AS (SELECT sum(tb)::BIGINT AS tt, sum(rb)::BIGINT AS rt FROM bc),
         |wt AS (SELECT b, ((1000::HUGEINT * (tb + 1) * (rt + 1024))
         |                   // ((rb + 1)::HUGEINT * (tt + 1024)))::BIGINT AS wm
         |       FROM bc, st),
         |af AS (SELECT tb.doc_id, count(*)::BIGINT AS n_tok,
         |              (sum(wm) // count(*))::BIGINT AS affinity_milli
         |       FROM tb JOIN wt ON wt.b = tb.b WHERE tb.doc_id % 97 != 0
         |       GROUP BY tb.doc_id),
         |sel AS (SELECT doc_id, n_tok, affinity_milli,
         |               (${H("'sel:' || doc_id::VARCHAR")} % 1000)::BIGINT AS u_permille
         |        FROM af)
         |SELECT doc_id, n_tok, affinity_milli, u_permille FROM sel
         |WHERE u_permille < least(affinity_milli, 1000)
         |ORDER BY doc_id""".stripMargin,
    "q137_length_buckets" ->
      """WITH t AS (SELECT len(regexp_split_to_array(text, ' '))::BIGINT AS n_tok
        |           FROM documents),
        |g AS (SELECT n_tok // 64 AS bucket, count(*)::BIGINT AS n_docs,
        |             sum(n_tok)::BIGINT AS sum_tok, max(n_tok)::BIGINT AS max_tok
        |      FROM t GROUP BY 1)
        |SELECT bucket::BIGINT AS bucket, (bucket * 64)::BIGINT AS lo_tok, n_docs,
        |       sum_tok, max_tok,
        |       (n_docs * max_tok - sum_tok)::BIGINT AS pad_waste_tok,
        |       ((1000 * sum_tok) // (n_docs * max_tok))::BIGINT AS fill_permille
        |FROM g ORDER BY bucket""".stripMargin,
    "q122_sample_estimate" ->
      s"""WITH r(lang, permille) AS (VALUES ('en', 250), ('de', 800), ('es', 800),
         |                                 ('fr', 800), ('zh', 800)),
         |s AS (SELECT d.lang, r.permille::BIGINT AS permille,
         |      len(regexp_split_to_array(d.text, ' '))::BIGINT AS n_tok
         |      FROM documents d JOIN r ON r.lang = d.lang
         |      WHERE ${H("d.text")} % 1000 < r.permille),
         |g AS (SELECT lang, permille, count(*)::BIGINT AS n_sampled,
         |      sum(n_tok)::BIGINT AS tok_sampled FROM s GROUP BY 1, 2)
         |SELECT lang, permille, n_sampled, tok_sampled,
         |       ((n_sampled * 1000) // permille)::BIGINT AS est_docs,
         |       ((tok_sampled * 1000) // permille)::BIGINT AS est_tokens
         |FROM g ORDER BY lang""".stripMargin,
    "q120_eval_carve" ->
      s"""WITH h AS (SELECT source, ${H("'carve:' || text")} AS hkey, doc_id FROM documents),
         |r AS (SELECT source, hkey, doc_id,
         |      row_number() OVER (PARTITION BY source ORDER BY hkey, doc_id) AS rn
         |      FROM h)
         |SELECT source, rn::BIGINT AS rank, doc_id, hkey
         |FROM r WHERE rn <= 50 ORDER BY source, rank""".stripMargin,
    "q113_length_drift" ->
      """WITH b AS (SELECT len(regexp_split_to_array(text, ' '))::BIGINT // 10 AS bucket,
        |                  substr(source, 4)::INT >= 15 AS is_new
        |           FROM documents),
        |g AS (SELECT bucket,
        |             count(*) FILTER (NOT is_new) AS n_old,
        |             count(*) FILTER (is_new) AS n_new
        |      FROM b GROUP BY bucket),
        |c AS (SELECT bucket, n_old, n_new,
        |             sum(n_old) OVER (ORDER BY bucket)::BIGINT AS cum_old,
        |             sum(n_new) OVER (ORDER BY bucket)::BIGINT AS cum_new,
        |             sum(n_old) OVER ()::BIGINT AS tot_old,
        |             sum(n_new) OVER ()::BIGINT AS tot_new
        |      FROM g)
        |SELECT bucket, n_old, n_new,
        |       cum_old * 1000 // tot_old AS cdf_old_pm,
        |       cum_new * 1000 // tot_new AS cdf_new_pm,
        |       abs(cum_old * 1000 // tot_old - cum_new * 1000 // tot_new) AS drift_pm
        |FROM c ORDER BY bucket""".stripMargin,
    "q111_split_assign" ->
      s"""WITH s AS (SELECT doc_id, ${H("'split:' || text")} % 1000 AS skey FROM documents)
         |SELECT doc_id, skey,
         |  CASE WHEN skey < 980 THEN 'train'
         |       WHEN skey < 990 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM s ORDER BY doc_id""".stripMargin,
    "q110_mixture_plan" ->
      """WITH tok AS (SELECT lang, sum(len(regexp_split_to_array(text, ' ')))::BIGINT AS n_tokens
        |             FROM documents GROUP BY lang),
        |t(lang, share_pm) AS (VALUES ('en', 400), ('de', 150), ('es', 150), ('fr', 150), ('zh', 150)),
        |j AS (SELECT lang, n_tokens, share_pm::BIGINT AS share_pm,
        |             n_tokens * 1000 // share_pm AS feasible
        |      FROM tok JOIN t USING (lang)),
        |b AS (SELECT min(feasible) AS budget FROM j)
        |SELECT lang, n_tokens, share_pm,
        |       least(1000, (budget * share_pm // 1000) * 1000 // n_tokens)::BIGINT AS rate_permille,
        |       (budget * share_pm // 1000)::BIGINT AS planned_tokens
        |FROM j, b ORDER BY lang""".stripMargin,
    "q63_source_overlap" ->
      """WITH w AS (SELECT DISTINCT source, word FROM
        |  (SELECT source, unnest(regexp_split_to_array(text, ' ')) word FROM documents)),
        |s AS (SELECT source, count(*)::BIGINT nv FROM w GROUP BY 1),
        |p AS (SELECT a.source src_a, b.source src_b, count(*)::BIGINT inter
        |      FROM w a JOIN w b ON a.word = b.word AND a.source < b.source
        |      GROUP BY 1, 2)
        |SELECT src_a, src_b, inter, sa.nv AS nv_a, sb.nv AS nv_b,
        |       ((1000 * inter) // (sa.nv + sb.nv - inter))::BIGINT AS jaccard_permille
        |FROM p JOIN s sa ON sa.source = p.src_a JOIN s sb ON sb.source = p.src_b
        |ORDER BY src_a, src_b""".stripMargin,
    "q54_sample_upweight" ->
      s"""WITH w(lang, wpm) AS (VALUES ('en', 1000), ('de', 2500), ('es', 1300),
         |                            ('fr', 1300), ('zh', 700)),
         |dd AS (SELECT doc_id, d.lang, ${H("'upsample:' || text")} % 1000 AS skey, wpm
         |       FROM documents d JOIN w ON w.lang = d.lang),
         |c AS (SELECT doc_id, lang,
         |      (wpm // 1000 + CASE WHEN skey < wpm % 1000 THEN 1 ELSE 0 END)::BIGINT n_copies
         |      FROM dd)
         |SELECT doc_id, lang, unnest(generate_series(1, n_copies))::BIGINT AS copy_id
         |FROM c WHERE n_copies > 0 ORDER BY doc_id, copy_id""".stripMargin,
    "q50_sample_stratified" ->
      s"""WITH r(lang, permille) AS (VALUES ('en', 250), ('de', 800), ('es', 800),
         |                                 ('fr', 800), ('zh', 800)),
         |dd AS (SELECT doc_id, lang, ${H("text")} % 1000 AS skey FROM documents)
         |SELECT dd.doc_id, dd.lang, dd.skey FROM dd JOIN r ON r.lang = dd.lang
         |WHERE dd.skey < r.permille ORDER BY dd.doc_id""".stripMargin,
    "q51_pack_windows" ->
      """WITH t AS (SELECT doc_id, lang,
        |           len(string_split(text, ' '))::BIGINT n_tok FROM documents),
        |c AS (SELECT doc_id, lang, n_tok,
        |      coalesce(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) prev_tok FROM t)
        |SELECT doc_id, lang, n_tok, (prev_tok // 512)::BIGINT AS window_id,
        |       (prev_tok % 512)::BIGINT AS off_in_win
        |FROM c ORDER BY doc_id""".stripMargin,
    "q89_chunk_tokens" -> {
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk
         |           FROM documents),
         |s AS (SELECT doc_id, tk, len(tk)::BIGINT n_tok,
         |      unnest(generate_series(0, GREATEST(len(tk) - 1, 0), 40)) tok_start
         |      FROM t),
         |f AS (SELECT * FROM s WHERE tok_start = 0 OR tok_start - 40 + 50 < n_tok)
         |SELECT doc_id, (tok_start // 40)::BIGINT AS chunk_id,
         |  tok_start::BIGINT AS tok_start,
         |  LEAST(50, n_tok - tok_start)::BIGINT AS n_in_chunk,
         |  ${H("array_to_string(tk[tok_start + 1 : tok_start + 50], ' ')")} AS chunk_hash
         |FROM f ORDER BY doc_id, chunk_id""".stripMargin
    },
    // q144: same regex cascade, RE2 side. Counts read the string as the
    // previous family left it, exactly like the plan.
    "q144_pii_scrub" ->
      s"""WITH s AS (SELECT event_id, event_type, props,
         |  regexp_replace(props, '${Curation.PiiEmailRe}', '<EMAIL>', 'g') AS s1
         |  FROM events),
         |s2t AS (SELECT *, regexp_replace(s1, '${Curation.PiiIpRe}', '<IP>', 'g') AS s2
         |        FROM s),
         |s3t AS (SELECT *, regexp_replace(s2, '${Curation.PiiPhoneRe}', '<PHONE>', 'g') AS s3
         |        FROM s2t)
         |SELECT event_id, event_type,
         |  len(regexp_extract_all(props, '${Curation.PiiEmailRe}'))::BIGINT AS n_email,
         |  len(regexp_extract_all(s1, '${Curation.PiiIpRe}'))::BIGINT AS n_ipv4,
         |  len(regexp_extract_all(s2, '${Curation.PiiPhoneRe}'))::BIGINT AS n_phone,
         |  len(regexp_extract_all(s3, '${Curation.PiiNumRe}'))::BIGINT AS n_num,
         |  (length(props) - length(regexp_replace(regexp_replace(regexp_replace(
         |     regexp_replace(props, '${Curation.PiiEmailRe}', '', 'g'),
         |     '${Curation.PiiIpRe}', '', 'g'), '${Curation.PiiPhoneRe}', '', 'g'),
         |     '${Curation.PiiNumRe}', '', 'g')))::BIGINT AS chars_redacted,
         |  regexp_replace(s3, '${Curation.PiiNumRe}', '<NUM>', 'g') AS redacted
         |FROM s3t ORDER BY event_id""".stripMargin,
    // q147: q134's integer milli-score, best-15 per source by
    // (score desc, doc_id) — the window replays the bounded heap.
    "q147_source_caps" ->
      """WITH t AS (SELECT doc_id, source, n_chars,
        |           regexp_split_to_array(text, ' ') tk FROM documents),
        |s AS (SELECT doc_id, source, n_chars, len(tk)::BIGINT n_tok,
        |      len(list_distinct(tk))::BIGINT n_uniq,
        |      len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in')))::BIGINT n_stop
        |      FROM t),
        |sc AS (SELECT doc_id, source, n_chars,
        |       ((500 * n_uniq) // n_tok + (200 * n_stop) // n_tok
        |        + (300 * least(n_tok, 200)) // 200)::BIGINT AS score_milli FROM s),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |        ORDER BY score_milli DESC, doc_id)::BIGINT AS rn FROM sc),
        |ks AS (SELECT source, count(*)::BIGINT kept_docs, sum(n_chars)::BIGINT kept_chars,
        |       min(score_milli)::BIGINT cap_score_milli FROM r WHERE rn <= 15 GROUP BY source),
        |a AS (SELECT source, count(*)::BIGINT n_docs, sum(n_chars)::BIGINT n_chars_total
        |      FROM sc GROUP BY source)
        |SELECT a.source, a.n_docs, ks.kept_docs,
        |  (a.n_docs - ks.kept_docs)::BIGINT AS dropped_docs,
        |  a.n_chars_total, ks.kept_chars,
        |  ((1000 * ks.kept_docs) // a.n_docs)::BIGINT AS retention_permille,
        |  ks.cap_score_milli
        |FROM a JOIN ks ON a.source = ks.source ORDER BY a.source""".stripMargin,
    // q151: cumulative over the bounded (lang, len) histogram; pK =
    // smallest len with cum >= ceil(n·K/100).
    "q151_length_percentiles" ->
      """WITH s AS (SELECT lang, len(regexp_split_to_array(text, ' '))::BIGINT n_tok
        |           FROM documents),
        |h AS (SELECT lang, n_tok, count(*)::BIGINT c FROM s GROUP BY 1, 2),
        |r AS (SELECT *,
        |      sum(c) OVER (PARTITION BY lang ORDER BY n_tok
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT cum,
        |      sum(c) OVER (PARTITION BY lang)::BIGINT n FROM h)
        |SELECT lang, max(n)::BIGINT AS n_docs,
        |  min(n_tok) AS min_tok, max(n_tok) AS max_tok,
        |  min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN n_tok END)::BIGINT AS p50_tok,
        |  min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN n_tok END)::BIGINT AS p90_tok,
        |  min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN n_tok END)::BIGINT AS p99_tok
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin,
    // q152: the q49 closure + the q111 hash split; every doc takes
    // its cluster representative's split.
    "q152_leak_safe_split" ->
      s"""WITH $NearDupClusterCte,
         |sp AS (SELECT doc_id, CASE WHEN ${H("'split:' || text")} % 1000 < 980 THEN 'train'
         |       WHEN ${H("'split:' || text")} % 1000 < 990 THEN 'val'
         |       ELSE 'test' END AS split FROM documents)
         |SELECT l.doc_id, sp.split AS orig_split, l.cluster_id, cn.cluster_n,
         |  rp.split AS final_split,
         |  (CASE WHEN sp.split != rp.split THEN 1 ELSE 0 END)::BIGINT AS moved
         |FROM lbl l JOIN cn ON cn.cluster_id = l.cluster_id
         |JOIN sp ON sp.doc_id = l.doc_id
         |JOIN sp rp ON rp.doc_id = l.cluster_id
         |ORDER BY l.doc_id""".stripMargin,
    // q154: the q49 closure + the q134 integer quality; per-cluster
    // argmax (score desc, doc_id) picks the canonical survivor.
    "q154_canonical_docs" ->
      s"""WITH $NearDupClusterCte,
         |tq AS (SELECT doc_id, n_chars, regexp_split_to_array(text, ' ') tk FROM documents),
         |sq AS (SELECT doc_id, n_chars, len(tk)::BIGINT n_tok,
         |       len(list_distinct(tk))::BIGINT n_uniq,
         |       len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in')))::BIGINT n_stop
         |       FROM tq),
         |scq AS (SELECT doc_id, n_chars,
         |        ((500 * n_uniq) // n_tok + (200 * n_stop) // n_tok
         |         + (300 * least(n_tok, 200)) // 200)::BIGINT AS score_milli FROM sq),
         |jq AS (SELECT l.doc_id, l.cluster_id, sc.n_chars, sc.score_milli
         |       FROM lbl l JOIN scq sc ON sc.doc_id = l.doc_id),
         |rq AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
         |        ORDER BY score_milli DESC, doc_id) rn FROM jq),
         |ag AS (SELECT cluster_id, count(*)::BIGINT cluster_n, sum(n_chars)::BIGINT chars_total
         |       FROM jq GROUP BY cluster_id)
         |SELECT rq.cluster_id, rq.doc_id AS canonical_id,
         |  rq.score_milli AS canonical_score_milli,
         |  ag.cluster_n, (ag.cluster_n - 1)::BIGINT AS dropped_docs,
         |  (ag.chars_total - rq.n_chars)::BIGINT AS chars_saved
         |FROM rq JOIN ag ON ag.cluster_id = rq.cluster_id
         |WHERE rq.rn = 1 ORDER BY rq.cluster_id""".stripMargin,
    // q157: exact isqrt = floor(sqrt(double)) with the one-step
    // correction both ways (IEEE sqrt is correctly rounded, so the
    // corrected integer is exact in both engines).
    "q157_temperature_mix" ->
      """WITH inv AS (SELECT source,
        |       sum(len(regexp_split_to_array(text, ' ')))::BIGINT AS n_tokens
        |       FROM documents GROUP BY 1),
        |w0 AS (SELECT source, n_tokens,
        |       floor(sqrt(n_tokens::DOUBLE))::BIGINT AS s0 FROM inv),
        |w1 AS (SELECT source, n_tokens,
        |       CASE WHEN s0 * s0 > n_tokens THEN s0 - 1 ELSE s0 END AS s1 FROM w0),
        |wt AS (SELECT source, n_tokens,
        |       CASE WHEN (s1 + 1) * (s1 + 1) <= n_tokens THEN s1 + 1 ELSE s1 END AS w
        |       FROM w1),
        |t AS (SELECT sum(w)::BIGINT AS tw, sum(n_tokens)::BIGINT AS tn FROM wt)
        |SELECT source, n_tokens, w::BIGINT AS weight,
        |  ((1000 * w) // tw)::BIGINT AS share_pm,
        |  ((tn * w) // tw)::BIGINT AS tokens_drawn,
        |  ((1000 * ((tn * w) // tw)) // n_tokens)::BIGINT AS epochs_milli
        |FROM wt, t ORDER BY source""".stripMargin,
    // q165: distinct (lang, content-hash) sets full-outer joined; the
    // split convention is q113/q155's source-index cut.
    "q165_snapshot_diff" ->
      s"""WITH t AS (SELECT lang, substr(source, 4)::INT >= 15 AS is_new,
         |           ${H("text")} AS h FROM documents),
         |o AS (SELECT DISTINCT lang, h FROM t WHERE NOT is_new),
         |n AS (SELECT DISTINCT lang, h FROM t WHERE is_new),
         |j AS (SELECT coalesce(o.lang, n.lang) AS lang,
         |      (CASE WHEN o.h IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS ov,
         |      (CASE WHEN n.h IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS nv
         |      FROM o FULL JOIN n ON n.lang = o.lang AND n.h = o.h)
         |SELECT lang, sum(ov)::BIGINT AS n_old, sum(nv)::BIGINT AS n_new,
         |  sum(CASE WHEN nv = 1 AND ov = 0 THEN 1 ELSE 0 END)::BIGINT AS added,
         |  sum(CASE WHEN ov = 1 AND nv = 0 THEN 1 ELSE 0 END)::BIGINT AS removed,
         |  sum(CASE WHEN ov = 1 AND nv = 1 THEN 1 ELSE 0 END)::BIGINT AS common,
         |  (CASE WHEN sum(nv) > 0 THEN
         |    (1000 * sum(CASE WHEN nv = 1 AND ov = 0 THEN 1 ELSE 0 END)) // sum(nv)
         |   END)::BIGINT AS added_pm,
         |  (CASE WHEN sum(ov) > 0 THEN
         |    (1000 * sum(CASE WHEN ov = 1 AND nv = 0 THEN 1 ELSE 0 END)) // sum(ov)
         |   END)::BIGINT AS removed_pm
         |FROM j GROUP BY lang ORDER BY lang""".stripMargin,
    // q173: plain rank() windows per signal — DuckDB's rank() IS the
    // min-rank the histogram cumsum computes on the Spark side.
    "q173_rank_fusion" ->
      """WITH m AS (SELECT doc_id, lang, n_chars,
        |      len(regexp_split_to_array(text, ' '))::BIGINT AS n_tok,
        |      len(list_distinct(regexp_split_to_array(text, ' ')))::BIGINT AS n_types
        |      FROM documents),
        |r AS (SELECT doc_id, lang, n_tok, n_types, n_chars,
        |      rank() OVER (PARTITION BY lang ORDER BY n_tok DESC)::BIGINT AS r_tok,
        |      rank() OVER (PARTITION BY lang ORDER BY n_types DESC)::BIGINT AS r_types,
        |      rank() OVER (PARTITION BY lang ORDER BY n_chars DESC)::BIGINT AS r_chars
        |      FROM m)
        |SELECT doc_id, lang, n_tok, n_types, n_chars, r_tok, r_types, r_chars,
        |  (r_tok + r_types + r_chars)::BIGINT AS borda
        |FROM r ORDER BY doc_id""".stripMargin,
    // q174: rank-picked p05/p95 (ceil thresholds over the sorted
    // multiset), clip, integer floor means — mirrors the histogram
    // cumsum exactly.
    "q174_winsorize" ->
      """WITH t AS (SELECT lang,
        |      len(regexp_split_to_array(text, ' '))::BIGINT AS n_tok
        |      FROM documents),
        |r AS (SELECT lang, n_tok,
        |      row_number() OVER (PARTITION BY lang ORDER BY n_tok) AS rn,
        |      count(*) OVER (PARTITION BY lang) AS n FROM t),
        |b AS (SELECT lang, max(n)::BIGINT AS n_docs,
        |      min(CASE WHEN rn >= (n * 5 + 99) // 100 THEN n_tok END) AS lo,
        |      min(CASE WHEN rn >= (n * 95 + 99) // 100 THEN n_tok END) AS hi
        |      FROM r GROUP BY lang)
        |SELECT t.lang, max(b.n_docs)::BIGINT AS n_docs,
        |  max(b.lo)::BIGINT AS p05_tok, max(b.hi)::BIGINT AS p95_tok,
        |  sum(CASE WHEN n_tok < lo THEN 1 ELSE 0 END)::BIGINT AS clipped_low,
        |  sum(CASE WHEN n_tok > hi THEN 1 ELSE 0 END)::BIGINT AS clipped_high,
        |  (sum(n_tok) // count(*))::BIGINT AS raw_mean_tok,
        |  (sum(greatest(lo, least(hi, n_tok))) // count(*))::BIGINT
        |    AS winsor_mean_tok
        |FROM t JOIN b ON b.lang = t.lang
        |GROUP BY t.lang ORDER BY t.lang""".stripMargin,
    // q176: identical integer priority arithmetic; top-K by
    // (priority DESC, doc_id).
    "q176_priority_sample" ->
      s"""WITH p AS (SELECT doc_id, source, n_chars,
         |      (${H("'smp:' || doc_id::VARCHAR")} % 1000000 + 1)::BIGINT AS u_ppm
         |      FROM documents)
         |SELECT doc_id, source, n_chars, u_ppm,
         |  ((n_chars * 1000000) // u_ppm)::BIGINT AS priority
         |FROM p ORDER BY priority DESC, doc_id
         |LIMIT ${Curation.PrioritySampleK}""".stripMargin,
    // q180: q176's priorities ranked per language; row_number
    // (priority DESC, doc_id) = TopKByScore order.
    "q180_stratified_sample" ->
      s"""WITH p AS (SELECT doc_id, lang,
         |      ((n_chars * 1000000) //
         |       (${H("'smp:' || doc_id::VARCHAR")} % 1000000 + 1))::BIGINT AS priority
         |      FROM documents),
         |r AS (SELECT lang, doc_id, priority,
         |      row_number() OVER (PARTITION BY lang
         |                         ORDER BY priority DESC, doc_id) AS rn
         |      FROM p)
         |SELECT lang, rn::BIGINT AS rank, doc_id, priority FROM r
         |WHERE rn <= ${Curation.StratSampleK} ORDER BY lang, rank""".stripMargin,
    // q184: q154's canonical chain + q111's split of the cluster
    // representative + shard hash, one (split, shard) rollup.
    "q184_export_manifest" ->
      s"""WITH $NearDupClusterCte,
         |tq AS (SELECT doc_id, n_chars, regexp_split_to_array(text, ' ') tk FROM documents),
         |sq AS (SELECT doc_id, n_chars, len(tk)::BIGINT n_tok,
         |       len(list_distinct(tk))::BIGINT n_uniq,
         |       len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in')))::BIGINT n_stop
         |       FROM tq),
         |scq AS (SELECT doc_id, n_chars,
         |        ((500 * n_uniq) // n_tok + (200 * n_stop) // n_tok
         |         + (300 * least(n_tok, 200)) // 200)::BIGINT AS score_milli FROM sq),
         |jq AS (SELECT l.doc_id, l.cluster_id, sc.n_chars, sc.score_milli
         |       FROM lbl l JOIN scq sc ON sc.doc_id = l.doc_id),
         |rq AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
         |        ORDER BY score_milli DESC, doc_id) rn FROM jq),
         |can AS (SELECT cluster_id, doc_id AS canonical_id FROM rq WHERE rn = 1),
         |spl AS (SELECT doc_id,
         |        CASE WHEN k < 980 THEN 'train' WHEN k < 990 THEN 'val'
         |             ELSE 'test' END AS split
         |        FROM (SELECT doc_id, ${H("'split:' || text")} % 1000 AS k
         |              FROM documents)),
         |m AS (SELECT s.split,
         |      (${H("'shard:' || c.canonical_id::VARCHAR")} % ${Curation.ManifestShards})::BIGINT AS shard,
         |      c.canonical_id, dch.n_chars
         |      FROM can c JOIN spl s ON s.doc_id = c.cluster_id
         |      JOIN documents dch ON dch.doc_id = c.canonical_id)
         |SELECT split, shard, count(*)::BIGINT AS n_docs,
         |  sum(n_chars)::BIGINT AS n_chars, min(canonical_id)::BIGINT AS min_doc,
         |  max(canonical_id)::BIGINT AS max_doc
         |FROM m GROUP BY 1, 2 ORDER BY split, shard""".stripMargin,
    // q185: both lower medians rank-picked; 3·MAD flags; floor pm.
    "q185_mad_outliers" ->
      """WITH t AS (SELECT lang,
        |      len(regexp_split_to_array(text, ' '))::BIGINT AS n_tok
        |      FROM documents),
        |r AS (SELECT lang, n_tok,
        |      row_number() OVER (PARTITION BY lang ORDER BY n_tok) rn,
        |      count(*) OVER (PARTITION BY lang) n FROM t),
        |med AS (SELECT lang, max(n)::BIGINT n_docs,
        |        min(CASE WHEN rn >= (n + 1) // 2 THEN n_tok END)::BIGINT med
        |        FROM r GROUP BY 1),
        |dv AS (SELECT t.lang, abs(t.n_tok - m.med) AS dev
        |       FROM t JOIN med m ON m.lang = t.lang),
        |r2 AS (SELECT lang, dev,
        |       row_number() OVER (PARTITION BY lang ORDER BY dev) rn,
        |       count(*) OVER (PARTITION BY lang) n FROM dv),
        |mad AS (SELECT lang,
        |        min(CASE WHEN rn >= (n + 1) // 2 THEN dev END)::BIGINT mad
        |        FROM r2 GROUP BY 1),
        |fl AS (SELECT t.lang,
        |       sum(CASE WHEN abs(t.n_tok - m.med) > 3 * md.mad
        |                THEN 1 ELSE 0 END)::BIGINT n_outliers
        |       FROM t JOIN med m ON m.lang = t.lang
        |            JOIN mad md ON md.lang = t.lang GROUP BY 1)
        |SELECT m.lang, m.n_docs, m.med AS median_tok, md.mad AS mad_tok,
        |  fl.n_outliers,
        |  ((1000 * fl.n_outliers) // m.n_docs)::BIGINT AS outlier_pm
        |FROM med m JOIN mad md ON md.lang = m.lang JOIN fl ON fl.lang = m.lang
        |ORDER BY m.lang""".stripMargin,
    // q171: the (lang, len-bucket) audit with the K=8 floor.
    "q171_k_anonymity" ->
      s"""WITH t AS (SELECT lang,
         |      len(regexp_split_to_array(text, ' '))::BIGINT
         |        // ${Curation.AnonBucketTokens} AS len_bucket
         |      FROM documents),
         |g AS (SELECT lang, len_bucket, count(*)::BIGINT AS n_docs
         |      FROM t GROUP BY 1, 2)
         |SELECT lang, len_bucket, n_docs,
         |  (CASE WHEN n_docs < ${Curation.AnonK} THEN 1 ELSE 0 END)::BIGINT
         |    AS suppressed,
         |  (CASE WHEN n_docs < ${Curation.AnonK} THEN 0 ELSE n_docs
         |   END)::BIGINT AS retained_docs
         |FROM g ORDER BY lang, len_bucket""".stripMargin,
    // q195: chi-square cell contributions via integer cross-
    // multiplication, HUGEINT mirror of DECIMAL(38,0).
    "q195_chisq_mix" ->
      """WITH cells AS (SELECT lang, source, count(*)::BIGINT o
        |               FROM documents GROUP BY 1, 2),
        |r AS (SELECT lang, sum(o)::BIGINT r FROM cells GROUP BY 1),
        |c AS (SELECT source, sum(o)::BIGINT c FROM cells GROUP BY 1),
        |n AS (SELECT sum(o)::BIGINT n FROM cells)
        |SELECT cells.lang, cells.source, cells.o AS n_obs,
        |       (1000 * r.r * c.c) // n.n AS exp_milli,
        |       ((1000::HUGEINT * (cells.o*n.n - r.r*c.c)
        |                       * (cells.o*n.n - r.r*c.c))
        |         // (n.n::HUGEINT * r.r * c.c))::BIGINT AS contrib_milli
        |FROM cells JOIN r USING (lang) JOIN c USING (source), n
        |ORDER BY cells.lang, cells.source""".stripMargin,
    // q217: the q134 integer quality score, source-partitioned greedy
    // prefix including the budget-crossing doc.
    "q217_token_budget" ->
      """WITH s AS (SELECT doc_id, source, len(tk)::BIGINT n_tok,
        |         len(list_distinct(tk))::BIGINT n_uniq,
        |         len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in')))::BIGINT n_stop
        |       FROM (SELECT doc_id, source, regexp_split_to_array(text, ' ') tk
        |             FROM documents)),
        |q AS (SELECT doc_id, source, n_tok,
        |        ((500 * n_uniq) // n_tok + (200 * n_stop) // n_tok
        |         + (300 * least(n_tok, 200)) // 200)::BIGINT q_milli
        |      FROM s),
        |c AS (SELECT source, n_tok, q_milli,
        |        sum(n_tok) OVER (PARTITION BY source
        |          ORDER BY q_milli DESC, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum
        |      FROM q)
        |SELECT source, count(*)::BIGINT AS n_docs_kept,
        |       sum(n_tok)::BIGINT AS tokens_kept,
        |       min(q_milli)::BIGINT AS cutoff_q_milli
        |FROM c WHERE cum - n_tok < 1000 GROUP BY 1
        |ORDER BY source""".stripMargin,
    // q218: doubled average ranks off each metric's value histogram
    // (2r = 2*before + c + 1), Pearson moments on ranks in HUGEINT,
    // sign decomposed for // vs div agreement.
    "q218_length_quality_corr" ->
      """WITH s AS (SELECT doc_id, len(tk)::BIGINT n_tok,
        |         len(list_distinct(tk))::BIGINT n_uniq,
        |         len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in')))::BIGINT n_stop
        |       FROM (SELECT doc_id, regexp_split_to_array(text, ' ') tk
        |             FROM documents)),
        |q AS (SELECT doc_id, n_tok,
        |        ((500 * n_uniq) // n_tok + (200 * n_stop) // n_tok
        |         + (300 * least(n_tok, 200)) // 200)::BIGINT q_milli
        |      FROM s),
        |hx AS (SELECT n_tok, count(*)::BIGINT c FROM q GROUP BY 1),
        |rx AS (SELECT n_tok,
        |         (2 * coalesce(sum(c) OVER (ORDER BY n_tok ROWS BETWEEN
        |            UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1)::BIGINT r
        |       FROM hx),
        |hy AS (SELECT q_milli, count(*)::BIGINT c FROM q GROUP BY 1),
        |ry AS (SELECT q_milli,
        |         (2 * coalesce(sum(c) OVER (ORDER BY q_milli ROWS BETWEEN
        |            UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1)::BIGINT r
        |       FROM hy),
        |m AS (SELECT count(*)::HUGEINT n, sum(rx.r)::HUGEINT sx,
        |        sum(ry.r)::HUGEINT sy, sum(rx.r::HUGEINT * ry.r) sxy,
        |        sum(rx.r::HUGEINT * rx.r) sxx, sum(ry.r::HUGEINT * ry.r) syy
        |      FROM q JOIN rx ON rx.n_tok = q.n_tok
        |           JOIN ry ON ry.q_milli = q.q_milli)
        |SELECT n::BIGINT AS n_docs,
        |  (CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0 THEN NULL
        |    WHEN n * sxy - sx * sy < 0
        |    THEN -((1000 * (sx * sy - n * sxy) * (sx * sy - n * sxy))
        |           // ((n * sxx - sx * sx) * (n * syy - sy * sy)))
        |    ELSE (1000 * (n * sxy - sx * sy) * (n * sxy - sx * sy))
        |         // ((n * sxx - sx * sx) * (n * syy - sy * sy))
        |   END)::BIGINT AS rho2_milli
        |FROM m""".stripMargin,
    // q219: per-source CDF on the shared corpus grid (zero-fill cross
    // join), cross-multiplied gap in HUGEINT, peak via row_number.
    "q219_source_length_drift" ->
      """WITH t AS (SELECT doc_id, source,
        |         len(regexp_split_to_array(text, ' '))::BIGINT n_tok
        |       FROM documents),
        |cells AS (SELECT source, n_tok, count(*)::BIGINT c FROM t GROUP BY 1, 2),
        |grid AS (SELECT n_tok g, sum(c)::BIGINT cc FROM cells GROUP BY 1),
        |gcum AS (SELECT g, cc, sum(cc) OVER (ORDER BY g)::BIGINT cumAll
        |         FROM grid),
        |tot AS (SELECT sum(c)::BIGINT nAll FROM cells),
        |st AS (SELECT source, sum(c)::BIGINT nS FROM cells GROUP BY 1),
        |f AS (SELECT st.source src, st.nS, gcum.g, gcum.cumAll,
        |        coalesce(cells.c, 0)::BIGINT c
        |      FROM st CROSS JOIN gcum LEFT JOIN cells
        |        ON cells.source = st.source AND cells.n_tok = gcum.g),
        |cum AS (SELECT src, nS, g, cumAll,
        |          sum(c) OVER (PARTITION BY src ORDER BY g)::BIGINT cumS
        |        FROM f),
        |gaps AS (SELECT cum.src, cum.nS, (tot.nAll - cum.nS) nR, cum.g,
        |           abs(cumS::HUGEINT * (tot.nAll - cum.nS)
        |               - (cumAll - cumS)::HUGEINT * cum.nS) gap
        |         FROM cum, tot),
        |pk AS (SELECT src, g, row_number() OVER (PARTITION BY src
        |         ORDER BY gap DESC, g) rn FROM gaps WHERE gap > 0)
        |SELECT gaps.src AS source, gaps.nS AS n_docs,
        |       ((1000 * max(gaps.gap)) // (max(gaps.nS)::HUGEINT
        |         * max(gaps.nR)))::BIGINT AS ks_pm,
        |       max(pk.g) AS peak_len
        |FROM gaps LEFT JOIN pk ON pk.src = gaps.src AND pk.rn = 1
        |GROUP BY 1, 2 ORDER BY source""".stripMargin,
    // q232: per-source length histogram, strictly-before cumulatives,
    // Δ/2 moment in HUGEINT, floored milli Gini.
    "q232_length_gini" ->
      """WITH h AS (SELECT source, n_chars v, count(*)::BIGINT c
        |      FROM documents GROUP BY 1, 2),
        |w AS (SELECT source, v, c,
        |        COALESCE(sum(c) OVER (PARTITION BY source ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cb,
        |        COALESCE(sum(c * v) OVER (PARTITION BY source ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) sb
        |      FROM h)
        |SELECT source, sum(c)::BIGINT AS n_docs,
        |       (sum(c * v) // sum(c))::BIGINT AS mean_chars,
        |       ((1000 * sum(CAST(c AS HUGEINT) * (v * cb - sb)))
        |          // (CAST(sum(c) AS HUGEINT) * sum(c * v)))::BIGINT
        |         AS gini_milli
        |FROM w GROUP BY 1 ORDER BY source""".stripMargin,
    // q261: the q134/q217 integer quality formula, even-id calibration
    // half, k = (n+1) div 10 smallest calibration score via the
    // cumulative value histogram, keep-all (NULL) when k = 0, odd-id
    // coverage. Tie/floor points identical to the Spark plan.
    "q261_conformal_quality" ->
      s"""WITH t AS (SELECT doc_id, source,
         |        regexp_split_to_array(text, ' ') tk,
         |        ${H("'cal:' || text")} % 2 = 0 AS is_cal FROM documents),
         |q AS (SELECT doc_id, source, is_cal,
         |        len(tk)::BIGINT n_tok,
         |        len(list_distinct(tk))::BIGINT n_uniq,
         |        len(list_filter(tk, x -> x IN
         |          ('the','a','of','and','is','to','in')))::BIGINT n_stop
         |      FROM t),
         |s AS (SELECT doc_id, source, is_cal,
         |        ((500 * n_uniq) // n_tok + (200 * n_stop) // n_tok
         |         + (300 * least(n_tok, 200)) // 200)::BIGINT q_milli
         |      FROM q),
        |h AS (SELECT source, q_milli, count(*)::BIGINT c FROM s
        |      WHERE is_cal GROUP BY 1, 2),
        |cu AS (SELECT source, q_milli, c,
        |        sum(c) OVER (PARTITION BY source ORDER BY q_milli)::BIGINT cum,
        |        sum(c) OVER (PARTITION BY source)::BIGINT n_cal
        |      FROM h),
        |thr AS (SELECT source, max(n_cal)::BIGINT n_cal,
        |        min(CASE WHEN (n_cal + 1) // 10 > 0
        |                  AND cum >= (n_cal + 1) // 10
        |                 THEN q_milli END)::BIGINT thr_milli
        |      FROM cu GROUP BY 1)
        |SELECT s.source, coalesce(max(thr.n_cal), 0)::BIGINT AS n_cal,
        |  count(*)::BIGINT AS n_test,
        |  max(thr.thr_milli)::BIGINT AS thr_milli,
        |  ((1000 * sum(CASE WHEN thr.thr_milli IS NULL
        |                     OR s.q_milli >= thr.thr_milli
        |                    THEN 1 ELSE 0 END)) // count(*))::BIGINT
        |    AS coverage_pm
        |FROM s LEFT JOIN thr ON thr.source = s.source
        |WHERE NOT s.is_cal
        |GROUP BY s.source ORDER BY s.source""".stripMargin,
    // q271: salted polyhash order, shard = h mod S, per-shard lag
    // adjacency, Simpson baseline in HUGEINT.
    "q271_interleave_audit" -> {
      val s = Curation.InterleaveShards
      s"""WITH dd AS (SELECT doc_id, source,
         |        ${H("'interleave42:' || text")} AS h FROM documents),
         |sd AS (SELECT doc_id, source, h, h % $s AS shard FROM dd),
         |lg AS (SELECT shard, source, lag(source) OVER
         |        (PARTITION BY shard ORDER BY h, doc_id) prev FROM sd),
         |aj AS (SELECT shard, count(*)::BIGINT n_docs,
         |        sum(CASE WHEN prev = source THEN 1 ELSE 0 END)::BIGINT
         |          n_adj_same
         |      FROM lg GROUP BY shard),
         |bs AS (SELECT ((1000 * sum(ns::HUGEINT * ns)) //
         |        (sum(ns)::HUGEINT * sum(ns)))::BIGINT expected_pm
         |      FROM (SELECT count(*)::BIGINT ns FROM documents
         |            GROUP BY source))
         |SELECT shard::BIGINT AS shard, n_docs, n_adj_same,
         |       ((1000 * n_adj_same) // (n_docs - 1))::BIGINT AS rate_pm,
         |       expected_pm
         |FROM aj, bs ORDER BY shard""".stripMargin
    },
    // q287: the q49 closure verbatim + token inventory, per-doc
    // (1000·nt)//cluster_n effective supply, the q157 corrected-isqrt
    // weight replay, 1-row weight total.
    "q287_effective_mixture" ->
      s"""WITH $NearDupClusterCte,
         |inv AS (SELECT d.source, d.doc_id,
         |      len(regexp_split_to_array(d.text, ' '))::BIGINT nt,
         |      cn.cluster_n
         |      FROM documents d JOIN lbl l ON l.doc_id = d.doc_id
         |      JOIN cn ON cn.cluster_id = l.cluster_id),
         |ag AS (SELECT source, sum(nt)::BIGINT raw_tokens,
         |      sum((1000 * nt) // cluster_n)::BIGINT eff_milli
         |      FROM inv GROUP BY 1),
         |e2 AS (SELECT source, raw_tokens, eff_milli,
         |      (eff_milli // 1000)::BIGINT eff_tokens FROM ag),
         |w0 AS (SELECT *, floor(sqrt(eff_tokens::DOUBLE))::BIGINT s0 FROM e2),
         |w1 AS (SELECT *, CASE WHEN s0 * s0 > eff_tokens THEN s0 - 1
         |      ELSE s0 END s1 FROM w0),
         |wt AS (SELECT source, raw_tokens, eff_tokens, eff_milli,
         |      CASE WHEN (s1 + 1) * (s1 + 1) <= eff_tokens THEN s1 + 1
         |      ELSE s1 END w FROM w1),
         |twt AS (SELECT sum(w)::BIGINT tw FROM wt)
         |SELECT source, raw_tokens, eff_tokens,
         |       (eff_milli // raw_tokens)::BIGINT AS discount_pm,
         |       w::BIGINT AS weight,
         |       ((1000 * w) // tw)::BIGINT AS share_pm
         |FROM wt, twt ORDER BY source""".stripMargin,
    // q310: the q171 grouping with source as the sensitive attribute;
    // the (group x source) grid completed by a bounded cross join so
    // missing cells contribute their full corpus mass to t.
    "q310_l_diversity" ->
      s"""WITH c0 AS (SELECT lang,
         |      len(regexp_split_to_array(text, ' '))::BIGINT
         |        // ${Curation.AnonBucketTokens} AS len_bucket,
         |      source FROM documents),
         |cl AS (SELECT lang, len_bucket, source, count(*)::BIGINT n_gs
         |      FROM c0 GROUP BY 1, 2, 3),
         |g AS (SELECT lang, len_bucket, sum(n_gs)::BIGINT n_docs,
         |      count(*)::BIGINT l_distinct, max(n_gs)::BIGINT modal_n
         |      FROM cl GROUP BY 1, 2),
         |s AS (SELECT source, sum(n_gs)::BIGINT n_s FROM cl GROUP BY 1),
         |tt AS (SELECT sum(n_s)::BIGINT n_corpus FROM s),
         |grid AS (SELECT g.lang, g.len_bucket, g.n_docs, s.source, s.n_s,
         |      coalesce(cl.n_gs, 0)::BIGINT n_gs
         |      FROM g CROSS JOIN s
         |      LEFT JOIN cl ON cl.lang = g.lang
         |        AND cl.len_bucket = g.len_bucket AND cl.source = s.source),
         |tn AS (SELECT lang, len_bucket,
         |      sum(abs(n_gs * tt.n_corpus - n_s * n_docs))::BIGINT t_num,
         |      max(tt.n_corpus)::BIGINT n_corpus
         |      FROM grid, tt GROUP BY 1, 2)
         |SELECT g.lang, g.len_bucket, g.n_docs, g.l_distinct,
         |  ((1000 * modal_n) // n_docs)::BIGINT AS modal_share_pm,
         |  ((1000 * t_num) // (2 * n_docs * tn.n_corpus))::BIGINT AS t_pm,
         |  (CASE WHEN n_docs < ${Curation.AnonK} THEN 1 ELSE 0 END)::BIGINT
         |    AS k_suppressed,
         |  (CASE WHEN l_distinct < ${Curation.LDiversityL} THEN 1 ELSE 0
         |   END)::BIGINT AS l_low
         |FROM g JOIN tn ON tn.lang = g.lang AND tn.len_bucket = g.len_bucket
         |ORDER BY g.lang, g.len_bucket""".stripMargin,
    // q313: the q129 weight chain + source join + HUGEINT Kish rollup.
    "q313_importance_ess" ->
      s"""WITH t AS (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) AS w
         |           FROM documents),
         |tb AS (SELECT doc_id, ${H("w")} % 1024 AS b FROM t),
         |bc AS (SELECT b, count(*) FILTER (doc_id % 97 = 0)::BIGINT AS tb,
         |              count(*) FILTER (doc_id % 97 != 0)::BIGINT AS rb
         |       FROM tb GROUP BY 1),
         |st AS (SELECT sum(tb)::BIGINT AS tt, sum(rb)::BIGINT AS rt FROM bc),
         |wt AS (SELECT b, ((1000::HUGEINT * (tb + 1) * (rt + 1024))
         |                   // ((rb + 1)::HUGEINT * (tt + 1024)))::BIGINT AS wm
         |       FROM bc, st),
         |af AS (SELECT tb.doc_id, (sum(wm) // count(*))::BIGINT w
         |       FROM tb JOIN wt ON wt.b = tb.b WHERE tb.doc_id % 97 != 0
         |       GROUP BY tb.doc_id),
         |j AS (SELECT d.source, af.w FROM af
         |      JOIN documents d ON d.doc_id = af.doc_id),
         |g AS (SELECT source, count(*)::BIGINT n_docs, sum(w)::BIGINT sw,
         |      sum(w::HUGEINT * w) sww, max(w)::BIGINT w_max
         |      FROM j GROUP BY 1)
         |SELECT source, n_docs, sw, w_max,
         |  ((1000 * sw::HUGEINT * sw) // (n_docs::HUGEINT * sww))::BIGINT
         |    AS ess_pm,
         |  ((1000 * w_max) // sw)::BIGINT AS max_share_pm
         |FROM g ORDER BY source""".stripMargin,
  )
}
