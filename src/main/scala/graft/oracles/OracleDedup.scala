package graft
package oracles

/** DuckDB oracle SQL — exact/MinHash/SimHash dedup and cluster economics.
  *
  * Split from SparkEntry.oracleSql (round 12): entry text is verbatim;
  * SparkEntry remains the single-source registry and concatenates the
  * family maps. RegistrationGateSpec enforces key-set equality with
  * `queries`, and the split was verified by a byte-identical
  * oracle_sql.json dump before/after. */
private[graft] object OracleDedup {
  import graft.SparkEntryOracleUtil._
  private lazy val MinhashCandCte: String =
    s"""t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
       |sh AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+2], ' ')")} AS h
       |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i FROM t)),
       |mh AS (SELECT doc_id, j, min(((2*j + 1) * h + 12345 + 7919*j) % 1000000007) m
       |       FROM sh, generate_series(0, 15) g(j) GROUP BY doc_id, j),
       |bands AS (SELECT doc_id, j // 4 AS b,
       |          list_reduce(list_prepend(0::BIGINT, list(m ORDER BY j)),
       |                      (acc, x) -> (acc * 131 + x) % 1000000007) AS key
       |          FROM mh GROUP BY doc_id, j // 4),
       |cand AS (SELECT DISTINCT x.doc_id da, y.doc_id db FROM bands x JOIN bands y
       |         ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id),
       |sz AS (SELECT doc_id, count(*) sz FROM sh GROUP BY doc_id)""".stripMargin

  /** Shared q270/q344 chain: the q23 verified-minhash pair set, the
    * q24 simhash pair set, and their full-outer agreement
    * categorization `pr` — extracted so the agreement TABLE (q270)
    * and the McNemar TEST on it (q344) can never drift. */

  private lazy val MethodAgreementCte: String =
    s"""cmc AS (SELECT da, db, count(*) cm FROM cand
       |      JOIN sh p ON p.doc_id = da
       |      JOIN sh q ON q.doc_id = db AND q.h = p.h
       |      GROUP BY da, db),
       |mhp AS MATERIALIZED (SELECT da, db FROM cmc
       |      JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
       |      WHERE cm / (x.sz + y.sz - cm) >= 0.5),
       |th AS (SELECT doc_id, ${H("tok")} AS h FROM
       |  (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) tok
       |   FROM documents)),
       |bits AS (SELECT doc_id, i,
       |        CASE WHEN sum(((h // (1::BIGINT << i)) % 2) * 2 - 1) > 0
       |             THEN (1::BIGINT << i) ELSE 0 END v
       |        FROM th, generate_series(0, 31) g(i) GROUP BY doc_id, i),
       |sig AS (SELECT doc_id, sum(v)::BIGINT s FROM bits GROUP BY doc_id),
       |shp AS MATERIALIZED (SELECT a.doc_id da, b.doc_id db
       |      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |      WHERE bit_count(xor(a.s, b.s)) <= 6),
       |pr AS MATERIALIZED (SELECT coalesce(m.da, s.da) doc_a,
       |        coalesce(m.db, s.db) doc_b,
       |        CASE WHEN m.da IS NOT NULL AND s.da IS NOT NULL THEN 'both'
       |             WHEN m.da IS NOT NULL THEN 'minhash_only'
       |             ELSE 'simhash_only' END cat
       |      FROM mhp m FULL JOIN shp s ON s.da = m.da AND s.db = m.db)""".stripMargin

  /** q148 oracle — the naive-Bayes held-out classification. ONE
    * definition, shared verbatim by q209's confusion matrix (the
    * confusion must grade exactly the predictions the driver checks —
    * the q44/q67 shared-oracle rule). */
  val sql: Map[String, String] = Map(
    "q21_dedup_exact" ->
      """SELECT keep_id, n_copies FROM (
        |  SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |  FROM documents GROUP BY lower(text))
        |ORDER BY keep_id""".stripMargin,
    "q22_dedup_ngram_jaccard" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i FROM t)),
         |sz AS (SELECT doc_id, count(*) sz FROM sh GROUP BY doc_id),
         |cm AS (SELECT a.doc_id da, b.doc_id db, count(*) cm
         |       FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT da AS doc_a, db AS doc_b, round(cm / (x.sz + y.sz - cm), 6) AS jaccard
         |FROM cm JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
         |WHERE cm / (x.sz + y.sz - cm) >= 0.6
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q46_dedup_jaccard_prefix" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i FROM t)),
         |sz AS (SELECT doc_id, count(*) sz FROM sh GROUP BY doc_id),
         |cm AS (SELECT a.doc_id da, b.doc_id db, count(*) cm
         |       FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT da AS doc_a, db AS doc_b, round(cm / (x.sz + y.sz - cm), 6) AS jaccard
         |FROM cm JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
         |WHERE cm / (x.sz + y.sz - cm) >= 0.6
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q23_dedup_minhash_lsh" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i FROM t)),
         |mh AS (SELECT doc_id, j, min(((2*j + 1) * h + 12345 + 7919*j) % 1000000007) m
         |       FROM sh, generate_series(0, 15) g(j) GROUP BY doc_id, j),
         |bands AS (SELECT doc_id, j // 4 AS b,
         |          list_reduce(list_prepend(0::BIGINT, list(m ORDER BY j)),
         |                      (acc, x) -> (acc * 131 + x) % 1000000007) AS key
         |          FROM mh GROUP BY doc_id, j // 4),
         |cand AS (SELECT DISTINCT x.doc_id da, y.doc_id db FROM bands x JOIN bands y
         |         ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id),
         |cm AS (SELECT da, db, count(*) cm FROM cand
         |       JOIN sh p ON p.doc_id = da JOIN sh q ON q.doc_id = db AND q.h = p.h
         |       GROUP BY da, db),
         |sz AS (SELECT doc_id, count(*) sz FROM sh GROUP BY doc_id)
         |SELECT da AS doc_a, db AS doc_b, round(cm / (x.sz + y.sz - cm), 6) AS jaccard
         |FROM cm JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
         |WHERE cm / (x.sz + y.sz - cm) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    // q23's pair pipeline, then WITH RECURSIVE transitive closure from
    // every doc; component label = min reachable doc_id (incl. self)
    "q49_dedup_clusters" ->
      s"""WITH $NearDupClusterCte
         |SELECT l.doc_id, l.cluster_id, cn.cluster_n
         |FROM lbl l JOIN cn ON cn.cluster_id = l.cluster_id
         |ORDER BY l.doc_id""".stripMargin,
    "q55_decontaminate" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+3], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 3)) i FROM t)),
         |ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % 97 = 0)
         |SELECT s.doc_id, count(*) AS n_shared
         |FROM sh s JOIN ev ON ev.h = s.h WHERE s.doc_id % 97 != 0
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    "q123_verbatim_overlap_capped" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |g0 AS (SELECT doc_id, i - 1 AS pos, ${H("array_to_string(tk[i:i+7], ' ')")} AS h
         |      FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) i FROM t)),
         |keep AS (SELECT h FROM g0 GROUP BY h HAVING count(*) <= 16),
         |g AS (SELECT g0.* FROM g0 JOIN keep USING (h)),
         |m AS (SELECT a.doc_id doc_a, b.doc_id doc_b, a.pos pa, a.pos - b.pos AS diag
         |      FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id),
         |r AS (SELECT doc_a, doc_b, diag,
         |      pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS grp
         |      FROM m),
         |agg AS (SELECT doc_a, doc_b, diag, grp, count(*) AS run
         |        FROM r GROUP BY doc_a, doc_b, diag, grp)
         |SELECT doc_a, doc_b, count(*) AS n_regions, max(run)::BIGINT AS max_run,
         |       (max(run) + 7)::BIGINT AS span_tokens
         |FROM agg GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b""".stripMargin,
    "q109_verbatim_overlap" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |g AS (SELECT doc_id, i - 1 AS pos, ${H("array_to_string(tk[i:i+7], ' ')")} AS h
         |      FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) i FROM t)),
         |m AS (SELECT a.doc_id doc_a, b.doc_id doc_b, a.pos pa, a.pos - b.pos AS diag
         |      FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id),
         |r AS (SELECT doc_a, doc_b, diag,
         |      pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS grp
         |      FROM m),
         |agg AS (SELECT doc_a, doc_b, diag, grp, count(*) AS run
         |        FROM r GROUP BY doc_a, doc_b, diag, grp)
         |SELECT doc_a, doc_b, count(*) AS n_regions, max(run)::BIGINT AS max_run,
         |       (max(run) + 7)::BIGINT AS span_tokens
         |FROM agg GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b""".stripMargin,
    "q132_dup_spans" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |g AS (SELECT doc_id, i - 1 AS pos, ${H("array_to_string(tk[i:i+7], ' ')")} AS h
         |      FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) i FROM t)),
         |dup AS (SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
         |hit AS (SELECT g.doc_id, g.pos FROM g JOIN dup ON g.h = dup.h),
         |r AS (SELECT doc_id, pos,
         |      pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM hit)
         |SELECT doc_id, min(pos)::BIGINT AS span_start, count(*)::BIGINT AS n_grams,
         |       (count(*) + 7)::BIGINT AS span_tokens
         |FROM r GROUP BY doc_id, grp ORDER BY doc_id, span_start""".stripMargin,
    // SemDeDup oracle: the same Lloyd cell chain as q33, then the
    // within-cell cosine prune with the min-partner representative.
    "q115_sem_dedup" ->
      """WITH q AS (SELECT vec_id, i::BIGINT - 1 AS pos,
        |             floor(embedding[i]::DOUBLE * 1000000)::BIGINT AS vm
        |           FROM (SELECT vec_id, embedding,
        |                 unnest(generate_series(1, len(embedding))) i FROM embeddings)),
        |seeds AS (SELECT vec_id, (row_number() OVER (ORDER BY vec_id) - 1)::BIGINT AS cid
        |          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
        |c0 AS (SELECT s.cid, q.pos, q.vm AS cm FROM q JOIN seeds s ON s.vec_id = q.vec_id),
        |e1 AS (SELECT q.vec_id, c.cid, sum((q.vm - c.cm) * (q.vm - c.cm))::BIGINT AS d2
        |       FROM q JOIN c0 c ON c.pos = q.pos GROUP BY 1, 2),
        |a1 AS (SELECT vec_id, cid FROM (
        |         SELECT vec_id, cid,
        |                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) rn
        |         FROM e1) WHERE rn = 1),
        |c1 AS (SELECT a.cid, q.pos, floor(sum(q.vm) / count(*))::BIGINT AS cm
        |       FROM q JOIN a1 a ON a.vec_id = q.vec_id GROUP BY 1, 2),
        |e2 AS (SELECT q.vec_id, c.cid, sum((q.vm - c.cm) * (q.vm - c.cm))::BIGINT AS d2
        |       FROM q JOIN c1 c ON c.pos = q.pos GROUP BY 1, 2),
        |a2 AS (SELECT vec_id, cid FROM (
        |         SELECT vec_id, cid,
        |                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) rn
        |         FROM e2) WHERE rn = 1),
        |e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        |pr AS (SELECT b.vec_id, b.cid AS cell, a.vec_id AS partner,
        |       list_dot_product(ae.v, be.v)
        |       / sqrt(list_dot_product(ae.v, ae.v) * list_dot_product(be.v, be.v)) c
        |       FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id
        |       JOIN e ae ON ae.vec_id = a.vec_id JOIN e be ON be.vec_id = b.vec_id),
        |sel AS (SELECT vec_id, cell, partner, round(c, 6) AS cosine,
        |        row_number() OVER (PARTITION BY vec_id
        |                           ORDER BY partner, round(c, 6)) rn
        |        FROM pr WHERE c >= 0.4)
        |SELECT vec_id, cell::INTEGER AS cell, partner AS dup_of, cosine
        |FROM sel WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    "q138_containment_pairs" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i FROM t)),
         |sz AS (SELECT doc_id, count(*)::BIGINT sz FROM sh GROUP BY doc_id),
         |cm AS (SELECT a.doc_id da, b.doc_id db, count(*)::BIGINT cm
         |       FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT da AS doc_a, db AS doc_b, cm, x.sz AS sa, y.sz AS sb,
         |       ((1000 * cm) // least(x.sz, y.sz))::BIGINT AS containment_permille,
         |       ((1000 * cm) // (x.sz + y.sz - cm))::BIGINT AS jaccard_permille
         |FROM cm JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
         |WHERE (1000 * cm) // least(x.sz, y.sz) >= 800
         |ORDER BY doc_a, doc_b""".stripMargin,
    // q138 with the df cap replayed: stop-shingles (df > 64) leave the
    // index before the pair join; sizes stay UNCAPPED (the denominator
    // is the doc's true shingle count, matching Dedup.containmentPairsDf)
    "q142_containment_capped" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |sh0 AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |        FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i FROM t)),
         |keep AS (SELECT h FROM sh0 GROUP BY h HAVING count(*) <= ${Dedup.ContainDfCap}),
         |sh AS (SELECT sh0.doc_id, sh0.h FROM sh0 JOIN keep USING (h)),
         |sz AS (SELECT doc_id, count(*)::BIGINT sz FROM sh0 GROUP BY doc_id),
         |cm AS (SELECT a.doc_id da, b.doc_id db, count(*)::BIGINT cm
         |       FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT da AS doc_a, db AS doc_b, cm, x.sz AS sa, y.sz AS sb,
         |       ((1000 * cm) // least(x.sz, y.sz))::BIGINT AS containment_permille,
         |       ((1000 * cm) // (x.sz + y.sz - cm))::BIGINT AS jaccard_permille
         |FROM cm JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
         |WHERE (1000 * cm) // least(x.sz, y.sz) >= 800
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q139_contam_radius" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i FROM t)
         |       WHERE doc_id % 97 != 0),
         |mh AS (SELECT doc_id, j, min(((2*j + 1) * h + 12345 + 7919*j) % 1000000007) m
         |       FROM sh, generate_series(0, 15) g(j) GROUP BY doc_id, j),
         |bands AS (SELECT doc_id, j // 4 AS b,
         |          list_reduce(list_prepend(0::BIGINT, list(m ORDER BY j)),
         |                      (acc, x) -> (acc * 131 + x) % 1000000007) AS key
         |          FROM mh GROUP BY doc_id, j // 4),
         |cand AS (SELECT DISTINCT x.doc_id da, y.doc_id db FROM bands x JOIN bands y
         |         ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id),
         |cm AS (SELECT da, db, count(*) cm FROM cand
         |       JOIN sh p ON p.doc_id = da JOIN sh q ON q.doc_id = db AND q.h = p.h
         |       GROUP BY da, db),
         |sz AS (SELECT doc_id, count(*) sz FROM sh GROUP BY doc_id),
         |pairs AS (SELECT da, db FROM cm JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
         |          WHERE cm / (x.sz + y.sz - cm) >= 0.5),
         |edges AS (SELECT da s, db t2 FROM pairs UNION ALL SELECT db, da FROM pairs),
         |sh4 AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+3], ' ')")} AS h
         |        FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 3)) i FROM t)),
         |ev AS (SELECT DISTINCT h FROM sh4 WHERE doc_id % 97 = 0),
         |h0 AS (SELECT DISTINCT s.doc_id FROM sh4 s JOIN ev ON ev.h = s.h
         |       WHERE s.doc_id % 97 != 0),
         |h1 AS (SELECT DISTINCT e.t2 AS doc_id FROM h0 JOIN edges e ON e.s = h0.doc_id
         |       WHERE e.t2 NOT IN (SELECT doc_id FROM h0)),
         |h2 AS (SELECT DISTINCT e.t2 AS doc_id FROM h1 JOIN edges e ON e.s = h1.doc_id
         |       WHERE e.t2 NOT IN (SELECT doc_id FROM h0)
         |         AND e.t2 NOT IN (SELECT doc_id FROM h1))
         |SELECT doc_id, 0::BIGINT AS hops FROM h0
         |UNION ALL SELECT doc_id, 1::BIGINT AS hops FROM h1
         |UNION ALL SELECT doc_id, 2::BIGINT AS hops FROM h2
         |ORDER BY doc_id""".stripMargin,
    "q121_cdc_chunk_dups" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |tok AS (SELECT doc_id, i::BIGINT - 1 AS i, tk[i] AS w
         |        FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk))) i FROM t)),
         |sh AS (SELECT doc_id, i::BIGINT - 1 AS p,
         |       ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i FROM t)),
         |bnd AS (SELECT doc_id, p FROM sh WHERE p >= 1 AND h % 8 = 0),
         |mk AS (SELECT tok.doc_id, tok.i, tok.w,
         |       CASE WHEN bnd.p IS NULL THEN 0 ELSE 1 END AS b
         |       FROM tok LEFT JOIN bnd ON bnd.doc_id = tok.doc_id AND bnd.p = tok.i),
         |ch AS (SELECT doc_id, i, w,
         |       sum(b) OVER (PARTITION BY doc_id ORDER BY i)::BIGINT AS chunk_id FROM mk),
         |cg AS (SELECT doc_id, chunk_id,
         |       ${H("string_agg(w, ' ' ORDER BY i)")} AS chunk_hash,
         |       count(*)::BIGINT AS n_tok FROM ch GROUP BY 1, 2)
         |SELECT chunk_hash, min(n_tok)::BIGINT AS n_tok,
         |       count(DISTINCT doc_id)::BIGINT AS n_docs, count(*)::BIGINT AS n_occ
         |FROM cg GROUP BY chunk_hash HAVING count(*) >= 2
         |ORDER BY chunk_hash""".stripMargin,
    "q112_decon_suites" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+3], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 3)) i FROM t)),
         |ev AS (SELECT DISTINCT (doc_id // 97) % 3 AS suite, h FROM sh WHERE doc_id % 97 = 0)
         |SELECT s.doc_id,
         |  count(*) FILTER (ev.suite = 0) AS n_suite0,
         |  count(*) FILTER (ev.suite = 1) AS n_suite1,
         |  count(*) FILTER (ev.suite = 2) AS n_suite2,
         |  count(DISTINCT ev.suite) AS n_suites
         |FROM sh s JOIN ev ON ev.h = s.h WHERE s.doc_id % 97 != 0
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    "q107_contam_spans" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |sh AS (SELECT doc_id, i - 1 AS pos, ${H("array_to_string(tk[i:i+3], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 3)) i FROM t)),
         |ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % 97 = 0),
         |hits AS (SELECT s.doc_id, s.pos FROM sh s JOIN ev ON ev.h = s.h
         |         WHERE s.doc_id % 97 != 0),
         |runs AS (SELECT doc_id,
         |         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |         FROM hits),
         |agg AS (SELECT doc_id, grp, count(*) AS run FROM runs GROUP BY doc_id, grp)
         |SELECT doc_id, count(*) AS n_spans, max(run)::BIGINT AS max_run,
         |       (max(run) + 3)::BIGINT AS span_tokens
         |FROM agg GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q56_ingest_dedup" ->
      s"""WITH t AS (SELECT doc_id, lang, substr(source, 4)::INT >= 15 AS is_new,
         |           regexp_split_to_array(text, ' ') tk, lower(text) lt FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i FROM t)),
         |mh AS (SELECT doc_id, j, min(((2*j + 1) * h + 12345 + 7919*j) % 1000000007) m
         |       FROM sh, generate_series(0, 15) g(j) GROUP BY doc_id, j),
         |bands AS (SELECT doc_id, j // 4 AS b,
         |          list_reduce(list_prepend(0::BIGINT, list(m ORDER BY j)),
         |                      (acc, x) -> (acc * 131 + x) % 1000000007) AS key
         |          FROM mh GROUP BY doc_id, j // 4),
         |cand AS (SELECT DISTINCT x.doc_id did, y.doc_id cid
         |         FROM bands x JOIN bands y ON x.b = y.b AND x.key = y.key
         |         JOIN t tx ON tx.doc_id = x.doc_id
         |         JOIN t ty ON ty.doc_id = y.doc_id
         |         WHERE tx.is_new AND NOT ty.is_new),
         |cm AS (SELECT did, cid, count(*) cm FROM cand
         |       JOIN sh p ON p.doc_id = did JOIN sh q ON q.doc_id = cid AND q.h = p.h
         |       GROUP BY did, cid),
         |sz AS (SELECT doc_id, count(*) sz FROM sh GROUP BY doc_id),
         |nd AS (SELECT DISTINCT did FROM cm JOIN sz x ON x.doc_id = did
         |       JOIN sz y ON y.doc_id = cid
         |       WHERE cm / (x.sz + y.sz - cm) >= 0.5),
         |ex AS (SELECT DISTINCT a.doc_id FROM t a JOIN t b ON a.lt = b.lt
         |       AND NOT b.is_new WHERE a.is_new)
         |SELECT doc_id, lang FROM t WHERE is_new
         |  AND doc_id NOT IN (SELECT did FROM nd)
         |  AND doc_id NOT IN (SELECT doc_id FROM ex)
         |ORDER BY doc_id""".stripMargin,
    // q106: splitmix64 mix replayed exactly — UBIGINT carries the
    // unsigned 64-bit state (xor/logical-shift are native); the two
    // wrapping multiplications split multiplier and state into 32-bit
    // halves so every product stays under 2^64 and the mod-2^64 sum
    // runs in HUGEINT: (a*b) mod 2^64 = al*bl + 2^32*((al*bh + ah*bl)
    // mod 2^32). Constants are splitmix64's published mixers
    // (0x9e3779b97f4a7c15; 0xbf58476d1ce4e5b9 = 3210233709·2^32 +
    // 484763065; 0x94d049bb133111eb = 2496678331·2^32 + 321982955).
    // Votes/pack/pairing are q24's oracle at 64-bit width; the unsigned
    // signature maps to Spark's signed Long by subtracting 2^64 ≥ 2^63.
    "q106_dedup_simhash64" ->
      s"""WITH th AS (SELECT doc_id, ${H("tok")}::UBIGINT AS h FROM
         |  (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) tok FROM documents)),
         |m0 AS (SELECT doc_id, ((h::HUGEINT + 11400714819323198485) % 18446744073709551616)::UBIGINT z FROM th),
         |m1 AS (SELECT doc_id, xor(z, z >> 30) z FROM m0),
         |m2 AS (SELECT doc_id, (((z % 4294967296)::HUGEINT * 484763065
         |        + 4294967296::HUGEINT * ((((z % 4294967296)::HUGEINT * 3210233709
         |                                   + (z // 4294967296)::HUGEINT * 484763065) % 4294967296))
         |       ) % 18446744073709551616)::UBIGINT z FROM m1),
         |m3 AS (SELECT doc_id, xor(z, z >> 27) z FROM m2),
         |m4 AS (SELECT doc_id, (((z % 4294967296)::HUGEINT * 321982955
         |        + 4294967296::HUGEINT * ((((z % 4294967296)::HUGEINT * 2496678331
         |                                   + (z // 4294967296)::HUGEINT * 321982955) % 4294967296))
         |       ) % 18446744073709551616)::UBIGINT z FROM m3),
         |m5 AS (SELECT doc_id, xor(z, z >> 31) z FROM m4),
         |bits AS (SELECT doc_id, i,
         |         CASE WHEN sum(((z >> i) & 1)::BIGINT * 2 - 1) > 0
         |              THEN (1::UBIGINT << i) ELSE 0::UBIGINT END v
         |         FROM m5, generate_series(0, 63) g(i) GROUP BY doc_id, i),
         |sig AS (SELECT doc_id,
         |        (CASE WHEN sum(v::HUGEINT) >= 9223372036854775808
         |              THEN sum(v::HUGEINT) - 18446744073709551616
         |              ELSE sum(v::HUGEINT) END)::BIGINT s
         |        FROM bits GROUP BY doc_id)
         |SELECT a.doc_id doc_a, b.doc_id doc_b, bit_count(xor(a.s, b.s))::BIGINT AS dist
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.s, b.s)) <= 6
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q24_dedup_simhash" ->
      s"""WITH th AS (SELECT doc_id, ${H("tok")} AS h FROM
         |  (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) tok FROM documents)),
         |bits AS (SELECT doc_id, i,
         |         CASE WHEN sum(((h // (1::BIGINT << i)) % 2) * 2 - 1) > 0
         |              THEN (1::BIGINT << i) ELSE 0 END v
         |         FROM th, generate_series(0, 31) g(i) GROUP BY doc_id, i),
         |sig AS (SELECT doc_id, sum(v)::BIGINT s FROM bits GROUP BY doc_id)
         |SELECT a.doc_id doc_a, b.doc_id doc_b, bit_count(xor(a.s, b.s))::BIGINT AS dist
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.s, b.s)) <= 6
         |ORDER BY doc_a, doc_b""".stripMargin,
    // candidates = pairs sharing ≥1 of the 4 deterministic LSH buckets
    // (identical plane arithmetic to q27), verified by exact cosine —
    // the oracle reproduces the blocking so the result hash-checks
    "q25_dedup_embedding_cosine" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        |sig AS (SELECT vec_id, t,
        |  list_sum(list_transform(generate_series(0, 3), r ->
        |    CASE WHEN list_sum(list_transform(generate_series(0, 63), i ->
        |      (CASE WHEN ((((t*4 + r)*64 + i) * 2654435761) & 65536) != 0
        |            THEN 1.0 ELSE -1.0 END) * v[i + 1])) > 0
        |    THEN (1::BIGINT << r) ELSE 0 END))::BIGINT AS bucket
        |  FROM e, generate_series(0, 3) g(t)),
        |cand AS (SELECT DISTINCT a.vec_id va, b.vec_id vb
        |         FROM sig a JOIN sig b
        |         ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
        |SELECT va AS vec_a, vb AS vec_b,
        |  round(list_dot_product(x.v, y.v)
        |        / sqrt(list_dot_product(x.v, x.v) * list_dot_product(y.v, y.v)), 6) AS cosine
        |FROM cand JOIN e x ON x.vec_id = va JOIN e y ON y.vec_id = vb
        |WHERE list_dot_product(x.v, y.v)
        |      / sqrt(list_dot_product(x.v, x.v) * list_dot_product(y.v, y.v)) >= 0.4
        |ORDER BY vec_a, vec_b""".stripMargin,
    // q145: chunk rows via unnest(generate_series), keeper = min packed
    // (doc_id, chunk_idx) per chunk hash — mirrors Dedup.chunkDedup.
    "q145_chunk_dedup" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |x AS (SELECT doc_id, tk,
         |      unnest(generate_series(0, (len(tk) + 15) // 16 - 1)) AS cidx FROM t),
         |c AS (SELECT doc_id, cidx,
         |      len(tk[cidx*16+1 : cidx*16+16])::BIGINT AS ctok,
         |      ${H("array_to_string(tk[cidx*16+1 : cidx*16+16], ' ')")} AS h,
         |      doc_id * 1048576 + cidx AS ckey FROM x),
         |k AS (SELECT h, min(ckey) AS keep_key FROM c GROUP BY h)
         |SELECT c.doc_id, count(*)::BIGINT AS n_chunks,
         |  sum(CASE WHEN ckey = keep_key THEN 1 ELSE 0 END)::BIGINT AS kept_chunks,
         |  (count(*) - sum(CASE WHEN ckey = keep_key THEN 1 ELSE 0 END))::BIGINT AS dup_chunks,
         |  sum(ctok)::BIGINT AS n_tokens,
         |  sum(CASE WHEN ckey = keep_key THEN ctok ELSE 0 END)::BIGINT AS kept_tokens
         |FROM c JOIN k USING (h)
         |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    // q149: distinct 8-gram sets (q31's gram unit), first holder =
    // min doc_id per hash — mirrors Dedup.docNovelty.
    "q149_doc_novelty" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |g AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+7], ' ')")} AS h
         |      FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) i FROM t)),
         |f AS (SELECT h, min(doc_id) AS first_doc FROM g GROUP BY h)
         |SELECT g.doc_id, count(*)::BIGINT AS n_grams,
         |  sum(CASE WHEN first_doc = g.doc_id THEN 1 ELSE 0 END)::BIGINT AS n_novel,
         |  ((1000 * sum(CASE WHEN first_doc = g.doc_id THEN 1 ELSE 0 END))
         |   // count(*))::BIGINT AS novelty_permille
         |FROM g JOIN f USING (h)
         |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    // q150: distinct (source, chunk-hash) before the pair join; a
    // chunk in > 16 sources leaves the index (boilerplate cap).
    "q150_cross_source_dup" ->
      s"""WITH t AS (SELECT doc_id, source, regexp_split_to_array(text, ' ') tk
         |           FROM documents),
         |x AS (SELECT doc_id, source, tk,
         |      unnest(generate_series(0, (len(tk) + 15) // 16 - 1)) AS cidx FROM t),
         |c AS (SELECT DISTINCT source,
         |      ${H("array_to_string(tk[cidx*16+1 : cidx*16+16], ' ')")} AS h FROM x),
         |ps AS (SELECT source, count(*)::BIGINT sz FROM c GROUP BY source),
         |keep AS (SELECT h FROM c GROUP BY h HAVING count(*) <= 16),
         |cc AS (SELECT c.source, c.h FROM c JOIN keep USING (h)),
         |sh AS (SELECT a.source src_a, b.source src_b, count(*)::BIGINT shared_chunks
         |       FROM cc a JOIN cc b ON a.h = b.h AND a.source < b.source
         |       GROUP BY 1, 2)
         |SELECT sh.src_a, sh.src_b, sh.shared_chunks, x1.sz AS sa, x2.sz AS sb,
         |  ((1000 * sh.shared_chunks) // least(x1.sz, x2.sz))::BIGINT AS overlap_permille
         |FROM sh JOIN ps x1 ON x1.source = sh.src_a JOIN ps x2 ON x2.source = sh.src_b
         |ORDER BY sh.src_a, sh.src_b""".stripMargin,
    // q155: corpus membership = distinct chunk hashes of the standing
    // half (the persisted index's content); the batch left-joins it.
    "q155_ingest_chunk_dedup" ->
      s"""WITH t AS (SELECT doc_id, substr(source, 4)::INT >= 15 AS is_new,
         |           regexp_split_to_array(text, ' ') tk FROM documents),
         |x AS (SELECT doc_id, is_new, tk,
         |      unnest(generate_series(0, (len(tk) + 15) // 16 - 1)) AS cidx FROM t),
         |c AS (SELECT doc_id, is_new,
         |      len(tk[cidx*16+1 : cidx*16+16])::BIGINT AS ctok,
         |      ${H("array_to_string(tk[cidx*16+1 : cidx*16+16], ' ')")} AS h FROM x),
         |ci AS (SELECT DISTINCT h FROM c WHERE NOT is_new),
         |j AS (SELECT c.doc_id, c.ctok, (ci.h IS NOT NULL) AS dup
         |      FROM c LEFT JOIN ci ON ci.h = c.h WHERE c.is_new)
         |SELECT doc_id, count(*)::BIGINT AS n_chunks,
         |  sum(CASE WHEN dup THEN 1 ELSE 0 END)::BIGINT AS corpus_dup_chunks,
         |  (count(*) - sum(CASE WHEN dup THEN 1 ELSE 0 END))::BIGINT AS fresh_chunks,
         |  sum(ctok)::BIGINT AS n_tokens,
         |  sum(CASE WHEN NOT dup THEN ctok ELSE 0 END)::BIGINT AS fresh_tokens,
         |  ((1000 * sum(CASE WHEN dup THEN 1 ELSE 0 END)) // count(*))::BIGINT AS dup_permille
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q156: the 64-vector eval carve is the TOP-64 by salted content
    // hash (deterministic, size-fixed); flags replay q25's exact
    // double cosine; best match = (cos desc, eval_id asc).
    "q156_embed_decontam" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |ev AS (SELECT vec_id AS eval_id, v FROM e
         |       ORDER BY ${H("'ed:' || vec_id")}, vec_id LIMIT 64),
         |s AS (SELECT e.vec_id, ev.eval_id,
         |      list_dot_product(e.v, ev.v)
         |      / sqrt(list_dot_product(e.v, e.v) * list_dot_product(ev.v, ev.v)) c
         |      FROM e, ev
         |      WHERE e.vec_id NOT IN (SELECT eval_id FROM ev)),
         |f AS (SELECT vec_id, eval_id, c,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, eval_id) rn
         |      FROM s WHERE c >= 0.4)
         |SELECT vec_id, (SELECT count(*) FROM f g
         |                WHERE g.vec_id = f.vec_id)::BIGINT AS n_eval_hits,
         |  eval_id, round(c, 6) AS cosine
         |FROM f WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    // q182: q23's candidate chain + the q22-shape exact baseline at
    // the q23 threshold; three scalar counts + floor permilles.
    "q182_lsh_eval" ->
      s"""WITH $MinhashCandCte,
         |cm AS (SELECT a.doc_id da, b.doc_id db, count(*) cm
         |       FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2),
         |ex AS (SELECT da, db FROM cm
         |       JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
         |       WHERE cm / (x.sz + y.sz - cm) >= 0.5),
         |n1 AS (SELECT count(*)::BIGINT n_exact FROM ex),
         |n2 AS (SELECT count(*)::BIGINT n_candidates FROM cand),
         |n3 AS (SELECT count(*)::BIGINT n_hit
         |       FROM ex JOIN cand c ON c.da = ex.da AND c.db = ex.db)
         |SELECT n_exact, n_candidates, n_hit,
         |  ((1000 * n_hit) // greatest(n_exact, 1))::BIGINT AS recall_pm,
         |  ((1000 * n_hit) // greatest(n_candidates, 1))::BIGINT AS precision_pm
         |FROM n1, n2, n3""".stripMargin,
    // q183: per-candidate minhash agreement (position-joined) vs the
    // exact permille, grouped by agreement level.
    "q183_minhash_calibration" ->
      s"""WITH $MinhashCandCte,
         |ag AS (SELECT c.da, c.db,
         |       sum(CASE WHEN x.m = y.m THEN 1 ELSE 0 END)::BIGINT AS agreement
         |       FROM cand c JOIN mh x ON x.doc_id = c.da
         |            JOIN mh y ON y.doc_id = c.db AND y.j = x.j
         |       GROUP BY 1, 2),
         |cm AS (SELECT c.da, c.db, count(*)::BIGINT cm FROM cand c
         |       JOIN sh p ON p.doc_id = c.da
         |       JOIN sh q ON q.doc_id = c.db AND q.h = p.h
         |       GROUP BY 1, 2),
         |e AS (SELECT a.da, a.db, a.agreement,
         |      (1000 * coalesce(cm.cm, 0))
         |        // (x.sz + y.sz - coalesce(cm.cm, 0)) AS epm
         |      FROM ag a LEFT JOIN cm ON cm.da = a.da AND cm.db = a.db
         |      JOIN sz x ON x.doc_id = a.da JOIN sz y ON y.doc_id = a.db)
         |SELECT agreement, count(*)::BIGINT AS n_pairs,
         |  (sum(epm) // count(*))::BIGINT AS mean_exact_pm,
         |  min(epm)::BIGINT AS min_exact_pm,
         |  max(epm)::BIGINT AS max_exact_pm,
         |  ((1000 * agreement) // 16)::BIGINT AS est_pm
         |FROM e GROUP BY agreement ORDER BY agreement""".stripMargin,
    // q221: the q49 cluster recurrence (shared CTE) joined to per-doc
    // token counts; per-doc 1/cluster_n weights in exact milli.
    "q221_dedup_yield" ->
      s"""WITH $NearDupClusterCte,
         |dt AS (SELECT doc_id, source,
         |         len(regexp_split_to_array(text, ' '))::BIGINT n_tok
         |       FROM documents),
         |jy AS (SELECT dt.source, dt.n_tok, cn.cluster_n
         |       FROM dt JOIN lbl ON lbl.doc_id = dt.doc_id
         |            JOIN cn ON cn.cluster_id = lbl.cluster_id)
         |SELECT source, count(*)::BIGINT AS n_docs,
         |       sum(n_tok)::BIGINT AS raw_tokens,
         |       sum(CASE WHEN cluster_n > 1 THEN 1 ELSE 0 END)::BIGINT
         |         AS n_dup_docs,
         |       sum((1000 * n_tok) // cluster_n)::BIGINT AS eff_tokens_milli,
         |       (sum((1000 * n_tok) // cluster_n) // sum(n_tok))::BIGINT
         |         AS yield_pm
         |FROM jy GROUP BY 1 ORDER BY source""".stripMargin,
    // q222: the q23 minhash/band scheme replayed, then per-band bucket
    // histogram stats; pair mass per bucket in HUGEINT.
    "q222_lsh_bucket_balance" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk
         |           FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |       FROM (SELECT doc_id, tk,
         |             unnest(generate_series(1, len(tk) - 2)) i FROM t)),
         |mh AS (SELECT doc_id, j,
         |         min(((2*j + 1) * h + 12345 + 7919*j) % 1000000007) m
         |       FROM sh, generate_series(0, 15) g(j) GROUP BY doc_id, j),
         |bands AS (SELECT doc_id, j // 4 AS b,
         |          list_reduce(list_prepend(0::BIGINT, list(m ORDER BY j)),
         |                      (acc, x) -> (acc * 131 + x) % 1000000007) AS key
         |          FROM mh GROUP BY doc_id, j // 4),
         |bk AS (SELECT b, key, count(*)::BIGINT n FROM bands GROUP BY 1, 2)
         |SELECT b::BIGINT AS band, count(*)::BIGINT AS n_buckets,
         |       max(n) AS max_bucket,
         |       sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_singletons,
         |       (sum((n::HUGEINT * (n - 1)) // 2))::BIGINT AS cand_pairs
         |FROM bk GROUP BY 1 ORDER BY band""".stripMargin,
    // q238: the q49 label recurrence + the q28 language heuristic,
    // majority by (count desc, pred desc) row_number — the same order
    // max(struct(n, pred)) induces.
    "q238_cluster_lang_mix" ->
      s"""WITH $NearDupClusterCte,
         |td AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk2
         |       FROM documents),
         |lp AS (SELECT doc_id,
         |        CASE WHEN len(list_filter(tk2, x -> x IN
         |            ('the','a','of','and','is','to','in'))) >=
         |          len(list_filter(tk2, x -> x IN
         |            ('der','die','das','und','ist','zu','ein')))
         |          AND len(list_filter(tk2, x -> x IN
         |            ('the','a','of','and','is','to','in'))) >=
         |          len(list_filter(tk2, x -> x IN
         |            ('el','la','de','y','es','un','en'))) THEN 'en'
         |        WHEN len(list_filter(tk2, x -> x IN
         |            ('der','die','das','und','ist','zu','ein'))) >=
         |          len(list_filter(tk2, x -> x IN
         |            ('el','la','de','y','es','un','en'))) THEN 'de'
         |        ELSE 'es' END pred
         |      FROM td),
         |m AS (SELECT lbl.cluster_id, pred, count(*)::BIGINT n
         |      FROM lbl JOIN cn ON cn.cluster_id = lbl.cluster_id
         |        JOIN lp ON lp.doc_id = lbl.doc_id
         |      WHERE cn.cluster_n > 1 GROUP BY 1, 2),
         |top AS (SELECT cluster_id, pred, n,
         |        row_number() OVER (PARTITION BY cluster_id
         |          ORDER BY n DESC, pred DESC) rk,
         |        sum(n) OVER (PARTITION BY cluster_id) tot,
         |        count(*) OVER (PARTITION BY cluster_id) nl
         |      FROM m)
         |SELECT cluster_id, tot::BIGINT AS n_docs, nl::BIGINT AS n_langs,
         |       pred AS maj_lang,
         |       ((1000 * (tot - n)) // tot)::BIGINT AS minority_pm
         |FROM top WHERE rk = 1 ORDER BY cluster_id""".stripMargin,
    // q243: the q49 label recurrence, one (length, polyhash) scan,
    // size-capped cluster-keyed pair join — the same H() whole-text
    // hash as q31.
    "q243_cluster_diff_stats" ->
      s"""WITH $NearDupClusterCte,
         |dd AS (SELECT doc_id, n_chars::BIGINT nc, ${H("text")} fp
         |      FROM documents),
         |jj AS MATERIALIZED (SELECT lbl.cluster_id, lbl.doc_id, nc, fp
         |      FROM lbl JOIN cn ON cn.cluster_id = lbl.cluster_id
         |        JOIN dd ON dd.doc_id = lbl.doc_id
         |      WHERE cn.cluster_n >= 2 AND cn.cluster_n <= 64)
         |SELECT a.cluster_id, count(*)::BIGINT AS n_pairs,
         |       ((1000 * sum(abs(a.nc - b.nc))) // count(*))::BIGINT
         |         AS mean_len_delta_milli,
         |       sum(CASE WHEN a.fp = b.fp THEN 1 ELSE 0 END)::BIGINT
         |         AS n_exact_pairs
         |FROM jj a JOIN jj b ON b.cluster_id = a.cluster_id
         |  AND a.doc_id < b.doc_id
         |GROUP BY 1 ORDER BY a.cluster_id""".stripMargin,
    // q266: ONE candidate+verify prefix (the q23 chain with exact
    // integer intersection/union), then per threshold an integer
    // filter, a recursive closure, and a cluster-size summary.
    "q266_dedup_threshold_curve" -> {
      val prefix =
        s"""RECURSIVE $MinhashCandCte,
           |cmr AS (SELECT da, db, count(*) cm FROM cand
           |      JOIN sh p ON p.doc_id = da
           |      JOIN sh q ON q.doc_id = db AND q.h = p.h
           |      GROUP BY da, db),
           |pc AS MATERIALIZED (SELECT da, db, cm,
           |        (x.sz + y.sz - cm)::BIGINT un
           |      FROM cmr JOIN sz x ON x.doc_id = da
           |        JOIN sz y ON y.doc_id = db)""".stripMargin
      val per = Dedup.PercolationGridPm.map { tpm =>
        s"""p$tpm AS (SELECT da, db FROM pc WHERE 1000 * cm >= $tpm * un),
           |e$tpm AS (SELECT da s, db t2 FROM p$tpm
           |      UNION ALL SELECT db, da FROM p$tpm),
           |r$tpm AS (SELECT doc_id AS src, doc_id AS dst FROM documents
           |      UNION
           |      SELECT r.src, e.t2 FROM r$tpm r JOIN e$tpm e ON r.dst = e.s),
           |l$tpm AS (SELECT src, min(dst) cid FROM r$tpm GROUP BY 1),
           |c$tpm AS (SELECT cid, count(*) n FROM l$tpm GROUP BY 1),
           |w$tpm AS (SELECT $tpm::BIGINT tau_pm,
           |      (SELECT count(*) FROM p$tpm)::BIGINT n_edges,
           |      count(*) FILTER (n >= 2)::BIGINT n_multi_clusters,
           |      coalesce(sum(n) FILTER (n >= 2), 0)::BIGINT n_docs_in_multi,
           |      max(n)::BIGINT largest_cluster FROM c$tpm)""".stripMargin
      }
      val rows = Dedup.PercolationGridPm
        .map(tpm => s"SELECT * FROM w$tpm").mkString(" UNION ALL ")
      s"""WITH ${(prefix +: per).mkString(",\n")}
         |SELECT * FROM ($rows) ORDER BY tau_pm""".stripMargin
    },
    // q270: the q23 verified-pair chain + the q24 simhash chain, full
    // outer flag union, exact per-pair Jaccard from the shared shingle
    // postings (left join — disjoint-set pairs score 0), 3-key agg.
    "q270_text_method_agreement" ->
      s"""WITH $MinhashCandCte,
         |$MethodAgreementCte,
         |ex AS (SELECT p.doc_a, p.doc_b, count(*)::BIGINT cm FROM pr p
         |      JOIN sh a ON a.doc_id = p.doc_a
         |      JOIN sh b ON b.doc_id = p.doc_b AND b.h = a.h
         |      GROUP BY 1, 2),
         |jj AS (SELECT pr.cat,
         |        ((1000 * coalesce(ex.cm, 0)) //
         |         (x.sz + y.sz - coalesce(ex.cm, 0)))::BIGINT j_pm
         |      FROM pr JOIN sz x ON x.doc_id = pr.doc_a
         |      JOIN sz y ON y.doc_id = pr.doc_b
         |      LEFT JOIN ex ON ex.doc_a = pr.doc_a AND ex.doc_b = pr.doc_b)
         |SELECT cat, count(*)::BIGINT AS n_pairs,
         |       (sum(j_pm) // count(*))::BIGINT AS mean_j_pm,
         |       min(j_pm)::BIGINT AS min_j_pm, max(j_pm)::BIGINT AS max_j_pm
         |FROM jj GROUP BY 1 ORDER BY 1""".stripMargin,
    // q278: the q49 cluster closure verbatim (shared-oracle rule),
    // one documents join, per-source agg; the per-doc 1000//n floor
    // is the defined semantic on both engines.
    "q278_dedup_effective_size" ->
      s"""WITH $NearDupClusterCte,
         |w AS (SELECT l.doc_id, l.cluster_id, cn.cluster_n
         |      FROM lbl l JOIN cn ON cn.cluster_id = l.cluster_id),
         |j AS (SELECT d.source, w.doc_id, w.cluster_id, w.cluster_n
         |      FROM w JOIN documents d ON d.doc_id = w.doc_id)
         |SELECT source, count(*)::BIGINT AS n_docs,
         |       sum(CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END)
         |         ::BIGINT AS n_canonical,
         |       sum(1000 // cluster_n)::BIGINT AS eff_milli,
         |       sum(CASE WHEN cluster_n = 1 THEN 1 ELSE 0 END)
         |         ::BIGINT AS n_singletons,
         |       ((1000000 * count(*)) // sum(1000 // cluster_n))
         |         ::BIGINT AS inflation_milli
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // q290: per n the distinct-per-doc shingle relation (the q23 sh
    // CTE at each order), df stats, capped equi-join pair set with
    // the source split, one row per n.
    "q290_shingle_ablation" -> {
      val cap = Dedup.AblationDfCap
      val blocks = Dedup.AblationNs.map { n =>
        val hi = if (n == 1) "tk[i:i]" else s"tk[i:i+${n - 1}]"
        s"""sh$n AS (SELECT DISTINCT doc_id,
           |      ${H(s"array_to_string($hi, ' ')")} h
           |      FROM (SELECT doc_id, tk,
           |            unnest(generate_series(1, len(tk) - ${n - 1})) i FROM t)),
           |df$n AS (SELECT h, count(*)::BIGINT df FROM sh$n GROUP BY 1),
           |st$n AS (SELECT count(*)::BIGINT gd,
           |      sum(CASE WHEN df > $cap THEN 1 ELSE 0 END)::BIGINT gx
           |      FROM df$n),
           |gi$n AS (SELECT sh.doc_id, sh.h FROM sh$n sh
           |      JOIN df$n dd ON dd.h = sh.h AND dd.df <= $cap),
           |pr$n AS (SELECT DISTINCT a.doc_id da, b.doc_id db FROM gi$n a
           |      JOIN gi$n b ON a.h = b.h AND a.doc_id < b.doc_id),
           |ps$n AS (SELECT
           |      sum(CASE WHEN x.source = y.source THEN 1 ELSE 0 END)
           |        ::BIGINT w,
           |      sum(CASE WHEN x.source != y.source THEN 1 ELSE 0 END)
           |        ::BIGINT c
           |      FROM pr$n JOIN documents x ON x.doc_id = da
           |      JOIN documents y ON y.doc_id = db),
           |row$n AS (SELECT $n::BIGINT n, gd, gx, coalesce(w, 0)::BIGINT pw,
           |      coalesce(c, 0)::BIGINT pc FROM st$n, ps$n)""".stripMargin
      }.mkString(",\n")
      val un = Dedup.AblationNs.map(n => s"SELECT * FROM row$n")
        .mkString(" UNION ALL ")
      s"""WITH t AS (SELECT doc_id,
         |      regexp_split_to_array(text, ' ') tk FROM documents),
         |$blocks
         |SELECT n, gd AS grams_distinct, gx AS grams_dropped,
         |       pw AS pairs_within, pc AS pairs_cross,
         |       (CASE WHEN pw + pc = 0 THEN 0
         |        ELSE (1000 * pc) // (pw + pc) END)::BIGINT AS cross_share_pm
         |FROM ($un) ORDER BY n""".stripMargin
    },
    // q318: the shared recursive cluster closure + row-local token
    // counts, k-keyed spectrum, one-row totals.
    "q318_dup_size_spectrum" ->
      s"""WITH $NearDupClusterCte,
         |ntk AS (SELECT doc_id, len(tk)::BIGINT n_tok FROM t),
         |jj AS (SELECT lbl.doc_id, lbl.cluster_id, cn.cluster_n, ntk.n_tok
         |      FROM lbl JOIN cn ON cn.cluster_id = lbl.cluster_id
         |      JOIN ntk ON ntk.doc_id = lbl.doc_id),
         |g AS (SELECT cluster_n AS k, count(DISTINCT cluster_id)::BIGINT
         |        n_clusters, count(*)::BIGINT n_docs,
         |      sum(n_tok)::BIGINT n_tokens FROM jj GROUP BY 1),
         |tt AS (SELECT sum(n_docs)::BIGINT td, sum(n_tokens)::BIGINT tt2
         |      FROM g)
         |SELECT k, n_clusters, n_docs,
         |  ((1000 * n_docs) // td)::BIGINT AS docs_share_pm,
         |  n_tokens, ((1000 * n_tokens) // tt2)::BIGINT AS tokens_share_pm
         |FROM g, tt ORDER BY k""".stripMargin,
    // q344: the shared q270 chain, then the discordant-count test.
    "q344_mcnemar_dedup" ->
      s"""WITH $MinhashCandCte,
         |$MethodAgreementCte,
         |cnt AS (SELECT
         |      sum(CASE WHEN cat = 'both' THEN 1 ELSE 0 END)::BIGINT n_both,
         |      sum(CASE WHEN cat = 'minhash_only' THEN 1 ELSE 0 END)::BIGINT
         |        n_mh_only,
         |      sum(CASE WHEN cat = 'simhash_only' THEN 1 ELSE 0 END)::BIGINT
         |        n_sh_only
         |      FROM pr)
         |SELECT n_both, n_mh_only, n_sh_only,
         |  (CASE WHEN n_mh_only + n_sh_only > 0 THEN
         |    (1000 * (n_mh_only - n_sh_only) * (n_mh_only - n_sh_only))
         |      // (n_mh_only + n_sh_only) END)::BIGINT AS z2_milli,
         |  (CASE WHEN n_sh_only > 0 THEN (1000 * n_mh_only) // n_sh_only
         |   END)::BIGINT AS odds_milli,
         |  (CASE WHEN n_mh_only > n_sh_only THEN 1
         |    WHEN n_mh_only < n_sh_only THEN -1 ELSE 0 END)::BIGINT
         |    AS direction
         |FROM cnt""".stripMargin,
  )
}
