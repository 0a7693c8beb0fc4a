package graft
package oracles

/** DuckDB oracle SQL — embedding similarity, ANN indexes, clustering.
  *
  * Split from SparkEntry.oracleSql (round 12): entry text is verbatim;
  * SparkEntry remains the single-source registry and concatenates the
  * family maps. RegistrationGateSpec enforces key-set equality with
  * `queries`, and the split was verified by a byte-identical
  * oracle_sql.json dump before/after. */
private[graft] object OracleSim {
  import graft.SparkEntryOracleUtil._
  private val MutualNnCte: String =
    """q AS (SELECT vec_id, i::BIGINT - 1 AS pos,
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
        |pr AS (SELECT a.vec_id AS src, a.cid AS cell, b.vec_id AS nbr,
        |       list_dot_product(ae.v, be.v)
        |       / sqrt(list_dot_product(ae.v, ae.v) * list_dot_product(be.v, be.v)) c
        |       FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id != b.vec_id
        |       JOIN e ae ON ae.vec_id = a.vec_id JOIN e be ON be.vec_id = b.vec_id),
        |n1 AS (SELECT src, cell, nbr, c FROM (
        |         SELECT src, cell, nbr, c,
        |                row_number() OVER (PARTITION BY src ORDER BY c DESC, nbr) rn
        |         FROM pr) WHERE rn = 1)""".stripMargin

  /** ONE as-of oracle, shared by q44 (union+window composition) and
    * q67 (custom physical operator): the two entries must stay
    * byte-identical or "q67 shares q44's oracle" silently rots. */

  private def lloydCte(k: Int): String =
    s"""q AS (SELECT vec_id, i::BIGINT - 1 AS pos,
       |        floor(embedding[i]::DOUBLE * 1000000)::BIGINT AS vm
       |      FROM (SELECT vec_id, embedding,
       |            unnest(generate_series(1, len(embedding))) i FROM embeddings)),
       |seeds AS (SELECT vec_id, (row_number() OVER (ORDER BY vec_id) - 1)::BIGINT AS cid
       |          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $k)),
       |c0 AS (SELECT s.cid, q.pos, q.vm AS cm FROM q JOIN seeds s ON s.vec_id = q.vec_id),
       |e1 AS (SELECT q.vec_id, c.cid, sum((q.vm - c.cm) * (q.vm - c.cm))::BIGINT AS d2
       |       FROM q JOIN c0 c ON c.pos = q.pos GROUP BY 1, 2),
       |a1 AS (SELECT vec_id, cid, d2 FROM (
       |         SELECT vec_id, cid, d2,
       |                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) rn
       |         FROM e1) WHERE rn = 1),
       |c1 AS (SELECT a.cid, q.pos, floor(sum(q.vm) / count(*))::BIGINT AS cm
       |       FROM q JOIN a1 a ON a.vec_id = q.vec_id GROUP BY 1, 2),
       |e2 AS (SELECT q.vec_id, c.cid, sum((q.vm - c.cm) * (q.vm - c.cm))::BIGINT AS d2
       |       FROM q JOIN c1 c ON c.pos = q.pos GROUP BY 1, 2),
       |a2 AS (SELECT vec_id, cid, d2 FROM (
       |         SELECT vec_id, cid, d2,
       |                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) rn
       |         FROM e2) WHERE rn = 1)""".stripMargin

  /** q161 oracle CTE chain: greedy farthest-point rounds 2..k over the
    * micro-quantized component relation — per round the distances to
    * every selected vector, the per-vector min, and the argmax pick
    * (ties to the smallest vec_id), mirroring Similarity.coresetSelect
    * round for round. */

  private def coresetCte(k: Int): String = {
    val rounds = (2 to k).map { r =>
      val prev = s"ss${r - 1}"
      s"""dd$r AS (SELECT a.vec_id, b.vec_id AS sid,
         |       sum((a.vm - b.vm) * (a.vm - b.vm))::BIGINT AS d2
         |       FROM q a JOIN q b ON b.pos = a.pos
         |       JOIN $prev s ON s.vec_id = b.vec_id GROUP BY 1, 2),
         |mm$r AS (SELECT vec_id, min(d2) AS d2 FROM dd$r GROUP BY 1),
         |pp$r AS (SELECT $r::BIGINT AS rank, vec_id, d2 FROM mm$r
         |        ORDER BY d2 DESC, vec_id LIMIT 1),
         |ss$r AS (SELECT * FROM $prev UNION ALL SELECT * FROM pp$r)""".stripMargin
    }.mkString(",\n")
    s"""q AS (SELECT vec_id, i::BIGINT - 1 AS pos,
       |        floor(embedding[i]::DOUBLE * 1000000)::BIGINT AS vm
       |      FROM (SELECT vec_id, embedding,
       |            unnest(generate_series(1, len(embedding))) i FROM embeddings)),
       |ss1 AS (SELECT 1::BIGINT AS rank, min(vec_id) AS vec_id,
       |        0::BIGINT AS d2 FROM embeddings),
       |$rounds""".stripMargin
  }

  /** q26 oracle — exact cosine top-5 ground truth. Shared verbatim by
    * q146's recall eval (the eval must grade against the same truth
    * the driver checks). */
  /** q33 oracle chain, parameterized by nprobe — shared verbatim by
    * q262's recall curve (the q44/q67/q146 shared-oracle rule: the
    * curve must grade exactly the probe plans the driver checks). */
  /** q256 oracle chain, parameterized by passage size (stride =
    * size/2) — shared verbatim by q263's ablation (the shared-oracle
    * rule again: the ablation grades exactly the plans the driver
    * checks). */

  private def ivfTopkSql(nprobe: Int): String =
    s"""WITH q AS (SELECT vec_id, i::BIGINT - 1 AS pos,
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
        |pd AS (SELECT q.vec_id q_id, c.cid, sum((q.vm - c.cm) * (q.vm - c.cm)) d2
        |       FROM q JOIN c1 c ON c.pos = q.pos WHERE q.vec_id < 10 GROUP BY 1, 2),
        |probes AS (SELECT q_id, cid FROM (
        |            SELECT q_id, cid,
        |                   row_number() OVER (PARTITION BY q_id ORDER BY d2, cid) pr
        |            FROM pd) WHERE pr <= $nprobe),
        |e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        |s AS (SELECT p.q_id, n.vec_id neighbor_id,
        |      list_dot_product(qe.v, ne.v)
        |      / sqrt(list_dot_product(qe.v, qe.v) * list_dot_product(ne.v, ne.v)) c
        |      FROM probes p JOIN a2 n ON n.cid = p.cid
        |      JOIN e qe ON qe.vec_id = p.q_id JOIN e ne ON ne.vec_id = n.vec_id
        |      WHERE n.vec_id != p.q_id),
        |r AS (SELECT q_id, neighbor_id, c,
        |      row_number() OVER (PARTITION BY q_id ORDER BY c DESC, neighbor_id) rnk FROM s)
        |SELECT q_id, neighbor_id, round(c, 6) AS cosine, rnk::BIGINT AS rank
        |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin

  private val BruteTopkSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
      |s AS (SELECT q.vec_id q_id, n.vec_id neighbor_id,
      |      list_dot_product(q.v, n.v)
      |      / sqrt(list_dot_product(q.v, q.v) * list_dot_product(n.v, n.v)) c
      |      FROM e q, e n WHERE q.vec_id < 10 AND n.vec_id != q.vec_id),
      |r AS (SELECT q_id, neighbor_id, c,
      |      row_number() OVER (PARTITION BY q_id ORDER BY c DESC, neighbor_id) rnk FROM s)
      |SELECT q_id, neighbor_id, round(c, 6) AS cosine, rnk::BIGINT AS rank
      |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin

  /** q27 oracle — hyperplane-LSH top-5 (shared by q146). */

  private val LshTopkSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
      |sig AS (SELECT vec_id, t,
      |  list_sum(list_transform(generate_series(0, 3), r ->
      |    CASE WHEN list_sum(list_transform(generate_series(0, 63), i ->
      |      (CASE WHEN ((((t*4 + r)*64 + i) * 2654435761) & 65536) != 0
      |            THEN 1.0 ELSE -1.0 END) * v[i + 1])) > 0
      |    THEN (1::BIGINT << r) ELSE 0 END))::BIGINT AS bucket
      |  FROM e, generate_series(0, 3) g(t)),
      |cand AS (SELECT DISTINCT q.vec_id q_id, c.vec_id vec_id
      |         FROM sig q JOIN sig c ON q.t = c.t AND q.bucket = c.bucket
      |              AND q.vec_id != c.vec_id
      |         WHERE q.vec_id < 10),
      |s AS (SELECT cand.q_id, cand.vec_id neighbor_id,
      |      list_dot_product(q.v, n.v)
      |      / sqrt(list_dot_product(q.v, q.v) * list_dot_product(n.v, n.v)) c
      |      FROM cand JOIN e q ON q.vec_id = cand.q_id JOIN e n ON n.vec_id = cand.vec_id),
      |r AS (SELECT q_id, neighbor_id, c,
      |      row_number() OVER (PARTITION BY q_id ORDER BY c DESC, neighbor_id) rnk FROM s)
      |SELECT q_id, neighbor_id, round(c, 6) AS cosine, rnk::BIGINT AS rank
      |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin

  /** q48 oracle — int8 coarse-rank + exact re-rank top-5 (shared by
    * q146). */

  private val Int8TopkSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
      |s AS (SELECT vec_id, v,
      |       127.0 / list_aggregate(list_transform(v, x -> abs(x)), 'max') sc
      |       FROM e WHERE list_aggregate(list_transform(v, x -> abs(x)), 'max') > 0),
      |q8 AS (SELECT vec_id, v, list_transform(v, x ->
      |         CASE WHEN x >= 0 THEN floor(abs(x * sc) + 0.5)
      |              ELSE -floor(abs(x * sc) + 0.5) END) q FROM s),
      |qq AS (SELECT vec_id, v, q, list_dot_product(q, q) qn FROM q8
      |       WHERE list_dot_product(q, q) > 0),
      |cand AS (SELECT a.vec_id q_id, b.vec_id vec_id,
      |         list_dot_product(a.q, b.q) / sqrt(a.qn * b.qn) ac, a.v qv, b.v nv
      |         FROM qq a JOIN qq b ON b.vec_id != a.vec_id
      |         WHERE a.vec_id < 10),
      |r1 AS (SELECT *, row_number() OVER (PARTITION BY q_id
      |                                    ORDER BY ac DESC, vec_id) rn FROM cand),
      |ex AS (SELECT q_id, vec_id, list_dot_product(qv, nv)
      |       / sqrt(list_dot_product(qv, qv) * list_dot_product(nv, nv)) c
      |       FROM r1 WHERE rn <= 20),
      |r2 AS (SELECT q_id, vec_id neighbor_id, c,
      |       row_number() OVER (PARTITION BY q_id ORDER BY c DESC, vec_id) rnk FROM ex)
      |SELECT q_id, neighbor_id, round(c, 6) AS cosine, rnk::BIGINT AS rank
      |FROM r2 WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin

  /** The q245 aHash pair chain as CTEs ending in `pr` (doc_a, doc_b,
    * dist) — shared by the q245 oracle and q250's recursive-closure
    * clustering oracle. */
  val sql: Map[String, String] = Map(
    // PQ oracle: the per-subspace Lloyd chain (sub = dim div 8 folded
    // into every key), integer ADC table + coarse rank, exact cosine
    // re-rank — replays Similarity.pqTopK bit-for-bit.
    "q83_knn_pq" ->
      """WITH q AS (SELECT vec_id, (i::BIGINT - 1) // 8 AS sub, i::BIGINT - 1 AS pos,
        |             floor(embedding[i]::DOUBLE * 1000000)::BIGINT AS vm
        |           FROM (SELECT vec_id, embedding,
        |                 unnest(generate_series(1, len(embedding))) i FROM embeddings)),
        |seeds AS (SELECT vec_id, (row_number() OVER (ORDER BY vec_id) - 1)::BIGINT AS cid
        |          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
        |c0 AS (SELECT q.sub, s.cid, q.pos, q.vm AS cm
        |       FROM q JOIN seeds s ON s.vec_id = q.vec_id),
        |e1 AS (SELECT q.vec_id, q.sub, c.cid, sum((q.vm - c.cm) * (q.vm - c.cm))::BIGINT AS d2
        |       FROM q JOIN c0 c ON c.sub = q.sub AND c.pos = q.pos GROUP BY 1, 2, 3),
        |a1 AS (SELECT vec_id, sub, cid FROM (
        |         SELECT vec_id, sub, cid,
        |                row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) rn
        |         FROM e1) WHERE rn = 1),
        |c1 AS (SELECT a.sub, a.cid, q.pos, floor(sum(q.vm) / count(*))::BIGINT AS cm
        |       FROM q JOIN a1 a ON a.vec_id = q.vec_id AND a.sub = q.sub
        |       GROUP BY 1, 2, 3),
        |e2 AS (SELECT q.vec_id, q.sub, c.cid, sum((q.vm - c.cm) * (q.vm - c.cm))::BIGINT AS d2
        |       FROM q JOIN c1 c ON c.sub = q.sub AND c.pos = q.pos GROUP BY 1, 2, 3),
        |a2 AS (SELECT vec_id, sub, cid FROM (
        |         SELECT vec_id, sub, cid,
        |                row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) rn
        |         FROM e2) WHERE rn = 1),
        |t AS (SELECT q.vec_id q_id, c.sub, c.cid, sum(q.vm * c.cm)::BIGINT t
        |      FROM q JOIN c1 c ON c.sub = q.sub AND c.pos = q.pos
        |      WHERE q.vec_id < 10 GROUP BY 1, 2, 3),
        |adc AS (SELECT t.q_id, a.vec_id, sum(t.t)::BIGINT adc
        |        FROM a2 a JOIN t ON t.sub = a.sub AND t.cid = a.cid
        |        WHERE a.vec_id != t.q_id GROUP BY 1, 2),
        |cand AS (SELECT q_id, vec_id FROM (
        |          SELECT q_id, vec_id,
        |                 row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, vec_id) rn
        |          FROM adc) WHERE rn <= 50),
        |e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        |s2 AS (SELECT c2.q_id, c2.vec_id neighbor_id,
        |       list_dot_product(qe.v, ne.v)
        |       / sqrt(list_dot_product(qe.v, qe.v) * list_dot_product(ne.v, ne.v)) c
        |       FROM cand c2 JOIN e qe ON qe.vec_id = c2.q_id
        |       JOIN e ne ON ne.vec_id = c2.vec_id),
        |r AS (SELECT q_id, neighbor_id, c,
        |      row_number() OVER (PARTITION BY q_id ORDER BY c DESC, neighbor_id) rnk FROM s2)
        |SELECT q_id, neighbor_id, round(c, 6) AS cosine, rnk::BIGINT AS rank
        |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    // IVF oracle: the q136 Lloyd CTE chain at nlist=16, then integer
    // probe selection (nprobe=4) and exact double-cosine scoring on the
    // probed cells — replays Similarity.ivfTopK bit-for-bit.
    "q33_knn_ivf" -> ivfTopkSql(4),
    "q140_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
        |s AS (SELECT q.vec_id q_id, q.label q_label, n.vec_id neighbor_id,
        |      n.label n_label,
        |      list_dot_product(q.v, n.v)
        |      / sqrt(list_dot_product(q.v, q.v) * list_dot_product(n.v, n.v)) c
        |      FROM e q, e n
        |      WHERE q.vec_id < 10 AND n.vec_id != q.vec_id AND n.label != q.label),
        |r AS (SELECT q_id, q_label, neighbor_id, n_label, c,
        |      row_number() OVER (PARTITION BY q_id ORDER BY c DESC, neighbor_id) rnk FROM s)
        |SELECT q_id, q_label, neighbor_id, n_label, round(c, 6) AS cosine,
        |       rnk::BIGINT AS rank
        |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "q136_kmeans_embed" ->
      s"""WITH ${lloydCte(8)}
         |SELECT vec_id, cid, d2 AS dist_sq_micro FROM a2 ORDER BY vec_id""".stripMargin,
    // q143: q64's centroid arithmetic + per-vector integer argmin with
    // (d2, label) tie-break; margin from the rank-2 row of the same
    // window order
    "q143_centroid_classify" ->
      """WITH e AS (SELECT vec_id, label, embedding,
        |           unnest(generate_series(1, len(embedding))) i FROM embeddings),
        |c AS (SELECT vec_id, label, i::BIGINT - 1 AS pos,
        |      floor(embedding[i]::DOUBLE * 1000000)::BIGINT vm FROM e),
        |cent AS (SELECT label clabel, pos, floor(sum(vm) / count(*))::BIGINT cm
        |         FROM c GROUP BY 1, 2),
        |d2 AS (SELECT c.vec_id, c.label, cent.clabel,
        |       sum((vm - cm) * (vm - cm))::BIGINT d2
        |       FROM c JOIN cent ON cent.pos = c.pos GROUP BY 1, 2, 3),
        |r AS (SELECT vec_id, label, clabel, d2,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rn,
        |      lead(d2) OVER (PARTITION BY vec_id ORDER BY d2, clabel) nx
        |      FROM d2)
        |SELECT vec_id, label, clabel AS pred_label, d2 AS d2_micro,
        |       (nx - d2)::BIGINT AS margin_micro,
        |       (label = clabel)::BIGINT AS is_match
        |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    "q64_label_centroids" ->
      """WITH e AS (SELECT label, embedding,
        |           unnest(generate_series(1, len(embedding))) i FROM embeddings),
        |c AS (SELECT label, i::BIGINT - 1 AS pos,
        |      floor(embedding[i]::DOUBLE * 1000000)::BIGINT vm FROM e)
        |SELECT label, pos, count(*)::BIGINT n, sum(vm)::BIGINT sum_micro,
        |       floor(sum(vm) / count(*))::BIGINT centroid_micro
        |FROM c GROUP BY 1, 2 ORDER BY label, pos""".stripMargin,
    "q26_knn_bruteforce" -> BruteTopkSql,
    "q27_knn_lsh" -> LshTopkSql,
    // q38 computes the same contract as q26 through the bounded-heap
    // aggregate — the oracle is identical
    "q38_knn_topk_agg" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        |s AS (SELECT q.vec_id q_id, n.vec_id neighbor_id,
        |      list_dot_product(q.v, n.v)
        |      / sqrt(list_dot_product(q.v, q.v) * list_dot_product(n.v, n.v)) c
        |      FROM e q, e n WHERE q.vec_id < 10 AND n.vec_id != q.vec_id),
        |r AS (SELECT q_id, neighbor_id, c,
        |      row_number() OVER (PARTITION BY q_id ORDER BY c DESC, neighbor_id) rnk FROM s)
        |SELECT q_id, neighbor_id, round(c, 6) AS cosine, rnk::BIGINT AS rank
        |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "q48_knn_int8" -> Int8TopkSql,
    // q146: recall@5 against the SAME three oracle plans the driver
    // checks individually (q26/q48/q27 SQL embedded verbatim).
    "q146_quant_recall" ->
      s"""WITH gt AS (SELECT q_id, neighbor_id FROM ($BruteTopkSql)),
         |i8 AS (SELECT q_id, neighbor_id FROM ($Int8TopkSql)),
         |ls AS (SELECT q_id, neighbor_id FROM ($LshTopkSql)),
         |g AS (SELECT q_id, count(*)::BIGINT AS n_gt FROM gt GROUP BY q_id),
         |h8 AS (SELECT gt.q_id, count(*)::BIGINT AS h FROM gt
         |       JOIN i8 ON gt.q_id = i8.q_id AND gt.neighbor_id = i8.neighbor_id
         |       GROUP BY gt.q_id),
         |hl AS (SELECT gt.q_id, count(*)::BIGINT AS h FROM gt
         |       JOIN ls ON gt.q_id = ls.q_id AND gt.neighbor_id = ls.neighbor_id
         |       GROUP BY gt.q_id)
         |SELECT g.q_id, g.n_gt,
         |  coalesce(h8.h, 0)::BIGINT AS hits_int8,
         |  round(coalesce(h8.h, 0) / g.n_gt, 6) AS recall_int8,
         |  coalesce(hl.h, 0)::BIGINT AS hits_lsh,
         |  round(coalesce(hl.h, 0) / g.n_gt, 6) AS recall_lsh
         |FROM g LEFT JOIN h8 ON g.q_id = h8.q_id LEFT JOIN hl ON g.q_id = hl.q_id
         |ORDER BY g.q_id""".stripMargin,
    // q153: the q136 Lloyd chain, then per-cluster integer mean and
    // row-local ratio/flag.
    "q153_embed_outliers" ->
      s"""WITH ${lloydCte(8)},
         |st AS (SELECT cid, (sum(d2) // count(*))::BIGINT AS mean_d2 FROM a2 GROUP BY cid)
         |SELECT a2.vec_id, a2.cid, a2.d2 AS dist_sq_micro, st.mean_d2,
         |  ((1000 * a2.d2) // greatest(st.mean_d2, 1))::BIGINT AS ratio_permille,
         |  (CASE WHEN (1000 * a2.d2) // greatest(st.mean_d2, 1) >= 2500
         |        THEN 1 ELSE 0 END)::BIGINT AS is_outlier
         |FROM a2 JOIN st USING (cid) ORDER BY a2.vec_id""".stripMargin,
    // q158: the q136 Lloyd CTEs verbatim, then the per-cell top-4 by
    // (d2, vec_id) — the oracle's window sort equals the bounded heap.
    "q158_cluster_prototypes" ->
      s"""WITH ${lloydCte(8)},
         |r AS (SELECT cid, vec_id, d2,
         |      row_number() OVER (PARTITION BY cid ORDER BY d2, vec_id) rn FROM a2)
         |SELECT cid, rn::BIGINT AS rank, vec_id, d2 AS dist_sq_micro
         |FROM r WHERE rn <= 4 ORDER BY cid, rank""".stripMargin,
    // q160: the q27 ±1 hyperplane arithmetic with the projection VALUES
    // kept (list_transform product + sequential list_sum — the same
    // fold the sign test already proves bit-identical), floor-scaled
    // to micro units at the boundary.
    "q160_rp_project" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        |p AS (SELECT vec_id, j::BIGINT AS pdim,
        |  list_sum(list_transform(generate_series(0, 63), i ->
        |    (CASE WHEN (((j*64 + i) * 2654435761) & 65536) != 0
        |          THEN 1.0 ELSE -1.0 END) * v[i + 1])) AS pr
        |  FROM e, generate_series(0, 15) g(j))
        |SELECT vec_id, pdim, floor(pr * 1000000)::BIGINT AS val_micro
        |FROM p ORDER BY vec_id, pdim""".stripMargin,
    // q161: the greedy farthest-point recurrence as a fixed CTE chain
    // (the q136/q126 fixed-round pattern).
    "q161_coreset_select" ->
      s"""WITH ${coresetCte(8)}
         |SELECT rank, vec_id, d2 AS min_d2_micro FROM ss8 ORDER BY rank""".stripMargin,
    // q172: the q115 Lloyd cell chain (nlist=16), full directed
    // within-cell cosine ranking, top-1 per vector with (c DESC, nbr)
    // tie-break = TopKByScore order, then the reciprocity self-join.
    "q172_mutual_nn" ->
      s"""WITH $MutualNnCte
         |SELECT x.src AS vec_a, y.src AS vec_b, x.cell::INTEGER AS cell,
        |  round(x.c, 6) AS cosine
        |FROM n1 x JOIN n1 y ON x.nbr = y.src AND y.nbr = x.src AND x.src < y.src
        |ORDER BY vec_a""".stripMargin,
    // q186: same +1e6 shift (floor ≡ truncate on the nonnegative
    // domain), HUGEINT variance products.
    "q186_embedding_dim_stats" ->
      """WITH q AS (SELECT i::BIGINT - 1 AS pos,
        |      floor(embedding[i]::DOUBLE * 1000000)::BIGINT + 1000000 AS vms
        |      FROM (SELECT embedding,
        |            unnest(generate_series(1, len(embedding))) i FROM embeddings))
        |SELECT pos, count(*)::BIGINT AS n_vecs,
        |  (min(vms) - 1000000)::BIGINT AS min_micro,
        |  (max(vms) - 1000000)::BIGINT AS max_micro,
        |  (sum(vms) // count(*) - 1000000)::BIGINT AS mean_micro,
        |  ((count(*)::HUGEINT * sum(vms * vms) - sum(vms)::HUGEINT * sum(vms))
        |    // (count(*)::HUGEINT * count(*)))::BIGINT AS var_micro2,
        |  (CASE WHEN min(vms) = max(vms) THEN 1 ELSE 0 END)::BIGINT AS dead
        |FROM q GROUP BY pos ORDER BY pos""".stripMargin,
    // q196: composes the SAME three top-k oracles the driver already
    // checks (q26/q27/q48) — rank of the true rank-1 neighbor in each
    // approximate list, reciprocal rank floored to micro units.
    "q196_mrr_eval" ->
      s"""WITH gt AS (SELECT q_id, neighbor_id true_nn
         |            FROM ($BruteTopkSql) WHERE rank = 1),
         |ls AS (SELECT q_id, neighbor_id, rank FROM ($LshTopkSql)),
         |i8 AS (SELECT q_id, neighbor_id, rank FROM ($Int8TopkSql)),
         |rl AS (SELECT gt.q_id, ls.rank FROM gt
         |       JOIN ls ON ls.q_id = gt.q_id AND ls.neighbor_id = gt.true_nn),
         |r8 AS (SELECT gt.q_id, i8.rank FROM gt
         |       JOIN i8 ON i8.q_id = gt.q_id AND i8.neighbor_id = gt.true_nn)
         |SELECT gt.q_id, gt.true_nn,
         |       rl.rank AS rank_lsh,
         |       coalesce(1000000 // rl.rank, 0)::BIGINT AS rr_lsh_micro,
         |       r8.rank AS rank_int8,
         |       coalesce(1000000 // r8.rank, 0)::BIGINT AS rr_int8_micro
         |FROM gt LEFT JOIN rl ON rl.q_id = gt.q_id
         |        LEFT JOIN r8 ON r8.q_id = gt.q_id
         |ORDER BY gt.q_id""".stripMargin,
    // q236: gains from the exact list, hardcoded micro discounts
    // (⌊1e6/log₂(pos+1)⌋ — the q211 constant-table move), left joins
    // keep missed neighbors at gain 0.
    "q236_ndcg_eval" ->
      s"""WITH ex AS (SELECT q_id, neighbor_id,
         |        (CASE WHEN rank = 1 THEN 3 WHEN rank <= 3 THEN 2
         |          ELSE 1 END)::BIGINT g, rank
         |      FROM ($BruteTopkSql)),
         |dt(pos, dm) AS (VALUES (1, 1000000), (2, 630929), (3, 500000),
         |      (4, 430676), (5, 386852)),
         |id AS (SELECT q_id, sum(g * dm)::BIGINT idcg_micro
         |      FROM ex JOIN dt ON dt.pos = ex.rank GROUP BY 1),
         |dl AS (SELECT l.q_id, sum(COALESCE(e.g, 0) * dm)::BIGINT dcg
         |      FROM ($LshTopkSql) l JOIN dt ON dt.pos = l.rank
         |        LEFT JOIN ex e ON e.q_id = l.q_id
         |          AND e.neighbor_id = l.neighbor_id
         |      GROUP BY 1),
         |d8 AS (SELECT i.q_id, sum(COALESCE(e.g, 0) * dm)::BIGINT dcg
         |      FROM ($Int8TopkSql) i JOIN dt ON dt.pos = i.rank
         |        LEFT JOIN ex e ON e.q_id = i.q_id
         |          AND e.neighbor_id = i.neighbor_id
         |      GROUP BY 1)
         |SELECT id.q_id, idcg_micro,
         |       COALESCE(dl.dcg, 0)::BIGINT AS dcg_lsh_micro,
         |       COALESCE((1000 * dl.dcg) // idcg_micro, 0)::BIGINT
         |         AS ndcg_lsh_milli,
         |       COALESCE(d8.dcg, 0)::BIGINT AS dcg_int8_micro,
         |       COALESCE((1000 * d8.dcg) // idcg_micro, 0)::BIGINT
         |         AS ndcg_int8_milli
         |FROM id LEFT JOIN dl ON dl.q_id = id.q_id
         |  LEFT JOIN d8 ON d8.q_id = id.q_id
         |ORDER BY id.q_id""".stripMargin,
    // q240: q48's quantization, the Gram via a generate_series pair
    // grid (materialized — the q162 lesson), then the EXACT integer
    // power-iteration recurrence as chained CTEs with sign-decomposed
    // rescaling to max|v| = 1000 per round.
    "q240_principal_direction" -> {
      // every round CTE is MATERIALIZED: each vN is referenced 3× by
      // round N+1 (join + two scalar subqueries) — plain CTEs inline,
      // and the chain re-expands 3^rounds (the q162 lesson, measured
      // here as a parity hang before the keyword went in)
      val rounds = (1 to Similarity.PowerRounds).map { r =>
        s"""w$r AS MATERIALIZED (SELECT g.i, sum(g.gv * v${r - 1}.x) w
           |      FROM g JOIN v${r - 1} ON v${r - 1}.i = g.j GROUP BY 1),
           |v$r AS MATERIALIZED (SELECT i,
           |      CASE WHEN w >= 0 THEN (1000 * w) // (SELECT max(abs(w)) FROM w$r)
           |        ELSE -((1000 * -w) // (SELECT max(abs(w)) FROM w$r)) END x
           |      FROM w$r)""".stripMargin
      }.mkString(",\n")
      val last = s"v${Similarity.PowerRounds}"
      s"""WITH e AS (SELECT embedding::DOUBLE[] v FROM embeddings),
         |s AS (SELECT v,
         |      127.0 / list_aggregate(list_transform(v, x -> abs(x)), 'max') sc
         |      FROM e
         |      WHERE list_aggregate(list_transform(v, x -> abs(x)), 'max') > 0),
         |q8 AS (SELECT list_transform(v, x ->
         |        (CASE WHEN x >= 0 THEN floor(abs(x * sc) + 0.5)
         |          ELSE -floor(abs(x * sc) + 0.5) END)::BIGINT) q FROM s),
         |g AS MATERIALIZED (SELECT i.i, j.j, sum(q[i.i] * q[j.j])::HUGEINT gv
         |      FROM q8, generate_series(1, 64) i(i), generate_series(1, 64) j(j)
         |      GROUP BY 1, 2),
         |v0 AS (SELECT i, 1000::HUGEINT x FROM generate_series(1, 64) t(i)),
         |$rounds,
         |wf AS (SELECT g.i, sum(g.gv * $last.x) w
         |      FROM g JOIN $last ON $last.i = g.j GROUP BY 1),
         |ray AS (SELECT ((1000 * sum(wf.w * $last.x))
         |        // (SELECT sum(x * x) FROM $last))::BIGINT r
         |      FROM wf JOIN $last ON $last.i = wf.i)
         |SELECT ($last.i - 1)::BIGINT AS dim, $last.x::BIGINT AS v_milli,
         |       ray.r AS rayleigh_milli
         |FROM $last, ray ORDER BY dim""".stripMargin
    },
    // q242: the q240 chain replayed PER SOURCE — every CTE carries the
    // source key and every round is MATERIALIZED (3× references).
    "q242_source_anisotropy" -> {
      val rounds = (1 to Similarity.PowerRounds).map { r =>
        s"""w$r AS MATERIALIZED (SELECT g.source, g.i, sum(g.gv * p.x) w
           |      FROM g JOIN v${r - 1} p ON p.source = g.source AND p.i = g.j
           |      GROUP BY 1, 2),
           |m$r AS MATERIALIZED (SELECT source, max(abs(w)) mx
           |      FROM w$r GROUP BY 1),
           |v$r AS MATERIALIZED (SELECT t.source, t.i,
           |      CASE WHEN t.w >= 0 THEN (1000 * t.w) // m.mx
           |        ELSE -((1000 * -t.w) // m.mx) END x
           |      FROM w$r t JOIN m$r m ON m.source = t.source)""".stripMargin
      }.mkString(",\n")
      val last = s"v${Similarity.PowerRounds}"
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |s AS (SELECT vec_id, v,
         |      127.0 / list_aggregate(list_transform(v, x -> abs(x)), 'max') sc
         |      FROM e
         |      WHERE list_aggregate(list_transform(v, x -> abs(x)), 'max') > 0),
         |q8 AS (SELECT vec_id, list_transform(v, x ->
         |        (CASE WHEN x >= 0 THEN floor(abs(x * sc) + 0.5)
         |          ELSE -floor(abs(x * sc) + 0.5) END)::BIGINT) q FROM s),
         |qd AS MATERIALIZED (SELECT source, q
         |      FROM q8 JOIN documents ON doc_id = vec_id),
         |g AS MATERIALIZED (SELECT source, i.i, j.j,
         |        sum(q[i.i] * q[j.j])::HUGEINT gv
         |      FROM qd, generate_series(1, 64) i(i), generate_series(1, 64) j(j)
         |      GROUP BY 1, 2, 3),
         |nv AS (SELECT source, count(*)::BIGINT n_vecs FROM qd GROUP BY 1),
         |v0 AS MATERIALIZED (SELECT src.source, t.i, 1000::HUGEINT x
         |      FROM (SELECT DISTINCT source FROM g) src,
         |        generate_series(1, 64) t(i)),
         |$rounds,
         |wf AS MATERIALIZED (SELECT g.source, g.i, sum(g.gv * p.x) w
         |      FROM g JOIN $last p ON p.source = g.source AND p.i = g.j
         |      GROUP BY 1, 2),
         |tr AS (SELECT source, sum(gv) trace FROM g WHERE i = j GROUP BY 1),
         |dn AS (SELECT source, sum(x * x) dnm FROM $last GROUP BY 1),
         |nm AS (SELECT w.source, sum(w.w * p.x) num
         |      FROM wf w JOIN $last p ON p.source = w.source AND p.i = w.i
         |      GROUP BY 1),
         |td AS (SELECT source, i, row_number() OVER (PARTITION BY source
         |        ORDER BY abs(x) DESC, i) rk FROM $last)
         |SELECT nm.source, nv.n_vecs, tr.trace::BIGINT AS trace,
         |       ((1000 * nm.num) // dn.dnm)::BIGINT AS rayleigh_milli,
         |       ((1000 * nm.num) // (dn.dnm * tr.trace))::BIGINT
         |         AS anisotropy_pm,
         |       (td.i - 1)::BIGINT AS top_dim
         |FROM nm JOIN dn ON dn.source = nm.source
         |  JOIN tr ON tr.source = nm.source
         |  JOIN nv ON nv.source = nm.source
         |  JOIN td ON td.source = nm.source AND td.rk = 1
         |ORDER BY nm.source""".stripMargin
    },
    // q244: the q240 chain (Gram + 8 power rounds → v1), THEN the
    // deflated chain — 8 more rounds, each matvec followed by an exact
    // integer projection p = u·(v1ᵀv1) − (v1ᵀu)·v1 — plus trace /
    // Frobenius sums. Every vector CTE is MATERIALIZED (multiply
    // referenced; the q162 3^rounds inlining lesson). G is PSD, so
    // every Rayleigh numerator is ≥ 0 and DuckDB's floor // equals
    // the driver's truncating BigInt division; degenerate rank-1
    // corpora give a zero deflated vector and NULL λ2/ratio in both
    // engines (x//0 is NULL in DuckDB, guarded None on the driver).
    "q244_spectral_spread" -> {
      val v1rounds = (1 to Similarity.PowerRounds).map { r =>
        s"""w$r AS MATERIALIZED (SELECT g.i, sum(g.gv * v${r - 1}.x) w
           |      FROM g JOIN v${r - 1} ON v${r - 1}.i = g.j GROUP BY 1),
           |v$r AS MATERIALIZED (SELECT i,
           |      CASE WHEN w >= 0 THEN (1000 * w) // (SELECT max(abs(w)) FROM w$r)
           |        ELSE -((1000 * -w) // (SELECT max(abs(w)) FROM w$r)) END x
           |      FROM w$r)""".stripMargin
      }.mkString(",\n")
      val v1 = s"v${Similarity.PowerRounds}"
      val defRounds = (1 to Similarity.PowerRounds).map { r =>
        s"""u$r AS MATERIALIZED (SELECT g.i, sum(g.gv * x${r - 1}.x) u
           |      FROM g JOIN x${r - 1} ON x${r - 1}.i = g.j GROUP BY 1),
           |d$r AS MATERIALIZED (SELECT sum($v1.x * u$r.u) dot
           |      FROM u$r JOIN $v1 ON $v1.i = u$r.i),
           |p$r AS MATERIALIZED (SELECT u$r.i,
           |      u$r.u * (SELECT dd FROM dn1) - (SELECT dot FROM d$r) * $v1.x p
           |      FROM u$r JOIN $v1 ON $v1.i = u$r.i),
           |m$r AS (SELECT greatest(max(abs(p)), 1) mx FROM p$r),
           |x$r AS MATERIALIZED (SELECT i,
           |      CASE WHEN p >= 0 THEN (1000 * p) // (SELECT mx FROM m$r)
           |        ELSE -((1000 * -p) // (SELECT mx FROM m$r)) END x
           |      FROM p$r)""".stripMargin
      }.mkString(",\n")
      val xf = s"x${Similarity.PowerRounds}"
      s"""WITH e AS (SELECT embedding::DOUBLE[] v FROM embeddings),
         |s AS (SELECT v,
         |      127.0 / list_aggregate(list_transform(v, x -> abs(x)), 'max') sc
         |      FROM e
         |      WHERE list_aggregate(list_transform(v, x -> abs(x)), 'max') > 0),
         |q8 AS (SELECT list_transform(v, x ->
         |        (CASE WHEN x >= 0 THEN floor(abs(x * sc) + 0.5)
         |          ELSE -floor(abs(x * sc) + 0.5) END)::BIGINT) q FROM s),
         |g AS MATERIALIZED (SELECT i.i, j.j, sum(q[i.i] * q[j.j])::HUGEINT gv
         |      FROM q8, generate_series(1, 64) i(i), generate_series(1, 64) j(j)
         |      GROUP BY 1, 2),
         |v0 AS (SELECT i, 1000::HUGEINT x FROM generate_series(1, 64) t(i)),
         |$v1rounds,
         |wf AS MATERIALIZED (SELECT g.i, sum(g.gv * $v1.x) w
         |      FROM g JOIN $v1 ON $v1.i = g.j GROUP BY 1),
         |dn1 AS MATERIALIZED (SELECT sum(x * x) dd FROM $v1),
         |nm1 AS MATERIALIZED (SELECT sum(wf.w * $v1.x) nn
         |      FROM wf JOIN $v1 ON $v1.i = wf.i),
         |tr AS (SELECT sum(gv) t FROM g WHERE i = j),
         |fro AS (SELECT sum(gv * gv) f FROM g),
         |d0 AS MATERIALIZED (SELECT 1000 * sum(x) dot FROM $v1),
         |p0 AS MATERIALIZED (SELECT $v1.i,
         |      1000 * (SELECT dd FROM dn1) - (SELECT dot FROM d0) * $v1.x p
         |      FROM $v1),
         |m0 AS (SELECT greatest(max(abs(p)), 1) mx FROM p0),
         |x0 AS MATERIALIZED (SELECT i,
         |      CASE WHEN p >= 0 THEN (1000 * p) // (SELECT mx FROM m0)
         |        ELSE -((1000 * -p) // (SELECT mx FROM m0)) END x
         |      FROM p0),
         |$defRounds,
         |gf AS MATERIALIZED (SELECT g.i, sum(g.gv * $xf.x) u
         |      FROM g JOIN $xf ON $xf.i = g.j GROUP BY 1),
         |fn2 AS (SELECT sum(gf.u * $xf.x) nn FROM gf JOIN $xf ON $xf.i = gf.i),
         |fd2 AS (SELECT sum(x * x) dd FROM $xf)
         |SELECT tr.t::BIGINT AS trace,
         |       (CASE WHEN fn2.nn * dn1.dd > nm1.nn * fd2.dd
         |          THEN (1000 * fn2.nn) // fd2.dd
         |          ELSE (1000 * nm1.nn) // dn1.dd END)::BIGINT
         |         AS lambda1_milli,
         |       (CASE WHEN fn2.nn * dn1.dd > nm1.nn * fd2.dd
         |          THEN (1000 * nm1.nn) // dn1.dd
         |          ELSE (1000 * fn2.nn) // fd2.dd END)::BIGINT
         |         AS lambda2_milli,
         |       (CASE WHEN fn2.nn * dn1.dd > nm1.nn * fd2.dd
         |          THEN (1000 * nm1.nn * fd2.dd) // (dn1.dd * fn2.nn)
         |          ELSE (1000 * fn2.nn * dn1.dd) // (fd2.dd * nm1.nn) END)
         |         ::BIGINT AS ratio_pm,
         |       ((1000 * tr.t * tr.t) // fro.f)::BIGINT AS pr_milli
         |FROM tr, fro, nm1, dn1, fn2, fd2""".stripMargin
    },
    // q247: the q26 exact-cosine chain with the cross-source predicate
    // in the candidate join (pre-filter evaluation order).
    "q247_filtered_knn" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        |es AS (SELECT e.vec_id, e.v, d.source
        |      FROM e JOIN documents d ON d.doc_id = e.vec_id),
        |s AS (SELECT q.vec_id q_id, n.vec_id neighbor_id,
        |      list_dot_product(q.v, n.v)
        |      / sqrt(list_dot_product(q.v, q.v) * list_dot_product(n.v, n.v)) c
        |      FROM es q, es n WHERE q.vec_id < 10 AND n.vec_id != q.vec_id
        |        AND n.source != q.source),
        |r AS (SELECT q_id, neighbor_id, c, row_number() OVER
        |      (PARTITION BY q_id ORDER BY c DESC, neighbor_id) rnk FROM s)
        |SELECT q_id, neighbor_id, round(c, 6) AS cosine, rnk::BIGINT AS rank
        |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    // q248: the q27 signature/bucket chain, source labels joined on,
    // post-filter counts, filtered top-5, and exact recall vs the q247
    // chain — every multiply-referenced CTE MATERIALIZED.
    "q248_filtered_lsh_audit" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        |es AS MATERIALIZED (SELECT e.vec_id, e.v, d.source
        |      FROM e JOIN documents d ON d.doc_id = e.vec_id),
        |sig AS (SELECT vec_id, t,
        |  list_sum(list_transform(generate_series(0, 3), r ->
        |    CASE WHEN list_sum(list_transform(generate_series(0, 63), i ->
        |      (CASE WHEN ((((t*4 + r)*64 + i) * 2654435761) & 65536) != 0
        |            THEN 1.0 ELSE -1.0 END) * v[i + 1])) > 0
        |    THEN (1::BIGINT << r) ELSE 0 END))::BIGINT AS bucket
        |  FROM e, generate_series(0, 3) g(t)),
        |cand AS (SELECT DISTINCT q.vec_id q_id, c.vec_id vec_id
        |         FROM sig q JOIN sig c ON q.t = c.t AND q.bucket = c.bucket
        |              AND q.vec_id != c.vec_id
        |         WHERE q.vec_id < 10),
        |cs AS MATERIALIZED (SELECT cand.q_id, cand.vec_id,
        |        qs.source q_src, ns.source n_src
        |      FROM cand JOIN es qs ON qs.vec_id = cand.q_id
        |           JOIN es ns ON ns.vec_id = cand.vec_id),
        |nc AS (SELECT q_id, count(*)::BIGINT n_cand,
        |        sum(CASE WHEN n_src != q_src THEN 1 ELSE 0 END)::BIGINT nf
        |      FROM cs GROUP BY 1),
        |sc AS (SELECT cs.q_id, cs.vec_id neighbor_id,
        |      list_dot_product(q.v, n.v)
        |      / sqrt(list_dot_product(q.v, q.v) * list_dot_product(n.v, n.v)) c
        |      FROM cs JOIN e q ON q.vec_id = cs.q_id
        |           JOIN e n ON n.vec_id = cs.vec_id
        |      WHERE cs.n_src != cs.q_src),
        |lt AS MATERIALIZED (SELECT q_id, neighbor_id FROM
        |      (SELECT q_id, neighbor_id, row_number() OVER
        |        (PARTITION BY q_id ORDER BY c DESC, neighbor_id) rnk FROM sc)
        |      WHERE rnk <= 5),
        |xs AS (SELECT q.vec_id q_id, n.vec_id neighbor_id,
        |      list_dot_product(q.v, n.v)
        |      / sqrt(list_dot_product(q.v, q.v) * list_dot_product(n.v, n.v)) c
        |      FROM es q, es n WHERE q.vec_id < 10 AND n.vec_id != q.vec_id
        |        AND n.source != q.source),
        |xt AS MATERIALIZED (SELECT q_id, neighbor_id FROM
        |      (SELECT q_id, neighbor_id, row_number() OVER
        |        (PARTITION BY q_id ORDER BY c DESC, neighbor_id) rnk FROM xs)
        |      WHERE rnk <= 5),
        |ov AS (SELECT lt.q_id, count(*)::BIGINT n_hit
        |      FROM lt JOIN xt ON xt.q_id = lt.q_id
        |        AND xt.neighbor_id = lt.neighbor_id GROUP BY 1),
        |xn AS (SELECT q_id, count(*)::BIGINT n_exact FROM xt GROUP BY 1),
        |fl AS (SELECT q_id, count(*)::BIGINT n_filled FROM lt GROUP BY 1)
        |SELECT base.vec_id AS q_id,
        |       coalesce(nc.n_cand, 0)::BIGINT AS n_cand,
        |       coalesce(nc.nf, 0)::BIGINT AS n_cand_filtered,
        |       coalesce(fl.n_filled, 0)::BIGINT AS n_filled,
        |       ((1000 * coalesce(ov.n_hit, 0)) // xn.n_exact)::BIGINT
        |         AS recall_pm
        |FROM (SELECT vec_id FROM es WHERE vec_id < 10) base
        |LEFT JOIN nc ON nc.q_id = base.vec_id
        |LEFT JOIN fl ON fl.q_id = base.vec_id
        |LEFT JOIN ov ON ov.q_id = base.vec_id
        |LEFT JOIN xn ON xn.q_id = base.vec_id
        |ORDER BY q_id""".stripMargin,
    // q249: int8 quantization (the q240 q8 chain), signed-square micro
    // relevance, top-12 pool, pool-pair sims, then MmrK−1 greedy
    // rounds as chained MATERIALIZED CTEs — each round = candidates
    // minus selected, penalty = max pool-pair sim to the selected set,
    // argmax (score desc, id asc).
    "q249_mmr_diversified" -> {
      val rounds = (2 to Similarity.MmrK).map { r =>
        s"""c$r AS MATERIALIZED (
           |  SELECT p.q_id, p.vec_id, p.srel, p.srel - max(x.ssim) score
           |  FROM pool p JOIN pp x ON x.q_id = p.q_id AND x.bb = p.vec_id
           |       JOIN u${r - 1} u ON u.q_id = x.q_id AND u.vec_id = x.aa
           |  WHERE NOT EXISTS (SELECT 1 FROM u${r - 1} u2
           |    WHERE u2.q_id = p.q_id AND u2.vec_id = p.vec_id)
           |  GROUP BY 1, 2, 3),
           |s$r AS MATERIALIZED (SELECT q_id, vec_id, srel, score, $r rnk FROM
           |  (SELECT *, row_number() OVER (PARTITION BY q_id
           |     ORDER BY score DESC, vec_id) rn FROM c$r) WHERE rn = 1),
           |u$r AS MATERIALIZED (SELECT q_id, vec_id FROM u${r - 1}
           |  UNION ALL SELECT q_id, vec_id FROM s$r)""".stripMargin
      }.mkString(",\n")
      val unions = (2 to Similarity.MmrK)
        .map(r => s"SELECT * FROM s$r").mkString(" UNION ALL ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |sq AS (SELECT vec_id, v,
         |      127.0 / list_aggregate(list_transform(v, x -> abs(x)), 'max') sc
         |      FROM e
         |      WHERE list_aggregate(list_transform(v, x -> abs(x)), 'max') > 0),
         |q8 AS (SELECT vec_id, list_transform(v, x ->
         |        (CASE WHEN x >= 0 THEN floor(abs(x * sc) + 0.5)
         |          ELSE -floor(abs(x * sc) + 0.5) END)::BIGINT) q FROM sq),
         |qq AS MATERIALIZED (SELECT vec_id, q,
         |      list_dot_product(q, q)::BIGINT qn FROM q8
         |      WHERE list_dot_product(q, q) > 0),
         |sr AS (SELECT a.vec_id q_id, b.vec_id vec_id, b.q, b.qn,
         |      CASE WHEN list_dot_product(a.q, b.q) >= 0
         |        THEN (1000000 * list_dot_product(a.q, b.q)::BIGINT
         |              * list_dot_product(a.q, b.q)::BIGINT) // (a.qn * b.qn)
         |        ELSE -((1000000 * list_dot_product(a.q, b.q)::BIGINT
         |              * list_dot_product(a.q, b.q)::BIGINT) // (a.qn * b.qn))
         |      END srel
         |      FROM qq a JOIN qq b ON b.vec_id != a.vec_id
         |      WHERE a.vec_id < 10),
         |pool AS MATERIALIZED (SELECT q_id, vec_id, q, qn, srel FROM
         |      (SELECT *, row_number() OVER (PARTITION BY q_id
         |         ORDER BY srel DESC, vec_id) rnk FROM sr)
         |      WHERE rnk <= ${Similarity.MmrPool}),
         |pp AS MATERIALIZED (SELECT a.q_id, a.vec_id aa, b.vec_id bb,
         |      CASE WHEN list_dot_product(a.q, b.q) >= 0
         |        THEN (1000000 * list_dot_product(a.q, b.q)::BIGINT
         |              * list_dot_product(a.q, b.q)::BIGINT) // (a.qn * b.qn)
         |        ELSE -((1000000 * list_dot_product(a.q, b.q)::BIGINT
         |              * list_dot_product(a.q, b.q)::BIGINT) // (a.qn * b.qn))
         |      END ssim
         |      FROM pool a JOIN pool b ON b.q_id = a.q_id
         |        AND b.vec_id != a.vec_id),
         |s1 AS MATERIALIZED (SELECT q_id, vec_id, srel, srel score, 1 rnk
         |      FROM (SELECT *, row_number() OVER (PARTITION BY q_id
         |         ORDER BY srel DESC, vec_id) rn FROM pool) WHERE rn = 1),
         |u1 AS (SELECT q_id, vec_id FROM s1),
         |$rounds
         |SELECT q_id, rnk::BIGINT AS rank, vec_id AS neighbor_id,
         |       srel::BIGINT AS srel_micro, score::BIGINT AS score_micro
         |FROM (SELECT * FROM s1 UNION ALL $unions)
         |ORDER BY q_id, rank""".stripMargin
    },
    // q251: both ANN-path oracles as subqueries, ranks → hardcoded
    // RRF discounts, (q, neighbor)-keyed vote sum, fused top-5.
    "q251_rrf_fusion" -> {
      val discCase = Similarity.RrfDiscounts.zipWithIndex
        .map { case (v, i) => s"WHEN ${i + 1} THEN $v" }
        .mkString("CASE rank ", " ", " END")
      s"""WITH lshr AS ($LshTopkSql),
         |i8r AS ($Int8TopkSql),
         |votes AS (SELECT q_id, neighbor_id, $discCase v FROM lshr
         |      UNION ALL SELECT q_id, neighbor_id, $discCase v FROM i8r),
         |fused AS (SELECT q_id, neighbor_id, sum(v)::BIGINT rrf_micro,
         |        count(*)::BIGINT n_paths
         |      FROM votes GROUP BY 1, 2),
         |r AS (SELECT q_id, neighbor_id, rrf_micro, n_paths,
         |      row_number() OVER (PARTITION BY q_id
         |        ORDER BY rrf_micro DESC, neighbor_id) rnk FROM fused)
         |SELECT q_id, rnk::BIGINT AS rank, neighbor_id, rrf_micro, n_paths
         |FROM r WHERE rnk <= 5 ORDER BY q_id, rank""".stripMargin
    },
    // q252: the q240 quantization chain labeled by source, per-
    // (source, dim) sums + counts, alphabet-bounded pair join on dim,
    // cross-multiplied HUGEINT difference squared.
    "q252_source_embed_drift" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        |sq AS (SELECT vec_id, v,
        |      127.0 / list_aggregate(list_transform(v, x -> abs(x)), 'max') sc
        |      FROM e
        |      WHERE list_aggregate(list_transform(v, x -> abs(x)), 'max') > 0),
        |q8 AS (SELECT vec_id, list_transform(v, x ->
        |        (CASE WHEN x >= 0 THEN floor(abs(x * sc) + 0.5)
        |          ELSE -floor(abs(x * sc) + 0.5) END)::BIGINT) q FROM sq),
        |qd AS MATERIALIZED (SELECT d.source, q
        |      FROM q8 JOIN documents d ON d.doc_id = q8.vec_id),
        |sums AS (SELECT source, i.i pos, sum(q[i.i])::BIGINT s
        |      FROM qd, generate_series(1, 64) i(i) GROUP BY 1, 2),
        |nt AS (SELECT source, count(*)::BIGINT n FROM qd GROUP BY 1),
        |pj AS (SELECT a.source sa, b.source sb, na.n n_a, nb.n n_b,
        |        sum((na.n::HUGEINT * b.s - nb.n::HUGEINT * a.s)
        |            * (na.n::HUGEINT * b.s - nb.n::HUGEINT * a.s)) d2
        |      FROM sums a JOIN sums b ON b.pos = a.pos AND a.source < b.source
        |        JOIN nt na ON na.source = a.source
        |        JOIN nt nb ON nb.source = b.source
        |      GROUP BY 1, 2, 3, 4)
        |SELECT sa AS source_a, sb AS source_b, n_a, n_b,
        |       ((1000 * d2) // (n_a::HUGEINT * n_a * n_b * n_b))::BIGINT
        |         AS mmd_milli
        |FROM pj ORDER BY source_a, source_b""".stripMargin,
    // q257: q25's sign-plane LSH buckets carrying lang, cross-language
    // candidates only, cosine floored to ppm, per-vector top-4
    // neighborhood sums, margin = c·(na+nb) div (sa+sb) in milli.
    "q257_bitext_margin" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |lg AS MATERIALIZED (SELECT e.vec_id, e.v, d.lang
         |      FROM e JOIN documents d ON d.doc_id = e.vec_id),
         |sig AS (SELECT vec_id, lang, t,
         |  list_sum(list_transform(generate_series(0, 3), r ->
         |    CASE WHEN list_sum(list_transform(generate_series(0, 63), i ->
         |      (CASE WHEN ((((t*4 + r)*64 + i) * 2654435761) & 65536) != 0
         |            THEN 1.0 ELSE -1.0 END) * v[i + 1])) > 0
         |    THEN (1::BIGINT << r) ELSE 0 END))::BIGINT AS bucket
         |  FROM lg, generate_series(0, 3) g(t)),
         |hotb AS (SELECT t, bucket FROM sig GROUP BY t, bucket
         |         HAVING count(*) > ${Similarity.BitextBucketCap}),
         |cand AS (SELECT DISTINCT a.vec_id va, b.vec_id vb
         |         FROM sig a JOIN sig b
         |         ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
         |           AND a.lang != b.lang
         |         WHERE NOT EXISTS (SELECT 1 FROM hotb h
         |           WHERE h.t = a.t AND h.bucket = a.bucket)),
         |sc AS MATERIALIZED (SELECT va, vb, x.lang lang_a, y.lang lang_b,
         |  floor(1000000 * (list_dot_product(x.v, y.v)
         |    / sqrt(list_dot_product(x.v, x.v) * list_dot_product(y.v, y.v))))
         |    ::BIGINT c_ppm
         |  FROM cand JOIN lg x ON x.vec_id = va JOIN lg y ON y.vec_id = vb),
         |nb AS (SELECT va vid, vb partner, c_ppm FROM sc
         |       UNION ALL SELECT vb, va, c_ppm FROM sc),
         |hood AS (SELECT vid, sum(c_ppm)::BIGINT s, count(*)::BIGINT n FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vid
         |    ORDER BY c_ppm DESC, partner) rn FROM nb) WHERE rn <= ${Similarity.BitextK}
         |  GROUP BY vid)
         |SELECT va AS vec_a, vb AS vec_b, lang_a, lang_b, c_ppm,
         |  ((1000 * c_ppm * (ha.n + hb.n)) // (ha.s + hb.s))::BIGINT margin_milli
         |FROM sc JOIN hood ha ON ha.vid = va JOIN hood hb ON hb.vid = vb
         |WHERE ha.s + hb.s > 0
         |  AND (1000 * c_ppm * (ha.n + hb.n)) // (ha.s + hb.s)
         |      >= ${Similarity.BitextMarginMilli}
         |ORDER BY margin_milli DESC, vec_a, vec_b""".stripMargin,
    // q262: the q26 truth and the four q33 probe plans embedded
    // verbatim (shared-oracle rule), one scalar-count hit join per
    // grid point.
    "q262_ivf_probe_curve" -> {
      val cols = Similarity.IvfProbeGrid.map(np =>
        s"i$np AS (SELECT q_id, neighbor_id FROM (${ivfTopkSql(np)}))")
        .mkString(",\n")
      val pts = Similarity.IvfProbeGrid.map(np =>
        s"""SELECT $np::BIGINT nprobe,
           |  (SELECT count(*) FROM gt JOIN i$np
           |     USING (q_id, neighbor_id))::BIGINT n_hits"""
          .stripMargin).mkString("\nUNION ALL\n")
      s"""WITH gt AS (SELECT q_id, neighbor_id FROM ($BruteTopkSql)),
         |$cols,
         |u AS ($pts),
         |tot AS (SELECT count(*)::BIGINT n_truth FROM gt)
         |SELECT nprobe, n_truth, n_hits,
         |  ((1000 * n_hits) // n_truth)::BIGINT AS recall_pm
         |FROM u, tot ORDER BY nprobe""".stripMargin
    },
    // q265: the q22 shingle relation query-side-restricted, exact
    // Jaccard lexical top-5, the q26 dense top-5, q251's hardcoded
    // RRF discounts, fused top-5.
    "q265_hybrid_mlt" -> {
      val discCase = Similarity.RrfDiscounts.zipWithIndex
        .map { case (v, i) => s"WHEN ${i + 1} THEN $v" }
        .mkString("CASE rank ", " ", " END")
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk
         |      FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |      FROM (SELECT doc_id, tk,
         |              unnest(generate_series(1, len(tk) - 2)) i FROM t)),
         |szs AS (SELECT doc_id, count(*)::BIGINT sz FROM sh GROUP BY 1),
         |cm AS (SELECT q.doc_id q_id, p.doc_id did, count(*)::BIGINT c
         |      FROM sh q JOIN sh p ON p.h = q.h AND p.doc_id != q.doc_id
         |      WHERE q.doc_id < 10 GROUP BY 1, 2),
         |lex AS (SELECT q_id, did AS neighbor_id,
         |        row_number() OVER (PARTITION BY q_id
         |          ORDER BY c / (a.sz + b.sz - c) DESC, did)::BIGINT rank
         |      FROM cm JOIN szs a ON a.doc_id = q_id
         |        JOIN szs b ON b.doc_id = did),
         |dn AS (SELECT q_id, neighbor_id, rank FROM ($BruteTopkSql)),
         |votes AS (SELECT q_id, neighbor_id, $discCase v
         |        FROM lex WHERE rank <= 5
         |      UNION ALL SELECT q_id, neighbor_id, $discCase v FROM dn),
         |fused AS (SELECT q_id, neighbor_id, sum(v)::BIGINT rrf_micro,
         |        count(*)::BIGINT n_paths FROM votes GROUP BY 1, 2),
         |r AS (SELECT q_id, neighbor_id, rrf_micro, n_paths,
         |      row_number() OVER (PARTITION BY q_id
         |        ORDER BY rrf_micro DESC, neighbor_id) rnk FROM fused)
         |SELECT q_id, rnk::BIGINT AS rank, neighbor_id, rrf_micro, n_paths
         |FROM r WHERE rnk <= 5 ORDER BY q_id, rank""".stripMargin
    },
    // q269: the q48 quant chain, dt = the same sequential double fold,
    // per-row ppm floor, then pure integer per-source aggregates.
    "q269_quant_fidelity" -> {
      val floor = Similarity.QuantFidFloorPpm
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |sq AS (SELECT vec_id, v, list_dot_product(v, v) nn,
         |      127.0 / list_aggregate(list_transform(v, x -> abs(x)), 'max') sc
         |      FROM e
         |      WHERE list_aggregate(list_transform(v, x -> abs(x)), 'max') > 0),
         |q8 AS (SELECT vec_id, v, nn, list_transform(v, x ->
         |        (CASE WHEN x >= 0 THEN floor(abs(x * sc) + 0.5)
         |          ELSE -floor(abs(x * sc) + 0.5) END)::DOUBLE) q FROM sq),
         |qq AS (SELECT vec_id, v, nn, q,
         |      list_dot_product(q, q)::BIGINT qn FROM q8
         |      WHERE list_dot_product(q, q) > 0),
         |dd AS (SELECT vec_id, nn, qn, list_dot_product(v, q) dt FROM qq),
         |f AS (SELECT vec_id,
         |      (CASE WHEN dt >= 0
         |        THEN floor(1000000.0 * dt * dt / (nn * qn))
         |        ELSE -floor(1000000.0 * dt * dt / (nn * qn))
         |       END)::BIGINT fid FROM dd),
         |j AS (SELECT d.source, f.fid FROM f
         |      JOIN documents d ON d.doc_id = f.vec_id)
         |SELECT source, count(*)::BIGINT AS n_vecs,
         |       (sum(fid) // count(*))::BIGINT AS mean_fid_ppm,
         |       min(fid)::BIGINT AS min_fid_ppm,
         |       sum(CASE WHEN fid < $floor THEN 1 ELSE 0 END)::BIGINT
         |         AS n_below
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // q274: the q240 power chain + the q244 deflation chain (both
    // MATERIALIZED round-for-round), per-vector dots with each
    // direction via an index cross-join, per-source HUGEINT energy
    // ratios against the direction norms.
    "q274_source_projection_energy" -> {
      val v1rounds = (1 to Similarity.PowerRounds).map { r =>
        s"""w$r AS MATERIALIZED (SELECT g.i, sum(g.gv * v${r - 1}.x) w
           |      FROM g JOIN v${r - 1} ON v${r - 1}.i = g.j GROUP BY 1),
           |v$r AS MATERIALIZED (SELECT i,
           |      CASE WHEN w >= 0 THEN (1000 * w) // (SELECT max(abs(w)) FROM w$r)
           |        ELSE -((1000 * -w) // (SELECT max(abs(w)) FROM w$r)) END x
           |      FROM w$r)""".stripMargin
      }.mkString(",\n")
      val v1 = s"v${Similarity.PowerRounds}"
      val defRounds = (1 to Similarity.PowerRounds).map { r =>
        s"""u$r AS MATERIALIZED (SELECT g.i, sum(g.gv * x${r - 1}.x) u
           |      FROM g JOIN x${r - 1} ON x${r - 1}.i = g.j GROUP BY 1),
           |d$r AS MATERIALIZED (SELECT sum($v1.x * u$r.u) dot
           |      FROM u$r JOIN $v1 ON $v1.i = u$r.i),
           |p$r AS MATERIALIZED (SELECT u$r.i,
           |      u$r.u * (SELECT dd FROM dn1) - (SELECT dot FROM d$r) * $v1.x p
           |      FROM u$r JOIN $v1 ON $v1.i = u$r.i),
           |m$r AS (SELECT greatest(max(abs(p)), 1) mx FROM p$r),
           |x$r AS MATERIALIZED (SELECT i,
           |      CASE WHEN p >= 0 THEN (1000 * p) // (SELECT mx FROM m$r)
           |        ELSE -((1000 * -p) // (SELECT mx FROM m$r)) END x
           |      FROM p$r)""".stripMargin
      }.mkString(",\n")
      val xf = s"x${Similarity.PowerRounds}"
      s"""WITH ee AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |ss AS (SELECT vec_id, v,
         |      127.0 / list_aggregate(list_transform(v, x -> abs(x)), 'max') sc
         |      FROM ee
         |      WHERE list_aggregate(list_transform(v, x -> abs(x)), 'max') > 0),
         |qs AS MATERIALIZED (SELECT vec_id, list_transform(v, x ->
         |        (CASE WHEN x >= 0 THEN floor(abs(x * sc) + 0.5)
         |          ELSE -floor(abs(x * sc) + 0.5) END)::BIGINT) q FROM ss),
         |g AS MATERIALIZED (SELECT i.i, j.j, sum(q[i.i] * q[j.j])::HUGEINT gv
         |      FROM qs, generate_series(1, 64) i(i), generate_series(1, 64) j(j)
         |      GROUP BY 1, 2),
         |v0 AS (SELECT i, 1000::HUGEINT x FROM generate_series(1, 64) t(i)),
         |$v1rounds,
         |dn1 AS MATERIALIZED (SELECT sum(x * x) dd FROM $v1),
         |d0 AS MATERIALIZED (SELECT 1000 * sum(x) dot FROM $v1),
         |p0 AS MATERIALIZED (SELECT $v1.i,
         |      1000 * (SELECT dd FROM dn1) - (SELECT dot FROM d0) * $v1.x p
         |      FROM $v1),
         |m0 AS (SELECT greatest(max(abs(p)), 1) mx FROM p0),
         |x0 AS MATERIALIZED (SELECT i,
         |      CASE WHEN p >= 0 THEN (1000 * p) // (SELECT mx FROM m0)
         |        ELSE -((1000 * -p) // (SELECT mx FROM m0)) END x
         |      FROM p0),
         |$defRounds,
         |fd2 AS (SELECT sum(x * x) dd FROM $xf),
         |pd1 AS MATERIALIZED (SELECT qs.vec_id,
         |      sum(qs.q[vv.i] * vv.x)::HUGEINT dt FROM qs, $v1 vv GROUP BY 1),
         |pd2 AS MATERIALIZED (SELECT qs.vec_id,
         |      sum(qs.q[xx.i] * xx.x)::HUGEINT dt FROM qs, $xf xx GROUP BY 1),
         |qn AS (SELECT vec_id, list_dot_product(q, q)::HUGEINT qn FROM qs),
         |per AS (SELECT doc.source, qn.qn,
         |        pd1.dt * pd1.dt d1sq, pd2.dt * pd2.dt d2sq
         |      FROM qn JOIN pd1 ON pd1.vec_id = qn.vec_id
         |      JOIN pd2 ON pd2.vec_id = qn.vec_id
         |      JOIN documents doc ON doc.doc_id = qn.vec_id)
         |SELECT source, count(*)::BIGINT AS n_vecs,
         |       ((1000 * sum(d1sq)) //
         |        ((SELECT dd FROM dn1) * sum(qn)))::BIGINT AS energy1_pm,
         |       ((1000 * sum(d2sq)) //
         |        ((SELECT dd FROM fd2) * sum(qn)))::BIGINT AS energy2_pm
         |FROM per GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // q275: the q186 micro-shift integerization per (source, dim)
    // cell, corpus re-agg of the cells, exact cross-multiplied
    // |mean diff| ranking in HUGEINT, sign-decomposed micro diff.
    "q275_source_dim_drift" -> {
      val topk = Similarity.DimDriftTopK
      s"""WITH x AS (SELECT doc.source, e.i::BIGINT - 1 AS dim,
         |      floor(e.embedding[e.i]::DOUBLE * 1000000)::BIGINT
         |        + 1000000 AS vms
         |      FROM (SELECT vec_id, embedding,
         |            unnest(generate_series(1, len(embedding))) i
         |            FROM embeddings) e
         |      JOIN documents doc ON doc.doc_id = e.vec_id),
         |cells AS MATERIALIZED (SELECT source, dim, sum(vms)::BIGINT s_sd,
         |      count(*)::BIGINT n_s FROM x GROUP BY 1, 2),
         |corp AS (SELECT dim, sum(s_sd)::BIGINT c_p, sum(n_s)::BIGINT n
         |      FROM cells GROUP BY 1),
         |j AS (SELECT cells.source, cells.dim, s_sd, n_s, c_p, n,
         |      s_sd::HUGEINT * n - c_p::HUGEINT * n_s AS num
         |      FROM cells JOIN corp ON corp.dim = cells.dim),
         |r AS (SELECT *, row_number() OVER
         |      (PARTITION BY source ORDER BY abs(num) DESC, dim) rnk FROM j)
         |SELECT source, rnk::BIGINT AS rnk, dim,
         |       (s_sd // n_s - 1000000)::BIGINT AS mean_src_micro,
         |       (c_p // n - 1000000)::BIGINT AS mean_corpus_micro,
         |       (CASE WHEN num >= 0 THEN num // (n_s::HUGEINT * n)
         |             ELSE -((-num) // (n_s::HUGEINT * n))
         |        END)::BIGINT AS diff_micro
         |FROM r WHERE rnk <= $topk ORDER BY source, rnk""".stripMargin
    },
    // q279: the q26 exact-cosine chain over the mod-7 query sample,
    // top-5 per query (ties (c desc, id)), two source joins, agg.
    "q279_knn_source_purity" -> {
      val stride = Similarity.PurityStride
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |s AS (SELECT q.vec_id q_id, n.vec_id nid,
         |      list_dot_product(q.v, n.v)
         |      / sqrt(list_dot_product(q.v, q.v) * list_dot_product(n.v, n.v)) c
         |      FROM e q, e n
         |      WHERE q.vec_id % $stride = 0 AND n.vec_id != q.vec_id),
         |r AS (SELECT q_id, nid FROM (SELECT q_id, nid,
         |      row_number() OVER (PARTITION BY q_id ORDER BY c DESC, nid) rnk
         |      FROM s) WHERE rnk <= 5),
         |m AS (SELECT dq.source q_src, r.q_id,
         |      sum(CASE WHEN dn.source = dq.source THEN 1 ELSE 0 END)
         |        ::BIGINT mm
         |      FROM r JOIN documents dq ON dq.doc_id = r.q_id
         |           JOIN documents dn ON dn.doc_id = r.nid
         |      GROUP BY 1, 2)
         |SELECT q_src AS source, count(*)::BIGINT AS n_queries,
         |       sum(mm)::BIGINT AS n_matched,
         |       ((1000 * sum(mm)) // (5 * count(*)))::BIGINT AS purity_milli,
         |       sum(CASE WHEN mm = 5 THEN 1 ELSE 0 END)::BIGINT AS n_pure,
         |       sum(CASE WHEN mm <= 1 THEN 1 ELSE 0 END)::BIGINT AS n_foreign
         |FROM m GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // q282: the q269 quant chain for the embedding view, H(tok) mod 64
    // capped counts for the lexical view, sparse (i,j) product cells
    // per source, the dense 64x64 centered-M grid (n*C − s_i*s_j),
    // HUGEINT Frobenius sums, one floored division per alignment.
    "q282_repr_alignment" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |sq AS (SELECT vec_id, v,
         |      127.0 / list_aggregate(list_transform(v, x -> abs(x)), 'max') sc
         |      FROM e
         |      WHERE list_aggregate(list_transform(v, x -> abs(x)), 'max') > 0),
         |yq AS (SELECT vec_id, list_transform(v, x ->
         |        (CASE WHEN x >= 0 THEN floor(abs(x * sc) + 0.5)
         |          ELSE -floor(abs(x * sc) + 0.5) END)::BIGINT) q FROM sq),
         |dj AS MATERIALIZED (SELECT d.source, d.doc_id, d.text, yq.q
         |      FROM yq JOIN documents d ON d.doc_id = yq.vec_id),
         |ns AS (SELECT source, count(*)::BIGINT n FROM dj GROUP BY 1),
         |tk AS (SELECT doc_id, unnest(string_split(text, ' ')) tok FROM dj),
         |bc AS (SELECT doc_id, ${H("tok")} % 64 AS i,
         |      least(count(*), 127)::BIGINT xv FROM tk GROUP BY 1, 2),
         |xs AS MATERIALIZED (SELECT dj.source, bc.doc_id, bc.i, bc.xv
         |      FROM bc JOIN dj ON dj.doc_id = bc.doc_id),
         |yl AS MATERIALIZED (SELECT dj.source, dj.doc_id,
         |      g.i::BIGINT - 1 AS j, q[g.i] AS yv
         |      FROM dj, generate_series(1, 64) g(i) WHERE q[g.i] != 0),
         |sx AS (SELECT source, i, sum(xv)::BIGINT s FROM xs GROUP BY 1, 2),
         |sy AS (SELECT source, j, sum(yv)::BIGINT s FROM yl GROUP BY 1, 2),
         |cxy AS (SELECT xs.source, xs.i, yl.j, sum(xs.xv * yl.yv)::BIGINT c
         |      FROM xs JOIN yl ON yl.doc_id = xs.doc_id GROUP BY 1, 2, 3),
         |cxx AS (SELECT a.source, a.i, b.i AS j, sum(a.xv * b.xv)::BIGINT c
         |      FROM xs a JOIN xs b ON b.doc_id = a.doc_id GROUP BY 1, 2, 3),
         |cyy AS (SELECT a.source, a.j AS i, b.j, sum(a.yv * b.yv)::BIGINT c
         |      FROM yl a JOIN yl b ON b.doc_id = a.doc_id GROUP BY 1, 2, 3),
         |grid AS (SELECT ns.source, gi.i::BIGINT - 1 AS i,
         |      gj.i::BIGINT - 1 AS j, ns.n
         |      FROM ns, generate_series(1, 64) gi(i),
         |           generate_series(1, 64) gj(i)),
         |mm AS MATERIALIZED (SELECT g.source, g.i, g.j,
         |      (g.n * coalesce(cxy.c, 0)
         |        - coalesce(pxi.s, 0) * coalesce(pyj.s, 0))::BIGINT mxy,
         |      (g.n * coalesce(cxx.c, 0)
         |        - coalesce(pxi.s, 0) * coalesce(pxj.s, 0))::BIGINT mxx,
         |      (g.n * coalesce(cyy.c, 0)
         |        - coalesce(pyi.s, 0) * coalesce(pyj.s, 0))::BIGINT myy
         |      FROM grid g
         |      LEFT JOIN cxy ON cxy.source = g.source AND cxy.i = g.i
         |        AND cxy.j = g.j
         |      LEFT JOIN cxx ON cxx.source = g.source AND cxx.i = g.i
         |        AND cxx.j = g.j
         |      LEFT JOIN cyy ON cyy.source = g.source AND cyy.i = g.i
         |        AND cyy.j = g.j
         |      LEFT JOIN sx pxi ON pxi.source = g.source AND pxi.i = g.i
         |      LEFT JOIN sx pxj ON pxj.source = g.source AND pxj.i = g.j
         |      LEFT JOIN sy pyi ON pyi.source = g.source AND pyi.j = g.i
         |      LEFT JOIN sy pyj ON pyj.source = g.source AND pyj.j = g.j),
         |fr AS (SELECT source,
         |      sum(mxy::HUGEINT * mxy) fxy, sum(mxx::HUGEINT * mxx) fxx,
         |      sum(myy::HUGEINT * myy) fyy,
         |      sum(CASE WHEN i = j THEN mxx ELSE 0 END)::BIGINT trx,
         |      sum(CASE WHEN i = j THEN myy ELSE 0 END)::BIGINT trY
         |      FROM mm GROUP BY 1)
         |SELECT fr.source, ns.n AS n_vecs, trx AS tr_lex, trY AS tr_emb,
         |       (CASE WHEN fxx > 0 THEN (1000000::HUGEINT * fxy) // fxx
         |        ELSE 0 END)::BIGINT AS align_lex_ppm,
         |       (CASE WHEN fyy > 0 THEN (1000000::HUGEINT * fxy) // fyy
         |        ELSE 0 END)::BIGINT AS align_emb_ppm
         |FROM fr JOIN ns ON ns.source = fr.source ORDER BY 1""".stripMargin,
    // q295: (label, dim) micro moments, per-dim pairwise spreads
    // (integral — no per-class division), ONE cross-multiplied ratio.
    "q295_dim_label_informativeness" ->
      """WITH q AS (SELECT "label"::BIGINT lbl, i::BIGINT - 1 dim,
        |      floor(embedding[i]::DOUBLE * 1000000)::BIGINT vm
        |      FROM (SELECT label, embedding,
        |            unnest(generate_series(1, len(embedding))) i
        |            FROM embeddings)),
        |c AS (SELECT lbl, dim, count(*)::BIGINT nl, sum(vm)::BIGINT sl,
        |      sum(vm::HUGEINT * vm) ql FROM q GROUP BY 1, 2),
        |a AS (SELECT dim, sum(nl)::BIGINT n, sum(sl)::BIGINT s, sum(ql) q,
        |      sum(nl::HUGEINT * ql - sl::HUGEINT * sl) wp,
        |      sum(nl * (nl - 1))::BIGINT wpairs FROM c GROUP BY 1),
        |b AS (SELECT dim, n, wp, wpairs,
        |      n::HUGEINT * q - s::HUGEINT * s tp FROM a)
        |SELECT dim, n AS n_vecs, wp::BIGINT AS within_spread,
        |       tp::BIGINT AS total_spread,
        |       (CASE WHEN tp = 0 OR wpairs = 0 THEN 0
        |        ELSE (1000000::HUGEINT * wp * (n * (n - 1)))
        |          // (tp * wpairs) END)::BIGINT AS within_ratio_ppm
        |FROM b ORDER BY dim""".stripMargin,
    // q296: the q136 Lloyd CTEs verbatim, label contingency, doubled
    // pair masses, one floored division.
    "q296_cluster_label_rand" ->
      s"""WITH ${lloydCte(8)},
         |lb AS (SELECT vec_id, "label"::BIGINT lbl FROM embeddings),
         |cells AS (SELECT a2.cid, lb.lbl, count(*)::BIGINT nij
         |      FROM a2 JOIN lb ON lb.vec_id = a2.vec_id GROUP BY 1, 2),
         |t0 AS (SELECT sum(nij)::BIGINT n,
         |      sum(nij * (nij - 1))::BIGINT sij FROM cells),
         |ta AS (SELECT count(*)::BIGINT n_clusters,
         |      sum(a * (a - 1))::BIGINT sa FROM
         |      (SELECT cid, sum(nij)::BIGINT a FROM cells GROUP BY 1)),
         |tb AS (SELECT count(*)::BIGINT n_labels,
         |      sum(b * (b - 1))::BIGINT sb FROM
         |      (SELECT lbl, sum(nij)::BIGINT b FROM cells GROUP BY 1))
         |SELECT n AS n_vecs, n_clusters, n_labels,
         |       sij AS pair_mass_joint, sa AS pair_mass_clusters,
         |       sb AS pair_mass_labels,
         |       ((1000000 * (n * (n - 1) + 2 * sij - sa - sb))
         |         // (n * (n - 1)))::BIGINT AS rand_ppm
         |FROM t0, ta, tb""".stripMargin,
    // q299: the q279 exact top-5 chain, neighbor in-degrees, source
    // rollup, one-row slot/corpus totals, cross-multiplied bias.
    "q299_neighbor_concentration" -> {
      val stride = Similarity.PurityStride
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |s AS (SELECT q.vec_id q_id, n.vec_id nid,
         |      list_dot_product(q.v, n.v)
         |      / sqrt(list_dot_product(q.v, q.v) * list_dot_product(n.v, n.v)) c
         |      FROM e q, e n
         |      WHERE q.vec_id % $stride = 0 AND n.vec_id != q.vec_id),
         |r AS (SELECT q_id, nid FROM (SELECT q_id, nid,
         |      row_number() OVER (PARTITION BY q_id ORDER BY c DESC, nid) rnk
         |      FROM s) WHERE rnk <= 5),
         |ind AS (SELECT nid, count(*)::BIGINT indeg FROM r GROUP BY 1),
         |bs AS (SELECT d.source, sum(indeg)::BIGINT n_cited_slots,
         |      count(*)::BIGINT n_distinct_docs, max(indeg)::BIGINT max_indeg
         |      FROM ind JOIN documents d ON d.doc_id = ind.nid GROUP BY 1),
         |cp AS (SELECT d.source, count(*)::BIGINT n_corpus FROM e
         |      JOIN documents d ON d.doc_id = e.vec_id GROUP BY 1),
         |g AS (SELECT bs.*, cp.n_corpus FROM bs
         |      JOIN cp ON cp.source = bs.source),
         |t3 AS (SELECT sum(n_cited_slots)::BIGINT ts,
         |      sum(n_corpus)::BIGINT tc FROM g)
         |SELECT source, n_corpus, n_cited_slots, n_distinct_docs, max_indeg,
         |       ((1000 * n_cited_slots) // ts)::BIGINT AS slot_share_pm,
         |       ((1000 * n_cited_slots * tc) // (ts * n_corpus))::BIGINT
         |         AS bias_milli
         |FROM g, t3 ORDER BY source""".stripMargin
    },
    // q307: the q269 int8 quantization twin, sampled pairs, exact
    // cross-multiplied signed-squared-cosine ppm in HUGEINT, bucketed
    // score histogram, q302's doubled-U rank sum per query source.
    "q307_embedding_label_auc" -> {
      val stride = Similarity.PurityStride
      val bw = Similarity.AucBucketWidth
      s"""WITH e AS (SELECT vec_id, "label" lbl, embedding::DOUBLE[] v FROM embeddings
         |      WHERE "label" IS NOT NULL),
         |sq AS (SELECT vec_id, lbl, v,
         |      127.0 / list_aggregate(list_transform(v, x -> abs(x)), 'max') sc
         |      FROM e
         |      WHERE list_aggregate(list_transform(v, x -> abs(x)), 'max') > 0),
         |q8 AS (SELECT vec_id, lbl, list_transform(v, x ->
         |        (CASE WHEN x >= 0 THEN floor(abs(x * sc) + 0.5)
         |          ELSE -floor(abs(x * sc) + 0.5) END)::DOUBLE) q FROM sq),
         |qq AS (SELECT vec_id, lbl, q, list_dot_product(q, q)::BIGINT qn
         |      FROM q8 WHERE list_dot_product(q, q) > 0),
         |pr AS (SELECT a.vec_id q_id, a.lbl = b.lbl same,
         |      list_dot_product(a.q, b.q)::BIGINT dq,
         |      a.qn qnq, b.qn qnb
         |      FROM qq a, qq b
         |      WHERE a.vec_id % $stride = 0 AND b.vec_id != a.vec_id),
         |sc2 AS (SELECT q_id, same,
         |      (CASE WHEN dq >= 0
         |        THEN (1000000 * dq::HUGEINT * dq) // (qnq::HUGEINT * qnb)
         |        ELSE -((1000000 * dq::HUGEINT * dq) // (qnq::HUGEINT * qnb))
         |       END)::BIGINT s_ppm FROM pr),
         |bk AS (SELECT d.source, (s_ppm + 1000000) // $bw AS bucket,
         |      sum(CASE WHEN same THEN 1 ELSE 0 END)::BIGINT a,
         |      sum(CASE WHEN same THEN 0 ELSE 1 END)::BIGINT b
         |      FROM sc2 JOIN documents d ON d.doc_id = sc2.q_id
         |      GROUP BY 1, 2),
         |cw AS (SELECT source, bucket, a, b,
         |      coalesce(sum(b) OVER (PARTITION BY source ORDER BY bucket
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT blt
         |      FROM bk),
         |g AS (SELECT source, sum(a)::BIGINT n_same, sum(b)::BIGINT n_diff,
         |      sum(a::HUGEINT * (2 * blt + b)) u2h FROM cw GROUP BY 1)
         |SELECT source, n_same, n_diff, u2h::BIGINT AS u2,
         |  ((1000000 * u2h) // (2 * n_same::HUGEINT * n_diff))::BIGINT AS auc_ppm
         |FROM g ORDER BY source""".stripMargin
    },
    // q314: q64's centroid grid, pos-keyed pair self-join, the
    // q269/q307 signed-squared-cosine integerization in HUGEINT.
    "q314_label_confusability" ->
      """WITH e AS (SELECT label, embedding,
        |           unnest(generate_series(1, len(embedding))) i FROM embeddings),
        |c0 AS (SELECT "label"::BIGINT lbl, i::BIGINT - 1 pos,
        |      floor(embedding[i]::DOUBLE * 1000000)::BIGINT vm FROM e),
        |ct AS (SELECT lbl, pos, floor(sum(vm) / count(*))::BIGINT c
        |      FROM c0 GROUP BY 1, 2),
        |pr AS (SELECT a.lbl la, b.lbl lb, sum(a.c * b.c)::BIGINT dot,
        |      sum(a.c * a.c)::BIGINT na, sum(b.c * b.c)::BIGINT nb,
        |      sum((a.c - b.c) * (a.c - b.c))::BIGINT d2
        |      FROM ct a JOIN ct b ON a.pos = b.pos AND a.lbl < b.lbl
        |      GROUP BY 1, 2)
        |SELECT la AS label_a, lb AS label_b,
        |  (CASE WHEN dot >= 0
        |    THEN (1000000 * dot::HUGEINT * dot) // (na::HUGEINT * nb)
        |    ELSE -((1000000 * dot::HUGEINT * dot) // (na::HUGEINT * nb))
        |   END)::BIGINT AS cos2_ppm,
        |  d2 AS d2_micro2
        |FROM pr ORDER BY label_a, label_b""".stripMargin,
    // q317: identical IEEE norm fold then ONE floor (the q269 double
    // discipline), per-label rollup, cross-multiplied corpus ratio.
    "q317_label_norm_bias" ->
      """WITH e AS (SELECT "label"::BIGINT AS label,
        |      floor(1000000 * list_dot_product(embedding::DOUBLE[],
        |        embedding::DOUBLE[]))::BIGINT n2
        |      FROM embeddings),
        |g AS (SELECT label, count(*)::BIGINT n_vecs, sum(n2)::BIGINT s2,
        |      min(n2)::BIGINT min_n2_ppm, max(n2)::BIGINT max_n2_ppm
        |      FROM e GROUP BY 1),
        |tt AS (SELECT sum(n_vecs)::BIGINT nt, sum(s2)::BIGINT st FROM g)
        |SELECT label, n_vecs, (s2 // n_vecs)::BIGINT AS mean_n2_ppm,
        |  min_n2_ppm, max_n2_ppm,
        |  ((1000 * s2::HUGEINT * nt) // (n_vecs::HUGEINT * st))::BIGINT
        |    AS bias_milli
        |FROM g, tt ORDER BY label""".stripMargin,
    // q323: micro-quantized components as exact integer-valued
    // doubles (the q307 trick), squared-L2 via norms + dot, per-query
    // extremes/sums, one floor per ratio.
    "q323_distance_contrast" -> {
      val stride = Similarity.PurityStride
      s"""WITH e AS (SELECT vec_id,
         |      list_transform(embedding::DOUBLE[], x -> floor(x * 1000000)) v
         |      FROM embeddings),
         |n AS (SELECT vec_id, v, list_dot_product(v, v)::BIGINT n2 FROM e),
         |p AS (SELECT a.vec_id q_id,
         |      (a.n2 + b.n2 - 2 * list_dot_product(a.v, b.v)::BIGINT)::BIGINT d2
         |      FROM n a, n b
         |      WHERE a.vec_id % $stride = 0 AND b.vec_id <> a.vec_id),
         |g AS (SELECT q_id, count(*)::BIGINT n_cand, min(d2)::BIGINT d2_min,
         |      max(d2)::BIGINT d2_max, sum(d2::HUGEINT) d2_sum FROM p GROUP BY 1)
         |SELECT q_id, n_cand, d2_min, d2_max,
         |  (CASE WHEN d2_sum > 0 THEN
         |    (1000 * (d2_max::HUGEINT - d2_min) * n_cand) // d2_sum
         |   END)::BIGINT AS contrast_milli,
         |  (CASE WHEN d2_min > 0 THEN
         |    (1000 * d2_sum) // (n_cand::HUGEINT * d2_min) END)::BIGINT
         |    AS meanmin_milli
         |FROM g ORDER BY q_id""".stripMargin
    },
    // q336: the shared q172 chain, mutual pairs, RECURSIVE min-label
    // closure (the q49 reach pattern), per-label component rollup.
    "q336_mutual_nn_components" ->
      s"""WITH RECURSIVE $MutualNnCte,
         |mp AS (SELECT x.src a, y.src b FROM n1 x
         |      JOIN n1 y ON x.nbr = y.src AND y.nbr = x.src AND x.src < y.src),
         |vv AS (SELECT vec_id, "label" lbl FROM embeddings
         |      WHERE "label" IS NOT NULL),
         |edges AS (SELECT a s, b t2 FROM mp UNION ALL SELECT b, a FROM mp),
         |reach AS (SELECT vec_id AS src, vec_id AS dst FROM vv
         |          UNION
         |          SELECT r.src, e.t2 FROM reach r JOIN edges e ON r.dst = e.s),
         |lbl AS (SELECT src AS vec_id, min(dst) AS cluster_id FROM reach
         |      GROUP BY src),
         |pd AS (SELECT DISTINCT u AS vec_id FROM (SELECT a u FROM mp
         |      UNION ALL SELECT b FROM mp)),
         |jn AS (SELECT vv.vec_id, vv.lbl, lbl.cluster_id,
         |      (CASE WHEN pd.vec_id IS NULL THEN 0 ELSE 1 END)::BIGINT in_pair
         |      FROM vv JOIN lbl ON lbl.vec_id = vv.vec_id
         |      LEFT JOIN pd ON pd.vec_id = vv.vec_id),
         |cmp AS (SELECT lbl, count(*)::BIGINT n_components,
         |      max(csz)::BIGINT largest_comp FROM
         |      (SELECT lbl, cluster_id, count(*)::BIGINT csz FROM jn
         |       WHERE in_pair = 1 GROUP BY 1, 2) GROUP BY 1),
         |ag AS (SELECT lbl, count(*)::BIGINT n_vecs,
         |      sum(in_pair)::BIGINT n_paired FROM jn GROUP BY 1)
         |SELECT ag.lbl::BIGINT AS "label", n_vecs, n_paired,
         |  coalesce(cmp.n_components, 0)::BIGINT AS n_components,
         |  coalesce(cmp.largest_comp, 0)::BIGINT AS largest_comp,
         |  ((1000 * (n_vecs - n_paired)) // n_vecs)::BIGINT
         |    AS isolated_share_pm
         |FROM ag LEFT JOIN cmp ON cmp.lbl = ag.lbl
         |ORDER BY "label"""".stripMargin,
  )
}
