package graft

/** Oracle-SQL helper fragments shared across oracle family files
  * (split from SparkEntry, round 12). */
private[graft] object SparkEntryOracleUtil {
  private[graft] def H(e: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(string_split($e, ''), c -> ascii(c)::BIGINT)), (acc, x) -> (acc * 131 + x) % 1000000007)"

  /** Shared trade-graph CTEs (q126/q131): supplier s ↦ 2s, customer
    * c ↦ 2c+1, symmetric arcs — mirrors Graph.tradeArcs exactly. */

  private[graft] val NearDupClusterCte: String =
    s"""RECURSIVE t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
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
         |sz AS (SELECT doc_id, count(*) sz FROM sh GROUP BY doc_id),
         |pairs AS (SELECT da, db FROM cm JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
         |          WHERE cm / (x.sz + y.sz - cm) >= 0.5),
         |edges AS (SELECT da s, db t2 FROM pairs UNION ALL SELECT db, da FROM pairs),
         |reach AS (SELECT doc_id AS src, doc_id AS dst FROM documents
         |          UNION
         |          SELECT r.src, e.t2 FROM reach r JOIN edges e ON r.dst = e.s),
         |lbl AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src),
         |cn AS (SELECT cluster_id, count(*) AS cluster_n FROM lbl GROUP BY cluster_id)""".stripMargin

  /** The q136 fixed-round integer Lloyd CTE chain at cluster count k
    * — micro-unit components `q` through final assignment `a2`
    * (vec_id, cid, d2). Shared by q136 and q153. */
}
