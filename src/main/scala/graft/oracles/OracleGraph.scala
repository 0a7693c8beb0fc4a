package graft
package oracles

/** DuckDB oracle SQL — graph suite (PageRank, k-truss, BFS, closeness...).
  *
  * Split from SparkEntry.oracleSql (round 12): entry text is verbatim;
  * SparkEntry remains the single-source registry and concatenates the
  * family maps. RegistrationGateSpec enforces key-set equality with
  * `queries`, and the split was verified by a byte-identical
  * oracle_sql.json dump before/after. */
private[graft] object OracleGraph {
  import graft.SparkEntryOracleUtil._
  private val TradeGraphCte: String =
    """b AS (SELECT DISTINCT l_suppkey * 2 AS s, o_custkey * 2 + 1 AS c
      |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |e AS (SELECT s AS src, c AS dst FROM b
      |      UNION ALL SELECT c AS src, s AS dst FROM b)""".stripMargin

  /** q162 oracle CTE chain: fixed-round peeling — per round the degree
    * table over the remaining arcs, the sub-k peel set (with its
    * degrees), and the arc relation minus everything touching it;
    * mirrors Graph.kCore round for round. */

  private def kCoreCte(k: Int, rounds: Int): String = {
    // MATERIALIZED throughout: DuckDB INLINES plain CTEs, and every
    // round references its predecessor 3× (degree + two NOT INs) — the
    // inlined tree grows 3^rounds and re-opens the base parquet files
    // thousands of times ("Too many open files", measured). Forced
    // materialization makes each round's relation compute once — the
    // oracle twin of the Spark side's persist+truncate rounds.
    val steps = (1 to rounds).map { r =>
      val prevA = if (r == 1) "e" else s"aa${r - 1}"
      val prevN = s"nn${r - 1}"
      s"""gg$r AS MATERIALIZED (SELECT src, count(*)::BIGINT AS dg
         |        FROM $prevA GROUP BY 1),
         |dd$r AS MATERIALIZED (SELECT n.node, coalesce(g.dg, 0)::BIGINT AS dg
         |        FROM $prevN n LEFT JOIN gg$r g ON g.src = n.node),
         |oo$r AS MATERIALIZED (SELECT node, $r::BIGINT AS peel_round,
         |        dg AS degree FROM dd$r WHERE dg < $k),
         |nn$r AS MATERIALIZED (SELECT node FROM dd$r WHERE dg >= $k),
         |aa$r AS MATERIALIZED (SELECT a.src, a.dst FROM $prevA a
         |        WHERE a.src NOT IN (SELECT node FROM oo$r)
         |          AND a.dst NOT IN (SELECT node FROM oo$r))""".stripMargin
    }.mkString(",\n")
    val peels = (1 to rounds).map(r => s"SELECT * FROM oo$r").mkString(" UNION ALL ")
    val graphM = TradeGraphCte
      .replace("b AS (", "b AS MATERIALIZED (")
      .replace("e AS (", "e AS MATERIALIZED (")
    s"""$graphM,
       |nn0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
       |$steps,
       |cg AS MATERIALIZED (SELECT src, count(*)::BIGINT AS dg
       |      FROM aa$rounds GROUP BY 1),
       |core AS (SELECT n.node, 0::BIGINT AS peel_round,
       |         coalesce(g.dg, 0)::BIGINT AS degree
       |         FROM nn$rounds n LEFT JOIN cg g ON g.src = n.node),
       |allrows AS ($peels UNION ALL SELECT * FROM core)""".stripMargin
  }

  /** q163 oracle CTE chain: synchronous label propagation — per round
    * the neighbor+self vote counts and the (count desc, label asc)
    * argmax; mirrors Graph.labelProp. */

  private def labelPropCte(rounds: Int): String = {
    // MATERIALIZED for the same reason as kCoreCte: each round inlines
    // its predecessor twice (neighbor join + self-vote) — 2^rounds
    // re-expansions of the full graph subtree without it.
    val steps = (1 to rounds).map { r =>
      val prev = s"ll${r - 1}"
      s"""vv$r AS MATERIALIZED (SELECT node, lbl, count(*)::BIGINT AS cnt FROM (
         |        SELECT e.src AS node, l.lbl FROM e JOIN $prev l ON l.node = e.dst
         |        UNION ALL SELECT node, lbl FROM $prev) GROUP BY 1, 2),
         |ll$r AS MATERIALIZED (SELECT node, lbl FROM (
         |        SELECT node, lbl,
         |               row_number() OVER (PARTITION BY node ORDER BY cnt DESC, lbl) rn
         |        FROM vv$r) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val graphM = TradeGraphCte
      .replace("b AS (", "b AS MATERIALIZED (")
      .replace("e AS (", "e AS MATERIALIZED (")
    s"""$graphM,
       |ll0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM e),
       |$steps""".stripMargin
  }

  /** q126 oracle: the 5 fixed PageRank rounds as chained CTEs — the
    * same exact integer recurrence Graph.pageRank runs. */

  private val PageRankOracle: String = {
    val rounds = (1 to Graph.PageRankIters).map { k =>
      s"""r$k AS (SELECT e.dst AS node,
         |  (150000 + (850 * sum(r${k - 1}.r // d.outdeg)) // 1000)::BIGINT AS r
         |  FROM e JOIN r${k - 1} ON r${k - 1}.node = e.src
         |         JOIN deg d ON d.src = e.src
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH $TradeGraphCte,
       |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
       |r0 AS (SELECT src AS node, 1000000::BIGINT AS r FROM deg),
       |$rounds
       |SELECT node, r AS rank_micro FROM r${Graph.PageRankIters}
       |ORDER BY node""".stripMargin
  }

  /** q178 oracle: the q126 chain with seed-restart teleport — each
    * round re-joins the one-row-per-node seed relation so teleport
    * mass lands only on seeds; mirrors Graph.personalizedPageRank
    * round for round. */

  private val PprOracle: String = {
    val rounds = (1 to Graph.PageRankIters).map { k =>
      s"""p$k AS (SELECT n.node,
         |  (n.seed * 150000 + coalesce((850 * c.s) // 1000, 0))::BIGINT AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, sum(p${k - 1}.r // d.outdeg) AS s
         |    FROM e JOIN p${k - 1} ON p${k - 1}.node = e.src
         |           JOIN deg d ON d.src = e.src
         |    GROUP BY e.dst) c ON c.dst = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $TradeGraphCte,
       |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
       |nodes AS (SELECT src AS node,
       |  CASE WHEN src % 2 = 0 AND (src // 2) % 5 = 0 THEN 1 ELSE 0 END AS seed
       |  FROM deg),
       |p0 AS (SELECT node, (seed * 1000000)::BIGINT AS r FROM nodes),
       |$rounds
       |SELECT node, r AS ppr_micro FROM p${Graph.PageRankIters}
       |WHERE r > 0 ORDER BY node""".stripMargin
  }

  /** q131 oracle: BFS frontier relaxation rounds as chained CTEs. */

  private val BfsOracle: String = {
    val rounds = (1 to Graph.BfsRounds).map { k =>
      s"""d$k AS (SELECT node, min(dist)::BIGINT AS dist FROM (
         |  SELECT e.dst AS node, x.dist + 1 AS dist
         |  FROM d${k - 1} x JOIN e ON e.src = x.node
         |  UNION ALL SELECT node, dist FROM d${k - 1}) GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $TradeGraphCte,
       |d0 AS (SELECT s_suppkey * 2 AS node, 0::BIGINT AS dist
       |       FROM supplier WHERE s_nationkey < 10),
       |$rounds
       |SELECT node, dist FROM d${Graph.BfsRounds} ORDER BY node""".stripMargin
  }

  /** q258 oracle chain — k-truss peel as one CTE block per round:
    * triangle enumeration (a<b<c sorted triples — provably the same
    * triangle set as the Spark side's degree-oriented wedge join),
    * per-edge support via the 3-role union, peel below k−2, then a
    * final support pass pricing the survivors. MATERIALIZED on the
    * edge/support relations so DuckDB doesn't inline the triangle
    * join once per consumer. */

  private def kTrussCte(k: Int, rounds: Int): String = {
    val thr = k - 2
    val base =
      """it0 AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |it AS (SELECT ok, pk FROM (
        |         SELECT ok, pk, row_number() OVER (PARTITION BY ok ORDER BY pk) AS rn
        |         FROM it0) WHERE rn <= 1024),
        |e0 AS MATERIALIZED (SELECT DISTINCT a.pk AS p1, b.pk AS p2
        |      FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk)""".stripMargin
    def supBlock(src: String, tri: String, sup: String): String =
      s"""$tri AS (SELECT x.p1 a, x.p2 b, y.p2 c
         |      FROM $src x JOIN $src y ON y.p1 = x.p2
         |      JOIN $src z ON z.p1 = x.p1 AND z.p2 = y.p2),
         |$sup AS MATERIALIZED (SELECT e.p1, e.p2, coalesce(t.s, 0)::BIGINT s
         |      FROM $src e LEFT JOIN (
         |        SELECT p1, p2, count(*)::BIGINT s FROM (
         |          SELECT a AS p1, b AS p2 FROM $tri
         |          UNION ALL SELECT b, c FROM $tri
         |          UNION ALL SELECT a, c FROM $tri) GROUP BY 1, 2) t
         |      ON t.p1 = e.p1 AND t.p2 = e.p2)""".stripMargin
    val blocks = (1 to rounds).map { r =>
      s"""${supBlock(s"e${r - 1}", s"t$r", s"s$r")},
         |pl$r AS (SELECT p1, p2, $r::BIGINT AS peel_round, s AS support
         |      FROM s$r WHERE s < $thr),
         |e$r AS MATERIALIZED (SELECT p1, p2 FROM s$r WHERE s >= $thr)""".stripMargin
    }
    val fin =
      s"""${supBlock(s"e$rounds", "tf", "sf")},
         |allrows AS (${(1 to rounds).map(r => s"SELECT * FROM pl$r")
          .mkString("\n      UNION ALL ")}
         |      UNION ALL SELECT p1, p2, 0::BIGINT, s FROM sf)""".stripMargin
    (base +: blocks :+ fin).mkString(",\n")
  }

  /** q49 oracle CTE chain — the full recursive near-dup closure
    * (shingles -> minhash bands -> verified pairs -> transitive
    * reach -> min-labels + sizes). Shared verbatim by q152's
    * leakage-safe split so the split reconciles against exactly the
    * clusters the driver checks. */
  val sql: Map[String, String] = Map(
    "q126_pagerank" -> PageRankOracle,
    "q131_bfs_distances" -> BfsOracle,
    "q127_triangle_counts" ->
      """WITH it0 AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |it AS (SELECT ok, pk FROM (
        |         SELECT ok, pk, row_number() OVER (PARTITION BY ok ORDER BY pk) AS rn
        |         FROM it0) WHERE rn <= 1024),
        |pr AS (SELECT DISTINCT a.pk AS p1, b.pk AS p2
        |            FROM it a JOIN it b
        |              ON a.ok = b.ok AND a.pk < b.pk),
        |deg AS (SELECT node, count(*)::BIGINT AS dg FROM
        |        (SELECT p1 AS node FROM pr UNION ALL SELECT p2 AS node FROM pr)
        |        GROUP BY 1),
        |o AS (SELECT
        |        CASE WHEN (d1.dg, pr.p1) < (d2.dg, pr.p2) THEN pr.p1 ELSE pr.p2 END AS src,
        |        CASE WHEN (d1.dg, pr.p1) < (d2.dg, pr.p2) THEN pr.p2 ELSE pr.p1 END AS dst,
        |        CASE WHEN (d1.dg, pr.p1) < (d2.dg, pr.p2) THEN d2.dg ELSE d1.dg END AS dd
        |      FROM pr JOIN deg d1 ON d1.node = pr.p1 JOIN deg d2 ON d2.node = pr.p2),
        |t AS (SELECT o1.src AS a, o1.dst AS b, o2.dst AS c
        |      FROM o o1 JOIN o o2 ON o1.src = o2.src
        |             AND (o1.dd, o1.dst) < (o2.dd, o2.dst)
        |      JOIN o o3 ON o3.src = o1.dst AND o3.dst = o2.dst),
        |n AS (SELECT node, count(*)::BIGINT AS tri FROM
        |      (SELECT a AS node FROM t UNION ALL SELECT b AS node FROM t
        |       UNION ALL SELECT c AS node FROM t) GROUP BY 1)
        |SELECT deg.node, deg.dg AS degree, coalesce(n.tri, 0)::BIGINT AS n_tri,
        |       (CASE WHEN deg.dg >= 2
        |             THEN (2000 * coalesce(n.tri, 0)) // (deg.dg * (deg.dg - 1))
        |             ELSE 0 END)::BIGINT AS cc_milli
        |FROM deg LEFT JOIN n ON n.node = deg.node ORDER BY deg.node""".stripMargin,
    // q162: the peeling cascade as a fixed CTE chain over the shared
    // trade-graph CTEs.
    "q162_k_core" ->
      s"""WITH ${kCoreCte(Graph.KCoreK, Graph.KCoreRounds)}
         |SELECT node, peel_round, degree FROM allrows ORDER BY node""".stripMargin,
    // q163: synchronous label propagation as a fixed CTE chain.
    "q163_label_prop" ->
      s"""WITH ${labelPropCte(Graph.LabelPropRounds)}
         |SELECT node, lbl AS community FROM ll${Graph.LabelPropRounds}
         |ORDER BY node""".stripMargin,
    // q167: same hub-capped wedge enumeration over the shared trade
    // graph; Jaccard denominators from FULL degrees.
    "q167_link_predict" ->
      s"""WITH $TradeGraphCte,
         |deg AS (SELECT src, count(*)::BIGINT AS dg FROM e GROUP BY 1),
         |mid AS (SELECT src AS m FROM deg WHERE dg <= ${Graph.LinkDegCap}),
         |em AS (SELECT e.src, e.dst FROM e JOIN mid ON e.dst = mid.m),
         |p AS (SELECT w1.src AS a, w2.src AS b, count(*)::BIGINT AS common
         |      FROM em w1 JOIN em w2
         |        ON w1.dst = w2.dst AND w1.src < w2.src
         |      GROUP BY 1, 2 HAVING count(*) >= 2)
         |SELECT p.a AS node_a, p.b AS node_b, p.common,
         |  da.dg AS dg_a, db.dg AS dg_b,
         |  ((1000 * p.common) // (da.dg + db.dg - p.common))::BIGINT
         |    AS jaccard_pm
         |FROM p JOIN deg da ON da.src = p.a
         |       JOIN deg db ON db.src = p.b
         |ORDER BY node_a, node_b""".stripMargin,
    "q178_personalized_pagerank" -> PprOracle,
    // q204: wedge join minus direct arcs minus self, distinct ends.
    "q204_two_hop_reach" ->
      s"""WITH $TradeGraphCte,
         |w AS (SELECT DISTINCT x.src a, y.dst b
         |      FROM e x JOIN e y ON x.dst = y.src
         |      WHERE x.src != y.dst),
         |r2 AS (SELECT w.a, count(*)::BIGINT reach2 FROM w
         |       WHERE NOT EXISTS (SELECT 1 FROM e
         |                         WHERE e.src = w.a AND e.dst = w.b)
         |       GROUP BY 1),
         |deg AS (SELECT src node, count(*)::BIGINT degree FROM e GROUP BY 1)
         |SELECT d.node, d.degree, coalesce(r2.reach2, 0)::BIGINT AS reach2
         |FROM deg d LEFT JOIN r2 ON r2.a = d.node
         |ORDER BY d.node""".stripMargin,
    // q208: endpoint-degree moments over arcs, signed r^2 in HUGEINT.
    "q208_assortativity" ->
      s"""WITH $TradeGraphCte,
         |deg AS (SELECT src, count(*)::BIGINT dg FROM e GROUP BY 1),
         |xy AS (SELECT a.dg dx, b.dg dy FROM e
         |       JOIN deg a ON a.src = e.src JOIN deg b ON b.src = e.dst),
         |m AS (SELECT count(*)::HUGEINT n, sum(dx)::HUGEINT sx,
         |             sum(dy)::HUGEINT sy, sum(dx::HUGEINT * dy) sxy,
         |             sum(dx::HUGEINT * dx) sxx, sum(dy::HUGEINT * dy) syy
         |      FROM xy)
         |SELECT n::BIGINT AS n_arcs,
         |  (CASE WHEN (n*sxx - sx*sx) * (n*syy - sy*sy) = 0 THEN NULL
         |   ELSE (CASE WHEN n*sxy - sx*sy < 0 THEN -1 ELSE 1 END) *
         |     ((1000::HUGEINT * (n*sxy - sx*sy) * (n*sxy - sx*sy))
         |      // ((n*sxx - sx*sx) * (n*syy - sy*sy)))
         |   END)::BIGINT AS assort_r2_signed_milli
         |FROM m""".stripMargin,
    // q258: the fixed-round peel chain + final survivor pricing.
    "q258_ktruss" ->
      s"""WITH ${kTrussCte(Graph.KTrussK, Graph.KTrussRounds)}
         |SELECT p1, p2, peel_round, support FROM allrows
         |ORDER BY p1, p2""".stripMargin,
    // q276: the q127 capped edge CTE, degree ranking, per-k elite
    // membership edge counts, one cross-multiplied HUGEINT ratio.
    "q276_rich_club" -> {
      val per = Graph.RichClubKs.map { k =>
        s"""c$k AS (SELECT count(*)::BIGINT c FROM e
           |      WHERE p1 IN (SELECT node FROM rk WHERE rn <= $k)
           |        AND p2 IN (SELECT node FROM rk WHERE rn <= $k)),
           |w$k AS (SELECT $k::BIGINT k,
           |      least($k, (SELECT nn FROM tot))::BIGINT m, c
           |      FROM c$k)""".stripMargin
      }.mkString(",\n")
      val rows = Graph.RichClubKs.map(k => s"SELECT * FROM w$k")
        .mkString(" UNION ALL ")
      s"""WITH it0 AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
         |      FROM lineitem),
         |it AS (SELECT ok, pk FROM (
         |        SELECT ok, pk, row_number() OVER
         |          (PARTITION BY ok ORDER BY pk) AS rn
         |        FROM it0) WHERE rn <= 1024),
         |e AS MATERIALIZED (SELECT DISTINCT a.pk AS p1, b.pk AS p2
         |      FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk),
         |deg AS MATERIALIZED (SELECT node, count(*)::BIGINT AS dg FROM
         |      (SELECT p1 AS node FROM e UNION ALL SELECT p2 AS node FROM e)
         |      GROUP BY 1),
         |rk AS MATERIALIZED (SELECT node, dg,
         |      row_number() OVER (ORDER BY dg DESC, node) rn FROM deg),
         |tot AS MATERIALIZED (SELECT (SELECT count(*) FROM deg) nn,
         |      (SELECT count(*) FROM e) ee),
         |$per
         |SELECT k, m AS n_members, c AS n_edges_within,
         |       (CASE WHEN m < 2 THEN 0 ELSE (2000 * c) // (m * (m - 1))
         |        END)::BIGINT AS density_milli,
         |       (CASE WHEN m < 2 OR (SELECT ee FROM tot) = 0 THEN 0
         |        ELSE (1000::HUGEINT * c * (SELECT nn FROM tot)
         |              * ((SELECT nn FROM tot) - 1))
         |          // ((SELECT ee FROM tot)::HUGEINT * m * (m - 1))
         |        END)::BIGINT AS rc_ratio_milli
         |FROM ($rows) ORDER BY k""".stripMargin
    },
    // q285: the q276 capped edge CTE, brand labels on both endpoints,
    // degree mass per brand, the common-denominator modularity
    // numerator in HUGEINT, one sign-decomposed floored division.
    "q285_brand_modularity" ->
      """WITH it0 AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |      FROM lineitem),
        |it AS (SELECT ok, pk FROM (
        |        SELECT ok, pk, row_number() OVER
        |          (PARTITION BY ok ORDER BY pk) AS rn
        |        FROM it0) WHERE rn <= 1024),
        |e AS MATERIALIZED (SELECT DISTINCT a.pk AS p1, b.pk AS p2
        |      FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk),
        |mm AS (SELECT count(*)::BIGINT m FROM e),
        |lb AS (SELECT p_partkey AS node, p_brand AS b FROM part),
        |ew AS (SELECT x.b AS brand, count(*)::BIGINT ew FROM e
        |      JOIN lb x ON x.node = e.p1 JOIN lb y ON y.node = e.p2
        |      WHERE x.b = y.b GROUP BY 1),
        |dg AS (SELECT node, count(*)::BIGINT dg FROM
        |      (SELECT p1 AS node FROM e UNION ALL SELECT p2 AS node FROM e)
        |      GROUP BY 1),
        |bd AS (SELECT lb.b AS brand, count(*)::BIGINT n_nodes,
        |      sum(dg.dg)::BIGINT deg_sum
        |      FROM dg JOIN lb ON lb.node = dg.node GROUP BY 1),
        |j AS (SELECT bd.brand, bd.n_nodes,
        |      coalesce(ew.ew, 0)::BIGINT n_edges_within, bd.deg_sum,
        |      4::HUGEINT * (SELECT m FROM mm) * coalesce(ew.ew, 0)
        |        - bd.deg_sum::HUGEINT * bd.deg_sum AS num
        |      FROM bd LEFT JOIN ew ON ew.brand = bd.brand)
        |SELECT brand, n_nodes, n_edges_within, deg_sum,
        |       (CASE WHEN num >= 0
        |          THEN (1000000::HUGEINT * num)
        |            // (4::HUGEINT * (SELECT m FROM mm) * (SELECT m FROM mm))
        |          ELSE -((1000000::HUGEINT * (-num))
        |            // (4::HUGEINT * (SELECT m FROM mm) * (SELECT m FROM mm)))
        |        END)::BIGINT AS contrib_micro
        |FROM j ORDER BY brand""".stripMargin,
    // q303: bipartite edge CTE, three unnormalized a->h HITS rounds in
    // HUGEINT (mirrors Graph.hitsBipartite's DECIMAL(38,0) sums round
    // for round), one final ppm normalization per side. MATERIALIZED
    // throughout - each round is referenced twice (next round + final
    // select) and DuckDB would otherwise inline the tree exponentially
    // (the q162 kCore lesson).
    "q303_hits_bipartite" -> {
      val K = Graph.HitsIters
      val rounds = (2 to K).map { k =>
        s"""a$k AS MATERIALIZED (SELECT p, sum(h)::HUGEINT a FROM be
           |      JOIN h${k - 1} USING (c) GROUP BY 1),
           |h$k AS MATERIALIZED (SELECT c, sum(a)::HUGEINT h FROM be
           |      JOIN a$k USING (p) GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH be AS MATERIALIZED (SELECT DISTINCT o_custkey AS c, l_partkey AS p
         |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |a1 AS MATERIALIZED (SELECT p, count(*)::HUGEINT a FROM be GROUP BY 1),
         |h1 AS MATERIALIZED (SELECT c, sum(a)::HUGEINT h FROM be
         |      JOIN a1 USING (p) GROUP BY 1),
         |$rounds,
         |att AS (SELECT sum(a) ta FROM a$K),
         |htt AS (SELECT sum(h) th FROM h$K),
         |dp AS (SELECT p, count(*)::BIGINT degree FROM be GROUP BY 1),
         |dc AS (SELECT c, count(*)::BIGINT degree FROM be GROUP BY 1)
         |SELECT * FROM (
         |  SELECT 'auth' AS node_type, a.p AS node, dp.degree,
         |         ((1000000 * a.a) // att.ta)::BIGINT AS score_ppm
         |  FROM a$K a JOIN dp ON dp.p = a.p, att
         |  UNION ALL
         |  SELECT 'hub' AS node_type, h.c AS node, dc.degree,
         |         ((1000000 * h.h) // htt.th)::BIGINT AS score_ppm
         |  FROM h$K h JOIN dc ON dc.c = h.c, htt)
         |ORDER BY node_type, node""".stripMargin
    },
    // q311: the q131 BFS relaxation with a seed dimension —
    // MATERIALIZED rounds (each referenced by the next round's join
    // AND union; inlined the tree doubles per round, the q162 lesson).
    "q311_harmonic_closeness" -> {
      val rounds = (1 to Graph.BfsRounds).map { k =>
        s"""d$k AS MATERIALIZED (SELECT seed, node, min(dist)::BIGINT AS dist FROM (
           |  SELECT x.seed, e.dst AS node, x.dist + 1 AS dist
           |  FROM d${k - 1} x JOIN e ON e.src = x.node
           |  UNION ALL SELECT seed, node, dist FROM d${k - 1})
           |  GROUP BY 1, 2)""".stripMargin
      }.mkString(",\n")
      s"""WITH $TradeGraphCte,
         |sd AS (SELECT DISTINCT src AS seed FROM e
         |       WHERE src % 2 = 0 AND (src // 2) % 5 = 0
         |       ORDER BY src LIMIT ${Graph.HarmonicSeeds}),
         |d0 AS (SELECT seed, seed AS node, 0::BIGINT AS dist FROM sd),
         |$rounds
         |SELECT node, count(*)::BIGINT AS n_seeds_reached,
         |       sum(1000 // dist)::BIGINT AS harmonic_milli
         |FROM d${Graph.BfsRounds} WHERE dist > 0
         |GROUP BY 1 ORDER BY node""".stripMargin
    },
  )
}
