package graft
package oracles

/** DuckDB oracle SQL — statistical battery and later core additions.
  *
  * Split from SparkEntry.oracleSql (round 12): entry text is verbatim;
  * SparkEntry remains the single-source registry and concatenates the
  * family maps. RegistrationGateSpec enforces key-set equality with
  * `queries`, and the split was verified by a byte-identical
  * oracle_sql.json dump before/after. */
private[graft] object OracleStats {
  import graft.SparkEntryOracleUtil._
  val sql: Map[String, String] = Map(
    // q237: capped session positions, two ordered self-joins, distinct
    // per session BEFORE support counting, min-support filter.
    "q237_event_seq_triples" ->
      // (`day` is reserved in DuckDB — the session day column is `dy`)
      """WITH e AS (SELECT user_id u, epoch_ns(ts) // 86400000000000 dy,
        |        event_type t, ts, event_id FROM events),
        |p AS (SELECT u, dy, t, row_number() OVER (PARTITION BY u, dy
        |        ORDER BY ts, event_id) rn FROM e),
        |cp AS MATERIALIZED (SELECT u, dy, t, rn FROM p WHERE rn <= 24),
        |pr AS MATERIALIZED (SELECT a.u, a.dy, a.t t1, b.t t2, b.rn r2
        |      FROM cp a JOIN cp b ON b.u = a.u AND b.dy = a.dy
        |        AND b.rn > a.rn),
        |tr AS (SELECT DISTINCT pr.u, pr.dy, t1, t2, c.t t3
        |      FROM pr JOIN cp c ON c.u = pr.u AND c.dy = pr.dy
        |        AND c.rn > pr.r2)
        |SELECT t1, t2, t3, count(*)::BIGINT AS support
        |FROM tr GROUP BY 1, 2, 3 HAVING count(*) >= 3
        |ORDER BY 1, 2, 3""".stripMargin,
    // q239: per-order worst line lag (orderkey-keyed), month rollup,
    // HUGEINT-safe permille/milli ratios.
    "q239_perfect_order" ->
      """WITH x AS (SELECT l_orderkey ok,
        |        (year(o_orderdate) * 12 + month(o_orderdate) - 1)::BIGINT m,
        |        max(date_diff('day', CAST(o_orderdate AS DATE),
        |          CAST(l_shipdate AS DATE))) wl
        |      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |      GROUP BY 1, 2)
        |SELECT m AS month_idx, count(*)::BIGINT AS n_orders,
        |       sum(CASE WHEN wl <= 30 THEN 1 ELSE 0 END)::BIGINT
        |         AS n_perfect,
        |       ((1000 * sum(CASE WHEN wl <= 30 THEN 1 ELSE 0 END))
        |          // count(*))::BIGINT AS perfect_pm,
        |       (CASE WHEN sum(wl) >= 0 THEN (1000 * sum(wl)) // count(*)
        |          ELSE -((1000 * -sum(wl)) // count(*)) END)::BIGINT
        |         AS mean_worst_lag_md
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,
    // q241: the shared brand-month grid, two keyed lag joins, HUGEINT-
    // safe milli MASE; absolute errors keep every floor non-negative.
    "q241_seasonal_backtest" ->
      """WITH bm AS (SELECT p_brand brand,
        |        (year(l_shipdate) * 12 + month(l_shipdate) - 1)::BIGINT m,
        |        sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
        |          rev_cents
        |      FROM lineitem JOIN part ON p_partkey = l_partkey
        |      GROUP BY 1, 2)
        |SELECT a.brand, count(*)::BIGINT AS n_eval,
        |       (sum(abs(a.rev_cents - s.rev_cents)) // count(*))::BIGINT
        |         AS mae_seasonal_cents,
        |       (sum(abs(a.rev_cents - n.rev_cents)) // count(*))::BIGINT
        |         AS mae_naive1_cents,
        |       ((1000 * sum(abs(a.rev_cents - s.rev_cents)))
        |          // sum(abs(a.rev_cents - n.rev_cents)))::BIGINT
        |         AS mase_milli
        |FROM bm a
        |JOIN bm s ON s.brand = a.brand AND s.m = a.m - 12
        |JOIN bm n ON n.brand = a.brand AND n.m = a.m - 1
        |GROUP BY 1 ORDER BY a.brand""".stripMargin,
    // q268: midpoint-day split, per-half monetary quintile on the
    // hundred-dollar grid (the q199 strictly-before cumulative), full
    // outer flow matrix with 0 = absent.
    "q268_rfm_migration" ->
      """WITH o AS (SELECT o_custkey,
        |        date_diff('day', DATE '1970-01-01', o_orderdate)::BIGINT dy,
        |        CAST(round(o_totalprice * 100) AS BIGINT) cents FROM orders),
        |pv AS (SELECT ((min(dy) + max(dy)) // 2)::BIGINT p FROM o),
        |ha AS (SELECT o_custkey, (sum(cents) // 10000)::BIGINT mh
        |      FROM o, pv WHERE dy < p GROUP BY 1),
        |hb AS (SELECT o_custkey, (sum(cents) // 10000)::BIGINT mh
        |      FROM o, pv WHERE dy >= p GROUP BY 1),
        |ga AS (SELECT mh, ((coalesce(sum(c) OVER (ORDER BY mh
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 5)
        |        // (SELECT count(*) FROM ha) + 1)::BIGINT s
        |      FROM (SELECT mh, count(*)::BIGINT c FROM ha GROUP BY 1)),
        |gb AS (SELECT mh, ((coalesce(sum(c) OVER (ORDER BY mh
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 5)
        |        // (SELECT count(*) FROM hb) + 1)::BIGINT s
        |      FROM (SELECT mh, count(*)::BIGINT c FROM hb GROUP BY 1)),
        |sa AS (SELECT ha.o_custkey, ga.s FROM ha JOIN ga ON ga.mh = ha.mh),
        |sb AS (SELECT hb.o_custkey, gb.s FROM hb JOIN gb ON gb.mh = hb.mh)
        |SELECT coalesce(sa.s, 0)::BIGINT AS seg_then,
        |       coalesce(sb.s, 0)::BIGINT AS seg_now,
        |       count(*)::BIGINT AS n_customers
        |FROM sa FULL JOIN sb ON sb.o_custkey = sa.o_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q272: the q235 brand-month grid, deterministic lower medians by
    // rank (n+1)//2 under (value, month) order for med and MAD, 3-MAD
    // flag per cell.
    "q272_mad_anomaly_calendar" ->
      """WITH bm AS (SELECT p_brand brand,
        |        (year(l_shipdate) * 12 + month(l_shipdate) - 1)::BIGINT m,
        |        sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
        |          rev_cents
        |      FROM lineitem JOIN part ON p_partkey = l_partkey
        |      GROUP BY 1, 2),
        |med AS (SELECT brand, rev_cents med_cents FROM
        |      (SELECT brand, rev_cents, row_number() OVER
        |        (PARTITION BY brand ORDER BY rev_cents, m) rk,
        |        count(*) OVER (PARTITION BY brand) n FROM bm)
        |      WHERE rk = (n + 1) // 2),
        |dv AS (SELECT bm.brand, bm.m, bm.rev_cents, med.med_cents,
        |        abs(bm.rev_cents - med.med_cents)::BIGINT dev_cents
        |      FROM bm JOIN med ON med.brand = bm.brand),
        |mad AS (SELECT brand, dev_cents mad_cents FROM
        |      (SELECT brand, dev_cents, row_number() OVER
        |        (PARTITION BY brand ORDER BY dev_cents, m) rk,
        |        count(*) OVER (PARTITION BY brand) n FROM dv)
        |      WHERE rk = (n + 1) // 2)
        |SELECT dv.brand, dv.m, dv.rev_cents, dv.med_cents, mad.mad_cents,
        |       dv.dev_cents,
        |       (CASE WHEN dv.dev_cents > 3 * mad.mad_cents THEN 1 ELSE 0
        |        END)::BIGINT AS is_anomaly
        |FROM dv JOIN mad ON mad.brand = dv.brand
        |ORDER BY dv.brand, dv.m""".stripMargin,
    // q273: month-aligned brand-pair grid, month-pair sign products,
    // tau-a = (C − D) / C(n,2) sign-decomposed in milli. pv
    // MATERIALIZED: the self-join references it twice and its
    // equality anchor must not be reordered into a piecewise range
    // join (the q227/q237 lesson).
    "q273_kendall_comovement" ->
      """WITH bm AS (SELECT p_brand brand,
        |        (year(l_shipdate) * 12 + month(l_shipdate) - 1)::BIGINT m,
        |        sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
        |          rev_cents
        |      FROM lineitem JOIN part ON p_partkey = l_partkey
        |      GROUP BY 1, 2),
        |pv AS MATERIALIZED (SELECT a.brand ba, b.brand bb, a.m,
        |        a.rev_cents ra, b.rev_cents rb
        |      FROM bm a JOIN bm b ON b.m = a.m AND a.brand < b.brand),
        |mp AS (SELECT p.ba, p.bb,
        |        (CASE WHEN q.ra > p.ra THEN 1 WHEN q.ra < p.ra THEN -1
        |          ELSE 0 END) *
        |        (CASE WHEN q.rb > p.rb THEN 1 WHEN q.rb < p.rb THEN -1
        |          ELSE 0 END) s
        |      FROM pv p JOIN pv q ON q.ba = p.ba AND q.bb = p.bb
        |        AND q.m > p.m),
        |ag AS (SELECT ba, bb,
        |        sum(CASE WHEN s > 0 THEN 1 ELSE 0 END)::BIGINT n_conc,
        |        sum(CASE WHEN s < 0 THEN 1 ELSE 0 END)::BIGINT n_disc,
        |        count(*)::BIGINT np
        |      FROM mp GROUP BY 1, 2),
        |nm AS (SELECT ba, bb, count(*)::BIGINT n_months FROM pv
        |      GROUP BY 1, 2)
        |SELECT nm.ba AS brand_a, nm.bb AS brand_b, nm.n_months,
        |       ag.n_conc, ag.n_disc,
        |       (CASE WHEN ag.n_conc >= ag.n_disc
        |         THEN (1000 * (ag.n_conc - ag.n_disc)) // ag.np
        |         ELSE -((1000 * (ag.n_disc - ag.n_conc)) // ag.np)
        |        END)::BIGINT AS tau_milli
        |FROM nm JOIN ag ON ag.ba = nm.ba AND ag.bb = nm.bb
        |ORDER BY brand_a, brand_b""".stripMargin,
    // q277: the q198 basket self-join, direction union, exact
    // confidence and one cross-multiplied conviction (c_a = c_ab ⇒
    // //0 ⇒ NULL ⇒ the honest infinity), top 30.
    "q277_association_rules" ->
      """WITH items AS (SELECT DISTINCT l_orderkey ok, l_partkey p
        |      FROM lineitem),
        |pairs AS (SELECT a.p pa, b.p pb, count(*)::BIGINT c_ab
        |      FROM items a JOIN items b ON a.ok = b.ok AND a.p < b.p
        |      GROUP BY 1, 2 HAVING count(*) >= 3),
        |dir AS (SELECT pa ante, pb cons, c_ab FROM pairs
        |      UNION ALL SELECT pb, pa, c_ab FROM pairs),
        |freq AS (SELECT p, count(*)::BIGINT c FROM items GROUP BY 1),
        |bt AS (SELECT count(DISTINCT ok)::BIGINT tb FROM items)
        |SELECT ante, cons, c_ab, fa.c AS c_a, fb.c AS c_b,
        |       ((1000::HUGEINT * c_ab) // fa.c)::BIGINT
        |         AS confidence_milli,
        |       ((1000::HUGEINT * (bt.tb - fb.c) * fa.c) //
        |        (bt.tb::HUGEINT * (fa.c - c_ab)))::BIGINT
        |         AS conviction_milli
        |FROM dir JOIN freq fa ON fa.p = dir.ante
        |     JOIN freq fb ON fb.p = dir.cons, bt
        |ORDER BY confidence_milli DESC, ante, cons LIMIT 30""".stripMargin,
    // q280: the q272 brand-month CTE, zero-filled spine grid, 12
    // explicit dyadic lag taps, num//4095 level, lagged delta.
    "q280_dyadic_momentum" -> {
      val taps = (0 until Queries.MomentumTaps).map { k =>
        s"lag(rev, $k, 0) OVER w * ${1L << (Queries.MomentumTaps - 1 - k)}"
      }.mkString("\n        |        + ").stripMargin
      s"""WITH bm AS (SELECT p_brand brand,
         |        (year(l_shipdate) * 12 + month(l_shipdate) - 1)::BIGINT m,
         |        sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
         |          rev_cents
         |      FROM lineitem JOIN part ON p_partkey = l_partkey
         |      GROUP BY 1, 2),
         |bounds AS (SELECT min(m) mn, max(m) mx FROM bm),
         |sp AS (SELECT unnest(generate_series((SELECT mn FROM bounds),
         |        (SELECT mx FROM bounds)))::BIGINT m),
         |br AS (SELECT DISTINCT brand FROM bm),
         |g AS (SELECT br.brand, sp.m, coalesce(bm.rev_cents, 0)::BIGINT rev
         |      FROM br CROSS JOIN sp
         |      LEFT JOIN bm ON bm.brand = br.brand AND bm.m = sp.m),
         |lv AS (SELECT brand, m,
         |        ($taps)::BIGINT num
         |      FROM g WINDOW w AS (PARTITION BY brand ORDER BY m)),
         |l2 AS (SELECT brand, m, (num // 4095)::BIGINT level_cents,
         |        lag(num // 4095, 1) OVER
         |          (PARTITION BY brand ORDER BY m)::BIGINT prev_level_cents
         |      FROM lv)
         |SELECT brand, m, level_cents, prev_level_cents,
         |       (level_cents - prev_level_cents)::BIGINT AS momentum_cents,
         |       (CASE WHEN level_cents > prev_level_cents THEN 1
         |             WHEN level_cents < prev_level_cents THEN -1
         |             ELSE 0 END)::BIGINT AS direction
         |FROM l2 WHERE m >= (SELECT mn FROM bounds) + ${Queries.MomentumTaps}
         |ORDER BY brand, m""".stripMargin
    },
    // q284: (type, hour) counts, calendar-bounded zero-filled spine,
    // two lag reads, the q91 exact-moment numerators in HUGEINT, one
    // sign-decomposed floored division.
    "q284_hourly_autocorr" -> {
      val lagBlocks = Queries.AcfLags.map { l =>
        s"""SELECT event_type, $l::BIGINT lag_h, h, c AS x,
           |      lag(c, $l) OVER (PARTITION BY event_type ORDER BY h) AS y
           |      FROM g""".stripMargin
      }.mkString("\n      UNION ALL ")
      s"""WITH cc AS (SELECT event_type,
         |      (epoch_ns(ts) // 3600000000000)::BIGINT h,
         |      count(*)::BIGINT c FROM events GROUP BY 1, 2),
         |bounds AS (SELECT min(h) mn, max(h) mx FROM cc),
         |sp AS (SELECT unnest(generate_series((SELECT mn FROM bounds),
         |      (SELECT mx FROM bounds)))::BIGINT h),
         |ty AS (SELECT DISTINCT event_type FROM cc),
         |g AS (SELECT ty.event_type, sp.h, coalesce(cc.c, 0)::BIGINT c
         |      FROM ty CROSS JOIN sp
         |      LEFT JOIN cc ON cc.event_type = ty.event_type AND cc.h = sp.h),
         |lg AS ($lagBlocks),
         |fl AS (SELECT * FROM lg
         |      WHERE h >= (SELECT mn FROM bounds) + lag_h),
         |ag AS (SELECT event_type, lag_h, count(*)::BIGINT n_pairs,
         |      sum(x)::BIGINT sx, sum(y)::BIGINT sy,
         |      sum(x::HUGEINT * y) sxy, sum(x::HUGEINT * x) sxx,
         |      sum(y::HUGEINT * y) syy
         |      FROM fl GROUP BY 1, 2),
         |mo AS (SELECT event_type, lag_h, n_pairs,
         |      n_pairs::HUGEINT * sxy - sx::HUGEINT * sy num,
         |      n_pairs::HUGEINT * sxx - sx::HUGEINT * sx dx,
         |      n_pairs::HUGEINT * syy - sy::HUGEINT * sy dy FROM ag)
         |SELECT event_type, lag_h, n_pairs,
         |       (CASE WHEN dx = 0 OR dy = 0 THEN 0
         |             WHEN num >= 0
         |               THEN (1000000::HUGEINT * num * num) // (dx * dy)
         |             ELSE -((1000000::HUGEINT * num * num) // (dx * dy))
         |        END)::BIGINT AS r2_signed_ppm
         |FROM mo ORDER BY event_type, lag_h""".stripMargin
    },
    // q286: the q272 brand-month CTE with quantities, one floored
    // unit-price division per cell, the q91 moment numerators in
    // HUGEINT, sign-decomposed slope and r-squared divisions.
    "q286_price_elasticity" ->
      """WITH bm AS (SELECT p_brand brand,
        |        (year(l_shipdate) * 12 + month(l_shipdate) - 1)::BIGINT m,
        |        sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
        |          rev_cents,
        |        sum(l_quantity::BIGINT)::BIGINT qty
        |      FROM lineitem JOIN part ON p_partkey = l_partkey
        |      GROUP BY 1, 2),
        |pt AS (SELECT brand, m, rev_cents // qty AS x, qty AS y FROM bm),
        |ag AS (SELECT brand, count(*)::BIGINT n, sum(x)::BIGINT sx,
        |      sum(y)::BIGINT sy, sum(x::HUGEINT * y) sxy,
        |      sum(x::HUGEINT * x) sxx, sum(y::HUGEINT * y) syy
        |      FROM pt GROUP BY 1),
        |mo AS (SELECT brand, n,
        |      n::HUGEINT * sxy - sx::HUGEINT * sy num,
        |      n::HUGEINT * sxx - sx::HUGEINT * sx dx,
        |      n::HUGEINT * syy - sy::HUGEINT * sy dy FROM ag)
        |SELECT brand, n AS n_months,
        |       (CASE WHEN dx = 0 THEN 0
        |             WHEN num >= 0 THEN (1000000::HUGEINT * num) // dx
        |             ELSE -((1000000::HUGEINT * (-num)) // dx)
        |        END)::BIGINT AS slope_micro,
        |       (CASE WHEN dx = 0 OR dy = 0 THEN 0
        |             WHEN num >= 0
        |               THEN (1000000::HUGEINT * num * num) // (dx * dy)
        |             ELSE -((1000000::HUGEINT * num * num) // (dx * dy))
        |        END)::BIGINT AS r2_signed_ppm
        |FROM mo ORDER BY brand""".stripMargin,
    // q288: (brand, part) revenue agg, in-brand rank/cumulative
    // windows, the prior-cumulative class rule, (brand, class) re-agg.
    "q288_abc_classes" -> {
      val (aBar, bBar) = Queries.AbcBarsPm
      s"""WITH pr AS (SELECT p_brand brand, l_partkey pk,
         |      sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT rev
         |      FROM lineitem JOIN part ON p_partkey = l_partkey
         |      GROUP BY 1, 2),
         |cw AS (SELECT brand, pk, rev,
         |      sum(rev) OVER (PARTITION BY brand ORDER BY rev DESC, pk
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum,
         |      sum(rev) OVER (PARTITION BY brand) brand_rev FROM pr),
         |cl AS (SELECT brand, rev, brand_rev,
         |      (1000 * (cum - rev)) // brand_rev AS prev_pm FROM cw),
         |cc AS (SELECT brand,
         |      CASE WHEN prev_pm < $aBar THEN 'A'
         |           WHEN prev_pm < $bBar THEN 'B' ELSE 'C' END cls,
         |      rev, brand_rev FROM cl)
         |SELECT brand, cls, count(*)::BIGINT AS n_parts,
         |       sum(rev)::BIGINT AS class_rev_cents,
         |       ((1000 * sum(rev)) // max(brand_rev))::BIGINT AS share_pm
         |FROM cc GROUP BY 1, 2 ORDER BY brand, cls""".stripMargin
    },
    // q289: supplier-keyed agg, the corrected ceil-isqrt radical
    // replay, one floored division clamped at 0 (pre-clamp sign
    // differences between // and div are absorbed by the clamp).
    "q289_wilson_ranking" ->
      """WITH ag AS (SELECT l_suppkey suppkey, count(*)::BIGINT n,
        |      sum(CASE WHEN l_returnflag != 'R' THEN 1 ELSE 0 END)::BIGINT s
        |      FROM lineitem GROUP BY 1),
        |r0 AS (SELECT *, n * (s * (n - s) + n) AS arg FROM ag),
        |r1 AS (SELECT *, floor(sqrt(arg::DOUBLE))::BIGINT s0 FROM r0),
        |r2 AS (SELECT *, CASE WHEN s0 * s0 > arg THEN s0 - 1 ELSE s0 END s1
        |      FROM r1),
        |r3 AS (SELECT *, CASE WHEN (s1 + 1) * (s1 + 1) <= arg THEN s1 + 1
        |      ELSE s1 END fl FROM r2),
        |r4 AS (SELECT *, CASE WHEN fl * fl = arg THEN fl ELSE fl + 1 END rad
        |      FROM r3)
        |SELECT suppkey, n AS n_lines, s AS n_ok,
        |       ((1000000 * s) // n)::BIGINT AS rate_ppm,
        |       greatest(0, (1000000 * (n * (s + 2) - 2 * rad))
        |         // (n * (n + 4)))::BIGINT AS wilson_lb_ppm
        |FROM r4 ORDER BY suppkey""".stripMargin,
    // q292: the q181 session chain at lead-1, transition counts, one
    // cross-multiplied Gini division, modal pick via rank window.
    "q292_transition_impurity" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, epoch_ns(ts) tns
        |            FROM events),
        |s AS (SELECT user_id, event_id, event_type, tns,
        |      CASE WHEN lag(tns) OVER w IS NULL
        |             OR tns - lag(tns) OVER w > 1800000000000
        |           THEN 1 ELSE 0 END AS ns
        |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)),
        |s2 AS (SELECT user_id, event_id, event_type, tns,
        |       sum(ns) OVER (PARTITION BY user_id ORDER BY tns, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid FROM s),
        |p AS (SELECT event_type AS ante, lead(event_type, 1) OVER w2 AS nxt
        |      FROM s2 WINDOW w2 AS (PARTITION BY user_id, sid
        |                            ORDER BY tns, event_id)),
        |c AS (SELECT ante, nxt, count(*)::BIGINT c FROM p
        |      WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |a AS (SELECT ante, sum(c)::BIGINT n, count(*)::BIGINT k,
        |      sum(c::HUGEINT * c) ssq FROM c GROUP BY 1),
        |tp AS (SELECT ante, nxt, c FROM (SELECT ante, nxt, c,
        |      row_number() OVER (PARTITION BY ante ORDER BY c DESC, nxt) rn
        |      FROM c) WHERE rn = 1)
        |SELECT a.ante, a.n AS n_transitions, a.k AS n_next_types,
        |       ((1000000::HUGEINT * (a.n::HUGEINT * a.n - ssq))
        |         // (a.n::HUGEINT * a.n))::BIGINT AS gini_ppm,
        |       tp.nxt AS top_next,
        |       ((1000 * tp.c) // a.n)::BIGINT AS top_share_pm
        |FROM a JOIN tp ON tp.ante = a.ante ORDER BY a.ante""".stripMargin,
    // q293: the q49 closure verbatim, row-local uniqueness banding,
    // band agg, 1-row corpus totals, cross-multiplied risk.
    "q293_quality_dup_association" ->
      s"""WITH $NearDupClusterCte,
         |b AS (SELECT d.doc_id,
         |      (((1000 * len(list_distinct(string_split(d.text, ' '))))
         |        // len(string_split(d.text, ' '))) // 100)::BIGINT band,
         |      CASE WHEN cn.cluster_n >= 2 THEN 1 ELSE 0 END dup
         |      FROM documents d JOIN lbl l ON l.doc_id = d.doc_id
         |      JOIN cn ON cn.cluster_id = l.cluster_id),
         |g AS (SELECT band, count(*)::BIGINT n_docs,
         |      sum(dup)::BIGINT n_dups FROM b GROUP BY 1),
         |t2 AS (SELECT sum(n_docs)::BIGINT nn, sum(n_dups)::BIGINT dd FROM g)
         |SELECT band, n_docs, n_dups,
         |       ((1000 * n_dups) // n_docs)::BIGINT AS dup_rate_pm,
         |       (CASE WHEN dd = 0 THEN 0
         |        ELSE (1000 * n_dups * nn) // (n_docs * dd)
         |        END)::BIGINT AS risk_milli
         |FROM g, t2 ORDER BY band""".stripMargin,
    // q294: (tier, lag-day) histogram, in-tier cumulatives, type-1
    // lower percentiles at the q272 ranks, breach share.
    "q294_priority_sla" ->
      s"""WITH lg AS (SELECT o_orderpriority priority,
         |      date_diff('day', o_orderdate, l_shipdate)::BIGINT lag
         |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |h AS (SELECT priority, lag, count(*)::BIGINT c FROM lg
         |      GROUP BY 1, 2),
         |cw AS (SELECT priority, lag, c,
         |      sum(c) OVER (PARTITION BY priority ORDER BY lag
         |        ROWS UNBOUNDED PRECEDING) cum,
         |      sum(c) OVER (PARTITION BY priority) n FROM h),
         |r AS (SELECT *, (n + 1) // 2 r50, (9 * n + 9) // 10 r90 FROM cw)
         |SELECT priority, max(n)::BIGINT AS n_lines,
         |       min(CASE WHEN cum >= r50 THEN lag END)::BIGINT AS p50_days,
         |       min(CASE WHEN cum >= r90 THEN lag END)::BIGINT AS p90_days,
         |       max(lag)::BIGINT AS max_days,
         |       ((1000 * sum(CASE WHEN lag > ${Queries.SlaBreachDays}
         |          THEN c ELSE 0 END)) // max(n))::BIGINT AS breach_pm
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    // q297: 32-replica hash-weight fan, per-(segment, replica) exact
    // weighted means, 2nd/31st order statistics in 32-row partitions.
    "q297_bootstrap_ci" -> {
      val b = Queries.BootstrapB
      s"""WITH base AS (SELECT c_mktsegment segment, o_orderkey ok,
         |      CAST(round(o_totalprice * 100) AS BIGINT) cents
         |      FROM orders JOIN customer ON o_custkey = c_custkey),
         |fan AS (SELECT segment, ok, cents, b,
         |      bit_count(${H("CAST(ok AS VARCHAR) || ':' || CAST(b AS VARCHAR)")}
         |        % 16)::BIGINT w
         |      FROM base, generate_series(0, ${b - 1}) g(b)),
         |mn AS (SELECT segment, b, sum(w)::BIGINT sw,
         |      sum(w::HUGEINT * cents) swx FROM fan GROUP BY 1, 2),
         |mb AS (SELECT segment, b, (swx // sw)::BIGINT mb FROM mn
         |      WHERE sw > 0),
         |rk AS (SELECT segment, b, mb, row_number() OVER
         |      (PARTITION BY segment ORDER BY mb, b) rn FROM mb),
         |lo AS (SELECT segment,
         |      min(CASE WHEN rn = 2 THEN mb END)::BIGINT lo,
         |      min(CASE WHEN rn = ${b - 1} THEN mb END)::BIGINT hi
         |      FROM rk GROUP BY 1),
         |ag AS (SELECT segment, count(*)::BIGINT n_orders,
         |      (sum(cents) // count(*))::BIGINT mean_cents
         |      FROM base GROUP BY 1)
         |SELECT ag.segment, n_orders, mean_cents,
         |       lo.lo AS boot_lo_cents, lo.hi AS boot_hi_cents,
         |       (lo.hi - lo.lo)::BIGINT AS band_cents
         |FROM ag JOIN lo ON lo.segment = ag.segment ORDER BY 1""".stripMargin
    },
    // q298: customer-partition first/second order lead, segment gap
    // histogram, type-1 lower quartiles (the q294 cumulative shape).
    "q298_repeat_latency" ->
      """WITH o2 AS (SELECT o_custkey ck, o_orderdate,
        |      row_number() OVER w rn, lead(o_orderdate, 1) OVER w nxt
        |      FROM orders WINDOW w AS (PARTITION BY o_custkey
        |        ORDER BY o_orderdate, o_orderkey)),
        |f AS (SELECT ck, date_diff('day', o_orderdate, nxt)::BIGINT gap
        |      FROM o2 WHERE rn = 1),
        |g AS (SELECT f.ck, f.gap, c_mktsegment segment FROM f
        |      JOIN customer ON c_custkey = f.ck),
        |cn AS (SELECT segment, count(*)::BIGINT n_customers,
        |      sum(CASE WHEN gap IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
        |        n_repeat FROM g GROUP BY 1),
        |h AS (SELECT segment, gap, count(*)::BIGINT c FROM g
        |      WHERE gap IS NOT NULL GROUP BY 1, 2),
        |cw AS (SELECT segment, gap, c,
        |      sum(c) OVER (PARTITION BY segment ORDER BY gap
        |        ROWS UNBOUNDED PRECEDING) cum,
        |      sum(c) OVER (PARTITION BY segment) n FROM h),
        |r AS (SELECT *, (n + 3) // 4 r25, (n + 1) // 2 r50,
        |      (3 * n + 3) // 4 r75 FROM cw),
        |p AS (SELECT segment,
        |      min(CASE WHEN cum >= r25 THEN gap END)::BIGINT p25_days,
        |      min(CASE WHEN cum >= r50 THEN gap END)::BIGINT p50_days,
        |      min(CASE WHEN cum >= r75 THEN gap END)::BIGINT p75_days
        |      FROM r GROUP BY 1)
        |SELECT cn.segment, n_customers, n_repeat,
        |       ((1000 * n_repeat) // n_customers)::BIGINT AS repeat_pm,
        |       p25_days, p50_days, p75_days
        |FROM cn LEFT JOIN p ON p.segment = cn.segment
        |ORDER BY 1""".stripMargin,
    // q301: day-grid cumsum, cross-multiplied CUSUM deviation, argmax
    // row per type (ties to earliest day), div-NULL after-rate at k=n.
    "q301_cusum_changepoint" ->
      """WITH e AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |c AS (SELECT event_type, day::BIGINT AS day, count(*)::BIGINT AS n
        |      FROM e GROUP BY 1, 2),
        |w AS (SELECT event_type, day, n,
        |      row_number() OVER (PARTITION BY event_type ORDER BY day)::BIGINT AS k,
        |      sum(n) OVER (PARTITION BY event_type ORDER BY day
        |        ROWS UNBOUNDED PRECEDING)::BIGINT AS s,
        |      count(*) OVER (PARTITION BY event_type)::BIGINT AS nd,
        |      sum(n) OVER (PARTITION BY event_type)::BIGINT AS total
        |      FROM c),
        |d AS (SELECT *, abs(nd * s - k * total)::BIGINT AS dev FROM w),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY dev DESC, day) AS rn FROM d)
        |SELECT event_type, nd AS n_days, total, day AS cut_day, k AS cut_k,
        |  dev AS dev_scaled,
        |  ((1000 * dev) // (nd * total))::BIGINT AS cusum_pm,
        |  ((1000 * s) // k)::BIGINT AS rate_before_milli,
        |  (CASE WHEN k < nd THEN (1000 * (total - s)) // (nd - k)
        |   END)::BIGINT AS rate_after_milli
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,
    // q302: (priority, lag) histogram, strictly-below kept cumulative,
    // doubled-U / tie-corrected z^2 in HUGEINT (mirrors the Spark
    // DECIMAL(38,0) arithmetic); degenerate groups -> div-NULL.
    "q302_ranksum_shiplag" ->
      """WITH lg AS (SELECT o_orderpriority priority,
        |      date_diff('day', o_orderdate, l_shipdate)::BIGINT lag,
        |      CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END ret
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |h AS (SELECT priority, lag, sum(ret)::BIGINT a,
        |      sum(1 - ret)::BIGINT b FROM lg GROUP BY 1, 2),
        |c AS (SELECT priority, lag, a, b,
        |      coalesce(sum(b) OVER (PARTITION BY priority ORDER BY lag
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT blt
        |      FROM h),
        |g AS (SELECT priority, sum(a)::BIGINT n_ret, sum(b)::BIGINT n_kept,
        |      sum(a * (2 * blt + b))::BIGINT u2,
        |      sum((a + b) * (a + b) * (a + b) - (a + b))::BIGINT ties3
        |      FROM c GROUP BY 1),
        |f AS (SELECT *, (n_ret + n_kept)::BIGINT n,
        |      (u2 - n_ret * n_kept)::BIGINT dev2 FROM g)
        |SELECT priority, n_ret, n_kept, u2,
        |  ((1000000 * u2::HUGEINT) // (2 * n_ret::HUGEINT * n_kept))::BIGINT AS cles_ppm,
        |  dev2,
        |  ((3000 * dev2::HUGEINT * dev2 * n * (n - 1))
        |    // (n_ret::HUGEINT * n_kept
        |        * ((n::HUGEINT * n * n - n) - ties3)))::BIGINT AS z2_milli
        |FROM f ORDER BY priority""".stripMargin,
    // q304: r*c cell grid, margin/total CTEs, HUGEINT squared residual
    // (mirrors the Spark DECIMAL(38,0) arithmetic cell for cell).
    "q304_chisq_independence" ->
      """WITH cells AS (SELECT o_orderpriority priority, l_returnflag returnflag,
        |      count(*)::BIGINT o
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2),
        |rm AS (SELECT priority, sum(o)::BIGINT r_tot FROM cells GROUP BY 1),
        |cm AS (SELECT returnflag, sum(o)::BIGINT c_tot FROM cells GROUP BY 1),
        |tot AS (SELECT sum(o)::BIGINT n, count(DISTINCT priority)::BIGINT r,
        |      count(DISTINCT returnflag)::BIGINT c FROM cells),
        |g AS (SELECT cells.priority, cells.returnflag, o, r_tot, c_tot, n, r, c,
        |      ((1000 * (n::HUGEINT * o - r_tot::HUGEINT * c_tot)
        |            * (n::HUGEINT * o - r_tot::HUGEINT * c_tot))
        |        // (n::HUGEINT * r_tot * c_tot))::BIGINT contrib_milli
        |      FROM cells JOIN rm ON rm.priority = cells.priority
        |                 JOIN cm ON cm.returnflag = cells.returnflag, tot),
        |ch AS (SELECT sum(contrib_milli)::BIGINT chisq_milli FROM g)
        |SELECT priority, returnflag, o,
        |  ((1000 * r_tot::HUGEINT * c_tot) // n)::BIGINT AS expected_milli,
        |  contrib_milli, chisq_milli,
        |  ((r - 1) * (c - 1))::BIGINT AS df,
        |  ((1000 * chisq_milli) // (n * (least(r, c) - 1)))::BIGINT AS v2_ppm
        |FROM g, ch ORDER BY priority, returnflag""".stripMargin,
    // q305: day-grid moments per type; the burst flag's squared compare
    // in HUGEINT with the direction guard (over-dispersed side only).
    "q305_event_overdispersion" ->
      """WITH e AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |c AS (SELECT event_type, day, count(*)::BIGINT n FROM e GROUP BY 1, 2),
        |a AS (SELECT event_type, count(*)::BIGINT nd, sum(n)::BIGINT total,
        |      sum(n * n)::BIGINT sumsq FROM c GROUP BY 1),
        |k AS (SELECT *, (nd * sumsq - total * total)::BIGINT num FROM a)
        |SELECT event_type, nd AS n_days, total,
        |  ((1000 * num) // ((nd - 1) * total))::BIGINT AS vmr_milli,
        |  ((1000 * num) // total)::BIGINT AS dispersion_milli,
        |  (CASE WHEN (num::HUGEINT - (nd - 1) * total)
        |           * (num::HUGEINT - (nd - 1) * total)
        |         > 18 * (nd::HUGEINT - 1) * total * total
        |        AND num > (nd - 1) * total THEN 1 ELSE 0 END)::BIGINT AS burst_flag
        |FROM k ORDER BY event_type""".stripMargin,
    // q306: the q298 gap relation, q297's hash weights fanned 32x,
    // weighted type-1 medians per replica, 2nd/31st order statistics.
    "q306_median_bootstrap" -> {
      val b = Queries.BootstrapB
      s"""WITH o2 AS (SELECT o_custkey ck, o_orderdate,
         |      row_number() OVER w rn, lead(o_orderdate, 1) OVER w nxt
         |      FROM orders WINDOW w AS (PARTITION BY o_custkey
         |        ORDER BY o_orderdate, o_orderkey)),
         |f AS (SELECT ck, date_diff('day', o_orderdate, nxt)::BIGINT gap
         |      FROM o2 WHERE rn = 1 AND nxt IS NOT NULL),
         |g AS (SELECT f.ck, f.gap, c_mktsegment segment FROM f
         |      JOIN customer ON c_custkey = f.ck),
         |fan AS (SELECT segment, ck, gap, b,
         |      bit_count(${H("CAST(ck AS VARCHAR) || ':' || CAST(b AS VARCHAR)")}
         |        % 16)::BIGINT w
         |      FROM g, generate_series(0, ${b - 1}) gs(b)),
         |hb AS (SELECT segment, b, gap, sum(w)::BIGINT c FROM fan GROUP BY 1, 2, 3),
         |cw AS (SELECT segment, b, gap, c,
         |      sum(c) OVER (PARTITION BY segment, b ORDER BY gap
         |        ROWS UNBOUNDED PRECEDING) cum,
         |      sum(c) OVER (PARTITION BY segment, b) tw FROM hb),
         |md AS (SELECT segment, b,
         |      min(CASE WHEN cum >= (tw + 1) // 2 THEN gap END)::BIGINT med
         |      FROM cw WHERE tw > 0 GROUP BY 1, 2),
         |rk AS (SELECT segment, b, med, row_number() OVER
         |      (PARTITION BY segment ORDER BY med, b) rn FROM md),
         |bb AS (SELECT segment,
         |      min(CASE WHEN rn = 2 THEN med END)::BIGINT lo,
         |      min(CASE WHEN rn = ${b - 1} THEN med END)::BIGINT hi
         |      FROM rk GROUP BY 1),
         |hp AS (SELECT segment, gap, count(*)::BIGINT c FROM g GROUP BY 1, 2),
         |cp AS (SELECT segment, gap, c,
         |      sum(c) OVER (PARTITION BY segment ORDER BY gap
         |        ROWS UNBOUNDED PRECEDING) cum,
         |      sum(c) OVER (PARTITION BY segment) tw FROM hp),
         |pt AS (SELECT segment, max(tw)::BIGINT n_gaps,
         |      min(CASE WHEN cum >= (tw + 1) // 2 THEN gap END)::BIGINT med_days
         |      FROM cp GROUP BY 1)
         |SELECT pt.segment, n_gaps, med_days, bb.lo AS boot_lo_days,
         |       bb.hi AS boot_hi_days, (bb.hi - bb.lo)::BIGINT AS band_days
         |FROM pt JOIN bb ON bb.segment = pt.segment ORDER BY 1""".stripMargin
    },
    // q308: q306's gap relation with 365-day administrative censoring,
    // event-day grid windows, per-day micro-floored hypergeometric
    // moments (mirrors the Spark driver's BigInt fold day for day).
    "q308_logrank_repeat" -> {
      val h = Queries.LogRankHorizonDays
      s"""WITH o2 AS (SELECT o_custkey ck, o_orderdate, o_orderpriority,
         |      row_number() OVER w rn, lead(o_orderdate, 1) OVER w nxt
         |      FROM orders WINDOW w AS (PARTITION BY o_custkey
         |        ORDER BY o_orderdate, o_orderkey)),
         |f AS (SELECT CASE WHEN substr(o_orderpriority, 1, 1)::INT <= 2
         |        THEN 1 ELSE 0 END g1,
         |      CASE WHEN nxt IS NOT NULL
         |        AND date_diff('day', o_orderdate, nxt) <= $h
         |        THEN date_diff('day', o_orderdate, nxt)::BIGINT END t
         |      FROM o2 WHERE rn = 1),
         |tt AS (SELECT sum(g1)::BIGINT n1, count(*)::BIGINT n,
         |      sum(CASE WHEN t IS NOT NULL THEN g1 ELSE 0 END)::BIGINT ev1,
         |      sum(CASE WHEN t IS NOT NULL THEN 1 ELSE 0 END)::BIGINT ev
         |      FROM f),
         |dd AS (SELECT t, sum(g1)::BIGINT d1, count(*)::BIGINT dt FROM f
         |      WHERE t IS NOT NULL GROUP BY 1),
         |cw AS (SELECT t, d1, dt,
         |      coalesce(sum(d1) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
         |        PRECEDING AND 1 PRECEDING), 0)::BIGINT cum1,
         |      coalesce(sum(dt) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
         |        PRECEDING AND 1 PRECEDING), 0)::BIGINT cum FROM dd),
         |pp AS (SELECT dt, (tt.n1 - cum1)::BIGINT n1t, (tt.n - cum)::BIGINT nt
         |      FROM cw, tt),
         |sm AS (SELECT sum((1000000 * dt::HUGEINT * n1t) // nt) e1mic,
         |      sum(CASE WHEN nt > 1 THEN
         |        (1000000 * dt::HUGEINT * n1t * (nt - n1t) * (nt - dt))
         |          // (nt::HUGEINT * nt * (nt - 1)) ELSE 0 END) vmic
         |      FROM pp),
         |zz AS (SELECT tt.n1, tt.n, tt.ev1, tt.ev,
         |      coalesce(sm.e1mic, 0) e1mic, coalesce(sm.vmic, 0) vmic,
         |      1000000 * tt.ev1 - coalesce(sm.e1mic, 0) delta
         |      FROM tt, sm)
         |SELECT n1 AS n_urgent, (n - n1)::BIGINT AS n_rest,
         |  ev1 AS events_urgent, (ev - ev1)::BIGINT AS events_rest,
         |  e1mic::BIGINT AS e1_micro, vmic::BIGINT AS v_micro,
         |  ((1000 * delta::HUGEINT * delta)
         |    // (CASE WHEN vmic > 0 THEN 1000000 * vmic END))::BIGINT
         |    AS z2_milli,
         |  (CASE WHEN delta > 0 THEN 1 WHEN delta < 0 THEN -1
         |   ELSE 0 END)::BIGINT AS urgent_faster
         |FROM zz""".stripMargin
    },
    // q312: q130's transition window, even-user train grid, modal
    // predictor + unconditional baseline, odd-user top-1 scoring.
    "q312_markov_backtest" ->
      """WITH tr0 AS (SELECT user_id, event_type AS from_type,
        |      lead(event_type, 1) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS to_type
        |      FROM events),
        |tr AS (SELECT from_type, to_type, user_id % 2 = 0 AS is_train
        |      FROM tr0 WHERE to_type IS NOT NULL),
        |c AS (SELECT from_type, to_type, count(*)::BIGINT n FROM tr
        |      WHERE is_train GROUP BY 1, 2),
        |p AS (SELECT from_type, to_type AS predicted FROM (
        |      SELECT *, row_number() OVER (PARTITION BY from_type
        |        ORDER BY n DESC, to_type) rn FROM c) WHERE rn = 1),
        |b AS (SELECT to_type AS base_pred FROM (
        |      SELECT to_type, sum(n) nb FROM c GROUP BY 1
        |      ORDER BY nb DESC, to_type LIMIT 1)),
        |ev AS (SELECT tr.from_type, tr.to_type, p.predicted, b.base_pred
        |      FROM tr LEFT JOIN p ON p.from_type = tr.from_type, b
        |      WHERE NOT is_train)
        |SELECT from_type, max(predicted) AS predicted,
        |  count(*)::BIGINT AS n_test,
        |  sum(CASE WHEN to_type = predicted THEN 1 ELSE 0 END)::BIGINT
        |    AS n_hits,
        |  ((1000 * sum(CASE WHEN to_type = predicted THEN 1 ELSE 0 END))
        |    // count(*))::BIGINT AS acc_pm,
        |  sum(CASE WHEN to_type = base_pred THEN 1 ELSE 0 END)::BIGINT
        |    AS n_base_hits,
        |  ((1000 * sum(CASE WHEN to_type = base_pred THEN 1 ELSE 0 END))
        |    // count(*))::BIGINT AS base_acc_pm,
        |  ((1000 * sum(CASE WHEN to_type = predicted THEN 1 ELSE 0 END))
        |    // sum(CASE WHEN to_type = base_pred THEN 1 ELSE 0 END))::BIGINT
        |    AS lift_milli
        |FROM ev GROUP BY 1 ORDER BY 1""".stripMargin,
    // q315: (priority, period) counts, cleared-denominator pooled z^2
    // in HUGEINT; degenerate slices -> div-NULL.
    "q315_return_rate_drift" -> {
      val cut = Queries.PeriodSplitDate
      s"""WITH lg AS (SELECT o_orderpriority priority,
         |      CASE WHEN l_shipdate < TIMESTAMP '$cut' THEN 1 ELSE 0 END early,
         |      CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END ret
         |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |g AS (SELECT priority, sum(early)::BIGINT n_a,
         |      sum(early * ret)::BIGINT x_a,
         |      sum(1 - early)::BIGINT n_b,
         |      sum((1 - early) * ret)::BIGINT x_b FROM lg GROUP BY 1)
         |SELECT priority, n_a, x_a, n_b, x_b,
         |  ((1000 * x_a) // n_a)::BIGINT AS rate_a_pm,
         |  ((1000 * x_b) // n_b)::BIGINT AS rate_b_pm,
         |  ((1000 * x_a) // n_a - (1000 * x_b) // n_b)::BIGINT AS diff_pm,
         |  ((1000 * (x_a::HUGEINT * n_b - x_b::HUGEINT * n_a)
         |         * (x_a::HUGEINT * n_b - x_b::HUGEINT * n_a) * (n_a + n_b))
         |    // (n_a::HUGEINT * n_b * (x_a + x_b)
         |         * (n_a + n_b - x_a - x_b)))::BIGINT AS z2_milli
         |FROM g ORDER BY priority""".stripMargin
    },
    // q316: part-keyed unit-cents moments in HUGEINT, top-50 by CV^2.
    "q316_price_dispersion" ->
      s"""WITH u AS (SELECT l_partkey partkey, l_suppkey,
         |      CAST(round(l_extendedprice * 100) AS BIGINT)
         |        // CAST(l_quantity AS BIGINT) unit_cents
         |      FROM lineitem),
         |g AS (SELECT partkey, count(*)::BIGINT n_quotes,
         |      count(DISTINCT l_suppkey)::BIGINT n_suppliers,
         |      sum(unit_cents)::BIGINT s,
         |      sum(unit_cents::HUGEINT * unit_cents) q,
         |      min(unit_cents)::BIGINT min_cents,
         |      max(unit_cents)::BIGINT max_cents
         |      FROM u GROUP BY 1)
         |SELECT partkey, n_quotes, n_suppliers, min_cents, max_cents,
         |  ((1000000 * (n_quotes::HUGEINT * q - s::HUGEINT * s))
         |    // (s::HUGEINT * s))::BIGINT AS cv2_ppm,
         |  ((1000 * (max_cents - min_cents)) // min_cents)::BIGINT
         |    AS spread_pm
         |FROM g ORDER BY cv2_ppm DESC, partkey
         |LIMIT ${Queries.PriceDispersionTopK}""".stripMargin,
    // q319: pooled doubled ranks over the (priority, lag) grid, per-
    // group micro floors, clamped numerator, tie-corrected H (mirrors
    // the Spark driver's BigInt fold floor for floor).
    "q319_kruskal_wallis" ->
      """WITH lg AS (SELECT o_orderpriority priority,
        |      date_diff('day', o_orderdate, l_shipdate)::BIGINT lag
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |h AS (SELECT priority, lag, count(*)::BIGINT c FROM lg GROUP BY 1, 2),
        |tv AS (SELECT lag, sum(c)::BIGINT t FROM h GROUP BY 1),
        |dr AS (SELECT lag, (2 * coalesce(sum(t) OVER (ORDER BY lag
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        + t + 1)::BIGINT dr2 FROM tv),
        |sj AS (SELECT priority, sum(c)::BIGINT n, sum(c::HUGEINT * dr2) s2
        |      FROM h JOIN dr USING (lag) GROUP BY 1),
        |tot AS (SELECT sum(n)::BIGINT nn, count(*)::BIGINT k FROM sj),
        |tie AS (SELECT sum(t::HUGEINT * t * t - t) tt FROM tv),
        |cj AS (SELECT sum((1000000 * s2 * s2) // n) csum FROM sj),
        |gl AS (SELECT greatest(3 * csum
        |        - 3000000::HUGEINT * nn * (nn + 1) * (nn + 1), 0) num,
        |      nn, k FROM cj, tot),
        |hh AS (SELECT (num // (1000::HUGEINT * nn * (nn + 1)))::BIGINT h_milli,
        |      nn, k FROM gl),
        |hc AS (SELECT h_milli,
        |      (CASE WHEN (nn::HUGEINT * nn * nn - nn) > tt
        |        THEN (h_milli::HUGEINT * (nn::HUGEINT * nn * nn - nn))
        |          // ((nn::HUGEINT * nn * nn - nn) - tt) END)::BIGINT hc_milli,
        |      (k - 1)::BIGINT df FROM hh, tie)
        |SELECT priority, n, s2::BIGINT AS rank_sum2,
        |  ((500 * s2) // n)::BIGINT AS mean_rank_milli,
        |  h_milli, hc_milli, df
        |FROM sj, hc ORDER BY priority""".stripMargin,
    // q320: day grid, strict above/below-mean binarization (equals
    // drop), lag-window run count, exact permutation moments.
    "q320_runs_test" ->
      s"""WITH c AS (SELECT o_orderdate dy, count(*)::BIGINT c FROM orders
         |      GROUP BY 1),
         |t AS (SELECT count(*)::BIGINT nd, sum(c)::BIGINT s FROM c),
         |k AS (SELECT dy, (CASE WHEN nd * c > s THEN 1 ELSE 0 END)::BIGINT x
         |      FROM c, t WHERE nd * c <> s),
         |r AS (SELECT x, lag(x) OVER (ORDER BY dy) px FROM k),
         |rr AS (SELECT (CASE WHEN count(*) = 0 THEN 0 ELSE 1 +
         |        coalesce(sum(CASE WHEN px IS NOT NULL AND px <> x
         |          THEN 1 ELSE 0 END), 0) END)::BIGINT runs,
         |      coalesce(sum(x), 0)::BIGINT n1,
         |      coalesce(sum(1 - x), 0)::BIGINT n2,
         |      count(*)::BIGINT nk FROM r),
         |f AS (SELECT runs, n1, n2, nk,
         |      ((runs - 1)::HUGEINT * nk - 2::HUGEINT * n1 * n2) dev FROM rr)
         |SELECT t.nd AS n_days, n1 AS n_above, n2 AS n_below, nk AS n_kept,
         |  runs,
         |  (CASE WHEN nk > 0 THEN 1000 + (2000 * n1 * n2) // nk END)::BIGINT
         |    AS expected_runs_milli,
         |  (CASE WHEN 2::HUGEINT * n1 * n2 * (2::HUGEINT * n1 * n2 - nk) > 0
         |    THEN (1000 * dev * dev * (nk - 1))
         |      // (2::HUGEINT * n1 * n2 * (2::HUGEINT * n1 * n2 - nk))
         |    END)::BIGINT AS z2_milli,
         |  (CASE WHEN dev > 0 THEN 1 WHEN dev < 0 THEN -1 ELSE 0 END)::BIGINT
         |    AS trend
         |FROM f, t""".stripMargin,
    // q321: 2x5 priority table, ordinal scores from the priority
    // prefix, two-floor z^2 (vN = Var//N then milli division) —
    // mirrors the Spark driver's BigInt fold.
    "q321_trend_test" ->
      """WITH g AS (SELECT o_orderpriority priority,
        |      substr(o_orderpriority, 1, 1)::BIGINT w, count(*)::BIGINT n,
        |      sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT x
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |      GROUP BY 1, 2),
        |t AS (SELECT sum(n)::HUGEINT nn, sum(x)::HUGEINT r,
        |      sum(w::HUGEINT * x) swx, sum(w::HUGEINT * n) swn,
        |      sum(w::HUGEINT * w * n) sw2n FROM g),
        |s AS (SELECT (nn * swx - r * swn) tc,
        |      (CASE WHEN nn > 0 THEN (r * (nn - r) * (nn * sw2n - swn * swn)) // nn
        |       ELSE 0 END) vn FROM t),
        |z AS (SELECT (CASE WHEN vn > 0 THEN (1000 * tc * tc) // vn END)::BIGINT
        |        z2_milli,
        |      (CASE WHEN tc > 0 THEN 1 WHEN tc < 0 THEN -1 ELSE 0 END)::BIGINT
        |        trend FROM s)
        |SELECT priority, w, n, x, ((1000 * x) // n)::BIGINT AS rate_pm,
        |  z2_milli, trend
        |FROM g, z ORDER BY priority""".stripMargin,
    // q322: per-variable doubled tie-averaged ranks over the day grid,
    // signed squared rho in ppm (q307 sign-square integerization).
    "q322_spearman_daily" ->
      """WITH c AS (SELECT o_orderdate dy, count(*)::BIGINT x,
        |      sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT y
        |      FROM orders GROUP BY 1),
        |xg AS (SELECT x v, count(*)::BIGINT t FROM c GROUP BY 1),
        |xr AS (SELECT v, (2 * coalesce(sum(t) OVER (ORDER BY v
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        + t + 1)::BIGINT dr FROM xg),
        |yg AS (SELECT y v, count(*)::BIGINT t FROM c GROUP BY 1),
        |yr AS (SELECT v, (2 * coalesce(sum(t) OVER (ORDER BY v
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        + t + 1)::BIGINT dr FROM yg),
        |j AS (SELECT xr.dr dx, yr.dr dy FROM c
        |      JOIN xr ON xr.v = c.x JOIN yr ON yr.v = c.y),
        |m AS (SELECT count(*)::HUGEINT n, sum(dx)::HUGEINT sx,
        |      sum(dy)::HUGEINT sy, sum(dx::HUGEINT * dy) sxy,
        |      sum(dx::HUGEINT * dx) sxx, sum(dy::HUGEINT * dy) syy FROM j),
        |f AS (SELECT n, (n * sxy - sx * sy) cov, (n * sxx - sx * sx) vx,
        |      (n * syy - sy * sy) vy FROM m)
        |SELECT n::BIGINT AS n_days,
        |  (CASE WHEN cov > 0 THEN 1 WHEN cov < 0 THEN -1 ELSE 0 END)::BIGINT
        |    AS direction,
        |  (CASE WHEN vx > 0 AND vy > 0 THEN
        |    (CASE WHEN cov >= 0 THEN (1000000 * cov * cov) // (vx * vy)
        |     ELSE -((1000000 * cov * cov) // (vx * vy)) END)
        |   END)::BIGINT AS rho2_ppm
        |FROM f""".stripMargin,
    // q324: cents-exact supplier revenue, per-nation share moments in
    // HUGEINT (mirrors the Spark DECIMAL(38,0) arithmetic).
    "q324_supply_hhi" ->
      """WITH rev AS (SELECT s_nationkey, s_suppkey,
        |      sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT r
        |      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |      GROUP BY 1, 2),
        |g AS (SELECT s_nationkey, count(*)::BIGINT n_suppliers,
        |      sum(r)::BIGINT total_cents, sum(r::HUGEINT * r) rr,
        |      max(r)::BIGINT top_cents FROM rev GROUP BY 1),
        |h AS (SELECT s_nationkey, n_suppliers, total_cents,
        |      ((1000000 * rr) // (total_cents::HUGEINT * total_cents))::BIGINT
        |        hhi_ppm,
        |      ((1000000 * top_cents::HUGEINT) // total_cents)::BIGINT
        |        top_share_ppm FROM g)
        |SELECT n_name AS nation, n_suppliers, total_cents, hhi_ppm,
        |  top_share_ppm,
        |  (CASE WHEN hhi_ppm > 0 THEN 1000000000 // hhi_ppm END)::BIGINT
        |    AS effective_suppliers_milli
        |FROM h JOIN nation ON n_nationkey = s_nationkey
        |ORDER BY nation""".stripMargin,
    // q325: gaps-and-islands — lag gap, burst starts, running-sum
    // island ids, per-island sizes, segment histogram.
    "q325_order_bursts" -> {
      val g = Queries.BurstGapDays
      s"""WITH o2 AS (SELECT o_custkey, o_orderdate, o_orderkey,
         |      date_diff('day', lag(o_orderdate) OVER w, o_orderdate)::BIGINT gap
         |      FROM orders WINDOW w AS (PARTITION BY o_custkey
         |        ORDER BY o_orderdate, o_orderkey)),
         |b AS (SELECT o_custkey,
         |      sum(CASE WHEN gap IS NULL OR gap > $g THEN 1 ELSE 0 END)
         |        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |          ROWS UNBOUNDED PRECEDING)::BIGINT burst_id FROM o2),
         |l AS (SELECT o_custkey, burst_id, count(*)::BIGINT burst_len
         |      FROM b GROUP BY 1, 2)
         |SELECT c_mktsegment AS segment, burst_len, count(*)::BIGINT n_bursts,
         |  count(DISTINCT o_custkey)::BIGINT n_customers
         |FROM l JOIN customer ON c_custkey = o_custkey
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    // q328: one 4-D categorical cube CTE, then per pair the 2-D
    // margins and the q304 per-cell-floored chi^2 (mirrors the Spark
    // driver's BigInt fold cell for cell) — blocks generated per pair.
    "q328_cramers_v_matrix" -> {
      val cats = Seq("priority", "returnflag", "segment", "linestatus")
      val pairs = for {
        i <- cats.indices; j <- cats.indices if i < j
      } yield (cats(i), cats(j))
      val blocks = pairs.map { case (a, b) =>
        s"""g_${a}_$b AS (SELECT $a va, $b vb, sum(c)::BIGINT o
           |      FROM cells GROUP BY 1, 2),
           |rm_${a}_$b AS (SELECT va, sum(o)::BIGINT rt FROM g_${a}_$b GROUP BY 1),
           |cm_${a}_$b AS (SELECT vb, sum(o)::BIGINT ct FROM g_${a}_$b GROUP BY 1),
           |tt_${a}_$b AS (SELECT sum(o)::BIGINT n,
           |      count(DISTINCT va)::BIGINT r, count(DISTINCT vb)::BIGINT c
           |      FROM g_${a}_$b),
           |x_${a}_$b AS (SELECT '$a' col_a, '$b' col_b, t.r, t.c, t.n,
           |      sum((1000 * (t.n::HUGEINT * o - rt::HUGEINT * ct)
           |            * (t.n::HUGEINT * o - rt::HUGEINT * ct))
           |        // (t.n::HUGEINT * rt * ct))::BIGINT chi2_milli
           |      FROM g_${a}_$b JOIN rm_${a}_$b USING (va)
           |        JOIN cm_${a}_$b USING (vb), tt_${a}_$b t
           |      GROUP BY 1, 2, 3, 4, 5)""".stripMargin
      }.mkString(",\n")
      val union = pairs.map { case (a, b) => s"SELECT * FROM x_${a}_$b" }
        .mkString("\n UNION ALL ")
      s"""WITH cells AS (SELECT o_orderpriority priority,
         |      l_returnflag returnflag, c_mktsegment segment,
         |      l_linestatus linestatus, count(*)::BIGINT c
         |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |      JOIN customer ON c_custkey = o_custkey
         |      GROUP BY 1, 2, 3, 4),
         |$blocks
         |SELECT col_a, col_b, r, c, n, chi2_milli,
         |  (CASE WHEN least(r, c) > 1 THEN
         |    (1000 * chi2_milli) // (n * (least(r, c) - 1)) END)::BIGINT
         |    AS v2_ppm
         |FROM ($union)
         |ORDER BY col_a, col_b""".stripMargin
    },
    // q329: generate_series window spine x observed types, left-join
    // counts, dead streaks via the win - row_number constancy trick.
    "q329_feed_liveness" -> {
      val win = Queries.LivenessWinNs
      s"""WITH ev AS (SELECT event_type, epoch_ns(ts) // $win AS win FROM events),
         |cnt AS (SELECT event_type, win, count(*)::BIGINT n FROM ev
         |      GROUP BY 1, 2),
         |rng AS (SELECT min(win) mn, max(win) mx FROM ev),
         |ty AS (SELECT DISTINCT event_type FROM ev),
         |spine AS (SELECT ty.event_type, uw.win FROM ty,
         |      (SELECT unnest(generate_series(mn, mx)) win FROM rng) uw),
         |grid AS (SELECT spine.event_type, spine.win,
         |      (CASE WHEN cnt.n IS NULL THEN 1 ELSE 0 END)::BIGINT dead
         |      FROM spine LEFT JOIN cnt ON cnt.event_type = spine.event_type
         |        AND cnt.win = spine.win),
         |dk AS (SELECT event_type, win,
         |      win - row_number() OVER (PARTITION BY event_type ORDER BY win)
         |        grp FROM grid WHERE dead = 1),
         |st AS (SELECT event_type, max(len)::BIGINT longest FROM
         |      (SELECT event_type, grp, count(*)::BIGINT len FROM dk
         |       GROUP BY 1, 2) GROUP BY 1),
         |ag AS (SELECT event_type, count(*)::BIGINT n_windows,
         |      sum(1 - dead)::BIGINT n_live, sum(dead)::BIGINT n_dead
         |      FROM grid GROUP BY 1)
         |SELECT ag.event_type, n_windows, n_live, n_dead,
         |  ((1000 * n_dead) // n_windows)::BIGINT AS dead_share_pm,
         |  coalesce(st.longest, 0)::BIGINT AS longest_dead_streak
         |FROM ag LEFT JOIN st ON st.event_type = ag.event_type
         |ORDER BY ag.event_type""".stripMargin
    },
    // q330: per-stratum 2x2 with micro-floored MH terms, pooled OR and
    // CMH chi^2 in HUGEINT (mirrors the Spark DECIMAL(38,0) floors).
    "q330_mantel_haenszel" -> {
      val cut = Queries.MhQtyCut
      s"""WITH s0 AS (SELECT o_orderpriority priority,
         |      (CASE WHEN l_quantity >= $cut THEN 1 ELSE 0 END)::BIGINT hi,
         |      (CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT ret
         |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |s AS (SELECT priority, sum(hi * ret)::BIGINT a,
         |      sum(hi * (1 - ret))::BIGINT b,
         |      sum((1 - hi) * ret)::BIGINT cc,
         |      sum((1 - hi) * (1 - ret))::BIGINT dd FROM s0 GROUP BY 1),
         |m AS (SELECT *, (a + b + cc + dd)::BIGINT n,
         |      ((1000000 * a::HUGEINT * dd) // (a + b + cc + dd))::BIGINT num_micro,
         |      ((1000000 * b::HUGEINT * cc) // (a + b + cc + dd))::BIGINT den_micro,
         |      ((1000000 * (a + b)::HUGEINT * (a + cc)) // (a + b + cc + dd))::BIGINT e_micro,
         |      ((1000000 * (a + b)::HUGEINT * (cc + dd) * (a + cc) * (b + dd))
         |        // ((a + b + cc + dd)::HUGEINT * (a + b + cc + dd)
         |           * (a + b + cc + dd - 1)))::BIGINT v_micro
         |      FROM s),
         |g AS (SELECT sum(a)::HUGEINT sa, sum(num_micro)::HUGEINT sn,
         |      sum(den_micro)::HUGEINT sd, sum(e_micro)::HUGEINT se,
         |      sum(v_micro)::HUGEINT sv FROM m)
         |SELECT priority, a, b, cc AS c, dd AS d,
         |  (CASE WHEN b * cc > 0 THEN
         |    (1000 * a::HUGEINT * dd) // (b::HUGEINT * cc) END)::BIGINT
         |    AS or_stratum_milli,
         |  (CASE WHEN sd > 0 THEN (1000 * sn) // sd END)::BIGINT AS or_mh_milli,
         |  (CASE WHEN sv > 0 THEN
         |    (1000 * (1000000 * sa - se) * (1000000 * sa - se))
         |      // (1000000 * sv) END)::BIGINT AS cmh_milli,
         |  (CASE WHEN 1000000 * sa - se > 0 THEN 1
         |    WHEN 1000000 * sa - se < 0 THEN -1 ELSE 0 END)::BIGINT
         |    AS direction
         |FROM m, g ORDER BY priority""".stripMargin
    },
    // q331: four raw power sums, integer central-sum identities, the
    // ratio-first two-floor skew chain, kurtosis A4/A2^2 in milli.
    "q331_lag_moments" ->
      """WITH lg AS (SELECT o_orderpriority priority,
        |      date_diff('day', o_orderdate, l_shipdate)::BIGINT x
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |p AS (SELECT priority, count(*)::BIGINT n, sum(x)::BIGINT s,
        |      sum(x::HUGEINT * x) p2, sum(x::HUGEINT * x * x) p3,
        |      sum(x::HUGEINT * x * x * x) p4 FROM lg GROUP BY 1),
        |a AS (SELECT priority, n, s,
        |      (n * p2 - s::HUGEINT * s) a2,
        |      (n::HUGEINT * n * p3 - 3 * n::HUGEINT * s * p2
        |        + 2 * s::HUGEINT * s * s) a3,
        |      (n::HUGEINT * n * n * p4 - 4 * n::HUGEINT * n * s * p3
        |        + 6 * n::HUGEINT * s * s * p2
        |        - 3 * s::HUGEINT * s * s * s) a4 FROM p)
        |SELECT priority, n, ((1000 * s) // n)::BIGINT AS mean_milli,
        |  (CASE WHEN n > 0 THEN (1000 * a2) // (n::HUGEINT * n) END)::BIGINT
        |    AS var_milli,
        |  (CASE WHEN a2 > 0 THEN
        |    (CASE WHEN a3 < 0 THEN -1 ELSE 1 END) *
        |    ((((1000000 * abs(a3)) // a2) * ((1000000 * abs(a3)) // a2))
        |      // (1000000000 * a2)) END)::BIGINT AS skew2_milli,
        |  (CASE WHEN a2 > 0 THEN (1000 * (a4 // a2)) // a2 END)::BIGINT
        |    AS kurt_milli
        |FROM a ORDER BY priority""".stripMargin,
    // q332: per-customer 3-order pivot, |diff|-day histogram, doubled
    // signed ranks, tie-corrected z^2 (mirrors the driver BigInt fold).
    "q332_wilcoxon_repeat" ->
      """WITH o2 AS (SELECT o_custkey, o_orderdate,
        |      row_number() OVER w rn FROM orders
        |      WINDOW w AS (PARTITION BY o_custkey
        |        ORDER BY o_orderdate, o_orderkey)),
        |pv AS (SELECT o_custkey,
        |      max(CASE WHEN rn = 1 THEN o_orderdate END) d1,
        |      max(CASE WHEN rn = 2 THEN o_orderdate END) d2,
        |      max(CASE WHEN rn = 3 THEN o_orderdate END) d3
        |      FROM o2 WHERE rn <= 3 GROUP BY 1),
        |f AS (SELECT (date_diff('day', d2, d3)
        |      - date_diff('day', d1, d2))::BIGINT df FROM pv
        |      WHERE d3 IS NOT NULL),
        |z AS (SELECT count(*)::BIGINT n_zero FROM f WHERE df = 0),
        |h AS (SELECT abs(df)::BIGINT ad,
        |      sum(CASE WHEN df > 0 THEN 1 ELSE 0 END)::BIGINT pos,
        |      count(*)::BIGINT t FROM f WHERE df <> 0 GROUP BY 1),
        |r AS (SELECT ad, pos, t,
        |      (2 * coalesce(sum(t) OVER (ORDER BY ad
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        + t + 1)::BIGINT dr FROM h),
        |g AS (SELECT coalesce(sum(pos::HUGEINT * dr), 0) w2,
        |      coalesce(sum(pos), 0)::BIGINT n_pos,
        |      coalesce(sum(t - pos), 0)::BIGINT n_neg,
        |      coalesce(sum(t), 0)::BIGINT n,
        |      coalesce(sum(t::HUGEINT * t * t - t), 0) tie FROM r),
        |e AS (SELECT *, (w2 - (n::HUGEINT * (n + 1)) // 2) dev,
        |      (2::HUGEINT * n * (n + 1) * (2 * n + 1) - tie) den FROM g)
        |SELECT (n + n_zero)::BIGINT AS n_pairs, n_zero, n_pos, n_neg,
        |  w2::BIGINT AS w2,
        |  (CASE WHEN dev > 0 THEN 1 WHEN dev < 0 THEN -1 ELSE 0 END)::BIGINT
        |    AS decel,
        |  (CASE WHEN den > 0 AND n > 0 THEN
        |    (12000 * dev * dev) // den END)::BIGINT AS z2_milli,
        |  (CASE WHEN n > 0 THEN
        |    (1000 * (n_pos - n_neg)::HUGEINT * (n_pos - n_neg)) // n
        |   END)::BIGINT AS sign_z2_milli
        |FROM e, z""".stripMargin,
    // q333: complete-week spine with zero fill, in-block doubled ranks
    // (rank + peer count), tie-corrected Friedman Q in milli.
    "q333_friedman_dow" ->
      """WITH dd AS (SELECT date_diff('day', DATE '1970-01-01',
        |        o_orderdate)::BIGINT dy FROM orders),
        |cnt AS (SELECT dy // 7 wk, dy % 7 dow, count(*)::BIGINT n
        |      FROM dd GROUP BY 1, 2),
        |rng AS (SELECT min(wk) + 1 w0, max(wk) - 1 w1 FROM cnt),
        |spine AS (SELECT uw.wk, dw.dow FROM
        |      (SELECT unnest(generate_series(w0, w1)) wk FROM rng) uw,
        |      generate_series(0, 6) dw(dow)),
        |grid AS (SELECT spine.wk, spine.dow,
        |      coalesce(cnt.n, 0)::BIGINT n FROM spine
        |      LEFT JOIN cnt ON cnt.wk = spine.wk AND cnt.dow = spine.dow),
        |rk AS (SELECT wk, dow, n,
        |      rank() OVER (PARTITION BY wk ORDER BY n)::BIGINT r,
        |      count(*) OVER (PARTITION BY wk, n)::BIGINT t FROM grid),
        |dr AS (SELECT wk, dow, (2 * (r - 1) + t + 1)::BIGINT dr2 FROM rk),
        |pd AS (SELECT dow, count(*)::BIGINT b, sum(dr2)::BIGINT rank_sum2
        |      FROM dr GROUP BY 1),
        |nm AS (SELECT sum((rank_sum2::HUGEINT - b * 8)
        |        * (rank_sum2::HUGEINT - b * 8)) num, max(b)::BIGINT bb FROM pd),
        |dn AS (SELECT sum(dr2::HUGEINT * dr2) sdr2 FROM dr),
        |gl AS (SELECT num, (sdr2 - bb::HUGEINT * 7 * 64) den FROM nm, dn)
        |SELECT dow, b, rank_sum2,
        |  ((500 * rank_sum2) // b)::BIGINT AS mean_rank_milli,
        |  (CASE WHEN den > 0 THEN (1000 * 6 * num) // den END)::BIGINT
        |    AS q_milli,
        |  6::BIGINT AS df
        |FROM pd, gl ORDER BY dow""".stripMargin,
    // q335: per-type running-max lateness via arrival-order windows,
    // minute-bucket histogram, smallest bucket with 100*cum >= 99*n.
    "q335_ooo_lateness" ->
      """WITH e AS (SELECT event_type, event_id, epoch_ns(ts) tns FROM events),
        |l AS (SELECT event_type,
        |      greatest(coalesce(max(tns) OVER (PARTITION BY event_type
        |          ORDER BY event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - tns,
        |        0), 0)::BIGINT late_ns FROM e),
        |h AS (SELECT event_type, late_ns // 60000000000 late_min,
        |      count(*)::BIGINT c FROM l GROUP BY 1, 2),
        |cw AS (SELECT event_type, late_min, c,
        |      sum(c) OVER (PARTITION BY event_type ORDER BY late_min
        |        ROWS UNBOUNDED PRECEDING)::BIGINT cum,
        |      sum(c) OVER (PARTITION BY event_type)::BIGINT n FROM h)
        |SELECT event_type, max(n)::BIGINT AS n_events,
        |  sum(CASE WHEN late_min > 0 THEN c ELSE 0 END)::BIGINT AS n_late_1min,
        |  ((1000 * sum(CASE WHEN late_min > 0 THEN c ELSE 0 END))
        |    // max(n))::BIGINT AS late_share_pm,
        |  max(late_min)::BIGINT AS max_late_min,
        |  min(CASE WHEN 100 * cum >= 99 * n THEN late_min END)::BIGINT
        |    AS watermark_p99_min
        |FROM cw GROUP BY event_type ORDER BY event_type""".stripMargin,
    // q339: json_keys enumeration per type; per-type totals and the
    // bounded key grid.
    "q339_props_schema" ->
      """WITH k AS (SELECT event_type, unnest(json_keys(props)) kname
        |      FROM events),
        |g AS (SELECT event_type, kname, count(*)::BIGINT n_present
        |      FROM k GROUP BY 1, 2),
        |t AS (SELECT event_type, count(*)::BIGINT n_events FROM events
        |      GROUP BY 1),
        |x AS (SELECT g.event_type, g.kname, g.n_present, t.n_events,
        |      count(*) OVER (PARTITION BY g.event_type)::BIGINT n_keys
        |      FROM g JOIN t ON t.event_type = g.event_type)
        |SELECT event_type, kname AS key, n_present, n_events,
        |  ((1000 * n_present) // n_events)::BIGINT AS present_share_pm,
        |  n_keys
        |FROM x ORDER BY event_type, kname""".stripMargin,
    // q340: customer revenue rollup, within-segment ntile with the
    // deterministic (revenue DESC, custkey) tie-break, cumulative
    // share from the top.
    "q340_revenue_concentration" ->
      """WITH cu AS (SELECT o_custkey,
        |      sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT cents
        |      FROM orders GROUP BY 1),
        |j AS (SELECT c_mktsegment segment, cu.o_custkey, cents,
        |      ntile(10) OVER (PARTITION BY c_mktsegment
        |        ORDER BY cents DESC, cu.o_custkey)::BIGINT decile
        |      FROM cu JOIN customer ON c_custkey = cu.o_custkey),
        |g AS (SELECT segment, decile, count(*)::BIGINT n_customers,
        |      sum(cents)::BIGINT cents FROM j GROUP BY 1, 2),
        |w AS (SELECT segment, decile, n_customers, cents,
        |      sum(cents) OVER (PARTITION BY segment ORDER BY decile
        |        ROWS UNBOUNDED PRECEDING)::BIGINT cum_cents,
        |      sum(cents) OVER (PARTITION BY segment)::BIGINT total_cents
        |      FROM g)
        |SELECT segment, decile, n_customers, cents,
        |  ((1000 * cents) // total_cents)::BIGINT AS share_pm,
        |  ((1000 * cum_cents) // total_cents)::BIGINT AS cum_share_pm
        |FROM w ORDER BY segment, decile""".stripMargin,
    // q341: the 2x2 (group, period) grid, ppm rate floors, micro
    // variance floors, one-row DiD scalar back onto the cells.
    "q341_did_returns" -> {
      val split = Queries.PeriodSplitDate
      s"""WITH c AS (SELECT
         |      (CASE WHEN substr(o_orderpriority, 1, 1)::INT <= 2
         |        THEN 1 ELSE 0 END)::BIGINT grp,
         |      (CASE WHEN l_shipdate < TIMESTAMP '$split' THEN 0 ELSE 1
         |        END)::BIGINT period,
         |      (CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT ret
         |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |g AS (SELECT grp, period, count(*)::BIGINT n, sum(ret)::BIGINT x
         |      FROM c GROUP BY 1, 2),
         |m AS (SELECT *, ((1000000 * x) // n)::BIGINT rate_ppm,
         |      ((1000000000000 * x::HUGEINT * (n - x))
         |        // (n::HUGEINT * n * n))::BIGINT var_micro FROM g),
         |t AS (SELECT
         |      sum(CASE WHEN grp = 1 AND period = 1 THEN rate_ppm ELSE 0 END)
         |        ::BIGINT p11,
         |      sum(CASE WHEN grp = 1 AND period = 0 THEN rate_ppm ELSE 0 END)
         |        ::BIGINT p10,
         |      sum(CASE WHEN grp = 0 AND period = 1 THEN rate_ppm ELSE 0 END)
         |        ::BIGINT p01,
         |      sum(CASE WHEN grp = 0 AND period = 0 THEN rate_ppm ELSE 0 END)
         |        ::BIGINT p00,
         |      sum(var_micro)::BIGINT var_sum, min(n)::BIGINT min_cell
         |      FROM m)
         |SELECT grp, period, n, x, rate_ppm,
         |  ((p11 - p10) - (p01 - p00))::BIGINT AS did_ppm,
         |  (CASE WHEN var_sum > 0 AND min_cell > 0 THEN
         |    (1000 * ((p11 - p10) - (p01 - p00))::HUGEINT
         |          * ((p11 - p10) - (p01 - p00)))
         |      // var_sum END)::BIGINT AS z2_milli
         |FROM m, t ORDER BY grp, period""".stripMargin
    },
    // q342: the 5-row priority grid self-joined on adjacency; the
    // ceiling cross-multiply with fixed z design constants.
    "q342_power_sample_size" -> {
      val z2 = (Queries.PowerZAlphaMilli + Queries.PowerZBetaMilli) *
        (Queries.PowerZAlphaMilli + Queries.PowerZBetaMilli)
      s"""WITH g AS (SELECT substr(o_orderpriority, 1, 1)::BIGINT w,
         |      count(*)::BIGINT n,
         |      sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT x
         |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |      GROUP BY 1),
         |p AS (SELECT w, n, ((1000000 * x) // n)::BIGINT p_ppm FROM g),
         |j AS (SELECT a.w w_lo, b.w w_hi, a.n n_lo, b.n n_hi,
         |      a.p_ppm p_lo_ppm, b.p_ppm p_hi_ppm,
         |      (a.p_ppm - b.p_ppm)::BIGINT delta_ppm,
         |      (CASE WHEN a.p_ppm <> b.p_ppm THEN
         |        ($z2::HUGEINT
         |          * (a.p_ppm::HUGEINT * (1000000 - a.p_ppm)
         |             + b.p_ppm::HUGEINT * (1000000 - b.p_ppm))
         |          + (a.p_ppm - b.p_ppm)::HUGEINT
         |            * (a.p_ppm - b.p_ppm) * 1000000 - 1)
         |        // ((a.p_ppm - b.p_ppm)::HUGEINT
         |             * (a.p_ppm - b.p_ppm) * 1000000) END)::BIGINT n_req
         |      FROM p a JOIN p b ON b.w = a.w + 1)
         |SELECT w_lo, w_hi, n_lo, n_hi, p_lo_ppm, p_hi_ppm, delta_ppm,
         |  n_req AS n_required,
         |  (CASE WHEN n_req IS NULL THEN NULL
         |    WHEN least(n_lo, n_hi) >= n_req THEN 1 ELSE 0 END)::BIGINT
         |    AS powered
         |FROM j ORDER BY w_lo""".stripMargin
    },
    // q343: delta-sweep backlog over the day spine, exact milli
    // lambda/W/L, the 10^6-scaled consistency ratio.
    "q343_little_law" ->
      """WITH li AS (SELECT
        |      date_diff('day', DATE '1970-01-01', o_orderdate)::BIGINT od,
        |      date_diff('day', DATE '1970-01-01', l_shipdate)::BIGINT sd
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |g AS (SELECT od, sd, count(*)::BIGINT c FROM li GROUP BY 1, 2),
        |rng AS (SELECT min(od) d0, greatest(max(od), max(sd)) d1 FROM g),
        |del AS (SELECT od AS dy, sum(c)::BIGINT dd FROM g GROUP BY 1
        |      UNION ALL SELECT sd, -sum(c) FROM g GROUP BY sd),
        |dd2 AS (SELECT dy, sum(dd)::BIGINT dd FROM del GROUP BY 1),
        |spine AS (SELECT uw.dy FROM
        |      (SELECT unnest(generate_series(d0, d1)) dy FROM rng) uw),
        |bl AS (SELECT spine.dy, coalesce(dd2.dd, 0)::BIGINT dd FROM spine
        |      LEFT JOIN dd2 ON dd2.dy = spine.dy),
        |run AS (SELECT dy,
        |      sum(dd) OVER (ORDER BY dy ROWS UNBOUNDED PRECEDING)::BIGINT
        |        backlog FROM bl),
        |tot AS (SELECT (SELECT d1 - d0 + 1 FROM rng)::BIGINT n_days,
        |      (SELECT sum(c) FROM g)::BIGINT n_items,
        |      (SELECT sum((sd - od)::HUGEINT * c) FROM g) w_sum,
        |      (SELECT sum(backlog::HUGEINT) FROM run) l_sum),
        |f AS (SELECT n_days, n_items,
        |      ((1000 * n_items) // n_days)::BIGINT lambda_milli,
        |      ((1000 * w_sum) // n_items)::BIGINT w_milli,
        |      ((1000 * l_sum) // n_days)::BIGINT l_milli FROM tot)
        |SELECT n_days, n_items, lambda_milli, w_milli, l_milli,
        |  (CASE WHEN lambda_milli > 0 AND w_milli > 0 THEN
        |    (1000000 * l_milli::HUGEINT)
        |      // (lambda_milli::HUGEINT * w_milli) END)::BIGINT
        |    AS consistency_milli
        |FROM f""".stripMargin,
    // q346: pooled (priority, lag) grid, in-partition cumulatives,
    // the single cross-multiplied CvM floor.
    "q346_cvm_lag" ->
      """WITH lg AS (SELECT o_orderpriority priority,
        |      date_diff('day', o_orderdate, l_shipdate)::BIGINT lag,
        |      CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END ret
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |h AS (SELECT priority, lag, sum(ret)::BIGINT a,
        |      sum(1 - ret)::BIGINT b FROM lg GROUP BY 1, 2),
        |cw AS (SELECT priority, lag, a, b,
        |      sum(a) OVER w1 ::BIGINT c1, sum(b) OVER w1 ::BIGINT c2,
        |      sum(a) OVER w2 ::BIGINT n, sum(b) OVER w2 ::BIGINT m
        |      FROM h
        |      WINDOW w1 AS (PARTITION BY priority ORDER BY lag
        |        ROWS UNBOUNDED PRECEDING),
        |      w2 AS (PARTITION BY priority)),
        |g AS (SELECT priority, max(n)::BIGINT n_ret, max(m)::BIGINT n_kept,
        |      sum((a + b)::HUGEINT
        |          * (m::HUGEINT * c1 - n::HUGEINT * c2)
        |          * (m::HUGEINT * c1 - n::HUGEINT * c2)) tsum
        |      FROM cw GROUP BY 1)
        |SELECT priority, n_ret, n_kept,
        |  (CASE WHEN n_ret > 0 AND n_kept > 0 THEN
        |    (1000 * tsum) // ((n_ret + n_kept)::HUGEINT * (n_ret + n_kept)
        |      * n_ret * n_kept) END)::BIGINT AS cvm_milli
        |FROM g ORDER BY priority""".stripMargin,
    // q347: per-customer lag gaps, week-bucket histogram, reverse-
    // cumulative at-risk fold, one permille floor per bucket.
    "q347_repeat_hazard" ->
      """WITH g AS (SELECT date_diff('day',
        |      lag(o_orderdate) OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate, o_orderkey),
        |      o_orderdate)::BIGINT gap FROM orders),
        |h AS (SELECT gap // 7 wk, count(*)::BIGINT n_gaps FROM g
        |      WHERE gap IS NOT NULL GROUP BY 1),
        |r AS (SELECT wk, n_gaps,
        |      sum(n_gaps) OVER (ORDER BY wk DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |        AS at_risk FROM h)
        |SELECT wk, n_gaps, at_risk,
        |  ((1000 * n_gaps) // at_risk)::BIGINT AS hazard_pm
        |FROM r ORDER BY wk""".stripMargin,
    // q349: one supplier-dim join + nation agg; the 2x2 margin
    // identity ad-bc = rN-nR; corrected isqrt; AS 26.2.19 polynomial
    // tail in micro fixed-point; BH step-up by integer cross-multiply.
    "q349_fdr_returns" ->
      """WITH ag AS (SELECT s_nationkey nk, count(*)::BIGINT n,
        |      sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT r
        |      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |      GROUP BY 1),
        |t0 AS (SELECT sum(n)::HUGEINT nn, sum(r)::HUGEINT rr,
        |      count(*)::HUGEINT m FROM ag),
        |x AS (SELECT nk, n, r, m,
        |      CASE WHEN n * (nn - n) * rr * (nn - rr) = 0 THEN 0::HUGEINT
        |        ELSE (1000 * nn * (r * nn - n * rr) * (r * nn - n * rr))
        |          // (n * (nn - n) * rr * (nn - rr)) END AS chi2m
        |      FROM ag, t0),
        |s0 AS (SELECT *, floor(sqrt((1000 * chi2m)::DOUBLE))::HUGEINT q0 FROM x),
        |s1 AS (SELECT *, CASE WHEN q0 * q0 > 1000 * chi2m THEN q0 - 1 ELSE q0 END q1 FROM s0),
        |s2 AS (SELECT *, CASE WHEN (q1 + 1) * (q1 + 1) <= 1000 * chi2m
        |      THEN q1 + 1 ELSE q1 END zm FROM s1),
        |zc AS (SELECT *, least(zm, 6000::HUGEINT) z FROM s2),
        |pt AS (SELECT *, (1000000 + (196854 * z) // 1000
        |      + (115194 * z * z) // 1000000
        |      + (344 * z * z * z) // 1000000000
        |      + (19527 * z * z * z * z) // 1000000000000) AS t FROM zc),
        |pv AS (SELECT nk, n, r, m, chi2m,
        |      (1000000000000000000000000000000::HUGEINT // (t * t * t * t)) p_ppm
        |      FROM pt),
        |rk AS (SELECT *, row_number() OVER (ORDER BY p_ppm, nk)::BIGINT i FROM pv),
        |ks AS (SELECT max(CASE WHEN m * p_ppm <= 50000 * i THEN i ELSE 0 END) kstar
        |      FROM rk)
        |SELECT nk::BIGINT AS nationkey, n AS n_lines, r AS n_returns,
        |  chi2m::BIGINT AS chi2_milli, p_ppm::BIGINT AS p_ppm, i AS p_rank,
        |  (CASE WHEN i <= kstar THEN 1 ELSE 0 END)::BIGINT AS bh_reject
        |FROM rk, ks ORDER BY nationkey""".stripMargin,
  )
}
