package graft
package oracles

/** DuckDB oracle SQL — core relational surface (scans, joins, aggs, windows, sets).
  *
  * Split from SparkEntry.oracleSql (round 12): entry text is verbatim;
  * SparkEntry remains the single-source registry and concatenates the
  * family maps. RegistrationGateSpec enforces key-set equality with
  * `queries`, and the split was verified by a byte-identical
  * oracle_sql.json dump before/after. */
private[graft] object OracleCore {
  import graft.SparkEntryOracleUtil._
  val sql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_join_orders_customer" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        |FROM orders LEFT OUTER JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q04_join_nation_region" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation LEFT OUTER JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,
    "q05_global_max" ->
      """SELECT max(l_quantity) AS max_qty, max(l_extendedprice) AS max_price,
        |  max(l_discount) AS max_disc, max(l_tax) AS max_tax,
        |  max(l_orderkey) AS max_orderkey
        |FROM lineitem""".stripMargin,
    "q06_global_counts" ->
      """SELECT count(*) AS n_rows, count(o_custkey) AS n_custkey,
        |  count(o_totalprice) AS n_totalprice,
        |  count(DISTINCT o_custkey) AS n_distinct_cust
        |FROM orders""".stripMargin,
    "q07_global_means" ->
      """SELECT round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  round(avg(l_extendedprice), 4) AS avg_price
        |FROM lineitem""".stripMargin,
    "q08_distinct_values" ->
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q09_normalize_by_max" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_quantity / (SELECT max(l_quantity) FROM lineitem), 6) AS qty_norm,
        |  round(l_extendedprice / (SELECT max(l_extendedprice) FROM lineitem), 6) AS price_norm
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q10_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin,
    "q11_window_top_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 2
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q12_semi_join_customers" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q13_anti_join_customers" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q14_union_high_value" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000.0
        |UNION
        |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000.0
        |ORDER BY custkey""".stripMargin,
    "q15_group_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_spent
        |FROM orders
        |GROUP BY o_custkey
        |HAVING count(*) >= 3
        |ORDER BY o_custkey""".stripMargin,
    "q16_shipping_priority" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q17_local_supplier_volume" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q18_events_hourly" ->
      """SELECT event_type,
        |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events
        |GROUP BY event_type, date_trunc('hour', ts)
        |ORDER BY event_type, hour""".stripMargin,
    "q19_events_sessionize" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(new_sess) AS BIGINT) AS n_sessions
        |FROM (
        |  SELECT user_id,
        |    CASE WHEN prev_ns IS NULL OR epoch_ns(ts) - prev_ns > 1800000000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM (
        |    SELECT user_id, ts,
        |      lag(epoch_ns(ts)) OVER (PARTITION BY user_id
        |                              ORDER BY ts, event_id) AS prev_ns
        |    FROM events) a) b
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q20_orders_by_month" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderstatus,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY strftime(o_orderdate, '%Y-%m'), o_orderstatus
        |ORDER BY month, o_orderstatus""".stripMargin,
    "q124_event_funnel" ->
      """WITH v AS (SELECT user_id, min(epoch_us(ts))::BIGINT AS view_us
        |           FROM events WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(epoch_us(e.ts))::BIGINT AS click_us
        |      FROM events e JOIN v ON v.user_id = e.user_id
        |      WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.view_us
        |      GROUP BY 1),
        |p AS (SELECT e.user_id, min(epoch_us(e.ts))::BIGINT AS purchase_us
        |      FROM events e JOIN c ON c.user_id = e.user_id
        |      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.click_us
        |      GROUP BY 1)
        |SELECT v.user_id, v.view_us, c.click_us, p.purchase_us,
        |       (1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
        |          + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END)::BIGINT AS stage
        |FROM v LEFT JOIN c ON c.user_id = v.user_id
        |       LEFT JOIN p ON p.user_id = v.user_id
        |ORDER BY v.user_id""".stripMargin,
    "q125_cohort_retention" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |ch AS (SELECT user_id, min(day)::BIGINT AS cohort_day FROM e GROUP BY 1),
        |a AS (SELECT DISTINCT ch.cohort_day, e.day - ch.cohort_day AS day_offset,
        |      e.user_id FROM e JOIN ch ON ch.user_id = e.user_id)
        |SELECT cohort_day, day_offset::BIGINT AS day_offset, count(*)::BIGINT AS n_users
        |FROM a GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,
    "q130_event_transitions" ->
      """WITH s AS (SELECT user_id, event_type AS from_type,
        |             lead(event_type) OVER (PARTITION BY user_id
        |               ORDER BY epoch_ns(ts), event_id) AS to_type
        |           FROM events),
        |t AS (SELECT from_type, to_type, count(*)::BIGINT AS n FROM s
        |      WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, sum(n)::BIGINT AS tot FROM t GROUP BY 1)
        |SELECT t.from_type, t.to_type, t.n, ((1000 * t.n) // tot.tot)::BIGINT AS permille
        |FROM t JOIN tot ON tot.from_type = t.from_type
        |ORDER BY t.from_type, t.to_type""".stripMargin,
    "q133_event_anomalies" ->
      """WITH e AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |c AS (SELECT event_type, day::BIGINT AS day, count(*)::BIGINT AS n FROM e GROUP BY 1, 2),
        |s AS (SELECT event_type, count(*)::BIGINT AS days, sum(n)::BIGINT AS total,
        |      sum(n * n)::BIGINT AS sumsq FROM c GROUP BY 1),
        |j AS (SELECT c.event_type, c.day, c.n,
        |      (c.n * s.days - s.total)::BIGINT AS dev_scaled,
        |      (s.days * s.sumsq - s.total * s.total)::BIGINT AS var_scaled
        |      FROM c JOIN s ON c.event_type = s.event_type)
        |SELECT event_type, day, n, dev_scaled,
        |  (CASE WHEN var_scaled > 0
        |        THEN (1000 * dev_scaled * dev_scaled) // var_scaled END)::BIGINT AS z2_milli,
        |  (CASE WHEN var_scaled > 0 AND dev_scaled * dev_scaled > 9 * var_scaled
        |        THEN 1 ELSE 0 END)::BIGINT AS flagged
        |FROM j ORDER BY event_type, day""".stripMargin,
    "q141_session_associations" ->
      """WITH s AS (SELECT user_id, event_id, event_type, epoch_ns(ts) tns,
        |             lag(epoch_ns(ts)) OVER (PARTITION BY user_id
        |               ORDER BY epoch_ns(ts), event_id) prev_ns
        |           FROM events),
        |n AS (SELECT user_id, event_type,
        |        sum(CASE WHEN prev_ns IS NULL OR tns - prev_ns > 1800000000000
        |                 THEN 1 ELSE 0 END)
        |          OVER (PARTITION BY user_id ORDER BY tns, event_id
        |                ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM s),
        |u AS (SELECT DISTINCT user_id, sid, event_type FROM n),
        |tot AS (SELECT count(*)::BIGINT n_sess FROM (SELECT DISTINCT user_id, sid FROM u)),
        |tc AS (SELECT event_type, count(*)::BIGINT nt FROM u GROUP BY 1),
        |p AS (SELECT a.event_type ta, b.event_type tb, count(*)::BIGINT n_both
        |      FROM u a JOIN u b ON a.user_id = b.user_id AND a.sid = b.sid
        |                       AND a.event_type < b.event_type
        |      GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT ta AS type_a, tb AS type_b, n_both, x.nt AS na, y.nt AS nb,
        |  ((1000 * n_both) // x.nt)::BIGINT AS conf_a_to_b_permille,
        |  ((1000 * n_both) // y.nt)::BIGINT AS conf_b_to_a_permille,
        |  ((1000::HUGEINT * n_both * t.n_sess) // (x.nt::HUGEINT * y.nt))::BIGINT
        |    AS lift_permille
        |FROM p JOIN tc x ON x.event_type = ta JOIN tc y ON y.event_type = tb, tot t
        |ORDER BY type_a, type_b""".stripMargin,
    "q52_profile_columns" ->
      """WITH u AS (
        |  SELECT 'l_quantity' AS col_name, l_quantity AS v FROM lineitem UNION ALL
        |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem UNION ALL
        |  SELECT 'l_discount', l_discount FROM lineitem UNION ALL
        |  SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT col_name, count(*) AS n, count(*) - count(v) AS n_null,
        |       count(DISTINCT v) AS n_distinct,
        |       round(min(v), 2) AS min_v, round(max(v), 2) AS max_v
        |FROM u GROUP BY col_name ORDER BY col_name""".stripMargin,
    "q34_orders_rollup" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderstatus,
        |  grouping_id(strftime(o_orderdate, '%Y-%m'), o_orderstatus)::BIGINT AS gid,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY ROLLUP(strftime(o_orderdate, '%Y-%m'), o_orderstatus)
        |ORDER BY gid, month NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    "q35_text_scalars" ->
      """SELECT doc_id, upper(substring(text, 1, 20)) AS head20,
        |  length(trim(text))::BIGINT AS n_trim,
        |  replace(lang, 'e', 'E') AS lang_x,
        |  source || ':' || lang AS src_lang,
        |  instr(text, 'the')::BIGINT AS first_the,
        |  right(text, 10) AS tail10
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q36_full_outer" ->
      """SELECT count(*) AS n_rows, count(o_orderkey) AS n_orders,
        |  count(c_custkey) AS n_cust_side,
        |  sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_customers_no_orders,
        |  round(sum(coalesce(o_totalprice, 0.0)), 2) AS total
        |FROM orders FULL OUTER JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q39_orders_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  grouping_id(o_orderstatus, o_orderpriority)::BIGINT AS gid,
        |  count(*) AS n_orders, round(avg(o_totalprice), 2) AS avg_price
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q40_running_totals" ->
      """WITH t AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |  round(o_totalprice * 100)::BIGINT AS cents FROM orders),
        |w AS (SELECT o_custkey, o_orderkey,
        |  sum(cents) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS srun,
        |  sum(cents) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS s3,
        |  count(*) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS c3
        |  FROM t)
        |SELECT o_custkey, o_orderkey,
        |  srun / 100.0 AS running_total,
        |  ((2 * s3 + c3) // (2 * c3)) / 100.0 AS avg3
        |FROM w
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q41_date_parts" ->
      """SELECT o_orderkey,
        |  extract(year FROM o_orderdate)::BIGINT AS yr,
        |  extract(month FROM o_orderdate)::BIGINT AS mo,
        |  extract(day FROM o_orderdate)::BIGINT AS dom,
        |  extract(quarter FROM o_orderdate)::BIGINT AS qtr,
        |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
        |  datediff('day', o_orderdate, DATE '1999-01-01')::BIGINT AS days_to_1999
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "q43_event_exact_stats" ->
      """SELECT event_type, count(*) AS n,
        |  count(DISTINCT user_id) AS n_users,
        |  round(quantile_cont(value, 0.5), 6) AS median_value
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // gaps-and-islands twin of the native session_window operator: new
    // session at gap >= 30 min (interval-overlap semantics), session
    // end = last event + gap
    "q69_session_windows" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) tus FROM events),
        |s AS (SELECT user_id, tus,
        |      lag(tus) OVER (PARTITION BY user_id ORDER BY tus) prev_us FROM t),
        |f AS (SELECT user_id, tus,
        |      CASE WHEN prev_us IS NULL OR tus - prev_us >= 1800000000
        |           THEN 1 ELSE 0 END new_sess FROM s),
        |g AS (SELECT user_id, tus,
        |      sum(new_sess) OVER (PARTITION BY user_id ORDER BY tus
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) sess_id FROM f)
        |SELECT user_id, min(tus) AS session_start_us,
        |  max(tus) + 1800000000 AS session_end_us,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id, sess_id
        |ORDER BY user_id, session_start_us""".stripMargin,
    "q70_grouping_sets" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderstatus,
        |  grouping_id(strftime(o_orderdate, '%Y-%m'), o_orderstatus)::BIGINT AS gid,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((strftime(o_orderdate, '%Y-%m')), (o_orderstatus), ())
        |ORDER BY gid, month NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    "q71_above_cust_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, n_cust_orders,
        |  (sum_cents // n_cust_orders)::BIGINT AS avg_cents
        |FROM (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    (SELECT count(*) FROM orders i
        |     WHERE i.o_custkey = o.o_custkey) AS n_cust_orders,
        |    (SELECT sum(CAST(round(i.o_totalprice * 100) AS BIGINT))
        |     FROM orders i
        |     WHERE i.o_custkey = o.o_custkey) AS sum_cents
        |  FROM orders o) t
        |WHERE 2 * cents * n_cust_orders > 3 * sum_cents
        |ORDER BY o_orderkey""".stripMargin,
    "q73_customer_deciles" ->
      """WITH s AS (SELECT o_custkey,
        |           sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS cents,
        |           count(*) AS n_orders FROM orders GROUP BY o_custkey),
        |w AS (SELECT o_custkey, cents, n_orders,
        |      ntile(10) OVER (ORDER BY cents DESC, o_custkey) AS decile,
        |      round(percent_rank() OVER (ORDER BY cents DESC, o_custkey), 6) AS pct_rank,
        |      lead(cents) OVER (ORDER BY cents DESC, o_custkey) AS next_cents,
        |      lag(cents) OVER (ORDER BY cents DESC, o_custkey) AS prev_cents
        |      FROM s)
        |SELECT o_custkey, cents / 100.0 AS total_spent, n_orders,
        |  decile::BIGINT AS decile, pct_rank,
        |  next_cents / 100.0 AS next_spent, prev_cents / 100.0 AS prev_spent
        |FROM w ORDER BY o_custkey""".stripMargin,
    "q75_scd2_customers" ->
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER w::BIGINT AS version,
        |  strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
        |  strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS valid_to,
        |  o_orderstatus, o_totalprice
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, version""".stripMargin,
    "q76_important_parts" ->
      """SELECT l_partkey, n_items,
        |  CAST(part_cents AS DOUBLE) / 100.0 AS value
        |FROM (
        |  SELECT l_partkey,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS part_cents,
        |    count(*) AS n_items
        |  FROM lineitem GROUP BY l_partkey) p
        |WHERE part_cents * 2000 >
        |  (SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |   FROM lineitem)
        |ORDER BY l_partkey""".stripMargin,
    // identity oracle: the JSON round trip must hand back exactly the
    // source columns (see Queries.jsonRoundTrip)
    "q77_json_roundtrip" ->
      """SELECT doc_id, lang AS j_lang, n_chars AS j_chars, source AS j_source
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q78_token_positions" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk
        |           FROM documents WHERE doc_id < 50)
        |SELECT doc_id, (i - 1)::BIGINT AS pos, tk[i] AS token
        |FROM t, unnest(generate_series(1, len(tk))) g(i)
        |ORDER BY doc_id, pos""".stripMargin,
    "q84_set_ops" ->
      """WITH ho AS (SELECT o_custkey AS custkey FROM orders
        |            WHERE o_totalprice > 300000.0),
        |bb AS (SELECT c_custkey AS custkey FROM customer
        |       WHERE c_acctbal > 5000.0)
        |SELECT custkey, 'both' AS side FROM (SELECT custkey FROM ho
        |  INTERSECT SELECT custkey FROM bb)
        |UNION ALL
        |SELECT custkey, 'balance_only' AS side FROM (SELECT custkey FROM bb
        |  EXCEPT SELECT custkey FROM ho)
        |ORDER BY side, custkey""".stripMargin,
    "q85_string_transforms" ->
      """SELECT doc_id,
        |  substring(regexp_replace(text, '[0-9]+', '#', 'g'), 1, 40) AS masked40,
        |  reverse(substring(text, 1, 10)) AS rev10,
        |  lpad(n_chars::VARCHAR, 8, '0') AS padded,
        |  split_part(text, ' ', 1) AS first_word,
        |  md5(text) AS content_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q86_window_values" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_totalprice) OVER wf AS first_price,
        |  last_value(o_totalprice) OVER wf AS last_price,
        |  nth_value(o_orderkey, 2) OVER wf AS second_key,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    // identity oracle like q77: variant extraction must hand back the
    // source columns; absent path → null
    "q87_variant_extract" ->
      """SELECT doc_id, lang AS v_lang, n_chars::BIGINT AS v_chars,
        |  source AS v_source, NULL::VARCHAR AS v_missing
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q91_exact_moments" ->
      """WITH t AS (SELECT event_type, floor(value * 1000)::BIGINT AS x,
        |           user_id AS y FROM events),
        |a AS (SELECT event_type, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
        |      sum(y)::BIGINT AS sy,
        |      sum(x::HUGEINT * x::HUGEINT) AS sxx,
        |      sum(y::HUGEINT * y::HUGEINT) AS syy,
        |      sum(x::HUGEINT * y::HUGEINT) AS sxy
        |      FROM t GROUP BY event_type)
        |SELECT event_type, n, sx,
        |  round(((n * sxx - sx::HUGEINT * sx::HUGEINT)::DOUBLE)
        |        / (n::DOUBLE * n::DOUBLE) / 1000000.0, 6) AS var_pop,
        |  round(((n * sxy - sx::HUGEINT * sy::HUGEINT)::DOUBLE)
        |        / sqrt((n * sxx - sx::HUGEINT * sx::HUGEINT)::DOUBLE
        |             * (n * syy - sy::HUGEINT * sy::HUGEINT)::DOUBLE), 6) AS corr_xy
        |FROM a ORDER BY event_type""".stripMargin,
    "q92_paged_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10 OFFSET 20""".stripMargin,
    "q93_hierarchy_rollup" ->
      """WITH RECURSIVE spend AS (
        |  SELECT o_custkey,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders GROUP BY o_custkey),
        |anc AS (
        |  SELECT o_custkey AS custkey, o_custkey AS anc_key FROM spend
        |  UNION ALL
        |  SELECT custkey, anc_key // 10 AS anc_key FROM anc WHERE anc_key > 0)
        |SELECT anc_key AS group_key, count(*) AS n_desc,
        |  CAST(sum(s.cents) AS DOUBLE) / 100.0 AS total_spent
        |FROM anc a JOIN spend s ON s.o_custkey = a.custkey
        |GROUP BY anc_key
        |ORDER BY group_key""".stripMargin,
    "q94_collation_groups" ->
      """WITH t AS (SELECT doc_id, lang,
        |  CASE doc_id % 3 WHEN 0 THEN upper(lang)
        |       WHEN 1 THEN upper(substring(lang, 1, 1)) || lower(substring(lang, 2))
        |       ELSE lang END AS mixed
        |  FROM documents)
        |SELECT lower(mixed) AS lang_ci, count(*) AS n_docs,
        |  count(DISTINCT mixed) AS n_case_variants
        |FROM t GROUP BY lower(mixed) ORDER BY lang_ci""".stripMargin,
    "q95_range_frame" ->
      """WITH t AS (SELECT o_custkey, o_orderkey,
        |  datediff('day', DATE '1992-01-01', o_orderdate::DATE)::BIGINT AS day,
        |  round(o_totalprice * 100)::BIGINT AS cents FROM orders)
        |SELECT o_custkey, o_orderkey, day,
        |  sum(cents) OVER w / 100.0 AS spend_30d,
        |  count(*) OVER w AS n_30d
        |FROM t
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day
        |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q97_safe_arith" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL
        |       ELSE n_chars / (doc_id % 5) END AS div_maybe,
        |  TRY_CAST(CASE WHEN doc_id % 3 = 0 THEN n_chars::VARCHAR
        |           ELSE substring(text, 1, 3) END AS BIGINT) AS cast_maybe,
        |  regexp_split_to_array(text, ' ')[50] AS elem_maybe,
        |  TRY_CAST(lang AS BIGINT) AS lang_num
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q98_url_parts" ->
      """SELECT doc_id,
        |  source || '.example.com' AS host,
        |  '/docs/' || lang AS path,
        |  'id=' || doc_id AS query,
        |  'https' AS protocol
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q100_monthly_spine" ->
      """WITH o AS (SELECT o_custkey, date_trunc('month', o_orderdate) AS m,
        |           round(o_totalprice * 100)::BIGINT AS cents FROM orders),
        |actual AS (SELECT o_custkey, m, count(*)::BIGINT n_orders,
        |           sum(cents)::BIGINT cents FROM o GROUP BY o_custkey, m),
        |bounds AS (SELECT o_custkey, min(m) m0, max(m) m1 FROM o GROUP BY o_custkey),
        |spine AS (SELECT o_custkey,
        |          unnest(generate_series(m0, m1, INTERVAL 1 MONTH)) AS m
        |          FROM bounds)
        |SELECT s.o_custkey, strftime(s.m, '%Y-%m') AS month,
        |  coalesce(a.n_orders, 0) AS n_orders,
        |  coalesce(a.cents, 0) / 100.0 AS total
        |FROM spine s LEFT JOIN actual a ON a.o_custkey = s.o_custkey AND a.m = s.m
        |ORDER BY s.o_custkey, month""".stripMargin,
    // the bitmap pipeline is exact, so the oracle is the plain
    // distinct count it must equal
    "q101_bitmap_distinct" ->
      """SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q102_xml_roundtrip" ->
      """SELECT doc_id, doc_id AS x_id, lang AS x_lang,
        |  n_chars::BIGINT AS x_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // DuckDB has no width_bucket: the oracle replays Spark's exact
    // formula floor((v-min)*numBucket/(max-min))+1 IN THE SAME
    // OPERATION ORDER (multiply then divide — a different order can
    // floor differently half-an-ulp from a boundary), and mirrors
    // Spark's NULL-on-NaN explicitly (DuckDB sorts NaN above all
    // values, so a bare >= guard would send NaN to the top bucket)
    "q103_value_histogram" ->
      """SELECT event_type,
        |  (CASE WHEN isnan(value) THEN NULL
        |        WHEN value < 0.0 THEN 0
        |        WHEN value >= 100.0 THEN 21
        |        ELSE floor(value * 20 / 100.0) + 1 END)::BIGINT AS bucket,
        |  count(*) AS n
        |FROM events GROUP BY event_type, bucket
        |ORDER BY event_type, bucket""".stripMargin,
    "q104_unpivot_measures" ->
      """WITH u AS (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS col_name,
        |         l_quantity AS v FROM lineitem UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |  FROM lineitem UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |  FROM lineitem UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
        |SELECT col_name, count(*) AS n,
        |  sum(round(v * 100)::BIGINT)::BIGINT / 100.0 AS sum_v,
        |  round(min(v), 2) AS min_v, round(max(v), 2) AS max_v
        |FROM u GROUP BY col_name ORDER BY col_name""".stripMargin,
    "q105_lang_rollup" ->
      """SELECT source,
        |  string_agg(lang, ',' ORDER BY lang) AS langs,
        |  count(*) AS n_langs
        |FROM (SELECT DISTINCT source, lang FROM documents)
        |GROUP BY source ORDER BY source""".stripMargin,
    "q42_pivot_by_status" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_F,
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_O,
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_P,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END), 2) AS rev_F,
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0 END), 2) AS rev_O,
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0.0 END), 2) AS rev_P
        |FROM orders
        |GROUP BY strftime(o_orderdate, '%Y-%m')
        |ORDER BY month""".stripMargin,
    // q164: same integer day/age/halving arithmetic; cents via floor.
    "q164_decayed_engagement" ->
      """WITH ev AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |            floor(value * 100)::BIGINT AS cents FROM events),
        |a AS (SELECT max(day) AS mxd FROM ev),
        |w AS (SELECT user_id, day, cents,
        |      CASE WHEN (mxd - day) // 7 >= 10 THEN 0
        |           ELSE 1000 // (1 << ((mxd - day) // 7)) END AS w_pm
        |      FROM ev, a)
        |SELECT user_id, count(*)::BIGINT AS n_events,
        |  sum(cents)::BIGINT AS raw_cents,
        |  sum(cents * w_pm)::BIGINT AS score_cpm,
        |  (CASE WHEN sum(cents) != 0
        |        THEN sum(cents * w_pm) // sum(cents) END)::BIGINT AS freshness_pm,
        |  max(day)::BIGINT AS last_day
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,
    // q168: first differences of each user's sorted ts multiset, then
    // rank-picked exact order statistics (lower median, ceil-p90).
    "q168_event_gaps" ->
      """WITH ev AS (SELECT user_id, epoch_ns(ts) AS tns FROM events),
        |g AS (SELECT user_id,
        |      (tns - lag(tns) OVER (PARTITION BY user_id ORDER BY tns))
        |        // 1000000000 AS gap_s FROM ev),
        |g2 AS (SELECT user_id, gap_s FROM g WHERE gap_s IS NOT NULL),
        |r AS (SELECT user_id, gap_s,
        |      row_number() OVER (PARTITION BY user_id ORDER BY gap_s) AS rn,
        |      count(*) OVER (PARTITION BY user_id) AS n FROM g2)
        |SELECT user_id, max(n)::BIGINT AS n_gaps,
        |  min(gap_s)::BIGINT AS min_gap_s,
        |  max(CASE WHEN rn = (n + 1) // 2 THEN gap_s END)::BIGINT
        |    AS median_gap_s,
        |  max(CASE WHEN rn = (9 * n + 9) // 10 THEN gap_s END)::BIGINT
        |    AS p90_gap_s,
        |  max(gap_s)::BIGINT AS max_gap_s,
        |  (sum(gap_s) // max(n))::BIGINT AS mean_gap_s
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,
    // q175: same user-keyed band join; last touch via row_number
    // (tts DESC, tid DESC) = max(struct); floor micro-credit split.
    "q175_attribution" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, epoch_ns(ts) AS tns
        |            FROM events),
        |conv AS (SELECT event_id AS conv_id, user_id, tns AS cts FROM ev
        |         WHERE event_type = 'purchase'),
        |touch AS (SELECT user_id, event_type AS channel, tns AS tts,
        |                 event_id AS tid FROM ev
        |          WHERE event_type IN ('click', 'view')),
        |j AS (SELECT c.conv_id, t.channel, t.tts, t.tid
        |      FROM conv c LEFT JOIN touch t ON t.user_id = c.user_id
        |        AND t.tts <= c.cts AND t.tts > c.cts - 604800000000000),
        |per AS (SELECT conv_id, count(tid)::BIGINT AS n_touches FROM j GROUP BY 1),
        |lastw AS (SELECT channel, count(*)::BIGINT AS last_touch_wins FROM (
        |           SELECT conv_id, channel,
        |                  row_number() OVER (PARTITION BY conv_id
        |                                     ORDER BY tts DESC, tid DESC) rn
        |           FROM j WHERE tid IS NOT NULL) WHERE rn = 1 GROUP BY 1),
        |lin AS (SELECT j.channel,
        |        sum((1000000 * cnt) // p.n_touches)::BIGINT AS linear_credit_micro,
        |        count(DISTINCT j.conv_id)::BIGINT AS conversions_touched
        |        FROM (SELECT conv_id, channel, count(*)::BIGINT AS cnt FROM j
        |              WHERE channel IS NOT NULL GROUP BY 1, 2) j
        |        JOIN per p ON p.conv_id = j.conv_id GROUP BY 1),
        |org AS (SELECT 'organic' AS channel,
        |        count(*)::BIGINT AS conversions_touched,
        |        (count(*) * 1000000)::BIGINT AS linear_credit_micro,
        |        count(*)::BIGINT AS last_touch_wins
        |        FROM per WHERE n_touches = 0)
        |SELECT l.channel, l.conversions_touched, l.linear_credit_micro,
        |  coalesce(w.last_touch_wins, 0)::BIGINT AS last_touch_wins
        |FROM lin l LEFT JOIN lastw w ON w.channel = l.channel
        |UNION ALL SELECT * FROM org
        |ORDER BY channel""".stripMargin,
    // q179: the correlated threshold decorrelated identically —
    // per-part sums joined back, exact cents arithmetic throughout.
    "q179_small_qty_revenue" ->
      """WITH li AS (SELECT l_partkey,
        |      CAST(round(l_quantity * 100) AS BIGINT) AS qc,
        |      CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
        |      FROM lineitem),
        |p AS (SELECT l_partkey, sum(qc)::BIGINT AS sq, count(*)::BIGINT AS cnt
        |      FROM li GROUP BY 1)
        |SELECT count(*)::BIGINT AS n_items,
        |  count(DISTINCT li.l_partkey)::BIGINT AS n_parts,
        |  (sum(pc) // 7)::BIGINT AS yearly_cents
        |FROM li JOIN p ON p.l_partkey = li.l_partkey
        |WHERE 5 * qc * cnt < sq""".stripMargin,
    // q181: same session numbering as q19/q141, two leads inside the
    // (user, sid) refinement, top-20 with full tie-break.
    "q181_session_paths" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, epoch_ns(ts) AS tns
        |            FROM events),
        |s AS (SELECT user_id, event_id, event_type, tns,
        |      CASE WHEN lag(tns) OVER w IS NULL
        |             OR tns - lag(tns) OVER w > 1800000000000
        |           THEN 1 ELSE 0 END AS ns
        |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)),
        |s2 AS (SELECT user_id, event_id, event_type, tns,
        |       sum(ns) OVER (PARTITION BY user_id ORDER BY tns, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid FROM s),
        |p AS (SELECT user_id, sid, event_type AS step1,
        |      lead(event_type, 1) OVER w2 AS step2,
        |      lead(event_type, 2) OVER w2 AS step3
        |      FROM s2 WINDOW w2 AS (PARTITION BY user_id, sid
        |                            ORDER BY tns, event_id))
        |SELECT step1, step2, step3, count(*)::BIGINT AS n_occurrences,
        |  count(DISTINCT (user_id, sid))::BIGINT AS n_sessions
        |FROM p WHERE step2 IS NOT NULL AND step3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n_occurrences DESC, step1, step2, step3 LIMIT 20""".stripMargin,
    // q188: equi-depth bins over the dollar-grid histogram — DuckDB
    // can afford the plain cumulative window (the value-bounded
    // relation is small); bin assignment is the identical exact
    // integer formula (rows_before * 8) // n.
    "q188_equidepth_hist" ->
      """WITH h AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) // 100
        |             AS dollars, count(*)::BIGINT AS c
        |           FROM lineitem GROUP BY 1),
        |cum AS (SELECT dollars, c,
        |               sum(c) OVER (ORDER BY dollars)::BIGINT AS cumc,
        |               sum(c) OVER ()::BIGINT AS n
        |        FROM h)
        |SELECT ((cumc - c) * 8) // n AS bin, sum(c)::BIGINT AS n_rows,
        |       min(dollars) AS lo_dollars, max(dollars) AS hi_dollars,
        |       count(*)::BIGINT AS n_distinct_dollars
        |FROM cum GROUP BY 1 ORDER BY bin""".stripMargin,
    // q189: exact sliding 7-day distinct users — the same bounded 7×
    // fan-out rewrite (user-day × window-ends it is visible from),
    // inner join drops phantom trailing days exactly as Spark does.
    "q189_sliding_active_users" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day
        |           FROM events),
        |daily AS (SELECT day, count(*)::BIGINT AS n_events,
        |                 count(DISTINCT user_id)::BIGINT AS dau
        |          FROM e GROUP BY 1),
        |ud AS (SELECT DISTINCT user_id, day FROM e),
        |fan AS (SELECT user_id, day + i AS day
        |        FROM (SELECT user_id, day,
        |              unnest(generate_series(0, 6)) i FROM ud)),
        |wau AS (SELECT day, count(DISTINCT user_id)::BIGINT AS wau
        |        FROM fan GROUP BY 1)
        |SELECT d.day, d.n_events, d.dau, w.wau,
        |       (1000 * d.dau) // w.wau AS stickiness_pm
        |FROM daily d JOIN wau w USING (day)
        |ORDER BY day""".stripMargin,
    // q193: identical RANGE frames over the numeric day — gap-correct
    // lags with no spine in either engine.
    "q193_lag_features" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day
        |           FROM events),
        |daily AS (SELECT user_id, day, count(*)::BIGINT AS n
        |          FROM e GROUP BY 1, 2)
        |SELECT user_id, day, n,
        |  coalesce(sum(n) OVER (PARTITION BY user_id ORDER BY day
        |    RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING), 0)::BIGINT AS lag1,
        |  coalesce(sum(n) OVER (PARTITION BY user_id ORDER BY day
        |    RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING), 0)::BIGINT AS lag7,
        |  coalesce(sum(n) OVER (PARTITION BY user_id ORDER BY day
        |    RANGE BETWEEN 27 PRECEDING AND CURRENT ROW), 0)::BIGINT AS sum28,
        |  coalesce(sum(n) OVER (PARTITION BY user_id ORDER BY day
        |    RANGE BETWEEN 1 FOLLOWING AND 1 FOLLOWING), 0)::BIGINT AS next1
        |FROM daily ORDER BY user_id, day""".stripMargin,
    // q194: each check restated as its own aggregate — the oracle
    // checks the CONTRACT (violation counts), not Spark's fused
    // two-pass plan.
    "q194_dq_violations" ->
      """WITH cents AS (SELECT l_orderkey,
        |         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) c
        |       FROM lineitem GROUP BY 1),
        |li AS (SELECT count(*)::BIGINT n,
        |  sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT v_orphan,
        |  sum(CASE WHEN l.l_quantity <= 0 OR l.l_quantity > 100
        |      THEN 1 ELSE 0 END)::BIGINT v_qty,
        |  sum(CASE WHEN l.l_discount < 0 OR l.l_discount > 0.5
        |      THEN 1 ELSE 0 END)::BIGINT v_disc
        |  FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey),
        |od AS (SELECT count(*)::BIGINT n,
        |  sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT v_orphan,
        |  (count(*) - count(DISTINCT o.o_orderkey))::BIGINT v_dup,
        |  sum(CASE WHEN o.o_orderdate < TIMESTAMP '1995-01-01'
        |        OR o.o_orderdate >= TIMESTAMP '2002-01-01'
        |      THEN 1 ELSE 0 END)::BIGINT v_date,
        |  sum(CASE WHEN CAST(round(o.o_totalprice * 100) AS BIGINT)
        |        != coalesce(cents.c, 0) THEN 1 ELSE 0 END)::BIGINT v_recon,
        |  sum(CASE WHEN cents.c IS NULL THEN 1 ELSE 0 END)::BIGINT v_childless
        |  FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
        |       LEFT JOIN cents ON cents.l_orderkey = o.o_orderkey),
        |rep AS (
        |  SELECT 'li_orphan_orderkey' check_name, n n_checked, v_orphan v FROM li
        |  UNION ALL SELECT 'li_quantity_range', n, v_qty FROM li
        |  UNION ALL SELECT 'li_discount_range', n, v_disc FROM li
        |  UNION ALL SELECT 'ord_orphan_custkey', n, v_orphan FROM od
        |  UNION ALL SELECT 'ord_dup_pk', n, v_dup FROM od
        |  UNION ALL SELECT 'ord_date_range', n, v_date FROM od
        |  UNION ALL SELECT 'ord_total_recon', n, v_recon FROM od
        |  UNION ALL SELECT 'ord_childless', n, v_childless FROM od)
        |SELECT check_name, n_checked, v AS n_violations,
        |       (1000000 * v) // n_checked AS viol_ppm
        |FROM rep ORDER BY check_name""".stripMargin,
    // q198: distinct (order, part) baskets; lift vs part basket
    // frequencies, T = ordering baskets.
    "q198_copurchase_pairs" ->
      """WITH items AS (SELECT DISTINCT l_orderkey ok, l_partkey p
        |               FROM lineitem),
        |pr AS (SELECT a.p pa, b.p pb, count(*)::BIGINT c_ab
        |       FROM items a JOIN items b ON a.ok = b.ok AND a.p < b.p
        |       GROUP BY 1, 2 HAVING count(*) >= 3),
        |fr AS (SELECT p, count(*)::BIGINT c FROM items GROUP BY 1),
        |st AS (SELECT count(DISTINCT ok)::BIGINT t FROM items)
        |SELECT pr.pa, pr.pb, pr.c_ab, fa.c AS c_a, fb.c AS c_b,
        |       ((1000::HUGEINT * pr.c_ab * st.t)
        |        // (fa.c::HUGEINT * fb.c))::BIGINT AS lift_milli
        |FROM pr JOIN fr fa ON fa.p = pr.pa JOIN fr fb ON fb.p = pr.pb, st
        |ORDER BY pr.c_ab DESC, pr.pa, pr.pb LIMIT 30""".stripMargin,
    // q199: value-group empirical-CDF quintiles — before = customers
    // strictly better-ranked; DuckDB can afford the plain histogram
    // window where Spark runs the two-pass.
    "q199_rfm_scores" ->
      """WITH per AS (SELECT o_custkey,
        |         max(date_diff('day', DATE '1970-01-01', o_orderdate))::BIGINT
        |           AS last_day,
        |         count(*)::BIGINT AS f,
        |         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS m_cents
        |       FROM orders GROUP BY 1),
        |base AS (SELECT o_custkey,
        |           (SELECT max(last_day) FROM per) - last_day AS r_days,
        |           f, m_cents, m_cents // 10000 AS m_hund FROM per),
        |rs AS (SELECT r_days, ((coalesce(sum(c) OVER (ORDER BY r_days DESC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 5)
        |         // (SELECT count(*) FROM base) + 1)::BIGINT s
        |       FROM (SELECT r_days, count(*)::BIGINT c FROM base GROUP BY 1)),
        |fs AS (SELECT f, ((coalesce(sum(c) OVER (ORDER BY f
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 5)
        |         // (SELECT count(*) FROM base) + 1)::BIGINT s
        |       FROM (SELECT f, count(*)::BIGINT c FROM base GROUP BY 1)),
        |ms AS (SELECT m_hund, ((coalesce(sum(c) OVER (ORDER BY m_hund
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 5)
        |         // (SELECT count(*) FROM base) + 1)::BIGINT s
        |       FROM (SELECT m_hund, count(*)::BIGINT c FROM base GROUP BY 1))
        |SELECT b.o_custkey, b.r_days, b.f, (b.m_cents // 100)::BIGINT AS m_dollars,
        |       rs.s AS r_score, fs.s AS f_score, ms.s AS m_score,
        |       rs.s * 100 + fs.s * 10 + ms.s AS rfm_code
        |FROM base b JOIN rs ON rs.r_days = b.r_days
        |     JOIN fs ON fs.f = b.f JOIN ms ON ms.m_hund = b.m_hund
        |ORDER BY b.o_custkey""".stripMargin,
    // q200: count profile + scalar mean; 2x-mean salt target.
    "q200_salt_plan" ->
      """WITH c AS (SELECT o_custkey, count(*)::BIGINT n FROM orders GROUP BY 1),
        |st AS (SELECT sum(n)::BIGINT total, count(*)::BIGINT nkeys FROM c)
        |SELECT c.o_custkey, c.n,
        |       (1000 * c.n) // st.total AS share_pm,
        |       (1000 * c.n * st.nkeys) // st.total AS ratio_to_mean_milli,
        |       (c.n + greatest(1, (2 * st.total) // st.nkeys) - 1)
        |         // greatest(1, (2 * st.total) // st.nkeys) AS n_splits
        |FROM c, st ORDER BY c.n DESC, c.o_custkey LIMIT 10""".stripMargin,
    // q201: purchase day visible from the ≤8 trailing days; latest
    // wins (arg_max on pday — unique per (user, pday)).
    "q201_locf_features" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |                  event_type,
        |                  CAST(round(value * 100) AS BIGINT) AS cents
        |           FROM events),
        |days AS (SELECT user_id, day, count(*)::BIGINT n_events
        |         FROM e GROUP BY 1, 2),
        |pur AS (SELECT user_id, day pday, sum(cents)::BIGINT pcents
        |        FROM e WHERE event_type = 'purchase' GROUP BY 1, 2),
        |best AS (SELECT d.user_id, d.day, max(p.pday) lpd,
        |                arg_max(p.pcents, p.pday) lpc
        |         FROM days d JOIN pur p ON p.user_id = d.user_id
        |              AND p.pday BETWEEN d.day - 7 AND d.day
        |         GROUP BY 1, 2)
        |SELECT d.user_id, d.day, d.n_events,
        |       b.lpd AS last_purchase_day,
        |       coalesce(b.lpc, 0) AS carried_cents,
        |       d.day - b.lpd AS age_days
        |FROM days d LEFT JOIN best b
        |     ON b.user_id = d.user_id AND b.day = d.day
        |ORDER BY d.user_id, d.day""".stripMargin,
    // q202: same capped-statistics estimate formula, scalar math.
    "q202_join_card_est" ->
      """WITH c AS (SELECT l_partkey, count(*)::BIGINT c FROM lineitem
        |           GROUP BY 1),
        |full_ AS (SELECT sum(c)::BIGINT n_rows, count(*)::BIGINT n_keys,
        |                 sum(c * c)::BIGINT exact_rows FROM c),
        |top_ AS (SELECT sum(c * c)::BIGINT top_sq, sum(c)::BIGINT top_rows,
        |                count(*)::BIGINT top_keys
        |         FROM (SELECT c FROM c ORDER BY c DESC, l_partkey LIMIT 20)),
        |est AS (SELECT f.n_keys, f.n_rows, f.exact_rows,
        |          t.top_sq + CASE WHEN f.n_keys > t.top_keys
        |            THEN ((f.n_rows - t.top_rows) * (f.n_rows - t.top_rows))
        |                 // (f.n_keys - t.top_keys)
        |            ELSE 0 END AS est_rows
        |        FROM full_ f, top_ t)
        |SELECT n_keys, n_rows, exact_rows, est_rows,
        |       (1000 * abs(est_rows - exact_rows)) // exact_rows AS err_pm
        |FROM est""".stripMargin,
    // q203: month-files min/max stats; per predicate pruned files,
    // rows in surviving files, exact matches, amplification.
    "q203_pruning_stats" ->
      """WITH li AS (SELECT strftime(l_shipdate, '%Y-%m') AS f, l_orderkey ok,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) pc,
        |         l_quantity q
        |       FROM lineitem),
        |st AS (SELECT f, count(*)::BIGINT c,
        |         min(ok) min_ok, max(ok) max_ok, max(pc) max_pc, max(q) max_q
        |       FROM li GROUP BY 1),
        |pa AS (SELECT count(*)::BIGINT n_files,
        |  sum(CASE WHEN max_pc < 5000000 THEN 1 ELSE 0 END)::BIGINT pr1,
        |  sum(CASE WHEN max_pc < 5000000 THEN 0 ELSE c END)::BIGINT sc1,
        |  sum(CASE WHEN max_ok < 1000 OR min_ok > 2000 THEN 1 ELSE 0 END)::BIGINT pr2,
        |  sum(CASE WHEN max_ok < 1000 OR min_ok > 2000 THEN 0 ELSE c END)::BIGINT sc2,
        |  sum(CASE WHEN max_q < 45 THEN 1 ELSE 0 END)::BIGINT pr3,
        |  sum(CASE WHEN max_q < 45 THEN 0 ELSE c END)::BIGINT sc3,
        |  sum(CASE WHEN f < '1998-01' THEN 1 ELSE 0 END)::BIGINT pr4,
        |  sum(CASE WHEN f < '1998-01' THEN 0 ELSE c END)::BIGINT sc4
        |  FROM st),
        |ex AS (SELECT
        |  sum(CASE WHEN pc >= 5000000 THEN 1 ELSE 0 END)::BIGINT m1,
        |  sum(CASE WHEN ok BETWEEN 1000 AND 2000 THEN 1 ELSE 0 END)::BIGINT m2,
        |  sum(CASE WHEN q >= 45 THEN 1 ELSE 0 END)::BIGINT m3,
        |  sum(CASE WHEN f >= '1998-01' THEN 1 ELSE 0 END)::BIGINT m4
        |  FROM li),
        |rep AS (
        |  SELECT 'price_ge_50k' pred, n_files, pr1 n_pruned, sc1 rows_scanned,
        |         (SELECT m1 FROM ex) n_match FROM pa
        |  UNION ALL SELECT 'orderkey_1k_2k', n_files, pr2, sc2,
        |         (SELECT m2 FROM ex) FROM pa
        |  UNION ALL SELECT 'quantity_ge_45', n_files, pr3, sc3,
        |         (SELECT m3 FROM ex) FROM pa
        |  UNION ALL SELECT 'shipdate_ge_1998', n_files, pr4, sc4,
        |         (SELECT m4 FROM ex) FROM pa)
        |SELECT pred, n_files, n_pruned, rows_scanned, n_match,
        |       CASE WHEN n_match > 0
        |            THEN (1000 * rows_scanned) // n_match END AS amp_pm
        |FROM rep ORDER BY pred""".stripMargin,
    // q205: one conditional-agg pass; windows anchored at max day.
    "q205_churn_labels" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |                  event_type
        |           FROM events),
        |mx AS (SELECT max(day) md FROM e),
        |agg AS (SELECT user_id,
        |  sum(CASE WHEN day BETWEEN mx.md - 13 AND mx.md - 7
        |      THEN 1 ELSE 0 END)::BIGINT n_events_obs,
        |  count(DISTINCT CASE WHEN day BETWEEN mx.md - 13 AND mx.md - 7
        |      THEN day END)::BIGINT active_days_obs,
        |  sum(CASE WHEN day BETWEEN mx.md - 13 AND mx.md - 7
        |       AND event_type = 'purchase'
        |      THEN 1 ELSE 0 END)::BIGINT n_purchases_obs,
        |  max(CASE WHEN day BETWEEN mx.md - 13 AND mx.md - 7
        |      THEN day END) last_obs_day,
        |  max(mx.md) md,
        |  sum(CASE WHEN day >= mx.md - 6 AND event_type = 'purchase'
        |      THEN 1 ELSE 0 END)::BIGINT n_label
        |  FROM e, mx GROUP BY 1)
        |SELECT user_id, n_events_obs, active_days_obs, n_purchases_obs,
        |       (md - 7 - last_obs_day)::BIGINT AS gap_days,
        |       (CASE WHEN n_label = 0 THEN 1 ELSE 0 END)::BIGINT AS churned
        |FROM agg WHERE n_events_obs > 0 ORDER BY user_id""".stripMargin,
    // q206: the identical integer assignment hash; chi-square SRM via
    // (2o - n)^2 // (2n).
    "q206_ab_srm" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |a AS (SELECT exp,
        |        CASE WHEN ((user_id % 1000000007 + exp * 1000003)
        |                   * 2654435761) % 1000 < 500
        |             THEN 'a' ELSE 'b' END arm
        |      FROM u, unnest(generate_series(0, 4)) t(exp)),
        |c AS (SELECT exp::BIGINT exp, arm, count(*)::BIGINT n_users
        |      FROM a GROUP BY 1, 2),
        |t AS (SELECT exp, sum(n_users)::BIGINT n FROM c GROUP BY 1)
        |SELECT c.exp, c.arm, c.n_users,
        |       (1000 * t.n) // 2 AS expected_milli,
        |       (1000 * (2 * c.n_users - t.n) * (2 * c.n_users - t.n))
        |         // (2 * t.n) AS chi2_contrib_milli
        |FROM c JOIN t USING (exp)
        |ORDER BY c.exp, c.arm""".stripMargin,
    // q207: train-split co-occurrence, window top-3 per item, hit =
    // recommended part present elsewhere in the held-out basket.
    "q207_rec_eval" ->
      """WITH items AS (SELECT DISTINCT l_orderkey ok, l_partkey p
        |               FROM lineitem),
        |tr AS (SELECT * FROM items WHERE ok % 5 != 0),
        |te AS (SELECT * FROM items WHERE ok % 5 = 0),
        |pr AS (SELECT a.p pa, b.p pb, count(*)::BIGINT c
        |       FROM tr a JOIN tr b ON a.ok = b.ok AND a.p != b.p
        |       GROUP BY 1, 2),
        |recs AS (SELECT pa item, pb rec, rk FROM
        |    (SELECT pa, pb, row_number() OVER
        |       (PARTITION BY pa ORDER BY c DESC, pb)::BIGINT rk FROM pr)
        |    WHERE rk <= 3),
        |cand AS (SELECT te.ok, recs.rec, recs.rk
        |         FROM te JOIN recs ON recs.item = te.p)
        |SELECT cand.rk AS rank, count(*)::BIGINT n_recs,
        |       sum(CASE WHEN EXISTS (SELECT 1 FROM te
        |                WHERE te.ok = cand.ok AND te.p = cand.rec)
        |           THEN 1 ELSE 0 END)::BIGINT n_hits,
        |       ((1000 * sum(CASE WHEN EXISTS (SELECT 1 FROM te
        |                WHERE te.ok = cand.ok AND te.p = cand.rec)
        |           THEN 1 ELSE 0 END)) // count(*))::BIGINT AS hit_pm
        |FROM cand GROUP BY 1 ORDER BY rank""".stripMargin,
    // q210: epoch-day weekday ((day+3)%7, Monday=0), share and
    // uniform-week deviation.
    "q210_dow_profile" ->
      """WITH e AS (SELECT event_type,
        |           ((epoch_ns(ts) // 86400000000000) + 3) % 7 AS dow
        |           FROM events),
        |cells AS (SELECT event_type, dow, count(*)::BIGINT n
        |          FROM e GROUP BY 1, 2),
        |t AS (SELECT event_type et, sum(n)::BIGINT t FROM cells GROUP BY 1)
        |SELECT cells.event_type, cells.dow, cells.n,
        |       (1000 * cells.n) // t.t AS share_pm,
        |       (1000 * (7 * cells.n - t.t)) // t.t AS dev_milli
        |FROM cells JOIN t ON t.et = cells.event_type
        |ORDER BY cells.event_type, cells.dow""".stripMargin,
    // q211: digit off the decimal string of exact cents; expected
    // permille as the 9 hardcoded floor(1000*log10(1+1/d)) literals
    // (no cross-engine transcendental). CASE literals cast ::BIGINT —
    // DuckDB would otherwise type them int32 vs Spark's int64.
    "q211_benford_audit" ->
      """WITH c AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |             AS cents FROM lineitem),
        |cells AS (SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1)
        |                 AS BIGINT) AS digit, count(*)::BIGINT AS n
        |          FROM c WHERE cents > 0 GROUP BY 1),
        |t AS (SELECT sum(n)::BIGINT AS t FROM cells)
        |SELECT cells.digit, cells.n,
        |       ((1000 * cells.n) // t.t)::BIGINT AS share_pm,
        |       (CASE cells.digit WHEN 1 THEN 301 WHEN 2 THEN 176
        |         WHEN 3 THEN 124 WHEN 4 THEN 96 WHEN 5 THEN 79
        |         WHEN 6 THEN 66 WHEN 7 THEN 57 WHEN 8 THEN 51
        |         ELSE 45 END)::BIGINT AS expected_pm,
        |       ((1000 * cells.n) // t.t
        |        - CASE cells.digit WHEN 1 THEN 301 WHEN 2 THEN 176
        |           WHEN 3 THEN 124 WHEN 4 THEN 96 WHEN 5 THEN 79
        |           WHEN 6 THEN 66 WHEN 7 THEN 57 WHEN 8 THEN 51
        |           ELSE 45 END)::BIGINT AS dev_milli
        |FROM cells, t ORDER BY cells.digit""".stripMargin,
    // q212: subject set is pure key arithmetic (every 97th identity);
    // lineitem cascades through its order's custkey via the tombstoned
    // order subset only.
    "q212_forget_cascade" ->
      """WITH ev AS (SELECT 'events' AS tbl, count(*)::BIGINT AS n_rows,
        |         sum(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END)::BIGINT
        |           AS n_del,
        |         count(DISTINCT CASE WHEN user_id % 97 = 0 THEN user_id
        |           END)::BIGINT AS n_subjects FROM events),
        |cu AS (SELECT 'customer', count(*)::BIGINT,
        |         sum(CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END)::BIGINT,
        |         count(DISTINCT CASE WHEN c_custkey % 97 = 0 THEN c_custkey
        |           END)::BIGINT FROM customer),
        |orr AS (SELECT 'orders', count(*)::BIGINT,
        |         sum(CASE WHEN o_custkey % 97 = 0 THEN 1 ELSE 0 END)::BIGINT,
        |         count(DISTINCT CASE WHEN o_custkey % 97 = 0 THEN o_custkey
        |           END)::BIGINT FROM orders),
        |li AS (SELECT 'lineitem', count(*)::BIGINT,
        |         sum(CASE WHEN o.o_custkey IS NOT NULL THEN 1 ELSE 0
        |           END)::BIGINT,
        |         count(DISTINCT o.o_custkey)::BIGINT
        |       FROM lineitem l LEFT JOIN
        |         (SELECT o_orderkey, o_custkey FROM orders
        |          WHERE o_custkey % 97 = 0) o
        |         ON l.l_orderkey = o.o_orderkey),
        |u AS (SELECT * FROM ev UNION ALL SELECT * FROM cu
        |      UNION ALL SELECT * FROM orr UNION ALL SELECT * FROM li)
        |SELECT tbl, n_rows, n_del, (n_rows - n_del)::BIGINT AS n_kept,
        |       ((1000 * n_del) // n_rows)::BIGINT AS del_pm, n_subjects
        |FROM u ORDER BY tbl""".stripMargin,
    // q223: the sequential survival recurrence replayed via
    // list_reduce over (d,n) pairs packed into one BIGINT each
    // (d*10^10 + n; acc stays <= 10^6 * n < 2^63) — prefix i gives
    // day i's survival; O(days^2) lambda work on a calendar-bounded
    // grid.
    "q223_kaplan_meier" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day
        |           FROM events),
        |u AS (SELECT user_id, min(day) f, max(day) l FROM e GROUP BY 1),
        |mx AS (SELECT max(l) md FROM u),
        |en AS (SELECT f AS day, count(*)::BIGINT e FROM u GROUP BY 1),
        |ex AS (SELECT l AS day, count(*)::BIGINT x FROM u GROUP BY 1),
        |grid AS (SELECT f AS day FROM u UNION SELECT l FROM u),
        |g AS (SELECT grid.day, coalesce(en.e, 0)::BIGINT e,
        |        coalesce(ex.x, 0)::BIGINT x
        |      FROM grid LEFT JOIN en ON en.day = grid.day
        |           LEFT JOIN ex ON ex.day = grid.day),
        |c AS (SELECT day, e, x,
        |        sum(e) OVER (ORDER BY day)::BIGINT cumE,
        |        coalesce(sum(x) OVER (ORDER BY day ROWS BETWEEN
        |          UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT cumXb
        |      FROM g),
        |dd AS (SELECT c.day, (cumE - cumXb) n,
        |         CASE WHEN c.day < mx.md THEN x ELSE 0 END d, x
        |       FROM c, mx),
        |lst AS (SELECT list(d * 10000000000 + n ORDER BY day) l,
        |          list(day ORDER BY day) ds, list(n ORDER BY day) ns,
        |          list(d ORDER BY day) dds, list(x ORDER BY day) xs
        |        FROM dd)
        |SELECT ds[i]::BIGINT AS day, ns[i]::BIGINT AS at_risk,
        |       dds[i]::BIGINT AS n_churned, xs[i]::BIGINT AS n_ended,
        |       list_reduce(list_prepend(1000000::BIGINT, l[1:i]),
        |         (acc, v) -> (acc * ((v % 10000000000) - (v // 10000000000)))
        |                     // (v % 10000000000))::BIGINT AS survival_micro
        |FROM lst, unnest(generate_series(1, len(ds))) t(i)
        |ORDER BY day""".stripMargin,
    // q224: q124's stage CTEs, latencies floored to seconds, q151's
    // exact ceil-percentile formula.
    "q224_funnel_latency" ->
      """WITH v AS (SELECT user_id, min(epoch_us(ts))::BIGINT AS view_us
        |           FROM events WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(v.view_us) view_us,
        |        min(epoch_us(e.ts))::BIGINT AS click_us
        |      FROM events e JOIN v ON v.user_id = e.user_id
        |      WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.view_us
        |      GROUP BY 1),
        |p AS (SELECT e.user_id, min(c.click_us) click_us,
        |        min(epoch_us(e.ts))::BIGINT AS purchase_us
        |      FROM events e JOIN c ON c.user_id = e.user_id
        |      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.click_us
        |      GROUP BY 1),
        |lat AS (SELECT '1_view_to_click' stage,
        |          (click_us - view_us) // 1000000 lat_s FROM c
        |        UNION ALL
        |        SELECT '2_click_to_purchase',
        |          (purchase_us - click_us) // 1000000 FROM p),
        |h AS (SELECT stage, lat_s, count(*)::BIGINT c FROM lat GROUP BY 1, 2),
        |cum AS (SELECT stage, lat_s, c,
        |          sum(c) OVER (PARTITION BY stage ORDER BY lat_s)::BIGINT cum,
        |          sum(c) OVER (PARTITION BY stage)::BIGINT n
        |        FROM h)
        |SELECT stage, max(n) AS n_conversions,
        |       min(lat_s)::BIGINT AS min_s, max(lat_s)::BIGINT AS max_s,
        |       min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN lat_s END)::BIGINT AS p50_s,
        |       min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN lat_s END)::BIGINT AS p90_s,
        |       min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN lat_s END)::BIGINT AS p99_s
        |FROM cum GROUP BY 1 ORDER BY stage""".stripMargin,
    // q227: level-1 prefilter then the three-way basket self-join.
    "q227_copurchase_triples" ->
      // two MATERIALIZED binary joins, each anchored on the ok
      // equality: the 3-way form let DuckDB's join reorderer pick the
      // `b.p < c.p` inequality FIRST (a piecewise merge join over all
      // pairs of rows — measured 80+ GB of spill at sf0.1 before this
      // barrier; 2 s after)
      """WITH items AS (SELECT DISTINCT l_orderkey ok, l_partkey p
        |               FROM lineitem),
        |fr AS (SELECT p FROM items GROUP BY p HAVING count(*) >= 2),
        |fi AS MATERIALIZED (SELECT ok, items.p
        |      FROM items JOIN fr ON fr.p = items.p),
        |pr AS MATERIALIZED (SELECT a.ok, a.p pa, b.p pb
        |      FROM fi a JOIN fi b ON b.ok = a.ok AND a.p < b.p)
        |SELECT pa, pb, c.p AS pc, count(*)::BIGINT AS support
        |FROM pr JOIN fi c ON c.ok = pr.ok AND pr.pb < c.p
        |GROUP BY 1, 2, 3 HAVING count(*) >= 2
        |ORDER BY support DESC, pa, pb, pc""".stripMargin,
    // q228: interval -> month-boundary fan-out via generate_series,
    // then one month-keyed agg; value in exact cents.
    "q228_backlog_snapshots" ->
      """WITH cl AS (SELECT l_orderkey, max(l_shipdate) cls
        |            FROM lineitem GROUP BY 1),
        |o AS (SELECT o_orderdate,
        |        CAST(round(o_totalprice * 100) AS BIGINT) cents,
        |        (year(o_orderdate) * 12 + month(o_orderdate) - 1)::BIGINT m0,
        |        (year(cl.cls) * 12 + month(cl.cls) - 1)::BIGINT m1
        |      FROM orders JOIN cl ON cl.l_orderkey = orders.o_orderkey),
        |x AS (SELECT o_orderdate, cents,
        |        unnest(generate_series(m0 + 1, m1)) m
        |      FROM o WHERE m1 >= m0 + 1),
        |y AS (SELECT m, make_date((m // 12)::INT, (m % 12 + 1)::INT, 1) t,
        |        o_orderdate, cents FROM x)
        |SELECT m::BIGINT AS month_idx, max(t) AS snapshot_date,
        |       count(*)::BIGINT AS n_open,
        |       sum(cents)::BIGINT AS open_value_cents,
        |       max(date_diff('day', CAST(o_orderdate AS DATE), t))::BIGINT
        |         AS max_age_days
        |FROM y GROUP BY 1 ORDER BY month_idx""".stripMargin,
    // q229: custkey-keyed cohort min, (cohort, offset) agg, window
    // cumulative over the calendar-bounded triangle; exact cents.
    "q229_cohort_ltv" ->
      // (`off` is reserved in DuckDB — the offset column is `moff`)
      """WITH o AS (SELECT o_custkey ck,
        |        CAST(round(o_totalprice * 100) AS BIGINT) cents,
        |        (year(o_orderdate) * 12 + month(o_orderdate) - 1)::BIGINT m
        |      FROM orders),
        |ch AS (SELECT ck, min(m) cm FROM o GROUP BY 1),
        |sz AS (SELECT cm, count(*)::BIGINT cohort_size FROM ch GROUP BY 1),
        |cells AS (SELECT ch.cm, o.m - ch.cm moff,
        |        count(DISTINCT o.ck)::BIGINT n_active,
        |        sum(cents)::BIGINT rev_cents
        |      FROM o JOIN ch ON ch.ck = o.ck GROUP BY 1, 2)
        |SELECT cells.cm AS cohort_month, moff AS month_offset, n_active,
        |       rev_cents,
        |       (sum(rev_cents) OVER (PARTITION BY cells.cm ORDER BY moff
        |          ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_rev_cents,
        |       cohort_size,
        |       ((sum(rev_cents) OVER (PARTITION BY cells.cm ORDER BY moff
        |          ROWS UNBOUNDED PRECEDING)) // cohort_size)::BIGINT
        |         AS ltv_cents_per_user
        |FROM cells JOIN sz ON sz.cm = cells.cm
        |ORDER BY cohort_month, month_offset""".stripMargin,
    // q230: (part, month) unit prices in floored milli-cents, brand's
    // own min month as base, matched-sample inner join, HUGEINT-safe
    // numerators cast back to BIGINT.
    "q230_price_index" ->
      """WITH pm AS (SELECT l_partkey pk,
        |        (year(l_shipdate) * 12 + month(l_shipdate) - 1)::BIGINT m,
        |        ((1000 * sum(CAST(round(l_extendedprice * 100) AS BIGINT)))
        |          // sum(CAST(round(l_quantity) AS BIGINT)))::BIGINT unit_mc,
        |        sum(CAST(round(l_quantity) AS BIGINT))::BIGINT sq
        |      FROM lineitem GROUP BY 1, 2),
        |bp AS (SELECT p_brand brand, pk, m, unit_mc, sq
        |      FROM pm JOIN part ON p_partkey = pk),
        |b0 AS (SELECT brand, min(m) m0 FROM bp GROUP BY 1),
        |base AS (SELECT bp.brand, pk, sq q0, unit_mc p0
        |      FROM bp JOIN b0 ON b0.brand = bp.brand AND bp.m = b0.m0)
        |SELECT bp.brand, bp.m AS month_idx, count(*)::BIGINT AS n_parts,
        |       ((1000 * sum(CAST(q0 AS HUGEINT) * unit_mc))
        |          // sum(CAST(q0 AS HUGEINT) * p0))::BIGINT AS index_milli
        |FROM bp JOIN base ON base.brand = bp.brand AND base.pk = bp.pk
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q231: (part, supplier) agg then the two-pass arg-min the struct
    // ordering gives Spark in one agg: min unit, then min suppkey
    // among the minimum-price suppliers.
    "q231_cheapest_supplier" ->
      """WITH ps AS (SELECT l_partkey pk, l_suppkey sk,
        |        ((1000 * sum(CAST(round(l_extendedprice * 100) AS BIGINT)))
        |          // sum(CAST(round(l_quantity) AS BIGINT)))::BIGINT unit_mc,
        |        count(*)::BIGINT n_lines
        |      FROM lineitem GROUP BY 1, 2),
        |m AS (SELECT pk, min(unit_mc) u, count(*)::BIGINT n_suppliers,
        |        (max(unit_mc) - min(unit_mc))::BIGINT spread_mc
        |      FROM ps GROUP BY 1)
        |SELECT m.pk AS p_partkey, min(ps.sk)::BIGINT AS best_suppkey,
        |       m.u AS best_unit_mc, m.n_suppliers, m.spread_mc
        |FROM ps JOIN m ON ps.pk = m.pk AND ps.unit_mc = m.u
        |GROUP BY 1, 3, 4, 5 ORDER BY p_partkey""".stripMargin,
    // q233: brand-month grid first, centered-year RANGE frame, full-
    // window filter, HUGEINT-safe milli ratio.
    "q233_seasonal_index" ->
      """WITH bm AS (SELECT p_brand brand,
        |        (year(l_shipdate) * 12 + month(l_shipdate) - 1)::BIGINT m,
        |        sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
        |          rev_cents
        |      FROM lineitem JOIN part ON p_partkey = l_partkey
        |      GROUP BY 1, 2),
        |w AS (SELECT brand, m, rev_cents,
        |        count(*) OVER win cnt, sum(rev_cents) OVER win s
        |      FROM bm WINDOW win AS (PARTITION BY brand ORDER BY m
        |        RANGE BETWEEN 6 PRECEDING AND 5 FOLLOWING))
        |SELECT brand, m AS month_idx, rev_cents,
        |       (s // 12)::BIGINT AS ma_cents,
        |       ((CAST(12000 AS HUGEINT) * rev_cents) // s)::BIGINT
        |         AS seasonal_milli
        |FROM w WHERE cnt = 12 ORDER BY brand, month_idx""".stripMargin,
    // q234: supplier aggregates once, then the O(n²) NOT EXISTS
    // dominance test — deliberately a DIFFERENT formula from the
    // engine's sort-based prefix-min skyline.
    "q234_supplier_skyline" ->
      """WITH s AS (SELECT l_suppkey sk,
        |        ((1000 * sum(CAST(round(l_extendedprice * 100) AS BIGINT)))
        |          // sum(CAST(round(l_quantity) AS BIGINT)))::BIGINT unit_mc,
        |        (CASE WHEN sum(date_diff('day', CAST(o_orderdate AS DATE),
        |            CAST(l_shipdate AS DATE))) >= 0
        |          THEN (1000 * sum(date_diff('day', CAST(o_orderdate AS DATE),
        |            CAST(l_shipdate AS DATE)))) // count(*)
        |          ELSE -((1000 * -sum(date_diff('day', CAST(o_orderdate AS DATE),
        |            CAST(l_shipdate AS DATE)))) // count(*)) END)::BIGINT lag_md,
        |        count(*)::BIGINT n_lines
        |      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |      GROUP BY 1)
        |SELECT a.sk AS suppkey, a.unit_mc, a.lag_md, a.n_lines
        |FROM s a WHERE NOT EXISTS (SELECT 1 FROM s b
        |  WHERE b.unit_mc <= a.unit_mc AND b.lag_md <= a.lag_md
        |    AND (b.unit_mc < a.unit_mc OR b.lag_md < a.lag_md))
        |ORDER BY suppkey""".stripMargin,
    // q235: calendar-bounded pair slopes, sign-decomposed floors,
    // lower-median pick by deterministic rank.
    "q235_theilsen_trend" ->
      """WITH bm AS (SELECT p_brand brand,
        |        (year(l_shipdate) * 12 + month(l_shipdate) - 1)::BIGINT m,
        |        sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
        |          rev_cents
        |      FROM lineitem JOIN part ON p_partkey = l_partkey
        |      GROUP BY 1, 2),
        |p AS (SELECT a.brand, a.m m1, b.m m2,
        |        (CASE WHEN b.rev_cents >= a.rev_cents
        |          THEN (CAST(1000 AS HUGEINT) * (b.rev_cents - a.rev_cents))
        |            // (b.m - a.m)
        |          ELSE -((CAST(1000 AS HUGEINT) * (a.rev_cents - b.rev_cents))
        |            // (b.m - a.m)) END)::BIGINT slope
        |      FROM bm a JOIN bm b ON a.brand = b.brand AND b.m > a.m),
        |r AS (SELECT brand, m1, m2, slope,
        |        row_number() OVER (PARTITION BY brand
        |          ORDER BY slope, m1, m2) rk,
        |        count(*) OVER (PARTITION BY brand) np
        |      FROM p),
        |mo AS (SELECT brand, count(*)::BIGINT n_months FROM bm GROUP BY 1)
        |SELECT r.brand, n_months, np::BIGINT AS n_pairs,
        |       slope AS trend_milli_per_month
        |FROM r JOIN mo ON mo.brand = r.brand
        |WHERE rk = (np + 1) // 2
        |ORDER BY r.brand""".stripMargin,
    // q350: per-(user, epoch-week) pre-first-purchase exposure mask,
    // the 2^3 subset rate grid via a bit-test join, and the exact
    // sixth-weighted Shapley sum (no division on the signed path).
    // 7 - s == ~s on 3 bits; S + bit == S | bit because the join
    // keeps S disjoint from bit.
    "q350_shapley_attribution" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) tns,
        |      epoch_ns(ts) // 86400000000000 // 7 wk FROM events),
        |fp AS (SELECT user_id, wk, min(tns) pts FROM e
        |      WHERE event_type = 'purchase' GROUP BY 1, 2),
        |u AS (SELECT e.user_id, e.wk,
        |      max(CASE WHEN e.event_type = 'click'
        |        AND (f.pts IS NULL OR e.tns < f.pts) THEN 1 ELSE 0 END)
        |      + max(CASE WHEN e.event_type = 'view'
        |        AND (f.pts IS NULL OR e.tns < f.pts) THEN 2 ELSE 0 END)
        |      + max(CASE WHEN e.event_type = 'signup'
        |        AND (f.pts IS NULL OR e.tns < f.pts) THEN 4 ELSE 0 END)
        |        AS mask,
        |      max(CASE WHEN f.pts IS NOT NULL THEN 1 ELSE 0 END) conv
        |      FROM e LEFT JOIN fp f ON f.user_id = e.user_id AND f.wk = e.wk
        |      GROUP BY 1, 2),
        |g AS (SELECT mask, conv, count(*)::BIGINT cnt FROM u GROUP BY 1, 2),
        |sm AS (SELECT unnest(generate_series(0, 7)) s),
        |v AS (SELECT sm.s, coalesce(sum(g.cnt), 0)::BIGINT n,
        |      coalesce(sum(CASE WHEN g.conv = 1 THEN g.cnt ELSE 0 END), 0)::BIGINT c
        |      FROM sm LEFT JOIN g ON (g.mask & (7 - sm.s)) = 0 GROUP BY 1),
        |r AS (SELECT s, n, c,
        |      CASE WHEN n = 0 THEN 0 ELSE (1000000 * c) // n END rate FROM v),
        |ch(bit, channel) AS (VALUES (1, 'click'), (2, 'view'), (4, 'signup')),
        |ph AS (SELECT ch.channel, ch.bit,
        |      sum((CASE WHEN (r0.s & 1) + ((r0.s // 2) & 1) + ((r0.s // 4) & 1) = 1
        |        THEN 1 ELSE 2 END) * (r1.rate - r0.rate))::BIGINT phi6
        |      FROM ch JOIN r r0 ON (r0.s & ch.bit) = 0
        |      JOIN r r1 ON r1.s = r0.s + ch.bit
        |      GROUP BY 1, 2),
        |ex AS (SELECT ch.channel,
        |      sum(CASE WHEN (g.mask & ch.bit) != 0 THEN g.cnt ELSE 0 END)::BIGINT ne,
        |      sum(CASE WHEN (g.mask & ch.bit) != 0 AND g.conv = 1
        |        THEN g.cnt ELSE 0 END)::BIGINT nc
        |      FROM ch, g GROUP BY 1)
        |SELECT ph.channel, coalesce(ex.ne, 0) AS n_exposed,
        |  coalesce(ex.nc, 0) AS n_conv_exposed, ph.phi6 AS shapley_ppm_x6
        |FROM ph JOIN ex ON ex.channel = ph.channel
        |ORDER BY ph.channel""".stripMargin,
  )
}
