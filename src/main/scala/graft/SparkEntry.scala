package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the complete operator surface (SURVEY.md §2) expressed
  * over the driver test tables; `oracleSql` is the DuckDB-dialect
  * equivalent the driver hash-compares against. Aliases and rounding are
  * kept identical on both sides (the driver sorts columns by name before
  * hashing values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.localSupplierVolume(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Queries.pricingSummary _),
    "q02_scan_filter_project" -> (Queries.scanFilterProject _),
    "q03_join_orders_customer" -> (Queries.joinOrdersCustomer _),
    "q04_join_nation_region" -> (Queries.joinNationRegion _),
    "q05_global_max" -> (Queries.globalMax _),
    "q06_global_counts" -> (Queries.globalCounts _),
    "q07_global_means" -> (Queries.globalMeans _),
    "q08_distinct_values" -> (Queries.distinctValues _),
    "q09_normalize_by_max" -> (Queries.normalizeByMax _),
    "q10_top_orders" -> (Queries.topOrders _),
    "q11_window_top_per_customer" -> (Queries.windowTopPerCustomer _),
    "q12_semi_join_customers" -> (Queries.semiJoinCustomers _),
    "q13_anti_join_customers" -> (Queries.antiJoinCustomers _),
    "q14_union_high_value" -> (Queries.unionHighValue _),
    "q15_group_having" -> (Queries.groupHaving _),
    "q16_shipping_priority" -> (Queries.shippingPriority _),
    "q17_local_supplier_volume" -> (Queries.localSupplierVolume _),
    "q18_events_hourly" -> (Queries.eventsHourly _),
    "q19_events_sessionize" -> (Queries.eventsSessionize _),
    "q20_orders_by_month" -> (Queries.ordersByMonth _),
  )

  def oracleSql: Map[String, String] = Map(
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
  )
}
