package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational query surface — every scan / projection / filter / join /
  * aggregate / sort / window / set-op semantic the reference executes
  * (SURVEY.md §2.1-2.6), re-expressed over the driver test tables.
  *
  * Reference citations (relative to /root/reference/):
  *  - left equi-joins on a single key: pb_etl/tasks.py:168-181,218-230,409-423
  *  - per-column max aggregation:      pb_etl/tasks.py:198-203
  *  - global count / mean:             pb_etl/tasks.py:438,443
  *  - per-column distinct:             pb_etl/tasks.py:281
  *  - column-subset projection:        pb_etl/tasks.py:200
  *  - scalar normalization (x/max):    pb_etl/tasks.py:235-244
  *
  * Design rules for oracle parity (the driver hash-compares against
  * DuckDB): deterministic ORDER BY on a unique key in every query,
  * explicit rounding on any float that is the result of arithmetic
  * (summation order differs between engines at the last ulp), aliases
  * identical between the DataFrame code and the oracle SQL.
  *
  * Scale rules: dimension sides of joins are broadcast; aggregations are
  * partial+final hash aggregates (Catalyst default); all filters and
  * projections sit directly on the parquet scan so pushdown applies.
  */
object Queries {
  import Tables._

  /** TPC-H Q1 shape: scan-side filter + partial/final hash aggregate.
    * Exercises A1/A2/A3-style global aggregation with grouping. */
  def pricingSummary(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Projection + predicate — both must reach the parquet scan
    * (PushedFilters / ReadSchema). Raw column values: exact match. */
  def scanFilterProject(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .filter(col("l_quantity") > 45 && col("l_discount") > 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** J1/J2 analog: left outer equi-join fact→dim on a single key.
    * customer is SF-proportional (0.15M rows per TPC-H SF — corpus
    * scale, not a fixed dimension), so the join is UNHINTED: AQE
    * broadcasts it while it fits and falls back to a shuffle join at
    * 100 TB, where a forced broadcast() would OOM the driver. */
  def joinOrdersCustomer(spark: SparkSession, d: String): DataFrame =
    orders(spark, d)
      .join(customer(spark, d),
        col("o_custkey") === col("c_custkey"), "left_outer")
      .select(col("o_orderkey"), col("o_totalprice"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("o_orderkey"))

  /** J3 analog: join of two small dimensions — pure broadcast. */
  def joinNationRegion(spark: SparkSession, d: String): DataFrame =
    nation(spark, d)
      .join(broadcast(region(spark, d)),
        col("n_regionkey") === col("r_regionkey"), "left_outer")
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
      .orderBy(col("n_nationkey"))

  /** A1 analog: per-column global max (partial+final, collects to 1 row).
    * Max of raw doubles is an exact data value — no rounding needed. */
  def globalMax(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d).agg(
      max(col("l_quantity")).as("max_qty"),
      max(col("l_extendedprice")).as("max_price"),
      max(col("l_discount")).as("max_disc"),
      max(col("l_tax")).as("max_tax"),
      max(col("l_orderkey")).as("max_orderkey"))

  /** A2 analog: global per-column non-null counts. */
  def globalCounts(spark: SparkSession, d: String): DataFrame =
    orders(spark, d).agg(
      count(lit(1)).as("n_rows"),
      count(col("o_custkey")).as("n_custkey"),
      count(col("o_totalprice")).as("n_totalprice"),
      countDistinct(col("o_custkey")).as("n_distinct_cust"))

  /** A3 analog: global means (the reference's deletion-rate report). */
  def globalMeans(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d).agg(
      round(avg(col("l_quantity")), 6).as("avg_qty"),
      round(avg(col("l_discount")), 6).as("avg_disc"),
      round(avg(col("l_extendedprice")), 4).as("avg_price"))

  /** A4 analog: distinct values of a categorical column (vocabulary). */
  def distinctValues(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** P3 analog (`the_norm`): divide columns by their global max. The
    * maxima are collected to the driver (provably 1 row) and re-enter
    * the plan as literals — the same shape as the reference's broadcast
    * of the 5-row max frame, and exactly how it scales: no second scan
    * join, just scalar arithmetic in codegen. */
  def normalizeByMax(spark: SparkSession, d: String): DataFrame = {
    val li = lineitem(spark, d)
    val r = li.agg(max(col("l_quantity")), max(col("l_extendedprice"))).head()
    val (maxQty, maxPrice) = (r.getDouble(0), r.getDouble(1))
    li.select(
      col("l_orderkey"), col("l_linenumber"),
      round(col("l_quantity") / lit(maxQty), 6).as("qty_norm"),
      round(col("l_extendedprice") / lit(maxPrice), 6).as("price_norm"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Global sort + limit (top-k). TakeOrderedAndProject at scale — no
    * full sort materialization. */
  def topOrders(spark: SparkSession, d: String): DataFrame =
    orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  /** Window function: top-2 orders per customer by price (row_number). */
  def windowTopPerCustomer(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(spark, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Left-semi join: customers having at least one large order. */
  def semiJoinCustomers(spark: SparkSession, d: String): DataFrame =
    customer(spark, d)
      .join(orders(spark, d).filter(col("o_totalprice") > 400000.0),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Left-anti join: customers with no orders at all. */
  def antiJoinCustomers(spark: SparkSession, d: String): DataFrame =
    customer(spark, d)
      .join(orders(spark, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Set op: distinct union of two key sets. */
  def unionHighValue(spark: SparkSession, d: String): DataFrame = {
    val a = orders(spark, d).filter(col("o_totalprice") > 450000.0)
      .select(col("o_custkey").as("custkey"))
    val b = customer(spark, d).filter(col("c_acctbal") > 9000.0)
      .select(col("c_custkey").as("custkey"))
    a.union(b).distinct().orderBy(col("custkey"))
  }

  /** Grouped aggregate + HAVING. */
  def groupHaving(spark: SparkSession, d: String): DataFrame =
    orders(spark, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_spent"))
      .filter(col("n_orders") >= 3)
      .orderBy(col("o_custkey"))

  /** TPC-H Q3 shape: 3-way join + grouped revenue + top-k. customer
    * joins UNHINTED (SF-proportional — AQE broadcasts the filtered
    * segment while small, shuffles at 100 TB); orders⋈lineitem is the
    * dominant shuffle either way. */
  def shippingPriority(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .join(orders(spark, d).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer(spark, d).filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)

  /** TPC-H Q5 shape: 5-way join through the dimension hierarchy.
    * nation/region (25/5 rows, fixed cardinality) keep explicit
    * broadcast hints; customer/supplier are SF-proportional and join
    * UNHINTED so AQE picks broadcast only while they genuinely fit. */
  def localSupplierVolume(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .join(orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(spark, d), col("o_custkey") === col("c_custkey"))
      .join(supplier(spark, d),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation(spark, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(spark, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))

  /** Event-time aggregation: per-type hourly counts and sums. `ts` is
    * epoch-nanos (see Tables.eventsNs); the hour bucket is computed by
    * integer division (`div`, not `/` — double division loses precision
    * above 2^53 ns) and emitted as a formatted string so both engines
    * hash identically. */
  def eventsHourly(spark: SparkSession, d: String): DataFrame =
    eventsNs(spark, d)
      .groupBy(col("event_type"),
        date_format(date_trunc("hour", timestamp_micros(expr("ts div 1000"))),
          "yyyy-MM-dd HH:mm:ss").as("hour"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("event_type"), col("hour"))

  /** Sessionization via window lag: a new session starts after a >30 min
    * gap per user. Gap arithmetic on integer epoch-nanos — exact, and
    * identical to the oracle's epoch_ns(). */
  def eventsSessionize(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    eventsNs(spark, d)
      .withColumn("prev_ns", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ns").isNull || col("ts") - col("prev_ns") > 1800000000000L, 1L)
          .otherwise(0L))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("new_sess")).as("n_sessions"))
      .orderBy(col("user_id"))
  }

  /** q141: session-level event-type ASSOCIATION RULES — the
    * market-basket statistics (support, both-direction confidence,
    * lift) over q19's sessions: which event types co-occur in the same
    * user session beyond chance. q128 asks this of token bigrams; this
    * asks it of product events — the "users who X in a session also Y"
    * report, and (on a corpus pipeline) the co-occurring quality-signal
    * audit. All exact integer permille: lift > 1000 means positive
    * association.
    *
    * Shape: ONE user-keyed sort window (lag + running sum share it)
    * numbers sessions exactly as q19; a distinct to (user, session,
    * type); the pair join is keyed on (user, session) — within-session
    * fan-out is bounded by the type alphabet, so pair mass is ≤
    * |types|²/2 per session, not events². Type totals and the session
    * count re-enter as broadcasts (|types| rows + 1 row). DECIMAL(38)
    * guards the lift product at stream scale (n_both · n_sess
    * overflows Long at ~10⁹ sessions). */
  def sessionAssociations(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sess = eventsNs(spark, d)
      .withColumn("prev_ns", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ns").isNull || col("ts") - col("prev_ns") > 1800000000000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("sid"), col("event_type")).distinct()
    val u = CacheScope.cached(sess)
    val tot = u.select(col("user_id"), col("sid")).distinct()
      .agg(count(lit(1)).as("n_sess"))
    val tc = u.groupBy(col("event_type")).agg(count(lit(1)).as("nt"))
    u.as("a")
      .join(u.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.sid") === col("b.sid") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= 5)
      .join(broadcast(tc.toDF("type_a", "na")), "type_a")
      .join(broadcast(tc.toDF("type_b", "nb")), "type_b")
      .crossJoin(broadcast(tot))
      .select(col("type_a"), col("type_b"), col("n_both"), col("na"), col("nb"),
        expr("(1000 * n_both) div na").as("conf_a_to_b_permille"),
        expr("(1000 * n_both) div nb").as("conf_b_to_a_permille"),
        expr("""(cast(1000 as decimal(38,0)) * n_both * n_sess)
                | div (cast(na as decimal(38,0)) * nb)"""
          .stripMargin.replace("\n", " ")).as("lift_permille"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Hierarchical aggregate: ROLLUP(month, status) with subtotal and
    * grand-total rows disambiguated by grouping_id — one shuffle, all
    * grouping sets computed in the same hash aggregate. */
  def ordersRollup(spark: SparkSession, d: String): DataFrame =
    orders(spark, d)
      .rollup(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_orderstatus"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("gid"), col("month"), col("o_orderstatus"))

  /** Scalar string-function suite over the documents table: substring /
    * case / trim / replace / search — all codegen built-ins, exercised
    * for oracle-exact cross-engine semantics (1-based positions). */
  def textScalars(spark: SparkSession, d: String): DataFrame =
    documents(spark, d)
      .select(col("doc_id"),
        upper(substring(col("text"), 1, 20)).as("head20"),
        length(trim(col("text"))).cast("long").as("n_trim"),
        expr("replace(lang, 'e', 'E')").as("lang_x"),
        concat(col("source"), lit(":"), col("lang")).as("src_lang"),
        instr(col("text"), "the").cast("long").as("first_the"),
        expr("right(text, 10)").as("tail10"))
      .orderBy(col("doc_id"))

  /** Full outer join + null-side accounting: every order and every
    * customer represented, unmatched sides null-counted. */
  def fullOuterAccounting(spark: SparkSession, d: String): DataFrame =
    orders(spark, d)
      .join(customer(spark, d), col("o_custkey") === col("c_custkey"), "full_outer")
      .agg(count(lit(1)).as("n_rows"),
        count(col("o_orderkey")).as("n_orders"),
        count(col("c_custkey")).as("n_cust_side"),
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("n_customers_no_orders"),
        round(sum(coalesce(col("o_totalprice"), lit(0.0))), 2).as("total"))

  /** Sketch aggregates per event type: HyperLogLog++ distinct users and
    * a t-digest-style median (percentile_approx). Both are mergeable
    * partial aggregates — constant memory per partition, one shuffle of
    * sketch bytes, the only way distinct-count scales to 100 TB.
    * Approximate values can't hash-match another engine's sketch, so
    * the driver records a rows-only check; SketchSpec bounds the error
    * against exact answers (HLL++ rsd default 5%). */
  def eventSketches(spark: SparkSession, d: String): DataFrame =
    eventsNs(spark, d)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("median_value"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** Canonical Count-Min parameters for q66 (width ⌈e/ε⌉ ≈ ε 0.27%,
    * depth 4 ⇒ δ = e⁻⁴ ≈ 1.8%) — shared with SketchSpec. */
  val CmsWidth = 1024
  val CmsDepth = 4

  /** Heavy-hitter users via a Count-Min sketch (graft_cms, q66): one
    * fixed-size counter matrix aggregated map-side and merged by
    * vector addition, then each candidate user probed against the
    * broadcast one-row sketch — the frequency analog of q37's HLL++.
    * At 100 TB the sketch build reads the stream once in constant
    * memory; candidates come from any cheap distinct pass (here the
    * same table; in production, yesterday's candidate list). Estimates
    * are one-sided (never undercount), so the threshold filter has no
    * false negatives — SketchSpec pins that plus the εN overcount
    * bound; approximate counts can't hash-match an exact oracle, so
    * the driver records a rows-only check (like q37). */
  def heavyUsers(spark: SparkSession, d: String): DataFrame = {
    import graft.functions.CountMinAgg.{cms, cmsEstimate}
    val e = eventsNs(spark, d)
    val sk = e.agg(cms(col("user_id"), CmsWidth, CmsDepth).as("sk"))
    e.select(col("user_id")).distinct()
      .crossJoin(broadcast(sk))
      .select(col("user_id"),
        cmsEstimate(col("sk"), col("user_id"), CmsWidth, CmsDepth).as("est_n"))
      .filter(col("est_n") >= 75L)
      .orderBy(col("user_id"))
  }

  /** The exact twin of `eventSketches`: same grouping, exact
    * count/distinct/median — hash-checked against the oracle (the
    * sketch columns of q37 can only be rows-only + error-bounded).
    * Exact countDistinct and percentile shuffle all values per group —
    * correct, and exactly the cost the q37 sketches exist to avoid at
    * 100 TB; keeping both documents the trade. */
  def eventExactStats(spark: SparkSession, d: String): DataFrame =
    eventsNs(spark, d)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        round(expr("percentile(value, 0.5)"), 6).as("median_value"))
      .orderBy(col("event_type"))

  /** CUBE over (status, priority): all four grouping sets in one hash
    * aggregate, grouping_id disambiguating. */
  def ordersCube(spark: SparkSession, d: String): DataFrame =
    orders(spark, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_orders"),
        round(avg(col("o_totalprice")), 2).as("avg_price"))
      .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))

  /** Window frames: per-customer running order total (rows unbounded
    * preceding → current) and a 3-order moving average.
    *
    * Sliding-window float aggregation differs across engines at the
    * last ulp (incremental vs recompute accumulation), so the money
    * column is integerized to cents first: window sums are then exact
    * integers and the single final double division is identical
    * everywhere — the same discipline a production ledger would use. */
  def runningTotals(spark: SparkSession, d: String): DataFrame = {
    val byDate = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val run = byDate.rowsBetween(Window.unboundedPreceding, 0)
    val last3 = byDate.rowsBetween(-2, 0)
    orders(spark, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .withColumn("running_total", sum(col("cents")).over(run) / 100.0)
      .withColumn("s3", sum(col("cents")).over(last3))
      .withColumn("c3", count(lit(1)).over(last3))
      // half-up average-to-cents in exact integer arithmetic — engines
      // disagree on rounding binary-representation halves like .235
      .withColumn("avg3",
        expr("CAST((2 * s3 + c3) div (2 * c3) AS DOUBLE) / CAST(100 AS DOUBLE)"))
      .select(col("o_custkey"), col("o_orderkey"), col("running_total"), col("avg3"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Date-part extraction and arithmetic over order dates. */
  def orderDateParts(spark: SparkSession, d: String): DataFrame =
    orders(spark, d)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("due_date"),
        datediff(lit("1999-01-01").cast("date"), col("o_orderdate")).cast("long").as("days_to_1999"))
      .orderBy(col("o_orderkey"))

  /** Conditional aggregation (manual pivot): one row per month, order
    * counts and revenue split by status into columns — the reshaping
    * pattern behind `DataFrame.pivot`, expressed portably. */
  def ordersPivotByStatus(spark: SparkSession, d: String): DataFrame = {
    def cnt(s: String) = count(when(col("o_orderstatus") === s, 1)).as(s"n_$s")
    def rev(s: String) =
      round(sum(when(col("o_orderstatus") === s, col("o_totalprice")).otherwise(0.0)), 2)
        .as(s"rev_$s")
    orders(spark, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(cnt("F"), cnt("O"), cnt("P"), rev("F"), rev("O"), rev("P"))
      .orderBy(col("month"))
  }

  /** Monthly order rollup — date bucketing on the fact table. */
  def ordersByMonth(spark: SparkSession, d: String): DataFrame =
    orders(spark, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("month"), col("o_orderstatus"))

  /** q69: sessionization via Spark's NATIVE session-window operator
    * (`session_window` — the one the streaming engine merges
    * incrementally), emitting per-session bounds rather than q19's
    * per-user counts. Session semantics: a new session starts when the
    * gap is >= 30 min (interval-overlap semantics: [t, t+gap) windows
    * merge only while they overlap); session end = last event + gap.
    * Bounds emitted as exact epoch-micros longs so the gaps-and-islands
    * oracle hash-matches. One shuffle on user_id; the same expression
    * runs under `writeStream` with a watermark for streaming session
    * analytics. */
  def sessionWindows(spark: SparkSession, d: String): DataFrame =
    eventsNs(spark, d)
      .select(col("user_id"), timestamp_micros(expr("ts div 1000")).as("mts"))
      .groupBy(col("user_id"), session_window(col("mts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start_us"))

  /** q70: explicit GROUPING SETS — (month), (status), and grand total,
    * a set NOT expressible as one rollup or cube (no (month, status)
    * row). All three sets compute in a single expand + hash aggregate:
    * one shuffle regardless of how many sets. */
  def ordersGroupingSets(spark: SparkSession, d: String): DataFrame = {
    val m = col("month")
    val s = col("o_orderstatus")
    orders(spark, d)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_orderstatus"), col("o_totalprice"))
      .groupingSets(Seq(Seq(m), Seq(s), Seq()), m, s)
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("gid"), col("month"), col("o_orderstatus"))
  }

  /** q71: correlated scalar subqueries — orders priced above 1.5× their
    * customer's average. Written as SQL so Catalyst's decorrelation is
    * what executes it (RewriteCorrelatedScalarSubquery turns both
    * subqueries into ONE aggregate + join — no per-row re-execution,
    * no nested loop; pinned in PlanSpec). The comparison runs in exact
    * integer cents so the boundary can't flip on last-ulp float
    * disagreement between engines. */
  def ordersAboveCustAvg(spark: SparkSession, d: String): DataFrame =
    sqlOn(orders(spark, d),
      """SELECT o_orderkey, o_custkey, o_totalprice, n_cust_orders,
        |  (sum_cents div n_cust_orders) AS avg_cents
        |FROM (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    (SELECT count(*) FROM __rel i
        |     WHERE i.o_custkey = o.o_custkey) AS n_cust_orders,
        |    (SELECT sum(CAST(round(i.o_totalprice * 100) AS BIGINT))
        |     FROM __rel i
        |     WHERE i.o_custkey = o.o_custkey) AS sum_cents
        |  FROM __rel o) t
        |WHERE 2 * cents * n_cust_orders > 3 * sum_cents
        |ORDER BY o_orderkey""".stripMargin)

  /** Run SQL over ONE input relation without leaking session state:
    * the input registers under a unique per-call temp-view name,
    * `__rel` in the text is rewritten to it, and the view is dropped
    * immediately after analysis (spark.sql analyzes eagerly, so the
    * returned DataFrame's plan no longer needs the catalog entry).
    * Keeps query functions pure from the caller's perspective —
    * concurrent invocations over different data dirs can't race on a
    * shared view name. */
  private val sqlOnSeq = new java.util.concurrent.atomic.AtomicLong()
  private def sqlOn(rel: DataFrame, sqlText: String): DataFrame = {
    val spark = rel.sparkSession
    val name = s"graft_rel_${sqlOnSeq.incrementAndGet()}"
    rel.createOrReplaceTempView(name)
    try spark.sql(sqlText.replace("__rel", name))
    finally { spark.catalog.dropTempView(name); () }
  }

  /** q73: ranking-function suite over per-customer spend — ntile
    * deciles, percent_rank, and lead/lag neighbors under ONE global
    * total order (cents desc, custkey). Spend is summed in exact cents;
    * the only float outputs are single integer→double divisions,
    * identical IEEE ops cross-engine.
    *
    * DISTRIBUTED global ranking — the naive `Window.orderBy` with no
    * partition funnels every row through one partition's sort (the
    * `WindowExec: No Partition Defined` plan); at 100× that's ~150 M
    * per-customer rows in a single task. Instead, the classic two-pass
    * ranking: range-repartition on the sort key (partition-parallel
    * sort), per-partition LOCAL row_number via a pid-partitioned
    * window, then add per-partition offsets. The offset table is one
    * row per shuffle partition — bounded by cluster config, not data —
    * so the driver-side cumulative sum is a justified bounded collect
    * (same contract as IvfIndex's centroids). ntile/percent_rank are
    * then closed-form in (global rank, N), and lead/lag neighbors come
    * from a self-equi-join on rank±1 — scalable shuffles on the reduced
    * relation, no single-partition sort anywhere. Exactly the oracle's
    * ntile/percent_rank/lead/lag semantics (no ties: custkey is unique
    * in the key). */
  def customerDeciles(spark: SparkSession, d: String): DataFrame = {
    val spend = orders(spark, d)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"),
        count(lit(1)).as("n_orders"))
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // persisted across BOTH consumers (the offsets collect below and
    // the caller's terminal action): pid/lrk must be computed exactly
    // once — a recompute could re-plan the range exchange and assign
    // different partition ids, silently colliding ranks. Direct persist
    // + post-collect adopt (not cached()) so the internal collect can't
    // claim the scope release before the caller's action runs.
    val local = spend.repartitionByRange(parts, col("cents").desc, col("o_custkey"))
      .withColumn("pid", spark_partition_id())
      .withColumn("lrk", row_number().over(
        Window.partitionBy(col("pid")).orderBy(col("cents").desc, col("o_custkey"))))
    local.persist()
    // one bounded row per range partition: local counts → cumulative
    // offsets (driver-side cumsum over ≤`parts` rows, no global window)
    val counts = local.groupBy(col("pid")).agg(count(lit(1)).as("n"))
      .orderBy(col("pid")).collect().map(r => (r.getInt(0), r.getLong(1)))
    CacheScope.adopt(local)
    val n = counts.map(_._2).sum
    val offsets = {
      var acc = 0L
      counts.map { case (pid, c) => val o = acc; acc += c; (pid, o) }
    }
    val offDf = broadcast(spark.createDataFrame(offsets.toSeq).toDF("pid", "off"))
    val ranked = local.join(offDf, "pid")
      .withColumn("rk", (col("off") + col("lrk")).cast("long"))
    // ntile(10) in closed form: the first (n % 10) buckets carry
    // ceil(n/10) rows, the rest floor(n/10) — derived from rank alone
    val q = n / 10L
    val rem = n % 10L
    val cut = rem * (q + 1L)
    val decile =
      if (q == 0L) col("rk") // fewer rows than buckets: bucket = rank
      else when(col("rk") <= cut, expr(s"(rk - 1) div ${q + 1L} + 1"))
        .otherwise(expr(s"$rem + (rk - ${cut + 1L}) div $q + 1"))
    val byRank = ranked.select(col("rk"), col("cents"))
    ranked
      .withColumn("decile", decile.cast("long"))
      .withColumn("pct_rank",
        if (n > 1L) round((col("rk") - 1L).cast("double") / (n - 1L).toDouble, 6)
        else lit(0.0))
      .join(byRank.select((col("rk") - 1L).as("rk"), col("cents").as("next_cents")),
        Seq("rk"), "left")
      .join(byRank.select((col("rk") + 1L).as("rk"), col("cents").as("prev_cents")),
        Seq("rk"), "left")
      .select(col("o_custkey"), (col("cents") / 100.0).as("total_spent"),
        col("n_orders"), col("decile"), col("pct_rank"),
        (col("next_cents") / 100.0).as("next_spent"),
        (col("prev_cents") / 100.0).as("prev_spent"))
      .orderBy(col("o_custkey"))
  }

  /** q74: distinct-user reach from MERGEABLE persisted sketch partials —
    * the approximate sibling of q65's incremental view. Per (type, day)
    * HLL sketches (DataSketches `hll_sketch_agg`) are the persisted
    * partial state; refresh unions |state| sketch bytes per type
    * (`hll_union_agg`) without ever rescanning history — the only
    * distinct-count refresh that works at 100 TB (exact distinct
    * partials don't merge: distinct-of-day ≠ distinct-of-month).
    * `est_direct` recomputes the sketch in one pass; SketchSpec pins
    * merged ≡ direct exactly (register-wise max is associative) and
    * both within HLL error of exact. Approximate values can't
    * hash-match an exact oracle → rows-only, like q37/q66. */
  def userReachSketch(spark: SparkSession, d: String): DataFrame = {
    val e = eventsNs(spark, d)
      .select(col("event_type"), expr("ts div 86400000000000").as("day"),
        col("user_id"))
    val partials = e.groupBy(col("event_type"), col("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val merged = partials.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_merged"))
    val direct = e.groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est_direct"))
    merged.join(direct, Seq("event_type"))
      .select(col("event_type"), col("n_days"), col("est_merged"), col("est_direct"))
      .orderBy(col("event_type"))
  }

  /** q75: SCD2 (slowly-changing-dimension) interval build — each
    * customer's orders become consecutive versions with
    * [valid_from, valid_to) bounds; the current version's valid_to is
    * null. One window pass (row_number + lead) on the natural key, one
    * shuffle — the standard warehouse pattern whose read-side partner
    * is the as-of join (q44/q67). */
  def scd2Customers(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(spark, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_orderstatus"), col("o_totalprice"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from", date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .withColumn("valid_to",
        date_format(lead(col("o_orderdate"), 1).over(w), "yyyy-MM-dd"))
      .select(col("o_custkey"), col("o_orderkey"), col("version"),
        col("valid_from"), col("valid_to"), col("o_orderstatus"),
        col("o_totalprice"))
      .orderBy(col("o_custkey"), col("version"))
  }

  /** q76: TPC-H Q11 shape — per-part value filtered by a share-of-total
    * threshold computed in an UNCORRELATED scalar subquery (one extra
    * 1-row aggregate, broadcast into the predicate; no per-row
    * re-execution). Share boundary in exact integer cents so the
    * cut can't flip on float summation order. */
  def importantParts(spark: SparkSession, d: String): DataFrame =
    sqlOn(lineitem(spark, d),
      """SELECT l_partkey, n_items,
        |  CAST(part_cents AS DOUBLE) / 100.0 AS value
        |FROM (
        |  SELECT l_partkey,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS part_cents,
        |    count(*) AS n_items
        |  FROM __rel GROUP BY l_partkey) p
        |WHERE part_cents * 2000 >
        |  (SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |   FROM __rel)
        |ORDER BY l_partkey""".stripMargin)

  /** q77: semi-structured round trip — struct → JSON string
    * (`to_json`) → path extraction (`get_json_object`) and schema'd
    * parse (`from_json`). The oracle states the identity the round
    * trip must preserve (extracted values ≡ source columns) — the
    * cross-engine-portable way to pin JSON semantics without
    * comparing engine-specific serialization. All per-row codegen,
    * no shuffle. */
  def jsonRoundTrip(spark: SparkSession, d: String): DataFrame =
    documents(spark, d)
      .withColumn("meta",
        to_json(struct(col("doc_id"), col("lang"), col("source"), col("n_chars"))))
      .select(col("doc_id"),
        get_json_object(col("meta"), "$.lang").as("j_lang"),
        get_json_object(col("meta"), "$.n_chars").cast("long").as("j_chars"),
        from_json(col("meta"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("source",
            org.apache.spark.sql.types.StringType))))
          .getField("source").as("j_source"))
      .orderBy(col("doc_id"))

  /** q87: the VARIANT semi-structured type (Spark 4) — parse_json into
    * an open-schema variant value, then typed path extraction with
    * `variant_get` (nested paths, absent path → null). Same identity-
    * oracle discipline as q77: extracted values must hand back the
    * source columns; the variant binary itself never leaves the plan.
    * Variant decode is columnar-friendly codegen — the modern scan
    * path for schema-drifting ingest (vs. re-parsing JSON strings per
    * field access). */
  def variantExtract(spark: SparkSession, d: String): DataFrame =
    documents(spark, d)
      .withColumn("meta", to_json(struct(col("doc_id"), col("lang"),
        struct(col("source"), col("n_chars")).as("src"))))
      .withColumn("vr", parse_json(col("meta")))
      .select(col("doc_id"),
        expr("variant_get(vr, '$.lang', 'string')").as("v_lang"),
        expr("variant_get(vr, '$.src.n_chars', 'long')").as("v_chars"),
        expr("variant_get(vr, '$.src.source', 'string')").as("v_source"),
        expr("variant_get(vr, '$.missing', 'string')").as("v_missing"))
      .orderBy(col("doc_id"))

  /** q78: generator surface — posexplode (UDTF-style lateral view)
    * unnesting tokens WITH their position. Row amplification happens
    * after the filter is pushed to the scan; the generator runs inside
    * whole-stage codegen. */
  def tokenPositions(spark: SparkSession, d: String): DataFrame =
    documents(spark, d)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("token"))
      .orderBy(col("doc_id"), col("pos"))

  /** q84: explicit set operators — INTERSECT and EXCEPT (both distinct
    * semantics; compiled to semi/anti joins over distinct inputs), the
    * two §2.6 set ops q12-q14 didn't surface directly. One output
    * relation, side-tagged. */
  def setOps(spark: SparkSession, d: String): DataFrame = {
    val highOrders = orders(spark, d).filter(col("o_totalprice") > 300000.0)
      .select(col("o_custkey").as("custkey"))
    val bigBal = customer(spark, d).filter(col("c_acctbal") > 5000.0)
      .select(col("c_custkey").as("custkey"))
    highOrders.intersect(bigBal).select(col("custkey"), lit("both").as("side"))
      .union(bigBal.except(highOrders)
        .select(col("custkey"), lit("balance_only").as("side")))
      .orderBy(col("side"), col("custkey"))
  }

  /** q85: string-transform suite — global regexp_replace, reverse,
    * lpad, split_part, and md5 content hashing (the content-address
    * every dedup/caching layer leans on). All per-row codegen; md5
    * bytes are identical across engines by definition. */
  def stringTransforms(spark: SparkSession, d: String): DataFrame =
    documents(spark, d)
      .select(col("doc_id"),
        substring(regexp_replace(col("text"), "[0-9]+", "#"), 1, 40).as("masked40"),
        reverse(substring(col("text"), 1, 10)).as("rev10"),
        lpad(col("n_chars").cast("string"), 8, "0").as("padded"),
        substring_index(col("text"), " ", 1).as("first_word"),
        md5(col("text")).as("content_md5"))
      .orderBy(col("doc_id"))

  /** q86: value-window functions — first/last/nth over the full
    * partition frame plus cume_dist, per customer order history. Raw
    * data values only (no arithmetic) → exact cross-engine. */
  def windowValues(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(spark, d)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(full).as("first_price"),
        last(col("o_totalprice")).over(full).as("last_price"),
        nth_value(col("o_orderkey"), 2).over(full).as("second_key"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** q91: second-moment statistics made EXACT cross-engine. Built-in
    * stddev/corr accumulate floats in engine-specific merge orders
    * (Welford partials) — last-ulp drift that can never hash-match. The
    * portable discipline: integerize to milli-units, compute the
    * moment NUMERATORS as exact integer sums (n·Σx² − (Σx)² etc. in
    * DECIMAL(38,0) ≡ DuckDB HUGEINT), and convert to double ONCE at the
    * end — both engines round the same exact integer to the same
    * double. Population variance and Pearson correlation of event
    * value vs user id, per type. One partial+final hash-agg. */
  def exactMoments(spark: SparkSession, d: String): DataFrame =
    eventsNs(spark, d)
      .select(col("event_type"),
        expr("CAST(floor(value * 1000) AS BIGINT)").as("x"),
        col("user_id").as("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))")).as("syy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))")).as("sxy"))
      .select(col("event_type"), col("n"), col("sx"),
        round(expr("""CAST(n * sxx - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0)) AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 1000000.0"""), 6)
          .as("var_pop"),
        round(expr("""CAST(n * sxy - CAST(sx AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0)) AS DOUBLE)
                      / sqrt(CAST(n * sxx - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0)) AS DOUBLE)
                           * CAST(n * syy - CAST(sy AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0)) AS DOUBLE))"""), 6)
          .as("corr_xy"))
      .orderBy(col("event_type"))

  /** q93: RECURSIVE CTE (Spark 4) — hierarchy rollup. Customers form a
    * synthetic decimal hierarchy (parent = key div 10, root 0); the
    * recursion walks each customer's ancestor chain (strictly
    * decreasing ⇒ terminates well under the recursion limit; Spark
    * requires UNION ALL recursion, which is exactly right for an
    * acyclic walk), then per-ancestor spend aggregates over the
    * closure — the org-tree rollup every warehouse needs and plain
    * SQL cannot express without recursion. Spend is summed in exact
    * cents before the single float division. */
  def hierarchyRollup(spark: SparkSession, d: String): DataFrame =
    sqlOn(orders(spark, d),
      """WITH RECURSIVE spend AS (
        |  SELECT o_custkey,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM __rel GROUP BY o_custkey),
        |anc AS (
        |  SELECT o_custkey AS custkey, o_custkey AS anc_key FROM spend
        |  UNION ALL
        |  SELECT custkey, anc_key div 10 AS anc_key FROM anc WHERE anc_key > 0)
        |SELECT anc_key AS group_key, count(*) AS n_desc,
        |  CAST(sum(s.cents) AS DOUBLE) / 100.0 AS total_spent
        |FROM anc a JOIN spend s ON s.o_custkey = a.custkey
        |GROUP BY anc_key
        |ORDER BY group_key""".stripMargin)

  /** q94: collation-aware grouping (Spark 4 collations) — a synthetic
    * mixed-case column grouped under UTF8_LCASE collation, so 'EN',
    * 'En', 'en' land in one group while countDistinct still sees the
    * raw variants. The emitted key is normalized via lower() because
    * WHICH case variant represents a collated group is unspecified —
    * the deterministic contract is the group MEMBERSHIP, and that is
    * what the lower()-grouped oracle replays. */
  def collationGroups(spark: SparkSession, d: String): DataFrame =
    documents(spark, d)
      .withColumn("mixed",
        when(col("doc_id") % 3 === 0, upper(col("lang")))
          .when(col("doc_id") % 3 === 1, initcap(col("lang")))
          .otherwise(col("lang")))
      .groupBy(expr("collate(mixed, 'UTF8_LCASE')").as("k"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("mixed")).as("n_case_variants"))
      .select(lower(col("k")).as("lang_ci"), col("n_docs"), col("n_case_variants"))
      .orderBy(col("lang_ci"))

  /** q95: RANGE window frame — trailing-30-day spend per customer,
    * framed by VALUE distance (epoch-day ordering, RANGE 30 PRECEDING)
    * rather than row count: orders on the same day share a frame, and
    * gaps in the calendar shrink it — semantics ROWS frames (q40)
    * cannot express. Day arithmetic and cents sums are exact integers;
    * one float division at the end. */
  def rangeFrameSpend(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
      .rangeBetween(-30, Window.currentRow)
    orders(spark, d)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
          .cast("long").as("day"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .withColumn("spend_30d", sum(col("cents")).over(w))
      .withColumn("n_30d", count(lit(1)).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("day"),
        (col("spend_30d") / 100.0).as("spend_30d"), col("n_30d"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** q97: error-safe expressions under ANSI semantics — `try_divide` /
    * `try_cast` / `try_element_at` return null where strict ANSI
    * evaluation would abort the job (division by zero, bad cast,
    * out-of-bounds). The null-on-error contract is what lets a 100 TB
    * scan survive the one malformed row in shard 9,731; the oracle
    * states the same semantics with guards. */
  def safeArithmetic(spark: SparkSession, d: String): DataFrame =
    documents(spark, d)
      .select(col("doc_id"),
        expr("try_divide(n_chars, doc_id % 5)").as("div_maybe"),
        // every third row carries a parseable integer string so the
        // SUCCESS path of try_cast is exercised, not just the null
        // path (integer strings parse identically cross-engine; fixture
        // text never starts with a digit, so the other rows pin null)
        expr("""try_cast(CASE WHEN doc_id % 3 = 0 THEN CAST(n_chars AS STRING)
                ELSE substring(text, 1, 3) END AS BIGINT)""").as("cast_maybe"),
        // index 50 is in bounds for longer docs, out of bounds for
        // short ones — both halves of try_element_at pinned
        expr("try_element_at(split(text, ' '), 50)").as("elem_maybe"),
        expr("try_cast(lang AS BIGINT)").as("lang_num"))
      .orderBy(col("doc_id"))

  /** q98: URL parsing — host/path/query extraction with `parse_url`
    * over a deterministically synthesized URL column (the source-domain
    * extraction every crawl-reputation pass runs). The oracle rebuilds
    * the same parts from the construction, pinning Spark's parser to
    * the construction's semantics. */
  def urlParts(spark: SparkSession, d: String): DataFrame =
    documents(spark, d)
      .withColumn("url", concat(lit("https://"), col("source"),
        lit(".example.com/docs/"), col("lang"), lit("?id="), col("doc_id")))
      .select(col("doc_id"),
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY')").as("query"),
        expr("parse_url(url, 'PROTOCOL')").as("protocol"))
      .orderBy(col("doc_id"))

  /** q100: calendar-spine gap fill — every (customer, month) between a
    * customer's first and last order, INCLUDING zero-order months: a
    * month spine from `sequence(first, last, interval 1 month)` +
    * explode, left-joined to actual monthly totals. The dense spine is
    * what makes month-over-month windows correct (a missing month must
    * read as 0, not silently skip); spine cardinality is bounded by
    * customers × active-month span, never by the fact table. */
  def monthlySpine(spark: SparkSession, d: String): DataFrame = {
    val o = orders(spark, d)
      .select(col("o_custkey"), trunc(col("o_orderdate"), "month").as("m"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val actual = o.groupBy(col("o_custkey"), col("m"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents"))
    val spine = o.groupBy(col("o_custkey"))
      .agg(min(col("m")).as("m0"), max(col("m")).as("m1"))
      .select(col("o_custkey"),
        explode(sequence(col("m0"), col("m1"), expr("interval 1 month"))).as("m"))
    spine.join(actual, Seq("o_custkey", "m"), "left_outer")
      .select(col("o_custkey"), date_format(col("m"), "yyyy-MM").as("month"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        (coalesce(col("cents"), lit(0L)) / 100.0).as("total"))
      .orderBy(col("o_custkey"), col("month"))
  }

  /** q101: EXACT mergeable distinct-count via bitmap partials — the
    * exact sibling of q74's HLL sketches. User ids map to (bucket, bit)
    * positions; per (type, day, bucket) bitmaps OR-merge across days
    * (`bitmap_or_agg` is associative ⇒ persistable partial state, same IVM
    * shape as q65/q74), and `bitmap_count` + sum recovers the exact
    * distinct count. Unlike HLL this is error-free — the trade is
    * state size: bitmaps scale with the id UNIVERSE per bucket, the
    * reason both paths exist. The count is exact, so the oracle is a
    * plain COUNT(DISTINCT) — hash-green, unlike any sketch. */
  def bitmapDistinct(spark: SparkSession, d: String): DataFrame = {
    val e = eventsNs(spark, d)
      .select(col("event_type"), expr("ts div 86400000000000").as("day"),
        col("user_id"))
    val dayPartials = e
      .groupBy(col("event_type"), col("day"),
        expr("bitmap_bucket_number(user_id)").as("bucket"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))").as("bm"))
    dayPartials
      .groupBy(col("event_type"), col("bucket"))
      .agg(expr("bitmap_or_agg(bm)").as("bm"))
      .groupBy(col("event_type"))
      .agg(sum(expr("bitmap_count(bm)")).as("n_users"))
      .orderBy(col("event_type"))
  }

  /** q102: XML parsing (built-in since Spark 4) — completes the
    * semi-structured trio (JSON q77, VARIANT q87): a deterministic XML
    * payload parsed back through `from_xml` with a declared schema,
    * identity oracle as with its siblings. */
  def xmlRoundTrip(spark: SparkSession, d: String): DataFrame =
    documents(spark, d)
      .withColumn("x", concat(lit("<doc><id>"), col("doc_id"),
        lit("</id><lang>"), col("lang"),
        lit("</lang><chars>"), col("n_chars"), lit("</chars></doc>")))
      .selectExpr("doc_id",
        "from_xml(x, 'id BIGINT, lang STRING, chars BIGINT') AS p")
      .select(col("doc_id"), col("p.id").as("x_id"),
        col("p.lang").as("x_lang"), col("p.chars").as("x_chars"))
      .orderBy(col("doc_id"))

  /** q103: equi-width histogram via `width_bucket` — the value
    * distribution pass behind any data-profiling dashboard: one
    * bucket-assignment expression (codegen) + one hash-agg; bucket
    * boundaries are pure arithmetic, identical cross-engine. */
  def valueHistogram(spark: SparkSession, d: String): DataFrame =
    eventsNs(spark, d)
      .select(col("event_type"),
        expr("width_bucket(value, 0.0, 100.0, 20)").as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("bucket"))

  /** q104: the dedicated `Dataset.unpivot` (melt) operator — q52's
    * wide→long reshaping through the first-class API instead of a
    * `stack` expression; same one-scan row amplification, same
    * profiler aggregation on top. */
  def unpivotMeasures(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        variableColumnName = "col_name", valueColumnName = "v")
      .groupBy(col("col_name"))
      // sum in exact integer cents (all four measures carry ≤2
      // decimals): float summation is addition-order dependent and a
      // parallel partial-agg order can drift across a rounding
      // boundary at scale — the q71/q91 discipline applies here too
      .agg(count(lit(1)).as("n"),
        (sum(round(col("v") * 100).cast("long")) / 100.0).as("sum_v"),
        round(min(col("v")), 2).as("min_v"),
        round(max(col("v")), 2).as("max_v"))
      .orderBy(col("col_name"))

  /** q105: ordered string aggregation — `listagg` (Spark 4) WITHIN
    * GROUP, the reporting-layer "join the group's values into one
    * cell" op. Deterministic because the ordering is part of the
    * aggregate; DuckDB's string_agg(… ORDER BY) states the same
    * contract. */
  def langRollup(spark: SparkSession, d: String): DataFrame =
    // DISTINCT happens in a subquery: listagg(DISTINCT …) WITHIN GROUP
    // trips an analyzer cast bug in Spark 4.1, and the pre-collapse is
    // the better plan anyway (the aggregate concatenates |langs| rows,
    // not |docs|)
    sqlOn(documents(spark, d),
      """SELECT source,
        |  listagg(lang, ',') WITHIN GROUP (ORDER BY lang) AS langs,
        |  count(*) AS n_langs
        |FROM (SELECT DISTINCT source, lang FROM __rel)
        |GROUP BY source ORDER BY source""".stripMargin)

  /** q92: LIMIT/OFFSET pagination — page 3 of the spend ranking
    * (rows 21-30). Offset composes with TakeOrderedAndProject: the
    * engine keeps offset+limit rows per partition, never a full sort
    * spill. */
  def pagedOrders(spark: SparkSession, d: String): DataFrame =
    orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(20)
      .limit(10)

  /** Column profiler (ANALYZE-style data quality pass) over lineitem's
    * numeric measures: one scan, `stack` unpivot, one hash-agg shuffle.
    * Every statistic is order-independent and exact (counts, exact
    * distinct, min/max) so the profile hash-matches any engine; the
    * one-pass approximate twin for 100 TB interactive profiling is the
    * sketch family (q37: HLL++ distinct, approx percentiles). The
    * unpivot amplifies rows 4× before the partial agg — the wide
    * alternative (one row of 4×5 aggregates, no amplification) trades
    * schema-as-data for throughput; this shape keeps the output
    * relational (a column catalog) which is what a profiler feeds. */
  def profileColumns(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .selectExpr(
        """stack(4,
          |  'l_quantity', l_quantity,
          |  'l_extendedprice', l_extendedprice,
          |  'l_discount', l_discount,
          |  'l_tax', l_tax) AS (col_name, v)""".stripMargin)
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n"),
        (count(lit(1)) - count(col("v"))).as("n_null"),
        countDistinct(col("v")).as("n_distinct"),
        round(min(col("v")), 2).as("min_v"),
        round(max(col("v")), 2).as("max_v"))
      .orderBy(col("col_name"))

  /** q124: ordered funnel analysis (the MATCH_RECOGNIZE-class query a
    * product-analytics warehouse runs daily): per user, the first
    * `view`, the first `click` AT OR AFTER that view, and the first
    * `purchase` at or after that click — strictly ordered stages, so a
    * click before any view does not count. Stage = how far the user
    * got (1-3).
    *
    * Shape: three per-user hash-aggregations chained by equi-joins on
    * user_id — each stage aggregates only its own event type's rows
    * (filter pushed to the scan), and the per-user joins co-partition
    * on the same key, so AQE plans one shuffle per stage side and the
    * chain never re-scans events. Exact integer epoch-nanos throughout
    * (`min` on Long, no timestamp arithmetic). */
  def eventFunnel(spark: SparkSession, d: String): DataFrame = {
    // micros, not nanos: the portable cross-engine resolution (the
    // oracle's TIMESTAMP reads at us precision; same as the as-of
    // family) — `div` keeps the floor exact
    val ev = eventsNs(spark, d).withColumn("tus", expr("ts div 1000"))
    def stage(tpe: String) = ev.filter(col("event_type") === tpe)
    val v = stage("view").groupBy(col("user_id")).agg(min(col("tus")).as("view_us"))
    val c = stage("click").join(v, "user_id")
      .filter(col("tus") >= col("view_us"))
      .groupBy(col("user_id"), col("view_us")).agg(min(col("tus")).as("click_us"))
    val p = stage("purchase").join(c.select(col("user_id"), col("click_us")), "user_id")
      .filter(col("tus") >= col("click_us"))
      .groupBy(col("user_id")).agg(min(col("tus")).as("purchase_us"))
    v.join(c.select(col("user_id"), col("click_us")), Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("view_us"), col("click_us"), col("purchase_us"),
        (lit(1L) + when(col("click_us").isNotNull, 1L).otherwise(0L)
          + when(col("purchase_us").isNotNull, 1L).otherwise(0L)).as("stage"))
      .orderBy(col("user_id"))
  }

  /** q125: cohort retention — users grouped by first-activity day, and
    * for each (cohort day, day offset) the count of cohort members
    * active on that offset. The standard warehouse retention triangle.
    *
    * Day indexes are exact integer `div` over epoch-nanos (identical
    * floors in both engines); the per-user cohort day is one hash-agg
    * re-joined on user_id; the triangle is one distinct + hash-agg over
    * (cohort, offset) — all linear, all shuffles keyed. */
  /** q130: event-transition matrix — the first-order Markov model of
    * user behavior (the "what happens after a click" table): per-user
    * event streams ordered by (ts, event_id), consecutive event-type
    * pairs counted, and each from-state's row normalized to exact
    * integer permille. One user-keyed window (`lead` — the shuffle is
    * the same user_id partitioning every product-analytics query here
    * shares), one pair hash-agg, and a |types|²-bounded join for the
    * row totals; at 100 TB only the window's user-keyed shuffle moves
    * corpus-sized data, and it co-partitions with q124/q125. */
  def eventTransitions(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val t = eventsNs(spark, d)
      .select(col("user_id"), col("event_type").as("from_type"), col("ts"), col("event_id"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type")).agg(count(lit(1)).as("n"))
    val tot = t.groupBy(col("from_type")).agg(sum(col("n")).as("tot"))
    t.join(tot, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(1000 * n) div tot").as("permille"))
      .orderBy(col("from_type"), col("to_type"))
  }

  def cohortRetention(spark: SparkSession, d: String): DataFrame = {
    val DayNs = 86400000000000L
    val ev = eventsNs(spark, d)
      .select(col("user_id"), expr(s"ts div $DayNs").as("day"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    ev.join(cohort, "user_id")
      .select(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"),
        col("user_id"))
      .distinct()
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** q133: daily volume anomaly detection per event type — the ingest
    * monitor that pages when a day's count departs its type's history
    * by more than 3σ. The whole z-test is EXACT integer arithmetic:
    * with per-type day count D, total T and sum-of-squares S over the
    * per-(type, day) counts n, z² = (n·D − T)² / (D·S − T²) (both sides
    * scaled by D², population variance), so |z| > 3 is the integer
    * predicate (n·D − T)² > 9·(D·S − T²) — no sqrt, no division, no
    * float drift against the oracle. Emits every (type, day) with its
    * deviation, z² in milli-units (NULL when the type's variance is
    * zero), and the flag — the monitor's full dashboard, not just hits
    * (also keeps the relation non-empty on quiet corpora).
    *
    * Shape: one (type, day) hash-agg over the fact scan, a |types|-row
    * re-aggregate joined back by BROADCAST, row-local predicates. At
    * 100 TB the first agg's map-side partials collapse each (type, day)
    * before the only keyed shuffle; the products are Long-safe to
    * ~3·10⁹ events/day/type and would widen to DECIMAL(38) beyond. */
  def eventAnomalies(spark: SparkSession, d: String): DataFrame = {
    val DayNs = 86400000000000L
    // cached: both the output rows and the |types|-row stats re-aggregate
    // consume it — one fact scan, not two (scope-released after the
    // caller's terminal action)
    val cnt = CacheScope.cached(Tables.eventsNs(spark, d)
      .select(col("event_type"), expr(s"ts div $DayNs").as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n")))
    val st = cnt.groupBy(col("event_type")).agg(
      count(lit(1)).as("days"), sum(col("n")).as("total"),
      sum(col("n") * col("n")).as("sumsq"))
    cnt.join(broadcast(st), "event_type")
      .withColumn("dev_scaled", expr("n * days - total"))
      .withColumn("var_scaled", expr("days * sumsq - total * total"))
      .select(col("event_type"), col("day"), col("n"), col("dev_scaled"),
        expr("CASE WHEN var_scaled > 0 THEN " +
          "(1000 * dev_scaled * dev_scaled) div var_scaled END").as("z2_milli"),
        expr("CASE WHEN var_scaled > 0 AND " +
          "dev_scaled * dev_scaled > 9 * var_scaled THEN 1 ELSE 0 END")
          .cast("long").as("flagged"))
      .orderBy(col("event_type"), col("day"))
  }

  /** q164: time-DECAYED user engagement — each user's event value
    * mass, weighted by a halving-per-week recency decay anchored at
    * the stream's last day. The "how alive is this account" score
    * behind churn models, re-engagement targeting, and decay-weighted
    * LTV: yesterday's purchase counts full, last month's an eighth.
    *
    * Exact integer end-to-end: values enter as floor-CENTS (the q40
    * money discipline), the decay weight is 1000 div 2^age_weeks
    * permille (integer halving, 0 from week 10 — an exact exp(−λt)
    * stand-in that is engine-portable where exp/pow are not), so the
    * score is a Σ cents·permille Long. The anchor (max day) is a
    * one-row scalar broadcast (the q110 pattern).
    *
    * Shape: row-local day/age/weight arithmetic + ONE user-keyed
    * hash-agg with map-side partials — linear, no windows; the decay
    * needs no per-user sort because the weight is a function of the
    * EVENT's age alone, not of event order. */
  def decayedEngagement(spark: SparkSession, d: String): DataFrame = {
    val DayNs = 86400000000000L
    val ev = Tables.eventsNs(spark, d)
      .select(col("user_id"), expr(s"ts div $DayNs").as("day"),
        floor(col("value") * 100).cast("long").as("cents"))
    val anchor = ev.agg(max(col("day")).as("mxd"))
    ev.crossJoin(broadcast(anchor))
      .withColumn("agew", expr("(mxd - day) div 7"))
      .withColumn("w_pm", expr(
        "CASE WHEN agew >= 10 THEN 0 " +
          "ELSE 1000 div shiftleft(1, CAST(agew AS INT)) END"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents")).as("raw_cents"),
        sum(col("cents") * col("w_pm")).as("score_cpm"),
        max(col("day")).as("last_day"))
      .select(col("user_id"), col("n_events"), col("raw_cents"),
        col("score_cpm"),
        expr("CASE WHEN raw_cents != 0 THEN (score_cpm) div raw_cents END")
          .as("freshness_pm"),
        col("last_day"))
      .orderBy(col("user_id"))
  }

  /** q168: per-user INTER-EVENT GAP distribution — exact integer order
    * statistics (min / lower-median / ceil-p90 / max / floor-mean of
    * whole-second gaps) over the time between a user's consecutive
    * events. The cadence profile an engagement or anomaly pipeline
    * keys on (q133 flags bursts; this gives each user's baseline).
    *
    * Exactness: gaps are the first differences of the user's SORTED
    * timestamp multiset — well-defined even under tied timestamps
    * (ties yield zero gaps regardless of tie order), so lag over
    * (user, ts) is deterministic in value. Order statistics are picked
    * by rank over (gap asc) — equal values make the pick
    * order-independent. median rank = (n+1) div 2 (lower median),
    * p90 rank = ceil(9n/10) = (9n+9) div 10; mean is integer floor.
    *
    * Shape: two user-keyed window passes (lag over ts; rank over gap)
    * + one user-keyed hash-agg — three shuffles on the same key, and
    * AQE coalesces the exchanges; no global sort, no driver state.
    * Per-user row counts bound every partition's window buffer. */
  def eventGaps(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.eventsNs(spark, d).select(col("user_id"), col("ts"))
    val wl = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gaps = ev
      .withColumn("prev", lag(col("ts"), 1).over(wl))
      .filter(col("prev").isNotNull)
      .select(col("user_id"), expr("(ts - prev) div 1000000000").as("gap_s"))
    val wr = Window.partitionBy(col("user_id")).orderBy(col("gap_s"))
    gaps
      .withColumn("rn", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .groupBy(col("user_id"))
      .agg(max(col("n")).as("n_gaps"),
        min(col("gap_s")).as("min_gap_s"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("gap_s")))
          .as("median_gap_s"),
        max(when(col("rn") === expr("(9 * n + 9) div 10"), col("gap_s")))
          .as("p90_gap_s"),
        max(col("gap_s")).as("max_gap_s"),
        sum(col("gap_s")).as("sum_gap_s"))
      .select(col("user_id"), col("n_gaps"), col("min_gap_s"),
        col("median_gap_s"), col("p90_gap_s"), col("max_gap_s"),
        expr("sum_gap_s div n_gaps").as("mean_gap_s"))
      .orderBy(col("user_id"))
  }

  /** q181: frequent SESSION PATHS — the top 20 three-step event-type
    * sequences users actually walk inside one q19 session, with both
    * raw occurrence counts and the number of distinct sessions
    * containing the path. This is sequence mining one level up from
    * q130's Markov transitions (which see only pairwise hops and
    * would hallucinate paths a second-order pattern forbids) — the
    * report UX/funnel owners read to find real multi-step behavior.
    *
    * Shape at 100 TB: session numbering and the two lookaheads share
    * ONE user-keyed shuffle (the lead window partitions by
    * (user, sid) — a refinement of the session window's partitioning,
    * so no second exchange); path counting is one hash-agg on the
    * (|types|³-bounded) path alphabet with map-side partials, and the
    * top-20 is TakeOrderedAndProject on that alphabet-bounded
    * relation. No corpus-wide sort anywhere. */
  def sessionPaths(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val ws = Window.partitionBy(col("user_id"), col("sid"))
      .orderBy(col("ts"), col("event_id"))
    eventsNs(spark, d)
      .withColumn("prev_ns", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ns").isNull || col("ts") - col("prev_ns") > 1800000000000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("t2", lead(col("event_type"), 1).over(ws))
      .withColumn("t3", lead(col("event_type"), 2).over(ws))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("t2").as("step2"),
        col("t3").as("step3"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("user_id"), col("sid")).as("n_sessions"))
      .orderBy(col("n_occurrences").desc, col("step1"), col("step2"), col("step3"))
      .limit(20)
  }

  /** q179: TPC-H Q17 shape — revenue locked in "small quantity"
    * orders: lineitems whose quantity is below 20% of their part's
    * average order quantity, reported as exact yearly cents (the Q17
    * `/ 7.0` as integer division). This is the per-group CORRELATED
    * threshold pattern (compare q76's global scalar subquery): the
    * row predicate references an aggregate of the row's own group.
    *
    * Shape at 100 TB: decorrelated the way Catalyst would — ONE
    * partkey-keyed aggregate of the fact table, joined back to the
    * fact on the same key (co-partitioned: AQE reuses the shuffle
    * layout), threshold as exact integer cents arithmetic (5·qc·cnt <
    * sq avoids division), then a global agg to one row. No windows,
    * no second fact scan beyond the join's own. */
  def smallQuantityRevenue(spark: SparkSession, d: String): DataFrame = {
    val li = lineitem(spark, d).select(col("l_partkey"),
      expr("CAST(round(l_quantity * 100) AS BIGINT)").as("qc"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("pc"))
    val perPart = li.groupBy(col("l_partkey"))
      .agg(sum(col("qc")).as("sq"), count(lit(1)).as("cnt"))
    li.join(perPart, "l_partkey")
      .filter(expr("5 * qc * cnt < sq"))
      .agg(count(lit(1)).as("n_items"),
        countDistinct(col("l_partkey")).as("n_parts"),
        expr("sum(pc) div 7").as("yearly_cents"))
  }

  /** q175: conversion ATTRIBUTION — for every `purchase`, the
    * click/view touchpoints by the same user in the preceding 7 days
    * split the credit two ways: LAST-TOUCH (the whole conversion to
    * the most recent touchpoint's channel) and LINEAR (equal
    * micro-shares to every touchpoint, floor division). Conversions
    * with no preceding touch credit an `organic` channel. This is the
    * standard marketing/product attribution read over the same event
    * log the funnel (q124) and transition (q130) queries mine.
    *
    * Shape at 100 TB: the touch↔conversion pairing is a USER-keyed
    * equi-join with the 7-day band as a residual predicate — per-user
    * fan-out is bounded by a user's own 7-day activity (the q45
    * interval argument), never cross-user. Both credit reductions are
    * conversion-keyed hash-aggs (last-touch rides one max(struct), no
    * per-conversion sort), and the final channel rollup is
    * alphabet-bounded. */
  def attribution(spark: SparkSession, d: String): DataFrame = {
    val WeekNs = 7L * 86400000000000L
    val ev = Tables.eventsNs(spark, d)
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("conv_id"), col("user_id").as("cu"),
        col("ts").as("cts"))
    val touch = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id").as("tu"), col("event_type").as("channel"),
        col("ts").as("tts"), col("event_id").as("tid"))
    val j = CacheScope.cached(conv.join(touch,
        col("cu") === col("tu") &&
          col("tts") <= col("cts") && col("tts") > col("cts") - WeekNs,
        "left")
      .select(col("conv_id"), col("channel"), col("tts"), col("tid")))
    // per conversion: touch count and the (ts desc, id desc) last touch
    val per = j.groupBy(col("conv_id"))
      .agg(count(col("tid")).as("n_touches"),
        max(struct(col("tts"), col("tid"), col("channel"))).as("last"))
    val lastWins = per.filter(col("n_touches") > 0)
      .groupBy(col("last.channel").as("channel"))
      .agg(count(lit(1)).as("last_touch_wins"))
    // linear: each conversion splits 1e6 micro-credits evenly
    val linear = j.filter(col("channel").isNotNull)
      .groupBy(col("conv_id"), col("channel")).agg(count(lit(1)).as("c"))
      .join(per.select(col("conv_id"), col("n_touches")), "conv_id")
      .groupBy(col("channel"))
      .agg(sum(expr("(1000000 * c) div n_touches")).as("linear_credit_micro"),
        countDistinct(col("conv_id")).as("conversions_touched"))
    val organic = per.filter(col("n_touches") === 0)
      .agg(count(lit(1)).as("n"))
      .select(lit("organic").as("channel"), col("n").as("conversions_touched"),
        (col("n") * 1000000L).as("linear_credit_micro"),
        col("n").as("last_touch_wins"))
    linear.join(lastWins, Seq("channel"), "left")
      .select(col("channel"), col("conversions_touched"),
        col("linear_credit_micro"),
        coalesce(col("last_touch_wins"), lit(0L)).as("last_touch_wins"))
      .unionByName(organic)
      .orderBy(col("channel"))
  }

  /** q188: EQUI-DEPTH histogram of lineitem extended price (8 bins of
    * ~equal row count) — the statistic a cost-based optimizer and a
    * skew-aware partitioner both want, where the equi-WIDTH histogram
    * (q103) wastes resolution on empty ranges. Depth boundaries are
    * computed at whole-dollar granularity: exact bin populations, bin
    * edges quantized to the dollar grid.
    *
    * Shape at 100 TB: NOT a global sort/ntile over the fact table. The
    * fact table collapses to its (dollar → count) histogram in ONE
    * hash-agg with map-side partials — bounded by the VALUE DOMAIN
    * (~110k distinct dollar values for TPC-H prices), not the row
    * count — and the global cumulative over that bounded relation runs
    * as the q73 two-pass (range partition, pid-local running sum,
    * driver cumsum over ≤|parts| totals re-broadcast): zero
    * partitionless windows anywhere. Each dollar-group lands in the
    * bin of its first row: bin = (rows_before * B) div n —
    * deterministic, exact, and identical in both engines. */
  def equiDepthHist(spark: SparkSession, d: String): DataFrame = {
    val hist = Tables.lineitem(spark, d)
      .select(expr("cast(round(l_extendedprice * 100) as bigint) div 100")
        .as("dollars"))
      .groupBy(col("dollars")).agg(count(lit(1)).as("c"))
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // global cumulative over the value-bounded histogram WITHOUT a
    // partitionless window (the sweep-banned one-task sort): the q73
    // two-pass — range-partition by value, pid-local running sum,
    // driver cumsum over ≤`parts` per-partition totals re-enters as a
    // broadcast offset. persist + post-collect adopt per the q73 note:
    // pid must be computed exactly once.
    val local = hist.repartitionByRange(parts, col("dollars"))
      .withColumn("pid", spark_partition_id())
      .withColumn("lcum", sum(col("c")).over(
        Window.partitionBy(col("pid")).orderBy(col("dollars"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    local.persist()
    val totals = local.groupBy(col("pid")).agg(sum(col("c")).as("t"))
      .orderBy(col("pid")).collect().map(r => (r.getInt(0), r.getLong(1)))
    CacheScope.adopt(local)
    val n = totals.map(_._2).sum
    val offsets = {
      var acc = 0L
      totals.map { case (pid, t) => val o = acc; acc += t; (pid, o) }
    }
    val offDf = broadcast(spark.createDataFrame(offsets.toSeq).toDF("pid", "off"))
    local.join(offDf, "pid")
      .select(expr(s"((off + lcum - c) * 8) div $n").as("bin"),
        col("dollars"), col("c"))
      .groupBy(col("bin"))
      .agg(sum(col("c")).as("n_rows"),
        min(col("dollars")).as("lo_dollars"),
        max(col("dollars")).as("hi_dollars"),
        count(lit(1)).as("n_distinct_dollars"))
      .orderBy(col("bin"))
  }

  private val DayNs = 86400L * 1000000000L

  /** q189: SLIDING-WINDOW active users — per day, the exact count of
    * distinct users active that day (DAU) and within the trailing
    * 7-day window (WAU), plus the event count. The stickiness ratio
    * DAU/WAU is the engagement metric every events pipeline reports;
    * the hard part is that count(DISTINCT) does not compose across a
    * sliding window — yesterday's WAU can't be updated, it must be
    * re-derived.
    *
    * Shape at 100 TB: events first collapse to DISTINCT (user, day) —
    * one hash-agg, the corpus's only full-width shuffle. Each (user,
    * day) row then fans out to the ≤7 window ENDS it is visible from
    * (a bounded explode — 7×, constant), and one more distinct-agg per
    * (window_end) yields exact WAU with every shuffle keyed on
    * user/day — no range join, no re-scan per day, no window function
    * over an unbounded frame. This is the standard exact-sliding-
    * distinct rewrite; the approximate path at larger windows is q74's
    * HLL sketches. */
  def slidingActiveUsers(spark: SparkSession, d: String): DataFrame = {
    val ud = CacheScope.cached(Tables.eventsNs(spark, d)
      .select(col("user_id"), expr(s"ts div $DayNs").as("day")))
    val daily = ud.groupBy(col("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("dau"))
    val userDays = ud.select(col("user_id"), col("day")).distinct()
    val wau = userDays
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6L)).as("day"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("wau"))
    // report only observed days: phantom trailing days (visible from a
    // user-day's fan-out but holding no events) are inner-joined away
    daily.join(wau, Seq("day"))
      .select(col("day"), col("n_events"), col("dau"), col("wau"),
        expr("(1000 * dau) div wau").as("stickiness_pm"))
      .orderBy(col("day"))
  }

  /** q193: LAG/ROLLING FEATURE MATRIX — per (user, active day):
    * today's event count, the count exactly 1 and 7 days earlier
    * (0 when inactive), a 28-day rolling total, and tomorrow's count
    * as the supervised label. The feature-engineering pass that turns
    * an event stream into training rows for churn/activity models —
    * generated directly from the stream with NO calendar spine table.
    *
    * The gap-correctness trick: every lag/rolling column is a RANGE
    * frame over the numeric day (rangeBetween on day values, not row
    * offsets), so missing days contribute nothing and `lag()` row
    * semantics are never confused by gaps — `sum over range [-7,-7]`
    * IS "the count 7 calendar days ago, else 0". No users×days spine
    * is materialized (the classic OOM at 100 TB: spine rows =
    * |users|·|history|, v.s. active rows here).
    *
    * Shape at 100 TB: one (user, day) hash-agg with map-side partials,
    * then ONE user-keyed window pass computes all five frames over the
    * same sort — a single exchange+sort per user partition, each
    * partition bounded by that user's active-day count. */
  def lagFeatures(spark: SparkSession, d: String): DataFrame = {
    val DayNs = 86400000000000L
    val daily = Tables.eventsNs(spark, d)
      .select(col("user_id"), expr(s"ts div $DayNs").as("day"))
      .groupBy(col("user_id"), col("day")).agg(count(lit(1)).as("n"))
    val byDay = Window.partitionBy(col("user_id")).orderBy(col("day"))
    def frame(lo: Long, hi: Long) =
      coalesce(sum(col("n")).over(byDay.rangeBetween(lo, hi)), lit(0L))
    daily.select(col("user_id"), col("day"), col("n"),
        frame(-1, -1).as("lag1"),
        frame(-7, -7).as("lag7"),
        frame(-27, 0).as("sum28"),
        frame(1, 1).as("next1"))
      .orderBy(col("user_id"), col("day"))
  }

  /** q194: DATA-QUALITY AUDIT — the cross-table expectation suite a
    * pipeline gates ingest on, one report row per check: referential
    * integrity (orphan lineitems, orphan orders), primary-key
    * duplication, domain ranges (quantity, discount, order dates),
    * order-total reconciliation against the lineitem sum in exact
    * integer cents, and childless orders. Violations in parts-per-
    * million (exact integer floor).
    *
    * Shape at 100 TB: ONE pass per driving table — every lineitem
    * check (orphan + both ranges) rides a single lineitem scan with
    * its keys-only join to orders, and every orders check (orphan,
    * dup-PK, date range, reconciliation, childless) rides a single
    * orders scan joined to customer keys and the per-order lineitem
    * cents pre-aggregate (shuffled on the join key it is grouped by —
    * no re-exchange). The per-check rows come from `stack` over the
    * two 1-row aggregates: adding a check adds a column, never a
    * scan. */
  def dqViolations(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
    val ord = Tables.orders(spark, d)
    val liAgg = li
      .join(ord.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"), "left")
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("v_orphan"),
        sum(when(col("l_quantity") <= 0.0 || col("l_quantity") > 100.0, 1L)
          .otherwise(0L)).as("v_qty"),
        sum(when(col("l_discount") < 0.0 || col("l_discount") > 0.5, 1L)
          .otherwise(0L)).as("v_disc"))
      .selectExpr(
        """stack(3,
          |  'li_orphan_orderkey', n, v_orphan,
          |  'li_quantity_range',  n, v_qty,
          |  'li_discount_range',  n, v_disc) AS (check_name, n_checked, n_violations)"""
          .stripMargin)
    val cents = li
      .groupBy(col("l_orderkey"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("cents"))
    val ordAgg = ord
      .join(Tables.customer(spark, d).select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left")
      .join(cents, col("o_orderkey") === col("l_orderkey"), "left")
      .agg(count(lit(1)).as("n"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("v_orphan"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_dup"),
        sum(when(col("o_orderdate") < lit("1995-01-01").cast("timestamp") ||
            col("o_orderdate") >= lit("2002-01-01").cast("timestamp"), 1L)
          .otherwise(0L)).as("v_date"),
        sum(when(expr("CAST(round(o_totalprice * 100) AS BIGINT)") =!=
            coalesce(col("cents"), lit(0L)), 1L).otherwise(0L)).as("v_recon"),
        sum(when(col("cents").isNull, 1L).otherwise(0L)).as("v_childless"))
      .selectExpr(
        """stack(5,
          |  'ord_orphan_custkey', n, v_orphan,
          |  'ord_dup_pk',         n, v_dup,
          |  'ord_date_range',     n, v_date,
          |  'ord_total_recon',    n, v_recon,
          |  'ord_childless',      n, v_childless) AS (check_name, n_checked, n_violations)"""
          .stripMargin)
    liAgg.unionAll(ordAgg)
      .select(col("check_name"), col("n_checked"), col("n_violations"),
        expr("(1000000 * n_violations) div n_checked").as("viol_ppm"))
      .orderBy(col("check_name"))
  }

  /** q198: CO-PURCHASE PAIRS — market-basket part pairs: parts bought
    * together in the same order, min support 3, ranked by count with
    * exact-integer lift (c_ab·T div c_a·c_b, milli; T = ordering
    * baskets). The item-item association build behind "bought
    * together" recommenders and product-affinity blocking — the
    * BASKET analogue of q191's windowed text co-occurrence.
    *
    * Shape at 100 TB: the pair generator is an orderkey-keyed
    * self-join — co-partitioned on the key both sides are already
    * grouped by, per-basket fan-out C(k,2) with k bounded by basket
    * size (single-digit), never corpus². Pair counts agg map-side;
    * the part-frequency joins are vocabulary(part)-keyed; T is a
    * one-row scalar broadcast. */
  def copurchasePairs(spark: SparkSession, d: String): DataFrame = {
    val items = CacheScope.cached(
      Tables.lineitem(spark, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        .distinct())
    val pairs = items.toDF("ok", "pa").join(items.toDF("ok", "pb"), "ok")
      .filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 3)
    val freq = items.groupBy(col("p")).agg(count(lit(1)).as("c"))
    val baskets = items.agg(countDistinct(col("ok")).as("t"))
    pairs
      .join(freq.toDF("pa", "c_a"), "pa")
      .join(freq.toDF("pb", "c_b"), "pb")
      .crossJoin(broadcast(baskets))
      .select(col("pa"), col("pb"), col("c_ab"), col("c_a"), col("c_b"),
        // numerator in DECIMAL(38,0): at 100 TB (t ~ 1e10 baskets,
        // c_ab up to t) 1000*c_ab*t can exceed Long range — the same
        // product-shape discipline as q191/q195/q208. IntegralDivide
        // on decimals returns BIGINT, so the output type is unchanged.
        expr("(CAST(1000 AS DECIMAL(38,0)) * c_ab * t) div " +
          "(CAST(c_a AS DECIMAL(38,0)) * c_b)").as("lift_milli"))
      .orderBy(col("c_ab").desc, col("pa"), col("pb"))
      .limit(30)
  }

  /** Global cumulative-before over a value-keyed histogram WITHOUT a
    * partitionless window: the q73/q188 two-pass, bucketed by a FIXED
    * function of the VALUE — bk = (v − lo) div w over the collected
    * [lo, hi] domain — with a bk-local running sum and a driver cumsum
    * over the ≤8·|parts| bucket totals re-broadcast. Returns the
    * histogram extended with `before` (count of rows at strictly
    * smaller — or larger, when `asc` is false — values) and the grand
    * total. Shared by q199/q268's quintile assignments and the
    * q213/q218/q219 offset machinery.
    *
    * Why value-keyed buckets and not repartitionByRange +
    * spark_partition_id: the result plan is LAZY, and the driver-folded
    * offsets are baked into it as literals. Under the original
    * pid-based scheme the offsets were only valid for the one physical
    * partitioning they were collected from — if the persisted
    * intermediate was released before the caller's terminal action
    * (CacheScope claims it at the operator's next internal action; any
    * multi-histCumBefore operator does this), the recompute could
    * range-sample DIFFERENT boundaries and silently shift every
    * `before` (caught live: q268's full-Verify run disagreed with its
    * solo run on 17 cells). bk is a pure function of the value and the
    * two collected scalars, so a recompute reproduces the mapping
    * bit-for-bit no matter how the data is partitioned. The persist is
    * now a pure optimization, never a correctness dependency.
    *
    * Balance note: 8·|parts| fixed-width buckets balance dense value
    * domains (every call site today: days, counts, token counts,
    * hundred-dollar grids, doc_ids); an adversarially SPARSE domain
    * (most values piled in one bucket) degrades toward one window over
    * ≤|hist| rows — bounded by the value-domain contract every caller
    * already carries. */
  private[graft] def histCumBefore(spark: SparkSession, hist: DataFrame,
      value: String, asc: Boolean): (DataFrame, Long) = {
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val mm = hist.agg(min(col(value)).cast("long"),
      max(col(value)).cast("long"), sum(col("c")).cast("long")).head()
    if (mm.isNullAt(0)) {
      import spark.implicits._
      return (Seq.empty[(Long, Long, Long)].toDF(value, "c", "before"), 0L)
    }
    val lo = mm.getLong(0)
    val w = math.max(1L, (mm.getLong(1) - lo) / (8L * parts) + 1L)
    val n = mm.getLong(2)
    val bucketed = hist
      .withColumn("bk", expr(s"(CAST($value AS BIGINT) - $lo) div $w"))
      .persist()
    val totals = bucketed.groupBy(col("bk")).agg(sum(col("c")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(t => if (asc) t._1 else -t._1)
    CacheScope.adopt(bucketed)
    val offsets = {
      var acc = 0L
      totals.map { case (bk, t) => val o = acc; acc += t; (bk, o) }
    }
    val offDf = broadcast(spark.createDataFrame(offsets.toSeq).toDF("bk", "off"))
    val ord = if (asc) col(value).asc else col(value).desc
    (bucketed
      .withColumn("lcum", sum(col("c")).over(
        Window.partitionBy(col("bk")).orderBy(ord)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(offDf, "bk")
      .select(col(value), col("c"), (col("off") + col("lcum") - col("c")).as("before")),
      n)
  }

  /** q199: RFM SCORING — per customer: recency (days since last
    * order, against the corpus max day), frequency (orders), monetary
    * (exact cents), each assigned an exact-integer quintile score
    * 1..5 (5 best) from the VALUE-GROUP empirical CDF: score =
    * (customers strictly better-ranked · 5) div n + 1, so ties share
    * a score deterministically. The classic customer-value feature
    * triple, engineered exactly.
    *
    * Shape at 100 TB: one orders hash-agg to the per-customer triple;
    * each quintile is computed on the metric's bounded HISTOGRAM
    * (recency: day domain; frequency: small-count domain; monetary:
    * hundred-dollar grid — the q188 dollar-grid trick) run through
    * the two-pass cumulative (no partitionless window), then joined
    * back BROADCAST on the grid value. No per-row global ranking
    * anywhere. */
  def rfmScores(spark: SparkSession, d: String): DataFrame = {
    val per = CacheScope.cached(Tables.orders(spark, d)
      .groupBy(col("o_custkey"))
      // datediff is timestamp-vintage-agnostic (works on NTZ and LTZ
      // reads alike), unlike unix_micros
      .agg(max(datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
        .cast("long")).as("last_day"),
        count(lit(1)).as("f"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("m_cents")))
    // "now" is a ONE-ROW bounded collect (the q187 df-probe
    // precedent) — as a cross-joined scalar it would re-enter the plan
    // once per score branch (5 nested-loop nodes for one number)
    val now = per.agg(max(col("last_day"))).head().getLong(0)
    val base = per
      .select(col("o_custkey"), (lit(now) - col("last_day")).as("r_days"),
        col("f"), col("m_cents"),
        expr("m_cents div 10000").as("m_hund"))
    // each score table re-aliases its grid key — fresh exprIds, so the
    // joins below stay broadcast HASH joins (the q196 lesson: a
    // shared-lineage key would dedup into a trivially-true predicate)
    def scores(value: String, asc: Boolean): DataFrame = {
      val hist = base.groupBy(col(value)).agg(count(lit(1)).as("c"))
      val (cum, n) = histCumBefore(spark, hist, value, asc)
      cum.select(col(value).as(s"${value}_k"),
        expr(s"(before * 5) div $n + 1").as(s"${value}_score"))
    }
    base
      .join(broadcast(scores("r_days", asc = false)),
        col("r_days") === col("r_days_k"))
      .join(broadcast(scores("f", asc = true)), col("f") === col("f_k"))
      .join(broadcast(scores("m_hund", asc = true)),
        col("m_hund") === col("m_hund_k"))
      .select(col("o_custkey"), col("r_days"), col("f"),
        expr("m_cents div 100").as("m_dollars"),
        col("r_days_score").as("r_score"), col("f_score"),
        col("m_hund_score").as("m_score"),
        (col("r_days_score") * 100 + col("f_score") * 10 + col("m_hund_score"))
          .as("rfm_code"))
      .orderBy(col("o_custkey"))
  }

  /** q200: SKEW / SALT PLAN — the AQE-style skew diagnostic for a
    * join key, computed from the key's count profile: the 10 heaviest
    * customer keys with their row share (permille), ratio to the mean
    * key (milli), and the number of salt splits each needs against a
    * 2×-mean target partition size — the plan a salted-join rewrite
    * would execute. The profile a pipeline owner reads BEFORE a big
    * join, not after it dies.
    *
    * Shape at 100 TB: one key-bounded count agg; the mean/total enter
    * as a one-row scalar broadcast; top-10 is a bounded TakeOrdered,
    * never a global sort. */
  def saltPlan(spark: SparkSession, d: String): DataFrame = {
    val c = CacheScope.cached(Tables.orders(spark, d)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n")))
    val stats = c.agg(sum(col("n")).as("total"), count(lit(1)).as("nkeys"))
    c.crossJoin(broadcast(stats))
      .select(col("o_custkey"), col("n"),
        expr("(1000 * n) div total").as("share_pm"),
        expr("(1000 * n * nkeys) div total").as("ratio_to_mean_milli"),
        expr("(n + greatest(1, (2 * total) div nkeys) - 1)" +
          " div greatest(1, (2 * total) div nkeys)").as("n_splits"))
      .orderBy(col("n").desc, col("o_custkey"))
      .limit(10)
  }

  /** q201: LOCF FEATURE BACKFILL — per (user, active day): the event
    * count plus the most recent purchase-day total within the
    * trailing 7 days carried forward (last observation carried
    * forward), with its age. The point-in-time-correct feature a
    * feature store serves ("spend as of this activity"), built
    * WITHOUT a calendar spine and WITHOUT an inequality join: each
    * purchase day fans out to the ≤8 future days it is visible from
    * (the q189 bounded fan-out applied to as-of semantics), and the
    * winner per (user, day) is one max(struct) aggregate — latest
    * purchase day wins, its cents ride the struct.
    *
    * Shape at 100 TB: user/day-keyed hash-aggs and one (user, day)
    * equi-join; fan-out multiplier is the window constant 8, never
    * data-dependent. The event-level sibling is q44's as-of join —
    * this is the day-grain batch twin. */
  def locfFeatures(spark: SparkSession, d: String): DataFrame = {
    val DayNs = 86400000000000L
    val ev = Tables.eventsNs(spark, d)
      .select(col("user_id"), expr(s"ts div $DayNs").as("day"),
        col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val days = ev.groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"))
    // uid/vday are fresh aliases: the left join below must not share
    // attribute lineage with `days` (the q196 trivially-true lesson)
    val pur = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("uid"), col("day").as("pday"))
      .agg(sum(col("cents")).as("pcents"))
    val vis = pur.select(col("uid"), col("pday"), col("pcents"),
        explode(sequence(col("pday"), col("pday") + 7L)).as("vday"))
      .groupBy(col("uid"), col("vday"))
      .agg(max(struct(col("pday"), col("pcents"))).as("b"))
    days.join(vis,
        col("user_id") === col("uid") && col("day") === col("vday"), "left")
      .select(col("user_id"), col("day"), col("n_events"),
        col("b.pday").as("last_purchase_day"),
        coalesce(col("b.pcents"), lit(0L)).as("carried_cents"),
        (col("day") - col("b.pday")).as("age_days"))
      .orderBy(col("user_id"), col("day"))
  }

  /** q202: JOIN CARDINALITY ESTIMATOR AUDIT — the CBO statistics
    * question "how big would the partkey self-join be", answered two
    * ways from ONE count profile: exactly (Σ c² — the true output
    * size of an equi-self-join) and as an optimizer would estimate it
    * from CAPPED statistics (top-20 heavy hitters exact + uniformity
    * over the rest: est = Σ_top c² + rest²  div d_rest), with the
    * error in permille. Calibrates how much cardinality truth the
    * heavy-hitter cap buys — the evidence behind choosing statistics
    * sizes for a 100 TB catalog.
    *
    * Shape: one key-bounded count agg feeding two tiny consumers
    * (full-profile scalars and a bounded TakeOrdered top-20), then
    * pure scalar arithmetic on one-row relations. */
  def joinCardEst(spark: SparkSession, d: String): DataFrame = {
    val counts = CacheScope.cached(Tables.lineitem(spark, d)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c")))
    val full = counts.agg(sum(col("c")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      sum(expr("c * c")).as("exact_rows"))
    val top = counts.orderBy(col("c").desc, col("l_partkey")).limit(20)
      .agg(sum(expr("c * c")).as("top_sq"), sum(col("c")).as("top_rows"),
        count(lit(1)).as("top_keys"))
    full.crossJoin(broadcast(top))
      .select(col("n_keys"), col("n_rows"), col("exact_rows"),
        expr("""top_sq + CASE WHEN n_keys > top_keys
               |  THEN ((n_rows - top_rows) * (n_rows - top_rows))
               |       div (n_keys - top_keys)
               |  ELSE 0 END""".stripMargin.replace("\n", " ")).as("est_rows"))
      .select(col("n_keys"), col("n_rows"), col("exact_rows"), col("est_rows"),
        expr("(1000 * abs(est_rows - exact_rows)) div exact_rows").as("err_pm"))
  }

  /** q203: DATA-SKIPPING / PRUNING AUDIT — simulate file-level min/max
    * pruning (parquet row-group stats, Iceberg manifests) for a fixed
    * predicate set: treat each ship-month as a "file", collect its
    * min/max column stats, and report per predicate how many files the
    * stats prune, the rows inside surviving files, the exact matching
    * rows, and the scan amplification (rows scanned per 1000 matching).
    * The layout-planning evidence behind q60's Z-order: it quantifies
    * what a time-clustered layout buys each predicate shape BEFORE
    * anyone rewrites a 100 TB table.
    *
    * Shape at 100 TB: the stats relation is file-count-bounded (one
    * month-keyed hash-agg with map-side partials); exact match counts
    * ride ONE conditional-sum pass over the fact table; everything
    * downstream joins 3-row-bounded relations. */
  def pruningStats(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("file"),
        col("l_orderkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("price_c"),
        col("l_quantity"))
    val stats = li.groupBy(col("file"))
      .agg(count(lit(1)).as("c"),
        min(col("l_orderkey")).as("min_ok"), max(col("l_orderkey")).as("max_ok"),
        min(col("price_c")).as("min_pc"), max(col("price_c")).as("max_pc"),
        max(col("l_quantity")).as("max_q"))
    // yyyy-MM compares lexicographically == chronologically, so the
    // file key doubles as its own min/max shipdate stat
    val pruneAgg = stats.agg(count(lit(1)).as("n_files"),
        sum(when(col("max_pc") < 5000000L, 1L).otherwise(0L)).as("pr1"),
        sum(when(col("max_pc") < 5000000L, 0L).otherwise(col("c"))).as("sc1"),
        sum(when(col("max_ok") < 1000L || col("min_ok") > 2000L, 1L)
          .otherwise(0L)).as("pr2"),
        sum(when(col("max_ok") < 1000L || col("min_ok") > 2000L, 0L)
          .otherwise(col("c"))).as("sc2"),
        sum(when(col("max_q") < 45.0, 1L).otherwise(0L)).as("pr3"),
        sum(when(col("max_q") < 45.0, 0L).otherwise(col("c"))).as("sc3"),
        sum(when(col("file") < "1998-01", 1L).otherwise(0L)).as("pr4"),
        sum(when(col("file") < "1998-01", 0L).otherwise(col("c"))).as("sc4"))
      .selectExpr(
        """stack(4,
          |  'price_ge_50k',      n_files, pr1, sc1,
          |  'orderkey_1k_2k',    n_files, pr2, sc2,
          |  'quantity_ge_45',    n_files, pr3, sc3,
          |  'shipdate_ge_1998',  n_files, pr4, sc4)
          |AS (pred, n_files, n_pruned, rows_scanned)""".stripMargin)
    val exact = li.agg(
        sum(when(col("price_c") >= 5000000L, 1L).otherwise(0L)).as("m1"),
        sum(when(col("l_orderkey") >= 1000L && col("l_orderkey") <= 2000L, 1L)
          .otherwise(0L)).as("m2"),
        sum(when(col("l_quantity") >= 45.0, 1L).otherwise(0L)).as("m3"),
        sum(when(col("file") >= "1998-01", 1L).otherwise(0L)).as("m4"))
      .selectExpr(
        """stack(4,
          |  'price_ge_50k',   m1,
          |  'orderkey_1k_2k', m2,
          |  'quantity_ge_45', m3,
          |  'shipdate_ge_1998', m4) AS (pred2, n_match)""".stripMargin)
    pruneAgg.join(exact, col("pred") === col("pred2"))
      .select(col("pred"), col("n_files"), col("n_pruned"),
        col("rows_scanned"), col("n_match"),
        expr("""CASE WHEN n_match > 0
               |  THEN (1000 * rows_scanned) div n_match END""".stripMargin
          .replace("\n", " ")).as("amp_pm"))
      .orderBy(col("pred"))
  }

  /** q207: RECOMMENDER EVAL — precision-by-rank of "bought together"
    * recommendations against held-out baskets: train co-occurrence on
    * 80% of orders (orderkey mod split — deterministic, content-
    * stable), recommend each test item's top-3 train partners, score a
    * hit when the recommended part actually appears in the same
    * held-out basket. The offline eval loop any q198-style associator
    * ships with — per-RANK hit rates expose whether rank 1 carries
    * the signal or the list is noise all the way down.
    *
    * Shape at 100 TB: train pair counts are the q198 basket self-join
    * (orderkey-keyed, C(k,2)-bounded); top-3-per-item is a window over
    * the item-keyed pair relation (each partition = one item's
    * partners, item-degree-bounded — never a global sort); candidate
    * and hit joins are (item)- and (basket, part)-keyed equi-joins.
    * Fresh toDF aliases on every self-join leg (the q196 lineage
    * discipline). */
  def recEval(spark: SparkSession, d: String): DataFrame = {
    val items = CacheScope.cached(
      Tables.lineitem(spark, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        .distinct())
    val train = items.filter(col("ok") % 5 =!= 0L)
    val test = items.filter(col("ok") % 5 === 0L)
    val pairs = train.toDF("ok", "pa").join(train.toDF("ok", "pb"), "ok")
      .filter(col("pa") =!= col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("c"))
    val recs = pairs
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("pa")).orderBy(col("c").desc, col("pb"))))
      .filter(col("rk") <= 3)
      .select(col("pa").as("item"), col("pb").as("rec"), col("rk"))
    val cand = test.toDF("ok", "item").join(recs, "item")
    cand
      .join(test.toDF("ok", "rec").withColumn("hit", lit(1L)),
        Seq("ok", "rec"), "left")
      .groupBy(col("rk"))
      .agg(count(lit(1)).as("n_recs"),
        coalesce(sum(col("hit")), lit(0L)).as("n_hits"))
      .select(col("rk").cast("long").as("rank"), col("n_recs"), col("n_hits"),
        expr("(1000 * n_hits) div n_recs").as("hit_pm"))
      .orderBy(col("rank"))
  }

  /** q210: DAY-OF-WEEK PROFILE — per (event type, weekday): event
    * count, share of the type's volume (permille), and deviation from
    * a uniform week in exact milli ((7n − total)·1000 div total). The
    * seasonality fingerprint monitoring baselines are built from —
    * a volume alarm that ignores weekday structure pages every
    * weekend. dow 0 = Monday, derived from the epoch day ((day+3)%7 —
    * 1970-01-01 was a Thursday), calendar-library-free and therefore
    * engine-portable.
    *
    * Shape at 100 TB: one (type, dow) hash-agg with map-side partials;
    * the per-type totals re-aggregate the 35-row cell table. */
  def dowProfile(spark: SparkSession, d: String): DataFrame = {
    val DayNs = 86400000000000L
    val cells = Tables.eventsNs(spark, d)
      .select(col("event_type"),
        expr(s"((ts div $DayNs) + 3) % 7").as("dow"))
      .groupBy(col("event_type"), col("dow")).agg(count(lit(1)).as("n"))
    val tot = cells.groupBy(col("event_type").as("et")).agg(sum(col("n")).as("t"))
    cells.join(broadcast(tot), col("event_type") === col("et"))
      .select(col("event_type"), col("dow"), col("n"),
        expr("(1000 * n) div t").as("share_pm"),
        expr("(1000 * (7 * n - t)) div t").as("dev_milli"))
      .orderBy(col("event_type"), col("dow"))
  }

  /** q205: CHURN LABEL GENERATION — the labeled-training-set builder:
    * for every user active in the 7-day observation window
    * [maxDay−13, maxDay−7], features from that window only (events,
    * active days, purchases, recency gap at cutoff) and the label
    * "churned" = zero PURCHASES in the following 7-day label window
    * (purchase churn — raw-activity churn is degenerate on an
    * always-on population, and this one's base rate is nonzero at
    * every SF, which the spec pins).
    * Point-in-time correct by construction: every feature is
    * conditioned on day ≤ cutoff, so nothing from the label window
    * leaks into the features (the q152 leakage discipline applied to
    * time instead of content).
    *
    * Shape at 100 TB: ONE user-keyed conditional-aggregate pass over
    * the stream — both windows ride the same groupBy as CASE sums, no
    * join between feature and label sides; maxDay is a one-row
    * bounded collect. */
  def churnLabels(spark: SparkSession, d: String): DataFrame = {
    val DayNs = 86400000000000L
    val ev = Tables.eventsNs(spark, d)
      .select(col("user_id"), expr(s"ts div $DayNs").as("day"),
        col("event_type"))
    val maxDay = ev.agg(max(col("day"))).head().getLong(0)
    val (obsLo, obsHi, labLo) = (maxDay - 13, maxDay - 7, maxDay - 6)
    def inObs = col("day") >= obsLo && col("day") <= obsHi
    ev.groupBy(col("user_id"))
      .agg(sum(when(inObs, 1L).otherwise(0L)).as("n_events_obs"),
        countDistinct(when(inObs, col("day"))).as("active_days_obs"),
        sum(when(inObs && col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("n_purchases_obs"),
        max(when(inObs, col("day"))).as("last_obs_day"),
        sum(when(col("day") >= labLo && col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("n_label"))
      .filter(col("n_events_obs") > 0)
      .select(col("user_id"), col("n_events_obs"), col("active_days_obs"),
        col("n_purchases_obs"),
        (lit(obsHi) - col("last_obs_day")).as("gap_days"),
        when(col("n_label") === 0L, 1L).otherwise(0L).as("churned"))
      .orderBy(col("user_id"))
  }

  /** q206: A/B ASSIGNMENT + SRM AUDIT — deterministic hash-based 50/50
    * arm assignment for 5 experiment salts over the user population,
    * with the sample-ratio-mismatch chi-square per (experiment, arm)
    * in exact milli-units: contrib = 1000·(2·o − n)² div (2·n) — the
    * guardrail every experimentation platform runs before trusting a
    * readout. Assignment is pure integer arithmetic
    * (((user_id mod 1000000007) + salt·1000003)·2654435761 mod 1000 <
    * 500) — the prime reduction BEFORE the Knuth multiplier bounds the
    * product at ~2.7e18 < 2^63−1 for ANY user_id, so the hash never
    * overflows BIGINT and stays replayable by any engine at 100 TB id
    * ranges (the unreduced form wraps negative past user_id ≈ 3.5e9,
    * biasing every wrapped user into arm 'a'); no engine-specific hash.
    *
    * Shape at 100 TB: distinct users once, a 5× literal fan-out
    * (experiment-count-bounded), one (exp, arm) hash-agg, and a
    * 5-row-bounded totals join. */
  def abSrm(spark: SparkSession, d: String): DataFrame = {
    val users = Tables.eventsNs(spark, d).select(col("user_id")).distinct()
    val arms = users
      .select(col("user_id"), explode(sequence(lit(0L), lit(4L))).as("exp"))
      .select(col("exp"),
        when(expr(
          "((user_id % 1000000007 + exp * 1000003) * 2654435761) % 1000") < 500L,
          lit("a")).otherwise(lit("b")).as("arm"))
      .groupBy(col("exp"), col("arm")).agg(count(lit(1)).as("n_users"))
    val totals = arms.groupBy(col("exp").as("exp_t"))
      .agg(sum(col("n_users")).as("n"))
    arms.join(broadcast(totals), col("exp") === col("exp_t"))
      .select(col("exp"), col("arm"), col("n_users"),
        expr("(1000 * n) div 2").as("expected_milli"),
        expr("""(1000 * (2 * n_users - n) * (2 * n_users - n))
               | div (2 * n)""".stripMargin.replace("\n", " "))
          .as("chi2_contrib_milli"))
      .orderBy(col("exp"), col("arm"))
  }

  /** q211: BENFORD FIRST-DIGIT AUDIT — the fraud/synthetic-data
    * tripwire: the first significant digit of every line item's
    * extended price vs Benford's law, with the expected permille per
    * digit hardcoded as the 9 literals floor(1000·log10(1+1/d)) so no
    * cross-engine log is ever evaluated (the q157 no-transcendental
    * discipline). Prices integerize to cents first (floor(x·100+0.5) —
    * the values are exact cents in a double, so the +0.5 floor is the
    * engine-stable round); the digit comes off the decimal string of
    * that BIGINT, exact in both engines. TPC-H prices are uniform-ish,
    * so dev_milli is LARGE — the audit reports the deviation, it does
    * not assume the law holds.
    *
    * Shape at 100 TB: row-local digit extract, one 9-group hash-agg
    * with map-side partials, and a one-row totals scalar broadcast
    * against the 9-row cell relation (PlanSweep-documented). */
  def benfordAudit(spark: SparkSession, d: String): DataFrame = {
    val expected = Seq(301L, 176L, 124L, 96L, 79L, 66L, 57L, 51L, 45L)
    val cells = Tables.lineitem(spark, d)
      .select(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
        .as("cents"))
      .filter(col("cents") > 0)
      .select(expr("CAST(substring(CAST(cents AS STRING), 1, 1) AS BIGINT)")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = cells.agg(sum(col("n")).as("t"))
    cells.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        expr("(1000 * n) div t").as("share_pm"),
        element_at(array(expected.map(lit): _*), col("digit").cast("int"))
          .as("expected_pm"))
      .withColumn("dev_milli", col("share_pm") - col("expected_pm"))
      .orderBy(col("digit"))
  }

  /** q212: RIGHT-TO-BE-FORGOTTEN CASCADE AUDIT — the impact report a
    * deletion pipeline publishes before executing a GDPR/CCPA erasure
    * batch: per table, total rows, rows tombstoned, rows kept, the
    * deletion permille, and how many distinct deletion subjects touch
    * that table. The subject set is deterministic here (every 97th
    * identity in each domain: event users and customers — the two are
    * separate identity domains in this corpus); orders cascade via
    * o_custkey and line items transitively via their order.
    *
    * Shape at 100 TB: events/customer/orders audits are row-local
    * conditional aggs (the predicate is pure key arithmetic — no
    * subject-list join at all); the lineitem cascade LEFT-joins the
    * full fact against only the TOMBSTONED orders (~1/97 of orders —
    * broadcastable at moderate scale, orderkey-keyed shuffle beyond),
    * never against the full order table. The four one-row audit frames
    * union driver-free. */
  def forgetCascade(spark: SparkSession, d: String): DataFrame = {
    def audit(df: DataFrame, tbl: String, del: Column, key: Column) =
      df.agg(count(lit(1)).as("n_rows"),
          sum(when(del, 1L).otherwise(0L)).as("n_del"),
          countDistinct(when(del, key)).as("n_subjects"))
        .select(lit(tbl).as("tbl"), col("n_rows"), col("n_del"),
          col("n_subjects"))
    val ev = audit(Tables.eventsNs(spark, d), "events",
      col("user_id") % 97 === 0, col("user_id"))
    val cu = audit(Tables.customer(spark, d), "customer",
      col("c_custkey") % 97 === 0, col("c_custkey"))
    val or = audit(Tables.orders(spark, d), "orders",
      col("o_custkey") % 97 === 0, col("o_custkey"))
    val delOrders = Tables.orders(spark, d)
      .filter(col("o_custkey") % 97 === 0)
      .select(col("o_orderkey").as("del_ok"), col("o_custkey").as("del_ck"))
    val li = audit(
      Tables.lineitem(spark, d).select(col("l_orderkey"))
        .join(broadcast(delOrders), col("l_orderkey") === col("del_ok"),
          "left_outer"),
      "lineitem", col("del_ck").isNotNull, col("del_ck"))
    ev.union(cu).union(or).union(li)
      .select(col("tbl"), col("n_rows"), col("n_del"),
        (col("n_rows") - col("n_del")).as("n_kept"),
        expr("(1000 * n_del) div n_rows").as("del_pm"), col("n_subjects"))
      .orderBy(col("tbl"))
  }

  /** q223: KAPLAN-MEIER RETENTION CURVE — the survival-analysis view
    * of user lifetime: a user "enters" on their first active day,
    * "dies" on their last (users still active on the corpus's final
    * day are right-CENSORED, not deaths — the standard KM treatment),
    * and the curve multiplies out the per-day survival fractions
    * S_t = S_{t−1}·(n_t − d_t)/n_t over the observed day grid, in
    * exact integer micro-units with a floor at each step (the
    * deterministic fixed-point both engines replay). Days where
    * nobody enters or exits change nothing and are omitted — the grid
    * is first∪last days.
    *
    * Shape at 100 TB: one user-keyed (first, last) agg; entry/exit
    * day histograms; the recurrence folds on the DRIVER over the
    * CALENDAR-bounded day grid (≤ observation-window days — a bounded
    * collect by the same argument as q205's maxDay, re-emitted as a
    * literal relation). Never a per-user scan on the driver. */
  def kaplanMeier(spark: SparkSession, d: String): DataFrame = {
    val DayNs = 86400000000000L
    val u = eventsNs(spark, d)
      .select(col("user_id"), expr(s"ts div $DayNs").as("day"))
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("f"), max(col("day")).as("l"))
    val enters = u.groupBy(col("f").as("day")).agg(count(lit(1)).as("e"))
    val exits = u.groupBy(col("l").as("day")).agg(count(lit(1)).as("x"))
    val grid = enters.join(exits, Seq("day"), "full_outer")
      .select(col("day"), coalesce(col("e"), lit(0L)).as("e"),
        coalesce(col("x"), lit(0L)).as("x"))
      .orderBy(col("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val maxDay = grid.map(_._1).max
    var (cumE, cumXb, s) = (0L, 0L, 1000000L)
    val rows = grid.map { case (day, e, x) =>
      cumE += e
      val n = cumE - cumXb
      val dd = if (day < maxDay) x else 0L
      s = s * (n - dd) / n
      cumXb += x
      (day, n, dd, x, s)
    }
    spark.createDataFrame(rows.toSeq)
      .toDF("day", "at_risk", "n_churned", "n_ended", "survival_micro")
      .orderBy(col("day"))
  }

  /** q227: FREQUENT TRIPLES (A-priori level 3) — co-purchase part
    * TRIPLES with support ≥ 2, mined with the classic A-priori
    * prefilter: only parts that themselves appear in ≥ 2 baskets can
    * participate (the level-1 downward-closure cut), then triples
    * enumerate per basket and count. q198's pair mining extended one
    * lattice level — pairs catch "bought together", triples catch the
    * bundle/kit structure pairs alias away.
    *
    * Shape at 100 TB: the prefilter is one part-keyed count agg + a
    * part-keyed semi-join (downward closure removes the long tail
    * BEFORE any enumeration); triple generation is the orderkey-keyed
    * THREE-way self-join — per-basket fan-out C(k,3), k single-digit
    * here and CoPurchaseCap-boundable for power-law baskets (q127's
    * knob); counts agg map-side. Support floor bounds the output. */
  def copurchaseTriples(spark: SparkSession, d: String): DataFrame = {
    val items = CacheScope.cached(
      Tables.lineitem(spark, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        .distinct())
    val freq = items.groupBy(col("p")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("p"))
    val fi = CacheScope.cached(items.join(freq, Seq("p")).select(col("ok"), col("p")))
    fi.toDF("ok", "pa")
      .join(fi.toDF("ok", "pb"), "ok").filter(col("pa") < col("pb"))
      .join(fi.toDF("ok", "pc"), "ok").filter(col("pb") < col("pc"))
      .groupBy(col("pa"), col("pb"), col("pc"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
      .orderBy(col("support").desc, col("pa"), col("pb"), col("pc"))
  }

  /** q228: MONTHLY BACKLOG SNAPSHOTS — for the first day of every
    * month: orders already placed but not yet fully shipped (close =
    * max lineitem ship date), their count, open value in exact cents,
    * and the oldest order's age in days. The as-of inventory series an
    * operations dashboard plots — and the snapshot-sequence shape
    * (interval → bounded month fan-out → keyed agg) that replaces the
    * naive months×orders range join.
    *
    * Shape at 100 TB: close dates are one orderkey-keyed agg; each
    * order explodes to ONLY the month boundaries inside its open
    * interval (lifetime-bounded fan-out, the q216 manifest shape —
    * never a non-equi range join); one month-keyed agg. */
  def backlogSnapshots(spark: SparkSession, d: String): DataFrame = {
    val close = Tables.lineitem(spark, d)
      .groupBy(col("l_orderkey")).agg(max(col("l_shipdate")).as("close"))
    Tables.orders(spark, d)
      .join(close, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderdate"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
        expr("CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)")
          .as("m0"),
        expr("CAST(year(close) * 12 + month(close) - 1 AS BIGINT)").as("m1"))
      .filter(col("m1") >= col("m0") + 1)
      .select(col("o_orderdate"), col("cents"),
        explode(sequence(col("m0") + 1, col("m1"))).as("m"))
      .withColumn("t", expr("make_date(m div 12, m % 12 + 1, 1)"))
      .groupBy(col("m").as("month_idx"))
      .agg(max(col("t")).as("snapshot_date"),
        count(lit(1)).as("n_open"),
        sum(col("cents")).as("open_value_cents"),
        max(expr("datediff(t, CAST(o_orderdate AS DATE))")).cast("long")
          .as("max_age_days"))
      .orderBy(col("month_idx"))
  }

  /** q224: FUNNEL LATENCY PERCENTILES — exact p50/p90/p99 of the
    * stage-to-stage conversion delays behind q124's funnel (first
    * view → first subsequent click, that click → first subsequent
    * purchase), floored to whole seconds. Conversion COUNTS (q124)
    * say how many make it; these say how long the journey takes —
    * the pair every funnel dashboard shows side by side.
    *
    * Shape at 100 TB: the stage relations are q124's user-keyed
    * min-aggs; latencies collapse to a (stage, seconds) histogram
    * whose cumulative window is CALENDAR-bounded per stage (distinct
    * second-values ≤ observation-window seconds, independent of user
    * count — the q151 bounded-window argument); percentile = min
    * value with cum ≥ ceil(p·n/100), q151's exact formula. */
  def funnelLatency(spark: SparkSession, d: String): DataFrame = {
    val ev = eventsNs(spark, d).withColumn("tus", expr("ts div 1000"))
    def stage(tpe: String) = ev.filter(col("event_type") === tpe)
    val v = stage("view").groupBy(col("user_id")).agg(min(col("tus")).as("view_us"))
    val c = stage("click").join(v, "user_id")
      .filter(col("tus") >= col("view_us"))
      .groupBy(col("user_id"), col("view_us")).agg(min(col("tus")).as("click_us"))
    val p = stage("purchase").join(c.select(col("user_id"), col("click_us")), "user_id")
      .filter(col("tus") >= col("click_us"))
      .groupBy(col("user_id"), col("click_us")).agg(min(col("tus")).as("purchase_us"))
    val lat = c.select(lit("1_view_to_click").as("stage"),
        expr("(click_us - view_us) div 1000000").as("lat_s"))
      .unionByName(p.select(lit("2_click_to_purchase").as("stage"),
        expr("(purchase_us - click_us) div 1000000").as("lat_s")))
    val hist = lat.groupBy(col("stage"), col("lat_s")).agg(count(lit(1)).as("c"))
    val byStage = Window.partitionBy(col("stage"))
    val cum = hist
      .withColumn("cum", sum(col("c")).over(byStage.orderBy(col("lat_s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(byStage))
    cum.groupBy(col("stage"))
      .agg(max(col("n")).as("n_conversions"),
        min(col("lat_s")).as("min_s"), max(col("lat_s")).as("max_s"),
        min(when(col("cum") >= expr("(n * 50 + 99) div 100"), col("lat_s"))).as("p50_s"),
        min(when(col("cum") >= expr("(n * 90 + 99) div 100"), col("lat_s"))).as("p90_s"),
        min(when(col("cum") >= expr("(n * 99 + 99) div 100"), col("lat_s"))).as("p99_s"))
      .orderBy(col("stage"))
  }

  /** q229: COHORT LTV MATRIX — customers grouped by first-order month,
    * and for each (cohort month, month offset): active customers,
    * revenue in exact cents, the cohort's CUMULATIVE revenue to that
    * offset, and cumulative LTV per cohort member (floored cents).
    * q125's retention triangle with money on it — the view a
    * subscription/commerce team actually budgets from.
    *
    * Shape at 100 TB: the cohort month is one custkey-keyed min agg
    * re-joined on custkey (co-partitions with q199's RFM scan); the
    * triangle is one (cohort, offset) hash-agg whose OUTPUT is
    * calendar-bounded (months² cells regardless of row count), so the
    * cumulative window runs over a bounded relation and the cohort-size
    * join broadcasts a months-bounded side. Revenue stays in BIGINT
    * cents: Σ cents ≤ 9.2e18 holds through ~10^13 orders; past that the
    * q208 DECIMAL(38,0) routing applies. */
  def cohortLtv(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d).select(
      col("o_custkey").as("ck"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
      expr("CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)")
        .as("m"))
    val cohort = o.groupBy(col("ck")).agg(min(col("m")).as("cm"))
    val sizes = cohort.groupBy(col("cm")).agg(count(lit(1)).as("cohort_size"))
    val cells = o.join(cohort, "ck")
      .groupBy(col("cm"), (col("m") - col("cm")).as("off"))
      .agg(countDistinct(col("ck")).as("n_active"),
        sum(col("cents")).as("rev_cents"))
    cells
      .withColumn("cum_rev_cents", sum(col("rev_cents")).over(
        Window.partitionBy(col("cm")).orderBy(col("off"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(sizes), "cm") // months-bounded side
      .select(col("cm").as("cohort_month"), col("off").as("month_offset"),
        col("n_active"), col("rev_cents"), col("cum_rev_cents"),
        col("cohort_size"),
        expr("cum_rev_cents div cohort_size").as("ltv_cents_per_user"))
      .orderBy(col("cohort_month"), col("month_offset"))
  }

  /** q230: MATCHED-SAMPLE LASPEYRES PRICE INDEX — per brand and month:
    * a fixed-basket price index in exact milli (1000 = base level),
    * weights = base-month quantities, base month = the brand's own
    * earliest traded month, restricted to parts present in BOTH months
    * (the matched-sample discipline every national CPI uses so basket
    * churn doesn't masquerade as inflation). Unit prices are exact
    * floored milli-cents (1000·Σcents div Σqty per part-month).
    *
    * Shape at 100 TB: one (part, month) hash-agg over lineitem, one
    * part-keyed join to the brand dimension (SF-proportional dim —
    * UNHINTED, AQE decides broadcast vs shuffle), one brand-keyed min
    * for the base month, one (brand, part)-keyed base join (each part
    * matches exactly its base row — keyed equi-join, never a range
    * join), one (brand, month) agg. Index numerators are
    * Θ(qty·price·parts) — routed through DECIMAL(38,0) like q198. */
  def priceIndex(spark: SparkSession, d: String): DataFrame = {
    val pm = Tables.lineitem(spark, d).select(
        col("l_partkey").as("pk"),
        expr("CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT)")
          .as("m"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("qty"))
      .groupBy(col("pk"), col("m"))
      .agg(expr("(1000 * sum(cents)) div sum(qty)").as("unit_mc"),
        sum(col("qty")).as("sq"))
    val bp = CacheScope.cached(pm.join(
      Tables.part(spark, d).select(col("p_partkey"), col("p_brand")),
      col("pk") === col("p_partkey")).select(
        col("p_brand").as("brand"), col("pk"), col("m"),
        col("unit_mc"), col("sq")))
    val baseM = bp.groupBy(col("brand")).agg(min(col("m")).as("m0"))
    val base = bp.join(baseM, "brand").filter(col("m") === col("m0"))
      .select(col("brand"), col("pk"), col("sq").as("q0"),
        col("unit_mc").as("p0"))
    bp.join(base, Seq("brand", "pk"))
      .groupBy(col("brand"), col("m"))
      .agg(count(lit(1)).as("n_parts"),
        sum(expr("CAST(q0 AS DECIMAL(38,0)) * unit_mc")).as("num"),
        sum(expr("CAST(q0 AS DECIMAL(38,0)) * p0")).as("den"))
      .select(col("brand"), col("m").as("month_idx"), col("n_parts"),
        expr("CAST((1000 * num) div den AS BIGINT)").as("index_milli"))
      .orderBy(col("brand"), col("month_idx"))
  }

  /** q231: CHEAPEST SUPPLIER PER PART — the procurement arg-min: for
    * every part, the supplier with the lowest observed unit price
    * (exact floored milli-cents over that supplier's lines), ties
    * broken deterministically by lowest suppkey, plus the supplier
    * count and the best-to-worst price spread. TPC-H Q2's
    * minimum-cost-supplier semantic re-expressed over the lineitem
    * history (this dataset has no partsupp table).
    *
    * Shape at 100 TB: one (part, supplier) hash-agg, then ONE
    * part-keyed agg where the arg-min rides `min(struct(price, supp))`
    * — lexicographic struct ordering IS the tie-break, no window, no
    * self-join back to the min row (the two-pass pattern the oracle
    * must use). Both shuffles are keyed; output is |parts|. */
  def cheapestSupplier(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d).select(
        col("l_partkey").as("pk"), col("l_suppkey").as("sk"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("qty"))
      .groupBy(col("pk"), col("sk"))
      .agg(expr("(1000 * sum(cents)) div sum(qty)").as("unit_mc"),
        count(lit(1)).as("n_lines"))
      .groupBy(col("pk"))
      .agg(min(struct(col("unit_mc"), col("sk"))).as("best"),
        count(lit(1)).as("n_suppliers"),
        (max(col("unit_mc")) - min(col("unit_mc"))).as("spread_mc"))
      .select(col("pk").as("p_partkey"), col("best.sk").as("best_suppkey"),
        col("best.unit_mc").as("best_unit_mc"), col("n_suppliers"),
        col("spread_mc"))
      .orderBy(col("p_partkey"))

  /** Shared (brand, month, revenue-cents) relation for q233/q235: one
    * (part, month)-free hash-agg over lineitem joined to the part
    * dimension. Calendar × brand bounded output regardless of fact
    * row count — the property both consumers' windows lean on. */
  private def brandMonthRevenue(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d).select(
        col("l_partkey").as("pk"),
        expr("CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT)")
          .as("m"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .join(Tables.part(spark, d).select(col("p_partkey"), col("p_brand")),
        col("pk") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"), col("m"))
      .agg(sum(col("cents")).as("rev_cents"))

  /** q233: SEASONAL INDEX — per brand and month, revenue's ratio to the
    * CENTERED 12-month moving average in exact milli (1000 = on-trend):
    * the classical ratio-to-moving-average decomposition step, the
    * demand-planning view that separates "December is big" from "the
    * brand is growing". Only months whose centered year is fully
    * observed (12 months present in [m−6, m+5]) are emitted — a RANGE
    * frame over the numeric month index, so calendar gaps shrink the
    * count and the completeness filter sees them (a ROWS frame would
    * silently stretch across gaps).
    *
    * Shape at 100 TB: the fact table collapses to the calendar × brand
    * bounded (brand, month) grid FIRST (one keyed hash-agg); the RANGE
    * window then runs inside brand partitions of ≤ |calendar| rows —
    * the q151/q219 bounded-window argument. The ×12000 numerator is
    * Θ(monthly revenue), routed DECIMAL(38,0) (brand-month cents can
    * pass 1e15 at scale; ×12000 clears Long). */
  def seasonalIndex(spark: SparkSession, d: String): DataFrame = {
    val yr = Window.partitionBy(col("brand")).orderBy(col("m"))
      .rangeBetween(-6, 5)
    brandMonthRevenue(spark, d)
      .withColumn("ma_n", count(lit(1)).over(yr))
      .withColumn("ma_sum", sum(col("rev_cents")).over(yr))
      .filter(col("ma_n") === 12)
      .select(col("brand"), col("m").as("month_idx"), col("rev_cents"),
        expr("ma_sum div 12").as("ma_cents"),
        expr("CAST((CAST(12000 AS DECIMAL(38,0)) * rev_cents) div ma_sum" +
          " AS BIGINT)").as("seasonal_milli"))
      .orderBy(col("brand"), col("month_idx"))
  }

  /** q234: SUPPLIER PARETO SKYLINE — suppliers not strictly dominated
    * on (unit price, ship lag): cheaper-or-equal AND faster-or-equal
    * with one strict makes a supplier redundant; what survives is the
    * exact price/speed efficient frontier — the procurement shortlist
    * query (and the 2-D skyline operator, Börzsönyi et al.'s classic,
    * which Spark has no native form of). Unit price = floored
    * milli-cents per unit over the supplier's lines; ship lag = floored
    * milli-days mean of (l_shipdate − o_orderdate), an orderkey-keyed
    * fact-fact join.
    *
    * Shape at 100 TB: facts collapse to one row per supplier (keyed
    * hash-agg), then the sort-based skyline: per-price min lag (keyed
    * agg), and the STRICT-PREFIX running min over price order via the
    * q73 two-pass machinery — range-repartition on price, pid-local
    * strictly-before window, ≤|shuffle partitions| pid minima collected
    * for a driver prefix-min, broadcast back. No partitionless window,
    * no O(n²) dominance join (that's the ORACLE's formula — NOT EXISTS
    * — which is exactly what makes the check independent). A supplier
    * survives iff its lag equals its price-class min AND beats every
    * strictly-cheaper class's min. Equal (price, lag) twins both
    * survive (neither strictly dominates). */
  def supplierSkyline(spark: SparkSession, d: String): DataFrame = {
    // cached: consumed by the frontier build AND the final survivor join
    val sup = CacheScope.cached(Tables.lineitem(spark, d).select(
        col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("qty"),
        col("l_shipdate"))
      .join(Tables.orders(spark, d).select(col("o_orderkey"), col("o_orderdate")),
        col("ok") === col("o_orderkey"))
      .groupBy(col("sk"))
      .agg(expr("(1000 * sum(cents)) div sum(qty)").as("unit_mc"),
        // per-line lags can be negative in the corpus tail; the mean's
        // numerator is sign-decomposed (q235 discipline) so truncation
        // (Spark div) and floor (DuckDB //) agree
        expr("CASE WHEN sum(CAST(datediff(l_shipdate, o_orderdate) AS BIGINT)) >= 0" +
          " THEN (1000 * sum(CAST(datediff(l_shipdate, o_orderdate) AS BIGINT))) div count(1)" +
          " ELSE -((1000 * -sum(CAST(datediff(l_shipdate, o_orderdate) AS BIGINT))) div count(1)) END")
          .as("lag_md"),
        count(lit(1)).as("n_lines")))
    val byCost = sup.groupBy(col("unit_mc")).agg(min(col("lag_md")).as("cmin"))
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val local = byCost.repartitionByRange(parts, col("unit_mc"))
      .withColumn("pid", spark_partition_id())
      .withColumn("lmin", min(col("cmin")).over(
        Window.partitionBy(col("pid")).orderBy(col("unit_mc"))
          .rowsBetween(Window.unboundedPreceding, -1)))
    local.persist()
    // one bounded row per range partition → driver prefix-min (the q73
    // offset-table contract: rows ∝ cluster config, not data)
    val pidMins = local.groupBy(col("pid")).agg(min(col("cmin")).as("pm"))
      .orderBy(col("pid")).collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) Long.MaxValue else r.getLong(1)))
    CacheScope.adopt(local)
    val prior = {
      var acc = Long.MaxValue
      pidMins.map { case (pid, pm) =>
        val o = acc; acc = math.min(acc, pm); (pid, o)
      }
    }
    val priorDf = broadcast(
      spark.createDataFrame(prior.toSeq).toDF("pid", "prior"))
    val frontier = local.join(priorDf, "pid")
      // least() skips nulls: strictly-before min within the pid,
      // folded with the min over all earlier pids (MaxValue = none)
      .withColumn("strict", least(col("lmin"), col("prior")))
      .filter(col("cmin") < col("strict"))
      .select(col("unit_mc").as("f_mc"), col("cmin"))
    sup.join(broadcast(frontier),
        col("unit_mc") === col("f_mc") && col("lag_md") === col("cmin"))
      .select(col("sk").as("suppkey"), col("unit_mc"), col("lag_md"),
        col("n_lines"))
      .orderBy(col("suppkey"))
  }

  /** q235: THEIL-SEN TREND PER BRAND — the robust (median-of-pairwise-
    * slopes) monthly-revenue trend in exact floored milli-cents/month:
    * up to 29% of months can be outliers (promo spikes, stockouts)
    * without moving the estimate, which is why drift monitors prefer it
    * to least squares. Median = the lower median (rank ⌈n/2⌉ under
    * (slope, m1, m2) order — fully deterministic, no interpolation).
    *
    * Shape at 100 TB: the fact table collapses to the calendar × brand
    * bounded grid first; the pair self-join (fresh-aliased lineage —
    * the q196 lesson) and the rank window then touch ≤ C(|calendar|,2)
    * rows per brand — bounded by the CALENDAR, not the data. Slope
    * numerators are sign-decomposed (Spark div truncates, DuckDB //
    * floors; they agree only on non-negative operands) and routed
    * DECIMAL(38,0). */
  def theilSenTrend(spark: SparkSession, d: String): DataFrame = {
    val bm = CacheScope.cached(brandMonthRevenue(spark, d))
    val a = bm.select(col("brand").as("ba"), col("m").as("m1"),
      col("rev_cents").as("r1"))
    val b = bm.select(col("brand").as("bb"), col("m").as("m2"),
      col("rev_cents").as("r2"))
    val pairs = a.join(b, col("ba") === col("bb") && col("m2") > col("m1"))
      .select(col("ba").as("brand"), col("m1"), col("m2"),
        when(col("r2") >= col("r1"),
          expr("CAST((CAST(1000 AS DECIMAL(38,0)) * (r2 - r1))" +
            " div (m2 - m1) AS BIGINT)"))
        .otherwise(-expr("CAST((CAST(1000 AS DECIMAL(38,0)) * (r1 - r2))" +
            " div (m2 - m1) AS BIGINT)")).as("slope"))
    val months = bm.groupBy(col("brand").as("mb"))
      .agg(count(lit(1)).as("n_months"))
    val w = Window.partitionBy(col("brand"))
      .orderBy(col("slope"), col("m1"), col("m2"))
    pairs
      .withColumn("rk", row_number().over(w))
      .withColumn("n_pairs", count(lit(1)).over(Window.partitionBy(col("brand"))))
      .filter(col("rk") === expr("(n_pairs + 1) div 2"))
      .join(broadcast(months), col("brand") === col("mb"))
      .select(col("brand"), col("n_months"), col("n_pairs"),
        col("slope").as("trend_milli_per_month"))
      .orderBy(col("brand"))
  }

  /** First-K-events cap per (user, day) session for q237 — bounds the
    * per-session C(k,3) subsequence fan-out at C(24,3) = 2,024. */
  val SeqCap = 24
  /** Minimum session support for an emitted pattern. */
  val SeqMinSup = 3L

  /** q237: GAPPED SEQUENTIAL TRIPLE PATTERNS — ordered event-type
    * triples (a before b before c, gaps allowed) and the number of
    * (user, day) sessions supporting each, the PrefixSpan-style
    * sequential-pattern question q130 (adjacent transitions) and q181
    * (contiguous paths) cannot answer: "signup … THEN view … THEN
    * purchase, whatever happened in between".
    *
    * Shape at 100 TB: positions come from a (user, day)-PARTITIONED
    * row_number (keyed window), capped at the first SeqCap events —
    * the documented loss is patterns occurring only past position 24
    * of a session, and the gain is a hard C(24,3) per-session bound
    * on the triple fan-out. Enumeration is two session-keyed
    * equi-joins on the capped relation (never a cartesian), deduped
    * per session BEFORE support counting (support = sessions, not
    * occurrences — one spammy session can't promote a pattern). The
    * final support table is alphabet³-bounded regardless of corpus
    * size. */
  def eventSeqTriples(spark: SparkSession, d: String): DataFrame = {
    val pos = CacheScope.cached(Tables.eventsNs(spark, d)
      .select(col("user_id").as("u"), expr("ts div 86400000000000").as("day"),
        col("event_type").as("t"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("u"), col("day"))
          .orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") <= SeqCap)
      .select(col("u"), col("day"), col("t"), col("rn")))
    val a = pos.select(col("u").as("u1"), col("day").as("d1"),
      col("t").as("t1"), col("rn").as("p1"))
    val b = pos.select(col("u").as("u2"), col("day").as("d2"),
      col("t").as("t2"), col("rn").as("p2"))
    val c = pos.select(col("u").as("u3"), col("day").as("d3"),
      col("t").as("t3"), col("rn").as("p3"))
    a.join(b, col("u1") === col("u2") && col("d1") === col("d2") &&
        col("p2") > col("p1"))
      .join(c, col("u1") === col("u3") && col("d1") === col("d3") &&
        col("p3") > col("p2"))
      .select(col("u1"), col("d1"), col("t1"), col("t2"), col("t3"))
      .distinct()
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= SeqMinSup)
      .orderBy(col("t1"), col("t2"), col("t3"))
  }

  /** q239: PERFECT-ORDER RATE PER MONTH — the classic fulfillment KPI:
    * share of orders (permille) whose EVERY line shipped within 30
    * days of ordering, plus the mean worst-line lag in exact floored
    * milli-days. The all-lines quantifier is what makes this an
    * order-grain aggregate, not a line filter.
    *
    * Shape at 100 TB: one orderkey-keyed fact-fact join (co-partitioned
    * shuffle), one per-order max agg, one calendar-bounded month agg.
    * Never materializes anything bigger than |orders|. */
  def perfectOrderRate(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("ok"), col("l_shipdate"))
      .join(Tables.orders(spark, d).select(col("o_orderkey"),
        col("o_orderdate"),
        expr("CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)")
          .as("m")), col("ok") === col("o_orderkey"))
      .groupBy(col("ok"), col("m"))
      .agg(max(expr("CAST(datediff(l_shipdate, o_orderdate) AS BIGINT)"))
        .as("worst_lag"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("worst_lag") <= 30L, 1L).otherwise(0L)).as("n_perfect"),
        // lags go NEGATIVE in the corpus tail (lines shipping before
        // the recorded order date) — sign-decomposed like q235 so
        // Spark's truncating div and DuckDB's flooring // agree
        expr("CASE WHEN sum(worst_lag) >= 0" +
          " THEN (1000 * sum(worst_lag)) div count(1)" +
          " ELSE -((1000 * -sum(worst_lag)) div count(1)) END")
          .as("mean_worst_lag_md"))
      .select(col("m").as("month_idx"), col("n_orders"), col("n_perfect"),
        expr("(1000 * n_perfect) div n_orders").as("perfect_pm"),
        col("mean_worst_lag_md"))
      .orderBy(col("month_idx"))

  /** q241: SEASONAL-NAIVE FORECAST BACKTEST (MASE) — per brand, the
    * mean absolute scaled error of the seasonal-naive forecast
    * (revenue(m) ≈ revenue(m−12)) against the naive-1 benchmark
    * (revenue(m) ≈ revenue(m−1)), in exact milli: the
    * Hyndman–Koehler scale-free accuracy metric every forecast
    * pipeline backtests BEFORE a model earns a slot. mase < 1000 =
    * yearly seasonality carries real signal for this brand. Evaluated
    * only on months where BOTH lags exist, so numerator and
    * denominator score the identical month set.
    *
    * Shape at 100 TB: the fact table collapses to the calendar × brand
    * grid first (the q233/q235 shared agg); the two lag joins are
    * (brand, month)-keyed equi-joins on that bounded grid — never a
    * window over fact rows, and absolute errors keep every floor
    * operand non-negative. */
  def seasonalNaiveBacktest(spark: SparkSession, d: String): DataFrame = {
    val bm = CacheScope.cached(brandMonthRevenue(spark, d))
    val l12 = bm.select(col("brand").as("b12"), (col("m") + 12L).as("m12"),
      col("rev_cents").as("r12"))
    val l1 = bm.select(col("brand").as("b1"), (col("m") + 1L).as("m1"),
      col("rev_cents").as("r1"))
    bm.join(l12, col("brand") === col("b12") && col("m") === col("m12"))
      .join(l1, col("brand") === col("b1") && col("m") === col("m1"))
      .groupBy(col("brand"))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("rev_cents") - col("r12"))).as("ae12"),
        sum(abs(col("rev_cents") - col("r1"))).as("ae1"))
      .select(col("brand"), col("n_eval"),
        expr("ae12 div n_eval").as("mae_seasonal_cents"),
        expr("ae1 div n_eval").as("mae_naive1_cents"),
        expr("CAST((CAST(1000 AS DECIMAL(38,0)) * ae12) div ae1 AS BIGINT)")
          .as("mase_milli"))
      .orderBy(col("brand"))
  }

  /** q268: RFM SEGMENT MIGRATION MATRIX — customer monetary-quintile
    * flow between the first and second half of the order history: per
    * (segment-then, segment-now) cell the customer count, where
    * segment is the q199 exact-integer monetary quintile (1..5, 5
    * best, hundred-dollar grid, score = (strictly-poorer·5) div n + 1)
    * computed INDEPENDENTLY per half, and 0 means "absent in that
    * half" (new customer / churned customer). The classic retention
    * read: mass on the diagonal = stable value segments, the 5→0 cell
    * = lost whales, the 0→5 cell = acquired whales — the q125
    * cohort-retention question asked at the VALUE level instead of
    * the activity level.
    *
    * The period split is the integer midpoint of the corpus's
    * [min, max] order-day span — derived from the data (one bounded
    * 1-row agg, the q199 `now` precedent), deterministic, and
    * identical in the oracle.
    *
    * Shape at 100 TB: two customer-keyed hash-aggs (one per half —
    * a single scan each), quintiles from the bounded hundred-dollar
    * histogram through the q73/q188 two-pass cumulative (no
    * partitionless window, no per-customer global rank), broadcast
    * re-join on the grid value, one full-outer customer-keyed join,
    * and a ≤36-key matrix agg. Nothing scales past the fact scan. */
  def rfmMigration(spark: SparkSession, d: String): DataFrame = {
    val o = CacheScope.cached(Tables.orders(spark, d)
      .select(col("o_custkey"),
        datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents")))
    val mm = o.agg(min(col("day")), max(col("day"))).head()
    val pivot = (mm.getLong(0) + mm.getLong(1)) / 2
    def half(pred: Column, tag: String): DataFrame = {
      val base = o.filter(pred).groupBy(col("o_custkey"))
        .agg(expr("sum(cents) div 10000").as("mh"))
      val hist = base.groupBy(col("mh")).agg(count(lit(1)).as("c"))
      val (cum, n) = histCumBefore(spark, hist, "mh", asc = true)
      base.join(broadcast(cum.select(col("mh").as("mh_k"),
          expr(s"(before * 5) div $n + 1").as(s"seg_$tag"))),
        col("mh") === col("mh_k"))
        .select(col("o_custkey").as(s"ck_$tag"), col(s"seg_$tag"))
    }
    val a = half(col("day") < pivot, "a")
    val b = half(col("day") >= pivot, "b")
    a.join(b, col("ck_a") === col("ck_b"), "full_outer")
      .select(coalesce(col("seg_a"), lit(0L)).as("seg_then"),
        coalesce(col("seg_b"), lit(0L)).as("seg_now"))
      .groupBy(col("seg_then"), col("seg_now"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("seg_then"), col("seg_now"))
  }

  /** q272: MAD ANOMALY CALENDAR — every (brand, month) revenue cell
    * flagged against the brand's own ROBUST dispersion: |rev − median|
    * > 3·MAD, where median and MAD (median absolute deviation) are the
    * deterministic LOWER medians (rank (n+1) div 2 under (value, month)
    * order — the q235 no-interpolation discipline). The month-level
    * twin of q185's per-day MAD outliers and the anomaly view q233's
    * seasonal decomposition can't give: a promo spike or stockout month
    * stands out against the brand's typical month WITHOUT the mean and
    * variance being dragged by the very outliers being hunted (up to
    * half the months can be wild before the median moves). Emits the
    * FULL calendar with the flag — the zero-anomaly brands are
    * evidence too (the q267 dead-rule argument).
    *
    * Shape at 100 TB: the fact table collapses to the bounded
    * calendar × brand grid first (one keyed hash-agg); both median
    * extractions are rank windows INSIDE brand partitions of
    * ≤|calendar| rows; the med/mad maps re-join broadcast (≤|brands|
    * rows each, fresh-aliased keys — the q196 lesson). Nothing after
    * the grid agg scales with data volume. */
  def madAnomalyCalendar(spark: SparkSession, d: String): DataFrame = {
    val bm = CacheScope.cached(brandMonthRevenue(spark, d))
    def lowerMedian(df: DataFrame, key: String, value: String,
        outKey: String, outVal: String): DataFrame = {
      val w = Window.partitionBy(col(key)).orderBy(col(value), col("m"))
      df.withColumn("rk", row_number().over(w))
        .withColumn("nn", count(lit(1)).over(Window.partitionBy(col(key))))
        .filter(col("rk") === expr("(nn + 1) div 2"))
        .select(col(key).as(outKey), col(value).as(outVal))
    }
    val med = lowerMedian(bm, "brand", "rev_cents", "mb", "med_cents")
    val dev = bm.join(broadcast(med), col("brand") === col("mb"))
      .withColumn("dev_cents", abs(col("rev_cents") - col("med_cents")))
      .select(col("brand"), col("m"), col("rev_cents"), col("med_cents"),
        col("dev_cents"))
    val mad = lowerMedian(dev, "brand", "dev_cents", "xb", "mad_cents")
    dev.join(broadcast(mad), col("brand") === col("xb"))
      .select(col("brand"), col("m"), col("rev_cents"), col("med_cents"),
        col("mad_cents"), col("dev_cents"),
        when(col("dev_cents") > col("mad_cents") * 3L, 1L).otherwise(0L)
          .as("is_anomaly"))
      .orderBy(col("brand"), col("m"))
  }

  /** q273: KENDALL-τ BRAND CO-MOVEMENT — for every brand pair, the
    * exact Kendall tau-a of their monthly revenue series over the
    * months BOTH observe: concordant month pairs (both brands moved
    * the same way) minus discordant, over C(n,2), in sign-decomposed
    * milli. Rank-based like q218's Spearman but pairwise-exact with
    * NO rank construction at all — τ needs only the SIGN of each
    * month-pair delta, so ties are handled exactly (they count for
    * neither side; tau-a keeps the full C(n,2) denominator) and zero
    * cross-engine arithmetic deeper than integer comparison exists.
    * The read: which brands' demand moves together (shared seasonality
    * / substitutes with the sign flipped) — the co-movement matrix a
    * demand planner clusters, where q235 gives each brand its OWN
    * trend in isolation.
    *
    * Shape at 100 TB: the fact table collapses to the bounded
    * calendar × brand grid first; the brand-pair month alignment is a
    * month-keyed self-equi-join of that grid (fresh-aliased — the
    * q196 lesson) and the month-pair enumeration is a brand-pair-keyed
    * self-equi-join — C(|brands|,2) · C(|calendar|,2) rows total,
    * bounded by dimensions, independent of fact volume. */
  def kendallComovement(spark: SparkSession, d: String): DataFrame = {
    val bm = CacheScope.cached(brandMonthRevenue(spark, d))
    val x = bm.select(col("brand").as("ba"), col("m").as("mx"),
      col("rev_cents").as("ra"))
    val y = bm.select(col("brand").as("bb"), col("m").as("my"),
      col("rev_cents").as("rb"))
    val pv = x.join(y, col("mx") === col("my") && col("ba") < col("bb"))
      .select(col("ba"), col("bb"), col("mx").as("m"), col("ra"), col("rb"))
    val p1 = pv.select(col("ba").as("pa"), col("bb").as("pb"),
      col("m").as("m1"), col("ra").as("ra1"), col("rb").as("rb1"))
    val p2 = pv.select(col("ba").as("qa"), col("bb").as("qb"),
      col("m").as("m2"), col("ra").as("ra2"), col("rb").as("rb2"))
    val sa = when(col("ra2") > col("ra1"), 1L)
      .when(col("ra2") < col("ra1"), -1L).otherwise(0L)
    val sb = when(col("rb2") > col("rb1"), 1L)
      .when(col("rb2") < col("rb1"), -1L).otherwise(0L)
    val ag = p1.join(p2, col("pa") === col("qa") && col("pb") === col("qb")
        && col("m2") > col("m1"))
      .select(col("pa"), col("pb"), (sa * sb).as("s"))
      .groupBy(col("pa"), col("pb"))
      .agg(sum(when(col("s") > 0, 1L).otherwise(0L)).as("n_conc"),
        sum(when(col("s") < 0, 1L).otherwise(0L)).as("n_disc"),
        count(lit(1)).as("np"))
    val nm = pv.groupBy(col("ba"), col("bb"))
      .agg(count(lit(1)).as("n_months"))
    nm.join(ag, col("ba") === col("pa") && col("bb") === col("pb"))
      .select(col("ba").as("brand_a"), col("bb").as("brand_b"),
        col("n_months"), col("n_conc"), col("n_disc"),
        when(col("n_conc") >= col("n_disc"),
          expr("(1000 * (n_conc - n_disc)) div np"))
          .otherwise(-expr("(1000 * (n_disc - n_conc)) div np"))
          .as("tau_milli"))
      .orderBy(col("brand_a"), col("brand_b"))
  }

  /** q277: ASSOCIATION RULES — the DIRECTED rules q198's symmetric
    * lift can't express: for every co-purchased part pair with support
    * ≥ 3 baskets, BOTH directions A→B and B→A with exact confidence
    * milli (⌊1000·|A∩B|/|A|⌋) and conviction milli — conviction =
    * (1 − supp(B)) / (1 − conf(A→B)) as ONE cross-multiplied integral
    * division ⌊1000·(t−c_b)·c_a / (t·(c_a−c_ab))⌋, the "how much more
    * often would A appear without B if they were independent" measure
    * that, unlike confidence, punishes rules whose consequent is just
    * globally common. A deterministic-confidence rule (c_ab = c_a)
    * reports NULL conviction via the div-NULL path on both engines —
    * infinity, honestly. Top 30 by (confidence desc, antecedent,
    * consequent), the basket-placement read ("customers who bought A
    * buy B" — directionality is the point: diapers→beer and
    * beer→diapers are different decisions).
    *
    * Shape at 100 TB: identical physics to q198 — basket-keyed
    * self-equi-join with per-basket C(k,2) fan-out, part-keyed
    * frequency joins, a one-row scalar broadcast, and a bounded
    * TakeOrdered. The direction union doubles a support-filtered
    * relation, nothing else. DECIMAL(38,0) products throughout (t and
    * the counts are corpus-scale). */
  def associationRules(spark: SparkSession, d: String): DataFrame = {
    val items = CacheScope.cached(
      Tables.lineitem(spark, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        .distinct())
    val pairs = items.toDF("ok", "pa").join(items.toDF("ok", "pb"), "ok")
      .filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 3)
    val directed = pairs.select(col("pa").as("ante"), col("pb").as("cons"),
        col("c_ab"))
      .unionAll(pairs.select(col("pb").as("ante"), col("pa").as("cons"),
        col("c_ab")))
    val freq = items.groupBy(col("p")).agg(count(lit(1)).as("c"))
    val baskets = items.agg(countDistinct(col("ok")).as("t"))
    directed
      .join(freq.toDF("ante", "c_a"), "ante")
      .join(freq.toDF("cons", "c_b"), "cons")
      .crossJoin(broadcast(baskets))
      .select(col("ante"), col("cons"), col("c_ab"), col("c_a"), col("c_b"),
        expr("(CAST(1000 AS DECIMAL(38,0)) * c_ab) div c_a")
          .as("confidence_milli"),
        // (t−c_b)·c_a / (t·(c_a−c_ab)); c_a = c_ab ⇒ div 0 ⇒ NULL ⇒ ∞
        expr("CAST((CAST(1000 AS DECIMAL(38,0)) * (t - c_b) * c_a) div " +
          "(CAST(t AS DECIMAL(38,0)) * (c_a - c_ab)) AS BIGINT)")
          .as("conviction_milli"))
      .orderBy(col("confidence_milli").desc, col("ante"), col("cons"))
      .limit(30)
  }

  /** q280 window length: 12 monthly taps with dyadic weights
    * 2¹¹..2⁰ (newest heaviest), weight mass 2¹²−1 = 4095. */
  val MomentumTaps = 12

  /** q280: DYADIC-DECAY REVENUE MOMENTUM — per brand and month, an
    * exponentially-weighted 12-month revenue level with EXACT dyadic
    * weights (tap k back weighs 2^(11−k); level = weighted sum div
    * 4095) and its month-over-month delta. The EWMA-family smoother
    * made hash-exact: classic EWMA carries an infinite recurrence
    * whose floored replay diverges across engines, so the operator is
    * DEFINED as the 12-tap truncation — weights decay 2× per month
    * (the α=½ profile), the tail below tap 12 is < 1/4096 of the
    * mass, and every engine computes the identical integer. Missing
    * months weigh in at 0 revenue (true demand silence, not NULL
    * skip): levels only emit once a FULL window exists (month index
    * ≥ 12 past spine start), momentum one month later. The read q233
    * (seasonal ratio) and q235 (whole-series trend) don't give: the
    * CURRENT smoothed level and whether it just turned — the
    * inventory-pacing signal.
    *
    * Shape at 100 TB: the fact table collapses to the bounded
    * calendar × brand grid FIRST (one keyed hash-agg); the spine
    * bounds come from a 1-row collect (the q223 calendar contract);
    * the 12 taps are lag() reads inside brand partitions of
    * ≤|calendar| rows — one window sort over dimension-bounded data,
    * nothing downstream scales with fact volume. Weighted sums are
    * ≤ 4095·max monthly cents — route DECIMAL(38,0) past ~2·10¹⁴
    * cents/brand-month. */
  def dyadicMomentum(spark: SparkSession, d: String): DataFrame = {
    val bm = CacheScope.cached(brandMonthRevenue(spark, d))
    val bounds = bm.agg(min(col("m")), max(col("m"))).head()
    val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
    val spine = spark.range(mn, mx + 1L).select(col("id").as("m"))
    val grid = bm.select(col("brand")).distinct()
      .crossJoin(broadcast(spine))
      .join(bm, Seq("brand", "m"), "left")
      .select(col("brand"), col("m"),
        coalesce(col("rev_cents"), lit(0L)).as("rev"))
    val w = Window.partitionBy(col("brand")).orderBy(col("m"))
    val num = (0 until MomentumTaps).map { k =>
      lag(col("rev"), k, 0L).over(w) * lit(1L << (MomentumTaps - 1 - k))
    }.reduce(_ + _)
    grid.withColumn("num", num)
      .withColumn("level_cents", expr("num div 4095"))
      .withColumn("prev_level_cents",
        lag(col("level_cents"), 1).over(w))
      .withColumn("momentum_cents",
        col("level_cents") - col("prev_level_cents"))
      .filter(col("m") >= mn + MomentumTaps)
      .select(col("brand"), col("m"), col("level_cents"),
        col("prev_level_cents"), col("momentum_cents"),
        signum(col("momentum_cents")).cast("long").as("direction"))
      .orderBy(col("brand"), col("m"))
  }

  /** q284 lags: adjacent hour (short-memory burstiness) and same hour
    * next day (diurnal rhythm). */
  val AcfLags: Seq[Long] = Seq(1L, 24L)

  /** q284: HOURLY-SERIES AUTOCORRELATION — per event type, the exact
    * signed lag-1 and lag-24 Pearson r² (in ppm, sign carried
    * separately from the square) of the zero-filled hourly event-count
    * series. The rhythm detector behind traffic-aware scheduling and
    * anomaly baselining: strong positive lag-24 = diurnal periodicity
    * (q233's seasonal index asks this of MONTHS; no operator asked it
    * of the event stream), strong lag-1 = bursty/sticky load, ~0 both
    * = memoryless arrivals. Exactness is the q91 discipline: moment
    * NUMERATORS as exact integer sums in DECIMAL(38,0), the ONE
    * division floored — r²·sign instead of r, so no square root ever
    * happens (sign(num)·10⁶·num² div (dx·dy)); a constant series
    * (dx·dy = 0) reports 0, the honest undefined.
    *
    * Shape at 100 TB: the stream collapses to the (type, hour) grid
    * FIRST (one keyed hash-agg, map-side combinable); the spine
    * zero-fill is |types| × the calendar-bounded hour range (the q219
    * value-domain idiom, broadcast spine); lags are window reads
    * inside type partitions of ≤|hours| rows. Nothing after the first
    * agg scales with event volume. num² ≤ (|hours|²·maxcount²)² —
    * ~3·10⁹ events/hour/type before the 38-digit envelope binds. */
  def hourlyAutocorr(spark: SparkSession, d: String): DataFrame = {
    val cc = CacheScope.cached(eventsNs(spark, d)
      .select(col("event_type"), expr("ts div 3600000000000").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c")))
    val bounds = cc.agg(min(col("h")), max(col("h"))).head()
    val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
    val spine = spark.range(mn, mx + 1L).select(col("id").as("h"))
    val grid = cc.select(col("event_type")).distinct()
      .crossJoin(broadcast(spine))
      .join(cc, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("c"), lit(0L)).as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val lagged = AcfLags.map { l =>
      grid.withColumn("y", lag(col("c"), l.toInt).over(w))
        .filter(col("h") >= mn + l)
        .select(col("event_type"), lit(l).as("lag_h"),
          col("c").as("x"), col("y"))
    }.reduce(_ unionAll _)
    lagged.groupBy(col("event_type"), col("lag_h"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      .withColumn("num", expr(
        "CAST(n_pairs AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("dx", expr(
        "CAST(n_pairs AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .withColumn("dy", expr(
        "CAST(n_pairs AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
      .select(col("event_type"), col("lag_h"), col("n_pairs"),
        when(expr("dx = 0 OR dy = 0"), lit(0L)).otherwise(expr(
          """CAST(CASE WHEN num >= 0
            |  THEN (1000000 * num * num) div (dx * dy)
            |  ELSE -((1000000 * num * num) div (dx * dy))
            |END AS BIGINT)""".stripMargin.replace("\n", " ")))
          .as("r2_signed_ppm"))
      .orderBy(col("event_type"), col("lag_h"))
  }

  /** q286: PRICE-QUANTITY ELASTICITY PROXY — per brand, the exact OLS
    * slope of monthly quantity on monthly unit price (micro units of
    * qty per cent) with its signed r² (ppm): did the brand sell LESS
    * in the months it priced HIGHER? The cross-VARIABLE regression
    * none of the time-series family runs: q235 regresses revenue on
    * TIME, q273 correlates brand PAIRS, q284 correlates a series with
    * its own PAST — this one prices the demand curve itself, the
    * input a pricing team actually fits. Months are the observation
    * grain (unit price = rev_cents div qty, ONE floored division per
    * cell, qty exact — TPC-H quantities are integral); slope and r²
    * follow the q91/q284 exact-moment discipline: integer numerators
    * in DECIMAL(38,0), one sign-decomposed floored division each.
    *
    * Shape at 100 TB: the fact table collapses to the brand × month
    * grid FIRST (one keyed hash-agg); moments are a |brands|-keyed
    * re-agg of that bounded grid. Nothing downstream of the first agg
    * scales with fact volume. */
  def priceElasticity(spark: SparkSession, d: String): DataFrame = {
    val bm = Tables.lineitem(spark, d).select(
        col("l_partkey").as("pk"),
        expr("CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT)")
          .as("m"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        expr("CAST(l_quantity AS BIGINT)").as("qty"))
      .join(Tables.part(spark, d).select(col("p_partkey"), col("p_brand")),
        col("pk") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"), col("m"))
      .agg(sum(col("cents")).as("rev_cents"), sum(col("qty")).as("qty"))
      .select(col("brand"), col("m"),
        expr("rev_cents div qty").as("x"), col("qty").as("y"))
    bm.groupBy(col("brand"))
      .agg(count(lit(1)).as("n_months"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      .withColumn("num", expr(
        "CAST(n_months AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("dx", expr(
        "CAST(n_months AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .withColumn("dy", expr(
        "CAST(n_months AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
      .select(col("brand"), col("n_months"),
        when(expr("dx = 0"), lit(0L)).otherwise(expr(
          """CAST(CASE WHEN num >= 0 THEN (1000000 * num) div dx
            |  ELSE -((1000000 * (-num)) div dx) END AS BIGINT)"""
            .stripMargin.replace("\n", " "))).as("slope_micro"),
        when(expr("dx = 0 OR dy = 0"), lit(0L)).otherwise(expr(
          """CAST(CASE WHEN num >= 0
            |  THEN (1000000 * num * num) div (dx * dy)
            |  ELSE -((1000000 * num * num) div (dx * dy))
            |END AS BIGINT)""".stripMargin.replace("\n", " ")))
          .as("r2_signed_ppm"))
      .orderBy(col("brand"))
  }

  /** q288 cumulative-share class bars: A captures the first 80 % of
    * brand revenue, B the next 15 %, C the tail. */
  val AbcBarsPm: (Long, Long) = (800L, 950L)

  /** q288: ABC VALUE-CONCENTRATION CLASSES — per brand, its parts
    * ranked by revenue and cut into the classic A/B/C inventory
    * classes by CUMULATIVE share: a part is A while the share
    * accumulated BEFORE it is < 800 ‰, B while < 950 ‰, else C (the
    * prior-cumulative rule makes a dominant first part class A by
    * construction — the defined, engine-identical semantic). Per
    * (brand, class): part count and captured revenue share. The
    * concentration CUT the equal-count cuts can't express: q73's
    * deciles give every bucket the same population; ABC gives every
    * class the same VALUE meaning — "how few SKUs carry 80 % of the
    * brand" is the planner's question, and n_parts(A) answers it.
    *
    * Shape at 100 TB: one (brand, part) keyed hash-agg of the fact
    * table, then rank/cumulative windows INSIDE brand partitions of
    * ≤|catalog parts per brand| rows (dimension-bounded — the q272
    * grid argument), a 3-value class derivation, and a (brand, class)
    * re-agg. Ties rank (revenue desc, partkey asc). */
  def abcClasses(spark: SparkSession, d: String): DataFrame = {
    val pr = Tables.lineitem(spark, d).select(
        col("l_partkey").as("pk"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .join(Tables.part(spark, d).select(col("p_partkey"), col("p_brand")),
        col("pk") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"), col("pk"))
      .agg(sum(col("cents")).as("rev"))
    val w = Window.partitionBy(col("brand"))
      .orderBy(col("rev").desc, col("pk"))
    val tot = Window.partitionBy(col("brand"))
    val (aBar, bBar) = AbcBarsPm
    pr.withColumn("cum", sum(col("rev")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("brand_rev", sum(col("rev")).over(tot))
      .withColumn("prev_pm",
        expr("(1000 * (cum - rev)) div brand_rev"))
      .withColumn("cls",
        when(col("prev_pm") < aBar, "A")
          .when(col("prev_pm") < bBar, "B").otherwise("C"))
      .groupBy(col("brand"), col("cls"))
      .agg(count(lit(1)).as("n_parts"), sum(col("rev")).as("class_rev_cents"),
        max(col("brand_rev")).as("br"))
      .withColumn("share_pm", expr("(1000 * class_rev_cents) div br"))
      .select(col("brand"), col("cls"), col("n_parts"),
        col("class_rev_cents"), col("share_pm"))
      .orderBy(col("brand"), col("cls"))
  }

  /** Ceiling integer square root — the q157 corrected floor-isqrt
    * shifted to the CONSERVATIVE side: for a subtracted radical a
    * floor would bias the bound optimistic, ceil keeps "lower bound"
    * honest. Exact for n < 2⁵³ (IEEE sqrt is correctly rounded). */
  private def ceilSqrt(n: Column): Column = {
    val s0 = floor(sqrt(n.cast("double"))).cast("long")
    val s1 = when(s0 * s0 > n, s0 - 1L).otherwise(s0)
    val fl = when((s1 + 1L) * (s1 + 1L) <= n, s1 + 1L).otherwise(s1)
    when(fl * fl === n, fl).otherwise(fl + 1L)
  }

  /** q289: WILSON LOWER-BOUND QUALITY RANKING — per supplier, the
    * non-return rate of its line items and the Wilson score interval's
    * lower bound at z = 2 (~95 %), both in ppm: the small-sample-fair
    * ranking statistic ("sort by lower confidence bound", the
    * canonical fix for a 2/2 supplier outranking a 4980/5000 one).
    * With s successes of n and z² = 4 the bound is
    * (n(s+2) − 2·√(n(s(n−s)+n))) / (n(n+4)) — ONE radical, taken with
    * the CEILING isqrt so the floor bias lands on the conservative
    * side, then one floored division, clamped at 0 (tiny-n underflow).
    * Both engines replay the identical corrected-sqrt arithmetic (the
    * q157 isqrt discipline, α = 1/2 case).
    *
    * Shape at 100 TB: ONE supplier-keyed hash-agg of the fact table,
    * then row-local arithmetic on |suppliers| dimension rows — no
    * window, no sort but presentation. Radicand n·(s(n−s)+n) ~ n³:
    * exact in the double-seeded isqrt to n ~ 2·10⁶ lines/supplier —
    * past that route the radicand DECIMAL(38,0) and seed from its
    * double cast (documented, not needed at any test SF). */
  def wilsonRanking(spark: SparkSession, d: String): DataFrame = {
    Tables.lineitem(spark, d)
      .groupBy(col("l_suppkey").as("suppkey"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("l_returnflag") =!= "R", 1L).otherwise(0L)).as("n_ok"))
      .withColumn("rad",
        ceilSqrt(expr("n_lines * (n_ok * (n_lines - n_ok) + n_lines)")))
      .select(col("suppkey"), col("n_lines"), col("n_ok"),
        expr("(1000000 * n_ok) div n_lines").as("rate_ppm"),
        greatest(lit(0L), expr(
          "(1000000 * (n_lines * (n_ok + 2) - 2 * rad))" +
            " div (n_lines * (n_lines + 4))")).as("wilson_lb_ppm"))
      .orderBy(col("suppkey"))
  }

  /** q292: SESSION TRANSITION IMPURITY — per antecedent event type,
    * the Gini impurity (ppm) of its within-session NEXT-event
    * distribution, plus the modal next step and its share: how
    * PREDICTABLE each state is. Impurity 0 = the flow is a corridor
    * (prefetch/precompute the next screen); near the (k−1)/k ceiling
    * = a hub where prediction is pointless. The entropy-style
    * question asked WITHOUT logarithms (the no-cross-engine-ln
    * discipline): Gini = 1 − Σp² is exact in ONE cross-multiplied
    * division, (n² − Σc²)·10⁶ div n². q181 mines the popular PATHS;
    * this scores each state's fan-out as a distribution. Modal ties
    * break to the lexicographically smallest next type via
    * min(struct(−c, nxt)).
    *
    * Shape at 100 TB: the q19/q181 session chain (user-keyed windows)
    * collapses to |types|² transition counts in one keyed hash-agg;
    * everything after is alphabet-bounded. Σc² exact in BIGINT to
    * ~3·10⁹ transitions per pair — DECIMAL(38,0) past that (q91). */
  def transitionImpurity(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val ws = Window.partitionBy(col("user_id"), col("sid"))
      .orderBy(col("ts"), col("event_id"))
    val counts = eventsNs(spark, d)
      .withColumn("prev_ns", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ns").isNull ||
          col("ts") - col("prev_ns") > 1800000000000L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("nxt", lead(col("event_type"), 1).over(ws))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("ante"), col("nxt"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col("ante"))
      .agg(sum(col("c")).as("n_transitions"),
        count(lit(1)).as("n_next_types"),
        sum(expr("c * c")).as("ssq"),
        min(struct((-col("c")).as("nc"), col("nxt"))).as("m"))
      .select(col("ante"), col("n_transitions"), col("n_next_types"),
        expr("(1000000 * (n_transitions * n_transitions - ssq))" +
          " div (n_transitions * n_transitions)").as("gini_ppm"),
        col("m.nxt").as("top_next"),
        expr("(1000 * (-m.nc)) div n_transitions").as("top_share_pm"))
      .orderBy(col("ante"))
  }

  /** q293: QUALITY × DUPLICATION ASSOCIATION — does repetitive text
    * (low unique-token ratio, the q29 uniqueness signal integerized)
    * duplicate more? Per uniqueness band: docs, near-dup members
    * (q49 cluster_n ≥ 2), dup rate, and the relative risk vs the
    * corpus base rate as ONE cross-multiplied milli ratio
    * (1000·dup_b·N) div (n_b·D). The curation composition q29 and
    * q49 each leave implicit: if risk falls monotonically with
    * uniqueness, a repetition filter IS a cheap pre-dedup — and the
    * table is the evidence either way.
    *
    * Shape at 100 TB: one row-local banding scan + the persisted
    * label join, a band-keyed agg, and the 1-row corpus totals
    * re-entering broadcast (the q62 scalar pattern). */
  def qualityDupAssociation(spark: SparkSession, d: String): DataFrame = {
    val t = split(col("text"), " ")
    val withTok = Tables.documentsDist(spark, d)
      .select(col("doc_id"), size(t).cast("long").as("nt"),
        size(array_distinct(t)).cast("long").as("uq"))
      .withColumn("uq_pm", expr("(1000 * uq) div nt"))
      .withColumn("band", expr("uq_pm div 100"))
    val labels = Dedup.nearDupClusters(spark, d)
      .select(col("doc_id"),
        when(col("cluster_n") >= 2L, 1L).otherwise(0L).as("dup"))
    val bands = withTok.join(labels, "doc_id")
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dup")).as("n_dups"))
    val tot = bands.agg(sum(col("n_docs")).as("nn"), sum(col("n_dups")).as("dd"))
    bands.crossJoin(broadcast(tot))
      .select(col("band"), col("n_docs"), col("n_dups"),
        expr("(1000 * n_dups) div n_docs").as("dup_rate_pm"),
        when(col("dd") === 0L, lit(0L))
          .otherwise(expr("(1000 * n_dups * nn) div (n_docs * dd)"))
          .as("risk_milli"))
      .orderBy(col("band"))
  }

  /** q294 SLA bar: ship lag beyond 90 days breaches. */
  val SlaBreachDays = 90L

  /** q294: PRIORITY SLA AUDIT — per order priority tier, the exact
    * P50/P90/max of ship lag (days from order date to line ship date)
    * and the share of lines past the 90-day bar: does the priority
    * field BUY anything? Percentiles are TYPE-1 (lower: first lag
    * whose cumulative count reaches (n+1) div 2 / (9n+9) div 10 — the
    * q272 no-interpolation discipline) computed over the per-tier lag
    * HISTOGRAM: lag days live on a bounded value grid (TPC-H ships
    * within ~4 months), so the cumulative runs inside tier partitions
    * of ≤|lag domain| rows — the q151/q188 bounded-histogram shape,
    * never a per-row rank.
    *
    * Shape at 100 TB: one (tier, lag) hash-agg of the fact join,
    * histogram cumulatives, a 5-row output. */
  def prioritySlaAudit(spark: SparkSession, d: String): DataFrame = {
    val lags = Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("ok"), col("l_shipdate"))
      .join(Tables.orders(spark, d)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("ok") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("lag"))
    val hist = lags.groupBy(col("priority"), col("lag"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("priority")).orderBy(col("lag"))
    val cum = hist
      .withColumn("cum", sum(col("c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("priority"))))
      .withColumn("r50", expr("(n + 1) div 2"))
      .withColumn("r90", expr("(9 * n + 9) div 10"))
    cum.groupBy(col("priority"))
      .agg(max(col("n")).as("n_lines"),
        min(when(col("cum") >= col("r50"), col("lag"))).as("p50_days"),
        min(when(col("cum") >= col("r90"), col("lag"))).as("p90_days"),
        max(col("lag")).as("max_days"),
        sum(when(col("lag") > SlaBreachDays, col("c")).otherwise(0L))
          .as("n_breach"))
      .withColumn("breach_pm", expr("(1000 * n_breach) div n_lines"))
      .select(col("priority"), col("n_lines"), col("p50_days"),
        col("p90_days"), col("max_days"), col("breach_pm"))
      .orderBy(col("priority"))
  }

  /** q297 resample count — 32 deterministic pseudo-replicas; the
    * 2nd/31st order statistics bracket ≈ 94 % of the resample mass. */
  val BootstrapB = 32

  /** q297: DETERMINISTIC POISSON-BOOTSTRAP CI — per market segment,
    * the mean order value with a resampling confidence band, computed
    * the only way a bootstrap CAN run on distributed data (Poisson
    * bootstrap: per-row independent weights, no global resample
    * index) and the only way one can be HASH-EXACT cross-engine: the
    * weight of order i in replica b is bit_count((polyhash(i:b) mod
    * P) mod 16) — four pseudo-uniform bits, Binomial(4, ½), a
    * mean-2 proxy for Poisson(1) whose scale cancels in the weighted
    * mean. 32 replicas, each mean ONE floored division of exact
    * integer sums; the band is the 2nd/31st order statistic of the
    * 32 means. The uncertainty-quantification primitive the whole
    * analytics family lacked: q07/q91 emit point estimates, this
    * emits "the mean is X ± how-sure".
    *
    * Shape at 100 TB: the 32× weight fan-out is row-local codegen
    * (one polyhash per (row, b)); per (segment, b) sums are one keyed
    * hash-agg (map-side combinable); ranking runs inside segment
    * partitions of exactly 32 rows. Nothing else scales. */
  def bootstrapCi(spark: SparkSession, d: String): DataFrame = {
    val base = orders(spark, d)
      .join(Tables.customer(spark, d)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"), col("o_orderkey").as("ok"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val fan = base.select(col("segment"), col("ok"), col("cents"),
        explode(sequence(lit(0), lit(BootstrapB - 1))).as("b"))
      .withColumn("w", bit_count(graft.functions.GraftFunctions.polyhash(
        concat(col("ok").cast("string"), lit(":"), col("b").cast("string")))
        % 16L).cast("long"))
    val means = fan.groupBy(col("segment"), col("b"))
      .agg(sum(col("w")).as("sw"),
        sum(expr("CAST(w AS DECIMAL(38,0)) * cents")).as("swx"))
      .filter(col("sw") > 0L)
      .select(col("segment"), col("b"),
        expr("CAST(swx div sw AS BIGINT)").as("mb"))
    val w32 = Window.partitionBy(col("segment"))
      .orderBy(col("mb"), col("b"))
    val ranked = means.withColumn("rn", row_number().over(w32))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_replicas"),
        min(when(col("rn") === 2, col("mb"))).as("boot_lo_cents"),
        min(when(col("rn") === BootstrapB - 1, col("mb"))).as("boot_hi_cents"))
    base.groupBy(col("segment"))
      .agg(count(lit(1)).as("n_orders"),
        expr("sum(cents) div count(1)").as("mean_cents"))
      .join(ranked, "segment")
      .select(col("segment"), col("n_orders"), col("mean_cents"),
        col("boot_lo_cents"), col("boot_hi_cents"),
        (col("boot_hi_cents") - col("boot_lo_cents")).as("band_cents"))
      .orderBy(col("segment"))
  }

  /** q298: REPEAT-PURCHASE LATENCY — per market segment, how many
    * customers ever came back and how fast: repeat share (pm) and the
    * exact P25/P50/P75 of days between a customer's FIRST and SECOND
    * order (type-1 lower ranks over the bounded gap-day histogram —
    * the q294 shape). The lifecycle question q223's survival curve
    * (time to CHURN) and q125's cohort retention (calendar-bucketed
    * activity) both skirt: the second purchase is THE activation
    * event a growth team prices.
    *
    * Shape at 100 TB: first/second order dates are one lag read
    * inside customer partitions; gaps collapse to the (segment, gap)
    * histogram; cumulatives run inside segment partitions of ≤|day
    * domain| rows. */
  def repeatLatency(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"),
      col("o_orderkey"))
    val firstTwo = orders(spark, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .withColumn("nxt", lead(col("o_orderdate"), 1).over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey").as("ck"),
        datediff(col("nxt"), col("o_orderdate")).cast("long").as("gap"))
    val seg = Tables.customer(spark, d)
      .select(col("c_custkey").as("ck"), col("c_mktsegment").as("segment"))
    val gaps = firstTwo.join(seg, "ck")
    val counts = gaps.groupBy(col("segment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("gap").isNotNull, 1L).otherwise(0L)).as("n_repeat"))
    val hist = gaps.filter(col("gap").isNotNull)
      .groupBy(col("segment"), col("gap")).agg(count(lit(1)).as("c"))
    val wg = Window.partitionBy(col("segment")).orderBy(col("gap"))
    val cum = hist
      .withColumn("cum", sum(col("c")).over(
        wg.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("segment"))))
    val pct = cum
      .withColumn("r25", expr("(n + 3) div 4"))
      .withColumn("r50", expr("(n + 1) div 2"))
      .withColumn("r75", expr("(3 * n + 3) div 4"))
      .groupBy(col("segment"))
      .agg(min(when(col("cum") >= col("r25"), col("gap"))).as("p25_days"),
        min(when(col("cum") >= col("r50"), col("gap"))).as("p50_days"),
        min(when(col("cum") >= col("r75"), col("gap"))).as("p75_days"))
    counts.join(pct, Seq("segment"), "left")
      .select(col("segment"), col("n_customers"), col("n_repeat"),
        expr("(1000 * n_repeat) div n_customers").as("repeat_pm"),
        col("p25_days"), col("p50_days"), col("p75_days"))
      .orderBy(col("segment"))
  }

  /** q301: CUSUM CHANGEPOINT — per event type, the single most likely
    * structural-break day of its daily volume: the classic offline
    * CUSUM statistic max_k |S_k − (k/n)·S_n| over the observed day
    * grid, kept exactly integral as |n·S_k − k·S_n| (cross-multiplied,
    * ties broken to the EARLIEST day), with the break's location, its
    * normalized height in permille (1000·maxdev / (n·S_n) — the
    * Kolmogorov-style drift share), and the mean daily rate before /
    * after the cut (milli-events/day). q133 flags pointwise 3σ
    * outlier DAYS against a stationary mean; this finds the REGIME
    * SHIFT a stationary-mean model is wrong about — the "feed changed
    * on day X" question an ingest operator actually asks. A
    * single-day series has dev ≡ 0 and reports its one day with a
    * NULL after-rate (div-NULL on both engines).
    *
    * Shape at 100 TB: one fact scan → (type, day) hash-agg; all
    * windows run INSIDE type partitions over the day grid (≤ days
    * rows each — value-domain-bounded, never corpus-sized); the
    * argmax is one more grid-bounded rank. n·S_k stays in Long until
    * ~10¹⁴ daily events × 10⁴ days; DECIMAL(38,0) past that. */
  def cusumChangepoint(spark: SparkSession, d: String): DataFrame = {
    val DayNs = 86400000000000L
    val cnt = Tables.eventsNs(spark, d)
      .select(col("event_type"), expr(s"ts div $DayNs").as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
    val dev = cnt
      .withColumn("k", row_number().over(wOrd).cast("long"))
      .withColumn("s", sum(col("n")).over(wCum))
      .withColumn("days", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("n")).over(wAll))
      .withColumn("dev", expr("abs(days * s - k * total)"))
    dev.withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("dev").desc, col("day"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("days").as("n_days"), col("total"),
        col("day").as("cut_day"), col("k").as("cut_k"),
        col("dev").as("dev_scaled"),
        expr("(1000 * dev) div (days * total)").as("cusum_pm"),
        expr("(1000 * s) div k").as("rate_before_milli"),
        expr("CASE WHEN k < days THEN (1000 * (total - s)) div (days - k) END")
          .as("rate_after_milli"))
      .orderBy(col("event_type"))
  }

  /** q302: MANN–WHITNEY RANK-SUM AUDIT — per order priority, does the
    * fulfillment lag (order → ship days, q294's measure) of RETURNED
    * line items stochastically dominate that of kept ones? The exact
    * doubled U statistic 2U = Σ_v a_v·(2·B(<v) + b_v) computed over
    * the bounded (priority, lag-day) histogram (a = returned counts,
    * b = kept, B(<v) = kept mass strictly below v — ties contribute
    * half, hence the doubling stays integral), the common-language
    * effect size U/(n₁n₂) in ppm (P[returned lag > kept lag] + ½ties
    * — 500000 = no effect), the signed deviation 2U − n₁n₂, and the
    * tie-corrected normal-approximation z² in milli via ONE
    * cross-multiplied division: z² = 3·(2U − n₁n₂)²·n·(n−1) /
    * (n₁·n₂·((n³−n) − Σ(t³−t))). A nonparametric two-sample test with
    * NO ranks materialized and no floats — only integer histogram
    * arithmetic crosses the engines, so the oracle replays it
    * bit-identically. q294 profiles lag quantiles per priority; this
    * TESTS whether the returned/kept populations differ. Degenerate
    * groups (either sample empty, or every lag tied) report NULL
    * effect/z² through the div-NULL path on both engines.
    *
    * Shape at 100 TB: one fact scan → (priority, lag) hash-agg; the
    * strictly-below cumulative is a window INSIDE priority partitions
    * over the lag grid (value-domain-bounded); the test statistics
    * are a |priorities|-row rollup. The z² numerator squares 2U−n₁n₂,
    * so it runs in DECIMAL(38,0) on the Spark side and HUGEINT in the
    * oracle — exact at any SF this engine benches; past ~10⁶ rows per
    * group the z² ceiling argument is moot anyway (any nonzero effect
    * is significant). */
  def rankSumShipLag(spark: SparkSession, d: String): DataFrame = {
    val lg = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d)
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        expr("CAST(datediff(l_shipdate, o_orderdate) AS BIGINT)").as("lag"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ret"))
    val h = lg.groupBy(col("priority"), col("lag"))
      .agg(sum(col("ret")).as("a"), sum(lit(1L) - col("ret")).as("b"))
    val wLt = Window.partitionBy(col("priority")).orderBy(col("lag"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = h.withColumn("blt", coalesce(sum(col("b")).over(wLt), lit(0L)))
    cum.groupBy(col("priority"))
      .agg(sum(col("a")).as("n_ret"), sum(col("b")).as("n_kept"),
        sum(expr("a * (2 * blt + b)")).as("u2"),
        sum(expr("(a + b) * (a + b) * (a + b) - (a + b)")).as("ties3"))
      .withColumn("n", col("n_ret") + col("n_kept"))
      .withColumn("dev2", expr("u2 - n_ret * n_kept"))
      .select(col("priority"), col("n_ret"), col("n_kept"), col("u2"),
        // DECIMAL(38,0) cross-multiply: 10⁶·u2 overflows Long at
        // ~9·10¹² pair-count (≈SF50 group sizes) and Spark would wrap
        // silently while the oracle errors — same discipline as z2
        expr("CAST((1000000 * CAST(u2 AS DECIMAL(38,0)))" +
          " div (2 * CAST(n_ret AS DECIMAL(38,0)) * n_kept) AS BIGINT)")
          .as("cles_ppm"),
        col("dev2"),
        expr("""CAST((3000 * CAST(dev2 AS DECIMAL(38,0)) * dev2 * n * (n - 1))
                div (CAST(n_ret AS DECIMAL(38,0)) * n_kept
                     * ((CAST(n AS DECIMAL(38,0)) * n * n - n) - ties3))
                AS BIGINT)""".stripMargin.replace("\n", " ")).as("z2_milli"))
      .orderBy(col("priority"))
  }

  /** q304: CHI-SQUARE INDEPENDENCE TEST — the general two-categorical
    * contingency audit the surface lacked: order priority × return
    * flag, per cell the observed count, the expected count in milli
    * (1000·R_i·C_j/n), and the χ² contribution in milli via ONE
    * cross-multiplied division 1000·(n·O − R·C)²/(n·R·C); plus the
    * global χ² (milli) and the normalized effect size Cramér's V² in
    * ppm (χ²/(n·(min(r,c)−1)) — squared so no root crosses the
    * engines), broadcast onto every cell row. q195 tests a mixture
    * against a FIXED target; q206 a 50:50 split ratio; this tests two
    * OBSERVED factors against each other — "does return behavior
    * depend on order priority?" — with both margins estimated, the
    * textbook (r−1)(c−1)-df setting. All integer: the squared
    * numerator runs in DECIMAL(38,0) / HUGEINT.
    *
    * Shape at 100 TB: one fact-join scan → (r, c)-cell hash-agg; the
    * margins and total derive from the ≤ r·c cell grid
    * (dimension-bounded — two window sums and a scalar), never from a
    * second fact pass. */
  def chisqIndependence(spark: SparkSession, d: String): DataFrame = {
    // cached: four consumers (both margins, the total, the cell join)
    // — one fact scan, not four
    val cells = CacheScope.cached(Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d)
          .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority").as("priority"),
        col("l_returnflag").as("returnflag"))
      .agg(count(lit(1)).as("o")))
    // margins/total from the r·c cell grid (dimension-bounded) — the
    // fact table is scanned exactly once, everything below is keyed
    // joins on the grid plus two one-row scalar broadcasts
    val rm = cells.groupBy(col("priority")).agg(sum(col("o")).as("r_tot"))
    val cm = cells.groupBy(col("returnflag")).agg(sum(col("o")).as("c_tot"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("priority")).as("r"),
      countDistinct(col("returnflag")).as("c"))
    val g = CacheScope.cached(cells
      .join(rm, "priority").join(cm, "returnflag")
      .crossJoin(broadcast(tot))
      .withColumn("contrib_milli", expr(
        """CAST((1000 * (CAST(n AS DECIMAL(38,0)) * o - CAST(r_tot AS DECIMAL(38,0)) * c_tot)
               * (CAST(n AS DECIMAL(38,0)) * o - CAST(r_tot AS DECIMAL(38,0)) * c_tot))
           div (CAST(n AS DECIMAL(38,0)) * r_tot * c_tot) AS BIGINT)"""
          .stripMargin.replace("\n", " "))))
    val chis = g.agg(sum(col("contrib_milli")).as("chisq_milli"))
    g.crossJoin(broadcast(chis))
      .select(col("priority"), col("returnflag"), col("o"),
        // DECIMAL(38,0) cross-multiply: 1000·R·C overflows Long at
        // ~3·10⁸ joined rows (≈SF50); keep the exact-parity contract
        // at any SF like contrib_milli does
        expr("CAST((1000 * CAST(r_tot AS DECIMAL(38,0)) * c_tot)" +
          " div n AS BIGINT)").as("expected_milli"),
        col("contrib_milli"), col("chisq_milli"),
        expr("(r - 1) * (c - 1)").as("df"),
        expr("(1000 * chisq_milli) div (n * (least(r, c) - 1))").as("v2_ppm"))
      .orderBy(col("priority"), col("returnflag"))
  }

  /** q305: EVENT OVERDISPERSION — per event type, is the daily volume
    * Poisson or bursty? The variance-to-mean ratio (index of
    * dispersion) in exact milli via ONE cross-multiplied division:
    * VMR = s²/x̄ = (n·Q − S²)/((n−1)·S) over the observed day grid
    * (n days, S total, Q sum of squares), the χ²_{n−1} dispersion
    * statistic D = (n−1)·VMR in milli, and a 3σ burst flag on the
    * EXACT integer inequality (n·Q − S² − (n−1)·S)² > 18·(n−1)·S²
    * (the squared form of D − (n−1) > 3·√(2(n−1)) — no root, no
    * float). VMR ≈ 1000 reads Poisson; ≫ 1000 is burst clustering,
    * ≪ 1000 is under-dispersed regularity. q133 flags which DAYS are
    * anomalous and q301 finds WHERE the level breaks; this scores the
    * process's hazard TYPE — the statistic a capacity planner needs
    * before assuming Poisson arrivals. Single-day series report NULL
    * VMR/D through the div-NULL path on both engines.
    *
    * Shape at 100 TB: one fact scan → (type, day) hash-agg → |types|
    * rollup; the flag's squared compare runs in DECIMAL(38,0) /
    * HUGEINT. */
  def eventOverdispersion(spark: SparkSession, d: String): DataFrame = {
    val DayNs = 86400000000000L
    Tables.eventsNs(spark, d)
      .select(col("event_type"), expr(s"ts div $DayNs").as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("days"), sum(col("n")).as("total"),
        sum(col("n") * col("n")).as("sumsq"))
      .withColumn("num", expr("days * sumsq - total * total"))
      .select(col("event_type"), col("days").as("n_days"), col("total"),
        expr("(1000 * num) div ((days - 1) * total)").as("vmr_milli"),
        expr("(1000 * num) div total").as("dispersion_milli"),
        expr("""CAST(CASE WHEN
              (CAST(num AS DECIMAL(38,0)) - (days - 1) * total)
                * (CAST(num AS DECIMAL(38,0)) - (days - 1) * total)
              > 18 * (CAST(days AS DECIMAL(38,0)) - 1) * total * total
            AND num > (days - 1) * total THEN 1 ELSE 0 END AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("burst_flag"))
      .orderBy(col("event_type"))
  }

  /** q306: MEDIAN BOOTSTRAP BAND — the q297 deterministic Poisson
    * bootstrap applied to a RANK statistic: per market segment, a
    * 32-replica confidence band for the MEDIAN first→second-order gap
    * (q298's activation-latency median). Each (customer, replica)
    * draws the same Binomial(4,1/2) polyhash weight as q297; a
    * replica's median is the type-1 lower weighted median over the
    * (segment, gap-day) histogram (first gap whose cumulative weight
    * reaches (W+1) div 2 — zero-weight replicas drop, mirroring
    * q297's sw > 0 guard); the band is the 2nd/31st order statistics
    * of the replica medians. Proves the bootstrap primitive
    * generalizes beyond linear statistics: means aggregate, medians
    * need the weighted-rank machinery — and the uncertainty of q298's
    * headline number is exactly what that report omits. Sparse
    * segments (< 31 nonzero replicas) report NULL endpoints rather
    * than fabricating coverage.
    *
    * Shape at 100 TB: the gap relation is one lag read inside
    * customer partitions (q298); the 32× fan-out collapses
    * immediately to the (segment, replica, gap-day) histogram
    * (value-domain × 32 bounded); medians and order statistics are
    * windows over that grid — never over facts. */
  def bootstrapMedianCi(spark: SparkSession, d: String): DataFrame = {
    val wOrd = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    // cached: the fan-out and the point-estimate histogram both
    // consume it — one orders scan, not two
    val gaps = CacheScope.cached(Tables.orders(spark, d)
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("nxt", lead(col("o_orderdate"), 1).over(wOrd))
      .filter(col("rn") === 1 && col("nxt").isNotNull)
      .select(col("o_custkey").as("ck"),
        expr("CAST(datediff(nxt, o_orderdate) AS BIGINT)").as("gap"))
      .join(Tables.customer(spark, d)
          .select(col("c_custkey"), col("c_mktsegment").as("segment")),
        col("ck") === col("c_custkey")))
    val fan = gaps.select(col("segment"), col("ck"), col("gap"),
        explode(sequence(lit(0), lit(BootstrapB - 1))).as("b"))
      .withColumn("w", bit_count(graft.functions.GraftFunctions.polyhash(
        concat(col("ck").cast("string"), lit(":"), col("b").cast("string")))
        % 16L).cast("long"))
    val hist = fan.groupBy(col("segment"), col("b"), col("gap"))
      .agg(sum(col("w")).as("c"))
    val wCum = Window.partitionBy(col("segment"), col("b")).orderBy(col("gap"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("segment"), col("b"))
    val med = hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("tw", sum(col("c")).over(wTot))
      .filter(col("tw") > 0L)
      .groupBy(col("segment"), col("b"))
      .agg(min(when(col("cum") >= expr("(tw + 1) div 2"), col("gap")))
        .as("med"))
    val band = med.withColumn("rn", row_number().over(
        Window.partitionBy(col("segment")).orderBy(col("med"), col("b"))))
      .groupBy(col("segment"))
      .agg(min(when(col("rn") === 2, col("med"))).as("boot_lo_days"),
        min(when(col("rn") === BootstrapB - 1, col("med")))
          .as("boot_hi_days"))
    val wSC = Window.partitionBy(col("segment")).orderBy(col("gap"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val point = gaps.groupBy(col("segment"), col("gap"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wSC))
      .withColumn("tw", sum(col("c")).over(Window.partitionBy(col("segment"))))
      .groupBy(col("segment"))
      .agg(sum(col("c")).as("n_gaps"),
        min(when(col("cum") >= expr("(tw + 1) div 2"), col("gap")))
          .as("med_days"))
    point.join(band, "segment")
      .select(col("segment"), col("n_gaps"), col("med_days"),
        col("boot_lo_days"), col("boot_hi_days"),
        (col("boot_hi_days") - col("boot_lo_days")).as("band_days"))
      .orderBy(col("segment"))
  }

  /** q308 administrative-censoring horizon (days): a customer with no
    * second order inside the horizon is censored AT the horizon, the
    * standard fixed-follow-up design. */
  val LogRankHorizonDays = 365L

  /** q308: LOG-RANK SURVIVAL TEST — do customers whose FIRST order was
    * urgent-priority (priority 1–2) repeat FASTER than the rest? The
    * classic two-sample censored-time test on q306's time-to-second-
    * order, 365-day administrative censoring: per event day t the
    * hypergeometric expected urgent-group events E₁ₜ = dₜ·n₁ₜ/nₜ and
    * variance dₜ·n₁ₜ·(nₜ−n₁ₜ)·(nₜ−dₜ)/(nₜ²(nₜ−1)), each FLOORED to
    * micro units per day (the statistic is DEFINED as this
    * integerization — both engines replay every floor); z² milli =
    * 1000·(10⁶·O₁ − ΣE₁)²/(10⁶·ΣV). q223's Kaplan–Meier DESCRIBES one
    * survival curve; this TESTS two against each other, respecting
    * censoring — the comparison a naive mean-gap t-test gets wrong
    * (censored customers vanish from a mean). The at-risk sets need no
    * per-customer walk: nₜ = N − events(< t) because administrative
    * censoring at the horizon keeps every non-event customer at risk
    * through every event day.
    *
    * Shape at 100 TB: the gap relation is the q298/q306 lag read; the
    * test statistic lives on the (event-day, d₁, d) grid — ≤ horizon
    * rows, collected and folded in exact BigInt on the driver (the
    * q240/q242 bounded-collect discipline; no partitionless window
    * anywhere). Zero-variance degenerate corpora report NULL z²
    * through the div-NULL path on both engines. */
  def logRankRepeat(spark: SparkSession, d: String): DataFrame = {
    val H = LogRankHorizonDays
    val wOrd = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    // Manual persist discipline (NOT CacheScope.cached): this operator
    // runs TWO sequential driver actions on `base` (tot.head, then the
    // event-day collect), and the CacheScope contract releases after the
    // FIRST completed action — cached() here would silently recompute
    // the full orders window scan for the second action. The returned
    // DataFrame is driver-built, so `base` is unpersisted directly once
    // both actions are done.
    val base = (Tables.orders(spark, d)
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("nxt", lead(col("o_orderdate"), 1).over(wOrd))
      .filter(col("rn") === 1)
      .select(
        expr("CASE WHEN CAST(substring(o_orderpriority, 1, 1) AS INT) <= 2" +
          " THEN 1L ELSE 0L END").as("g1"),
        expr(s"CASE WHEN nxt IS NOT NULL AND" +
          s" CAST(datediff(nxt, o_orderdate) AS BIGINT) <= $H" +
          s" THEN CAST(datediff(nxt, o_orderdate) AS BIGINT) END").as("t")))
      .persist()
    val tot = base.agg(sum(col("g1")).as("n1"), count(lit(1)).as("n"),
      sum(when(col("t").isNotNull, col("g1")).otherwise(0L)).as("ev1"),
      sum(when(col("t").isNotNull, 1L).otherwise(0L)).as("ev"))
      .head()
    val (n1, n, ev1, ev) =
      (tot.getLong(0), tot.getLong(1), tot.getLong(2), tot.getLong(3))
    // event-day grid: ≤ horizon rows — bounded collect, driver fold
    val days = base.filter(col("t").isNotNull)
      .groupBy(col("t")).agg(sum(col("g1")).as("d1"),
        count(lit(1)).as("dt"))
      .orderBy(col("t")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    base.unpersist()
    var cum1 = 0L
    var cum = 0L
    var e1mic = BigInt(0)
    var vmic = BigInt(0)
    days.foreach { case (_, d1, dt) =>
      val n1t = n1 - cum1
      val nt = n - cum
      e1mic += BigInt(1000000L) * dt * n1t / nt
      if (nt > 1)
        vmic += BigInt(1000000L) * dt * n1t * (nt - n1t) * (nt - dt) /
          (BigInt(nt) * nt * (nt - 1))
      cum1 += d1
      cum += dt
    }
    val delta = BigInt(1000000L) * ev1 - e1mic
    val z2 = if (vmic > 0)
      Some((BigInt(1000) * delta * delta / (BigInt(1000000L) * vmic)).toLong)
    else None
    val faster = delta.signum.toLong
    import spark.implicits._
    Seq((n1, n - n1, ev1, ev - ev1, e1mic.toLong, vmic.toLong, z2, faster))
      .toDF("n_urgent", "n_rest", "events_urgent", "events_rest",
        "e1_micro", "v_micro", "z2_milli", "urgent_faster")
  }

  /** q312: MARKOV NEXT-EVENT BACKTEST — the out-of-sample test q130's
    * transition matrix and q292's impurity both stop short of: train
    * the modal next-event predictor per antecedent on EVEN user ids,
    * score top-1 accuracy on ODD users' transitions, per antecedent
    * type, against the unconditional modal-event baseline (predicting
    * the train-majority next event regardless of antecedent). The
    * lift over baseline is the honest value of sequence conditioning
    * — q292 measures in-sample predictability, which inflates under
    * overfit; a held-out split cannot. Ties in the argmax break to
    * the lexicographically smallest event type (deterministic on both
    * engines); antecedents never seen in training predict nothing and
    * score misses — the honest cold-start accounting.
    *
    * Shape at 100 TB: transitions are one lead() inside user
    * partitions (q130's window); train counts collapse to the
    * |types|² grid; the predictor and baseline re-enter as
    * dimension-bounded broadcasts onto the test half's keyed scan. */
  def markovBacktest(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // cached: the train grid and the test evaluation both consume it
    val tr = CacheScope.cached(Tables.eventsNs(spark, d)
      .select(col("user_id"), col("event_type").as("from_type"),
        col("ts"), col("event_id"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(col("user_id"), col("from_type"), col("to_type"),
        (col("user_id") % 2 === 0).as("is_train")))
    val counts = tr.filter(col("is_train"))
      .groupBy(col("from_type"), col("to_type")).agg(count(lit(1)).as("n"))
    val pred = counts.withColumn("rn", row_number().over(
        Window.partitionBy(col("from_type"))
          .orderBy(col("n").desc, col("to_type"))))
      .filter(col("rn") === 1)
      .select(col("from_type"), col("to_type").as("predicted"),
        col("n").as("n_pred_train"))
    val base = counts.groupBy(col("to_type")).agg(sum(col("n")).as("nb"))
      .orderBy(col("nb").desc, col("to_type")).limit(1)
      .select(col("to_type").as("base_pred"))
    tr.filter(!col("is_train"))
      .join(broadcast(pred), Seq("from_type"), "left")
      .crossJoin(broadcast(base))
      .groupBy(col("from_type"))
      .agg(max(col("predicted")).as("predicted"),
        count(lit(1)).as("n_test"),
        sum(when(col("to_type") === col("predicted"), 1L).otherwise(0L))
          .as("n_hits"),
        sum(when(col("to_type") === col("base_pred"), 1L).otherwise(0L))
          .as("n_base_hits"))
      .select(col("from_type"), col("predicted"), col("n_test"),
        col("n_hits"), expr("(1000 * n_hits) div n_test").as("acc_pm"),
        col("n_base_hits"),
        expr("(1000 * n_base_hits) div n_test").as("base_acc_pm"),
        expr("(1000 * n_hits) div n_base_hits").as("lift_milli"))
      .orderBy(col("from_type"))
  }

  /** q315's fixed period boundary (ship date). */
  val PeriodSplitDate = "1998-07-01"

  /** q315: TWO-PROPORTION DRIFT TEST — per order priority, did the
    * return RATE move between the early and late shipping periods
    * (fixed boundary [[PeriodSplitDate]])? The classic pooled
    * two-proportion z² in exact milli via ONE cross-multiplied
    * division: z² = (x_a·n_b − x_b·n_a)²·n / (n_a·n_b·x·(n−x)) —
    * algebraically (p̂_a−p̂_b)²/(p̂(1−p̂)(1/n_a+1/n_b)) with every
    * denominator cleared, so no rate is ever materialized as a float.
    * The "did the metric move" primitive: q206 tests a 50:50 design
    * ratio, q289 bounds ONE proportion, q302 compares DISTRIBUTIONS —
    * this compares two observed proportions, the form a release
    * readout actually quotes. Degenerate slices (either period empty,
    * or x ∈ {0, n}) report NULL z² through the div-NULL path on both
    * engines.
    *
    * Shape at 100 TB: one fact-join scan → (priority, period)
    * hash-agg → |priorities| rollup; the squared numerator runs in
    * DECIMAL(38,0)/HUGEINT. */
  def returnRateDrift(spark: SparkSession, d: String): DataFrame = {
    Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d)
          .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        (col("l_shipdate") < lit(PeriodSplitDate).cast("timestamp"))
          .cast("long").as("early"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ret"))
      .groupBy(col("priority"))
      .agg(sum(col("early")).as("n_a"),
        sum(expr("early * ret")).as("x_a"),
        sum(expr("1 - early")).as("n_b"),
        sum(expr("(1 - early) * ret")).as("x_b"))
      .select(col("priority"), col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        expr("(1000 * x_a) div n_a").as("rate_a_pm"),
        expr("(1000 * x_b) div n_b").as("rate_b_pm"),
        expr("(1000 * x_a) div n_a - (1000 * x_b) div n_b").as("diff_pm"),
        expr("""CAST((1000 * CAST(x_a * n_b - x_b * n_a AS DECIMAL(38,0))
                     * (x_a * n_b - x_b * n_a) * (n_a + n_b))
                div (CAST(n_a AS DECIMAL(38,0)) * n_b * (x_a + x_b)
                     * (n_a + n_b - x_a - x_b)) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("z2_milli"))
      .orderBy(col("priority"))
  }

  /** q316's output cut. */
  val PriceDispersionTopK = 50

  /** q316: PART PRICE-DISPERSION AUDIT — per part the exact
    * coefficient-of-variation² of its observed unit price across
    * line items (cents via round(100·extendedprice) div quantity —
    * the defined integerization both engines replay), CV²_ppm =
    * 10⁶·(n·Σp² − S²)/S², plus supplier fan-out and min/max spread:
    * the procurement-arbitrage shortlist. q231 names each part's
    * CHEAPEST supplier, q230 indexes brand prices over TIME — this
    * ranks parts by how inconsistently the market prices them, the
    * signal that a price is negotiable. Top-K by dispersion
    * (deterministic (cv², part) order); single-quote parts report 0
    * dispersion, zero-price degenerates NULL via div-NULL.
    *
    * Shape at 100 TB: one fact scan → part-keyed hash-agg (moment
    * sums in DECIMAL(38,0)); the cut is TakeOrderedAndProject —
    * per-partition heaps, never a global sort. */
  def priceDispersion(spark: SparkSession, d: String): DataFrame = {
    Tables.lineitem(spark, d)
      .select(col("l_partkey").as("partkey"), col("l_suppkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)" +
          " div CAST(l_quantity AS BIGINT)").as("unit_cents"))
      .groupBy(col("partkey"))
      .agg(count(lit(1)).as("n_quotes"),
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        sum(col("unit_cents")).as("s"),
        sum(expr("CAST(unit_cents AS DECIMAL(38,0)) * unit_cents")).as("q"),
        min(col("unit_cents")).as("min_cents"),
        max(col("unit_cents")).as("max_cents"))
      .select(col("partkey"), col("n_quotes"), col("n_suppliers"),
        col("min_cents"), col("max_cents"),
        expr("""CAST((1000000 * (CAST(n_quotes AS DECIMAL(38,0)) * q
                     - CAST(s AS DECIMAL(38,0)) * s))
                div (CAST(s AS DECIMAL(38,0)) * s) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("cv2_ppm"),
        expr("(1000 * (max_cents - min_cents)) div min_cents")
          .as("spread_pm"))
      .orderBy(col("cv2_ppm").desc, col("partkey"))
      .limit(PriceDispersionTopK)
  }

  /** q319: KRUSKAL–WALLIS — does fulfillment lag differ across ALL
    * five order priorities at once? The k-sample generalization of
    * q302's two-sample Mann–Whitney: tie-averaged ranks over the
    * pooled (priority, lag-day) histogram via DOUBLED ranks (a tied
    * block spanning cumulative positions [c+1, c+t] has average rank
    * c + (t+1)/2, doubled 2c + t + 1 — integral), per-group doubled
    * rank sums S_j, and H = [3·ΣS_j²/n_j − 3N(N+1)²] / (N(N+1)) with
    * the tie correction H_c = H·(N³−N)/((N³−N) − Σ(t³−t)). The
    * statistic is DEFINED with two integer floors (per-group micro
    * contribution floor(10⁶·S_j²/n_j), then the milli division) —
    * both engines replay every floor, so parity is exact. All-tied
    * degenerate corpora report NULL H_c through the div-NULL path.
    *
    * Shape at 100 TB: one fact scan → (priority, lag) hash-agg; the
    * grid is value-domain-bounded (5 priorities × ~120 lag days), so
    * the rank fold is a bounded driver collect in exact BigInt (the
    * q308 discipline — no partitionless window anywhere). The
    * oracle's HUGEINT 10⁶·S_j² term caps exact SQL replay near SF10;
    * past that N any nonzero effect is significant anyway (the q302
    * ceiling argument). */
  def kruskalWallisLag(spark: SparkSession, d: String): DataFrame = {
    val grid = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d)
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority").as("priority"),
        expr("CAST(datediff(l_shipdate, o_orderdate) AS BIGINT)").as("lag"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // pooled doubled ranks over the lag value grid
    val byLag = grid.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val lags = byLag.keys.toSeq.sorted
    var cum = 0L
    var tieT = BigInt(0)
    val dr2 = scala.collection.mutable.Map.empty[Long, Long]
    lags.foreach { v =>
      val t = byLag(v)
      dr2(v) = 2 * cum + t + 1
      tieT += BigInt(t) * t * t - t
      cum += t
    }
    val n = BigInt(cum)
    val groups = grid.groupBy(_._1).toSeq.sortBy(_._1).map { case (p, g) =>
      val nj = g.map(_._3).sum
      val s2 = g.map(t => BigInt(t._3) * dr2(t._2)).sum
      (p, nj, s2)
    }
    val cSum = groups.map { case (_, nj, s2) => BigInt(1000000) * s2 * s2 / nj }.sum
    val num = (BigInt(3) * cSum - BigInt(3000000) * n * (n + 1) * (n + 1)).max(0)
    val hMilli = (num / (BigInt(1000) * n * (n + 1))).toLong
    val n3n = n * n * n - n
    val hcMilli = if (n3n > tieT)
      Some((BigInt(hMilli) * n3n / (n3n - tieT)).toLong) else None
    val df = (groups.size - 1).toLong
    import spark.implicits._
    groups.map { case (p, nj, s2) =>
      (p, nj, s2.toLong, (BigInt(500) * s2 / nj).toLong,
        hMilli, hcMilli, df)
    }.toDF("priority", "n", "rank_sum2", "mean_rank_milli",
      "h_milli", "hc_milli", "df")
      .orderBy(col("priority"))
  }

  /** q325 burst gap: two orders ≤ this many days apart chain into one
    * purchasing burst (the gaps-and-islands cut). */
  val BurstGapDays = 30L

  /** q320: WALD–WOLFOWITZ RUNS TEST — is the daily order volume
    * RANDOM over time, or do above-average and below-average days
    * clump? Binarize each observed day against the exact mean
    * (n·c_d vs S, strictly — days exactly at the mean drop, the
    * standard cut treatment), count runs R of consecutive same-signs,
    * and test against the exact permutation moments μ = 1 + 2n₁n₂/N,
    * σ² = 2n₁n₂(2n₁n₂−N)/(N²(N−1)): z² in milli via ONE
    * cross-multiplied division 1000·((R−1)N − 2n₁n₂)²·(N−1) /
    * (2n₁n₂·(2n₁n₂−N)). trend = sign((R−1)N − 2n₁n₂): negative means
    * FEWER runs than chance (momentum/clustering — the autocorrelated
    * regime q284 measures parametrically), positive means
    * oscillation. q301 finds WHERE the level breaks; this tests
    * whether the sequence is exchangeable AT ALL — the
    * model-free precondition check. Degenerate splits (n₁n₂ = 0 or
    * 2n₁n₂ ≤ N) report NULL z² via div-NULL on both engines.
    *
    * Shape at 100 TB: one orders scan → day hash-agg; the run fold is
    * a calendar-bounded driver collect in exact BigInt (the q308
    * discipline — no partitionless window). */
  def runsTestDaily(spark: SparkSession, d: String): DataFrame = {
    val days = Tables.orders(spark, d)
      .groupBy(col("o_orderdate").as("day"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("day"))
      .collect().map(r => (r.get(0).toString, r.getLong(1)))
    val nDays = days.length.toLong
    val s = days.map(_._2).sum
    // strictly above/below the exact mean; equals drop
    val signs = days.flatMap { case (_, c) =>
      val lhs = BigInt(nDays) * c
      if (lhs > s) Some(1) else if (lhs < s) Some(0) else None
    }
    val n1 = signs.count(_ == 1).toLong
    val n2 = signs.count(_ == 0).toLong
    val nn = n1 + n2
    val runs =
      if (signs.isEmpty) 0L
      else 1L + signs.sliding(2).count(p => p.length == 2 && p(0) != p(1))
    val dev = BigInt(runs - 1) * nn - BigInt(2) * n1 * n2
    val expMilli = if (nn > 0) Some(1000L + (BigInt(2000) * n1 * n2 / nn).toLong)
      else None
    val den = BigInt(2) * n1 * n2 * (BigInt(2) * n1 * n2 - nn)
    val z2Milli = if (den > 0)
      Some((BigInt(1000) * dev * dev * (nn - 1) / den).toLong) else None
    import spark.implicits._
    Seq((nDays, n1, n2, nn, runs, expMilli, z2Milli, dev.signum.toLong))
      .toDF("n_days", "n_above", "n_below", "n_kept", "runs",
        "expected_runs_milli", "z2_milli", "trend")
  }

  /** q321: COCHRAN–ARMITAGE TREND TEST — does the return RATE move
    * monotonically with order priority (ordinal scores w = 1..5 from
    * the priority prefix)? The χ²(1df) trend statistic on the 2×5
    * table: T = Σw_j·x_j − R·Σw_j·n_j/N, Var = R(N−R)(N·Σw_j²n_j −
    * (Σw_j n_j)²)/N³, z² = N·T²/Var — integerized as TWO floors
    * replayed on both engines: vN = Var_cross div N, then z²_milli =
    * 1000·T_cross² div vN (where T_cross = N·Σwx − R·Σwn and
    * Var_cross = R(N−R)(N·Σw²n − (Σwn)²), so z² = N·T²/Var exactly
    * up to the two floors). q304 tests ANY association (4 df); this
    * spends one df on the ORDERED alternative — the right test when
    * the factor is ordinal, with ~4× the power against monotone
    * drift. trend = sign(T_cross): positive means urgent orders
    * return MORE. Degenerate tables (all returned / none / one
    * group) report NULL via div-NULL on both engines.
    *
    * Shape at 100 TB: one fact scan → 5-row priority hash-agg →
    * driver BigInt fold (the q308 discipline). The oracle's HUGEINT
    * replay caps near SF30 (Var_cross ~ 25N⁴); same ceiling argument
    * as q302. */
  def trendTestReturns(spark: SparkSession, d: String): DataFrame = {
    val g = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d)
          .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("x"))
      .orderBy(col("priority"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val w = g.map { case (p, nj, xj) => (p, p.take(1).toLong, nj, xj) }
    val n = BigInt(w.map(_._3).sum)
    val rTot = BigInt(w.map(_._4).sum)
    val swx = w.map(t => BigInt(t._2) * t._4).sum
    val swn = w.map(t => BigInt(t._2) * t._3).sum
    val sw2n = w.map(t => BigInt(t._2) * t._2 * t._3).sum
    val tCross = n * swx - rTot * swn
    val varCross = rTot * (n - rTot) * (n * sw2n - swn * swn)
    val vN = if (n > 0) varCross / n else BigInt(0)
    val z2Milli = if (vN > 0)
      Some((BigInt(1000) * tCross * tCross / vN).toLong) else None
    import spark.implicits._
    w.toSeq.map { case (p, wj, nj, xj) =>
      (p, wj, nj, xj, 1000L * xj / nj, z2Milli, tCross.signum.toLong)
    }.toDF("priority", "w", "n", "x", "rate_pm", "z2_milli", "trend")
      .orderBy(col("priority"))
  }

  /** q322: SPEARMAN RANK CORRELATION (daily volume vs daily revenue)
    * — are busier order days also higher-revenue days MONOTONICALLY?
    * Tie-averaged ranks via the q319 doubled-rank construction on
    * each variable's own value grid, then the signed squared
    * correlation in ppm via ONE cross-multiplied floor (the q307
    * sign·square integerization — no square root crosses the
    * engines): ρ²_ppm = sign(cov)·10⁶·(nΣdxdy − ΣdxΣdy)² /
    * ((nΣdx²−(Σdx)²)(nΣdy²−(Σdy)²)). Kendall (q273) counts pair
    * inversions between two SERIES; Spearman here rank-correlates
    * two MEASURES of the same day — robust to the heavy right tail
    * that would dominate a Pearson fit. Constant series report NULL
    * via div-NULL on both engines.
    *
    * Shape at 100 TB: one orders scan → calendar-bounded day grid →
    * driver BigInt fold (the q308 discipline); revenue integerized to
    * cents at the scan so the grid is exact. */
  def spearmanDaily(spark: SparkSession, d: String): DataFrame = {
    val days = Tables.orders(spark, d)
      .groupBy(col("o_orderdate").as("day"))
      .agg(count(lit(1)).as("x"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("y"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val n = BigInt(days.length)
    // doubled tie-averaged ranks per variable
    def dranks(vs: Array[Long]): Array[BigInt] = {
      val byV = vs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      var cum = 0L
      val dr = scala.collection.mutable.Map.empty[Long, BigInt]
      byV.keys.toSeq.sorted.foreach { v =>
        val t = byV(v)
        dr(v) = BigInt(2 * cum + t + 1)
        cum += t
      }
      vs.map(dr)
    }
    val dx = dranks(days.map(_._1))
    val dy = dranks(days.map(_._2))
    val sx = dx.sum; val sy = dy.sum
    val sxy = dx.zip(dy).map { case (a, b) => a * b }.sum
    val sxx = dx.map(a => a * a).sum
    val syy = dy.map(a => a * a).sum
    val cov = n * sxy - sx * sy
    val vx = n * sxx - sx * sx
    val vy = n * syy - sy * sy
    val rho2 = if (vx > 0 && vy > 0)
      Some((BigInt(cov.signum) * (BigInt(1000000) * cov * cov / (vx * vy))).toLong)
    else None
    import spark.implicits._
    Seq((n.toLong, cov.signum.toLong, rho2))
      .toDF("n_days", "direction", "rho2_ppm")
  }

  /** q324: SUPPLY-CONCENTRATION HHI — per nation, the Herfindahl–
    * Hirschman index of supplier revenue shares in ppm (Σ s_i² —
    * 10⁶ = monopoly, 10⁶/k = k equal suppliers), the top supplier's
    * share, and the equivalent-supplier count 10⁶ div HHI (the
    * "effective number of suppliers", the concentration dual of
    * q287's effective mixture size). One cross-multiplied floor:
    * HHI_ppm = 10⁶·Σr_i² div (Σr_i)² in DECIMAL(38,0)/HUGEINT —
    * revenue integerized to cents at the scan. q232 measures
    * inequality of DOCUMENT lengths (Gini); this is the
    * antitrust-standard concentration index on the supply graph —
    * the single-source-risk audit a procurement pipeline runs.
    *
    * Shape at 100 TB: one fact scan → (nation, supplier) hash-agg →
    * nation rollup; the supplier dimension join broadcasts. No
    * window, no second fact pass. */
  def supplyHhi(spark: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(spark, d)
      .join(broadcast(Tables.supplier(spark, d)
          .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"), col("s_suppkey"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("r"))
    rev.groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"), sum(col("r")).as("total_cents"),
        sum(expr("CAST(r AS DECIMAL(38,0)) * r")).as("rr"),
        max(col("r")).as("top_cents"))
      .join(broadcast(Tables.nation(spark, d)
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("n_suppliers"),
        col("total_cents"),
        expr("""CAST((1000000 * rr) div
               (CAST(total_cents AS DECIMAL(38,0)) * total_cents) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("hhi_ppm"),
        // DECIMAL(38,0) like hhi_ppm in the same select: raw-Long
        // 10⁶·top_cents would silently wrap past ~9e12 supplier
        // cents while the oracle's HUGEINT raises — asymmetric.
        expr("CAST((1000000 * CAST(top_cents AS DECIMAL(38,0)))" +
          " div total_cents AS BIGINT)").as("top_share_ppm"))
      .withColumn("effective_suppliers_milli",
        expr("CASE WHEN hhi_ppm > 0 THEN (1000000000 div hhi_ppm) END"))
      .orderBy(col("nation"))
  }

  /** q328: CRAMÉR'S V MATRIX — the pairwise association strength
    * between ALL categorical dimensions of the order fact (priority,
    * return flag, market segment, line status) in one audit: per
    * column pair the
    * contingency r×c, the q304 per-cell-floored χ² in milli, and the
    * bias-free strength V² = χ²/(N·(min(r,c)−1)) in ppm. This is the
    * categorical correlation matrix a feature auditor reads before
    * one-hot encoding (the reference one-hots exactly these
    * alphabet-bounded columns — pb_etl/tasks.py:244-258): V² ≈ 0
    * columns are independent signals, V² near 10⁶ means one column is
    * a function of the other and its encoding is redundant.
    *
    * Shape at 100 TB: ONE fact scan → the 4-D categorical cube
    * (alphabet-bounded, ≤ 5·2·5·2 cells; the segment dimension joins
    * broadcast through orders); every pairwise margin,
    * total, and χ² folds from the cube grid on the driver in exact
    * BigInt (the q308 bounded-collect discipline) — 6 pairwise
    * audits for one scan, never 6. */
  def cramersVMatrix(spark: SparkSession, d: String): DataFrame = {
    val cells = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, d)
          .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority").as("priority"),
        col("l_returnflag").as("returnflag"),
        col("c_mktsegment").as("segment"),
        col("l_linestatus").as("linestatus"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (Map(
        "priority" -> r.getString(0), "returnflag" -> r.getString(1),
        "segment" -> r.getString(2), "linestatus" -> r.getString(3)),
        r.getLong(4)))
    val colsOrder = Seq("priority", "returnflag", "segment", "linestatus")
    val pairs = for {
      i <- colsOrder.indices; j <- colsOrder.indices if i < j
    } yield (colsOrder(i), colsOrder(j))
    val rows = pairs.map { case (ca, cb) =>
      val g = cells.groupBy(t => (t._1(ca), t._1(cb))).view
        .mapValues(_.map(_._2).sum).toMap
      val rm = g.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      val cm = g.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
      val n = BigInt(g.values.sum)
      val chi2 = g.map { case ((va, vb), o) =>
        val dev = n * o - BigInt(rm(va)) * cm(vb)
        BigInt(1000) * dev * dev / (n * rm(va) * cm(vb))
      }.sum
      val minDim = BigInt(math.min(rm.size, cm.size) - 1)
      val v2 = if (minDim > 0) Some((BigInt(1000) * chi2 / (n * minDim)).toLong)
        else None
      (ca, cb, rm.size.toLong, cm.size.toLong, n.toLong, chi2.toLong, v2)
    }
    import spark.implicits._
    rows.toDF("col_a", "col_b", "r", "c", "n", "chi2_milli", "v2_ppm")
      .orderBy(col("col_a"), col("col_b"))
  }

  /** q329 liveness window width (ns): the volumeMonitor deployment
    * window — 10 minutes. */
  val LivenessWinNs = 600L * 1000000000L

  /** q329: FEED-LIVENESS AUDIT — the batch operator the q305-family
    * stream monitor CANNOT be (EventStream.volumeMonitor's documented
    * blind spot): a completely dead feed emits NO rows, so deadness
    * is only detectable by joining observed windows against the
    * EXPECTED window spine. Build the full (event_type × 10-minute
    * window) grid over the observed time range, left-join the
    * observed counts, and report per type the dead-window count,
    * dead share, and the LONGEST dead streak (gaps-and-islands via
    * the win − row_number constancy trick, q325's construction).
    * longest_dead_streak × 10 min is the worst undetected outage the
    * stream monitor would have paged zero times for.
    *
    * Shape at 100 TB: one events scan → (type, window) hash-agg; the
    * spine is |types| × calendar-bounded windows (a one-row min/max
    * scalar broadcast + sequence explode — never a second fact
    * scan); streak windows partition by event_type. */
  def feedLiveness(spark: SparkSession, d: String): DataFrame = {
    val ev = eventsNs(spark, d)
      .select(col("event_type"), expr(s"ts div $LivenessWinNs").as("win"))
    val counts = ev.groupBy(col("event_type"), col("win"))
      .agg(count(lit(1)).as("n"))
    val range = ev.agg(min(col("win")).as("mn"), max(col("win")).as("mx"))
    val spine = ev.select(col("event_type")).distinct()
      .crossJoin(broadcast(range))
      .select(col("event_type"),
        explode(expr("sequence(mn, mx)")).as("win"))
    val grid = spine.join(counts, Seq("event_type", "win"), "left")
      .withColumn("dead", col("n").isNull.cast("long"))
    val wt = Window.partitionBy(col("event_type")).orderBy(col("win"))
    val streaks = grid.filter(col("dead") === 1L)
      .withColumn("grp", col("win") - row_number().over(wt))
      .groupBy(col("event_type"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("event_type"))
      .agg(max(col("len")).as("longest_dead_streak"))
    grid.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_windows"),
        sum(lit(1L) - col("dead")).as("n_live"),
        sum(col("dead")).as("n_dead"))
      .join(streaks, Seq("event_type"), "left")
      .select(col("event_type"), col("n_windows"), col("n_live"),
        col("n_dead"),
        expr("(1000 * n_dead) div n_windows").as("dead_share_pm"),
        coalesce(col("longest_dead_streak"), lit(0L))
          .as("longest_dead_streak"))
      .orderBy(col("event_type"))
  }

  /** q330 exposure cut: a line item ordering at least this many units
    * counts as a HIGH-quantity exposure. */
  val MhQtyCut = 25L

  /** q330: MANTEL–HAENSZEL STRATIFIED ODDS RATIO — does HIGH-quantity
    * ordering associate with returns AFTER controlling for priority?
    * Per stratum (priority) the 2×2 [high/low × returned/kept], the
    * per-stratum odds ratio, then the MH pooled estimate OR_MH =
    * Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ) and the CMH χ²(1df) with the q308
    * hypergeometric moments — every per-stratum term FLOORED to micro
    * units (the statistic is DEFINED as this integerization; both
    * engines replay each floor). The confounding-proof version of a
    * naive 2×2: if priority drives both quantity and returns, the
    * crude OR lies and MH doesn't — the warehouse twin of the
    * epidemiologist's adjusted risk audit. Degenerate strata
    * contribute their floors; all-degenerate tables report NULL
    * via div-NULL on both engines.
    *
    * Shape at 100 TB: one fact scan → 5-row priority hash-agg →
    * grid-bounded arithmetic (scalar broadcast of the 1-row pooled
    * sums back onto the stratum rows). The CMH square runs in
    * DECIMAL(38,0)/HUGEINT; the variance product caps exact oracle
    * replay near SF100. */
  def mantelHaenszel(spark: SparkSession, d: String): DataFrame = {
    val s = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d)
          .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        (col("l_quantity") >= MhQtyCut).cast("long").as("hi"),
        (col("l_returnflag") === "R").cast("long").as("ret"))
      .groupBy(col("priority"))
      .agg(sum(expr("hi * ret")).as("a"),
        sum(expr("hi * (1 - ret)")).as("b"),
        sum(expr("(1 - hi) * ret")).as("cc"),
        sum(expr("(1 - hi) * (1 - ret)")).as("dd"))
      .withColumn("n", expr("a + b + cc + dd"))
      .withColumn("num_micro", expr(
        "(1000000 * CAST(a AS DECIMAL(38,0)) * dd) div n"))
      .withColumn("den_micro", expr(
        "(1000000 * CAST(b AS DECIMAL(38,0)) * cc) div n"))
      .withColumn("e_micro", expr(
        "(1000000 * CAST(a + b AS DECIMAL(38,0)) * (a + cc)) div n"))
      .withColumn("v_micro", expr(
        """CAST((1000000 * CAST(a + b AS DECIMAL(38,0)) * (cc + dd)
               * (a + cc) * (b + dd))
           div (CAST(n AS DECIMAL(38,0)) * n * (n - 1)) AS DECIMAL(38,0))"""
          .stripMargin.replace("\n", " ")))
    val g = s.agg(sum(col("a")).as("sa"), sum(col("num_micro")).as("sn"),
      sum(col("den_micro")).as("sd"), sum(col("e_micro")).as("se"),
      sum(col("v_micro")).as("sv"))
    s.crossJoin(broadcast(g))
      .select(col("priority"), col("a"), col("b"), col("cc").as("c"),
        col("dd").as("d"),
        expr("CASE WHEN b * cc > 0 THEN" +
          " (1000 * CAST(a AS DECIMAL(38,0)) * dd)" +
          " div (CAST(b AS DECIMAL(38,0)) * cc) END")
          .cast("long").as("or_stratum_milli"),
        expr("CASE WHEN sd > 0 THEN CAST((1000 * sn) div sd AS BIGINT) END")
          .as("or_mh_milli"),
        expr("""CASE WHEN sv > 0 THEN
             CAST((1000 * (1000000 * CAST(sa AS DECIMAL(38,0)) - se)
                  * (1000000 * CAST(sa AS DECIMAL(38,0)) - se))
               div (1000000 * sv) AS BIGINT) END"""
          .stripMargin.replace("\n", " ")).as("cmh_milli"),
        expr("CAST(sign(1000000 * CAST(sa AS DECIMAL(38,0)) - se) AS BIGINT)")
          .as("direction"))
      .orderBy(col("priority"))
  }

  /** q331: EXACT SKEWNESS / KURTOSIS of fulfillment lag per priority —
    * the 3rd/4th-moment profile q91 stops short of. Central power
    * sums from raw power sums (A₂ = nΣx²−S², A₃ = n²Σx³−3nSΣx²+2S³,
    * A₄ = n³Σx⁴−4n²SΣx³+6nS²Σx²−3S⁴ — each EXACTLY n^k·Σ(x−μ)^k in
    * integers), then the signed squared skewness b₁ = A₃²/A₂³ in
    * milli via the magnitude-safe two-floor chain (a₃ = A₃ div n,
    * a₂ = A₂ div n, then 1000·(a₃² div n) div a₂³ — keeps every
    * intermediate under DECIMAL(38,0) where the raw square would
    * overflow at bench SFs) and kurtosis A₄/A₂² in milli (3000 =
    * mesokurtic). Right-skewed, heavy-tailed lag distributions are
    * the SLA-planning reality a variance-only profile (q91/q294)
    * hides. Degenerate (constant-lag) groups report NULLs via
    * div-NULL on both engines.
    *
    * Shape at 100 TB: one fact scan → 5-row hash-agg of four power
    * sums in DECIMAL(38,0); everything after is row-local arithmetic
    * on 5 rows. */
  def lagMoments(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d)
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        expr("CAST(datediff(l_shipdate, o_orderdate) AS BIGINT)").as("x"))
      .groupBy(col("priority"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("p2"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x * x")).as("p3"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x * x * x")).as("p4"))
      .withColumn("a2", expr("n * p2 - CAST(s AS DECIMAL(38,0)) * s"))
      .withColumn("a3", expr(
        "CAST(n AS DECIMAL(38,0)) * n * p3" +
          " - 3 * CAST(n AS DECIMAL(38,0)) * s * p2" +
          " + 2 * CAST(s AS DECIMAL(38,0)) * s * s"))
      .withColumn("a4", expr(
        "CAST(n AS DECIMAL(38,0)) * n * n * p4" +
          " - 4 * CAST(n AS DECIMAL(38,0)) * n * s * p3" +
          " + 6 * CAST(n AS DECIMAL(38,0)) * s * s * p2" +
          " - 3 * CAST(s AS DECIMAL(38,0)) * s * s * s"))
      .select(col("priority"), col("n"),
        expr("(1000 * s) div n").as("mean_milli"),
        expr("CASE WHEN n > 0 THEN CAST((1000 * a2) div" +
          " (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT) END").as("var_milli"),
        // ratio-first two-floor chain: r = 10⁶·|A₃|/A₂ (Long-sized),
        // then b₁_milli = r²/(10⁹·A₂) — every intermediate fits
        // DECIMAL(38,0)/HUGEINT where the raw A₃² square would not;
        // integer CASE sign (never sign()-on-decimal, which detours
        // through DOUBLE)
        expr("""CASE WHEN a2 > 0 THEN CAST(
               (CASE WHEN a3 < 0 THEN -1 ELSE 1 END) *
               ((CAST((1000000 * abs(a3)) div a2 AS DECIMAL(38,0))
                 * ((1000000 * abs(a3)) div a2))
                div (1000000000 * a2))
             AS BIGINT) END""".stripMargin.replace("\n", " "))
          .as("skew2_milli"),
        // kurtosis via the same ratio-first two-floor discipline:
        // q = A₄ div A₂ (Long-sized ~5e17 at SF10 where 1000·A₄
        // would silently NULL past DECIMAL(38,0)), then
        // 1000·q div A₂ in DECIMAL. Two floors diverge from the
        // single floor only within 1000/A₂ ≈ 1e-14 milli of an
        // integer boundary, and the oracle runs the IDENTICAL
        // chain, so cross-engine equality is exact. SF ceiling
        // ~SF60: A₄ ≈ n⁴·m₄ itself crosses 38 digits near
        // per-priority n ≈ 4e7 — documented like q302/q346.
        expr("CASE WHEN a2 > 0 THEN CAST((1000 *" +
          " CAST(a4 div a2 AS DECIMAL(38,0))) div a2" +
          " AS BIGINT) END").as("kurt_milli"))
      .orderBy(col("priority"))

  /** q340: REVENUE CONCENTRATION (Lorenz points) — per market
    * segment, rank customers by lifetime revenue into within-segment
    * deciles and report each decile's customer count, revenue mass,
    * share, and the cumulative share from the top — the top-decile
    * concentration read ("the top 10% of customers carry X% of
    * revenue") that HHI (q324, supplier side) and Gini (q232,
    * document lengths) don't give at the customer grain. Decile cuts
    * are ntile over (revenue DESC, custkey) — the deterministic
    * tie-break makes the cut exact and oracle-replayable.
    *
    * Shape at 100 TB: one orders scan → customer hash-agg; BOTH
    * windows (ntile, cumulative) partition by segment — never global
    * (the q73 lesson); output is the fixed 5×10 grid. */
  def revenueConcentration(spark: SparkSession, d: String): DataFrame = {
    val cust = Tables.orders(spark, d)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .join(Tables.customer(spark, d)
          .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
    val wRank = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("cents").desc, col("o_custkey"))
    val deciles = cust
      .withColumn("decile", ntile(10).over(wRank).cast("long"))
      .groupBy(col("c_mktsegment").as("segment"), col("decile"))
      .agg(count(lit(1)).as("n_customers"), sum(col("cents")).as("cents"))
    val wCum = Window.partitionBy(col("segment")).orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wTot = Window.partitionBy(col("segment"))
    deciles
      .withColumn("cum_cents", sum(col("cents")).over(wCum))
      .withColumn("total_cents", sum(col("cents")).over(wTot))
      .select(col("segment"), col("decile"), col("n_customers"),
        col("cents"),
        expr("(1000 * cents) div total_cents").as("share_pm"),
        expr("(1000 * cum_cents) div total_cents").as("cum_share_pm"))
      .orderBy(col("segment"), col("decile"))
  }

  /** q341: DIFFERENCE-IN-DIFFERENCES — the causal-inference primitive
    * the test battery lacked: did urgent-priority line items' return
    * rate move DIFFERENTLY across the PeriodSplitDate break than the
    * rest's? DiD = (p₁₁ − p₁₀) − (p₀₁ − p₀₀) in exact ppm floors per
    * cell, with the linear-probability-model standard error
    * Var = Σ p̂ᵢ(1−p̂ᵢ)/nᵢ over the four cells (each cell's term one
    * micro-floored cross-multiply: 10¹²·x(n−x)/n³) and z² in milli.
    * q315 tests ONE group's drift; DiD nets out the common shock —
    * the difference between "returns rose" and "returns rose MORE
    * for urgent orders", which is the policy-relevant number.
    * Degenerate cells report NULL via div-NULL on both engines.
    *
    * Shape at 100 TB: one fact scan → the 2×2 (group, period) cell
    * grid → row-local arithmetic on 4 rows + a one-row scalar
    * broadcast back onto the cells. */
  def didReturns(spark: SparkSession, d: String): DataFrame = {
    val cells = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d)
          .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        expr("CASE WHEN CAST(substring(o_orderpriority, 1, 1) AS INT) <= 2" +
          " THEN 1L ELSE 0L END").as("grp"),
        expr(s"CASE WHEN l_shipdate < TIMESTAMP '$PeriodSplitDate'" +
          " THEN 0L ELSE 1L END").as("period"),
        expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END").as("ret"))
      .groupBy(col("grp"), col("period"))
      .agg(count(lit(1)).as("n"), sum(col("ret")).as("x"))
      .withColumn("rate_ppm", expr("(1000000 * x) div n"))
      .withColumn("var_micro", expr(
        """CAST((1000000000000 * CAST(x AS DECIMAL(38,0)) * (n - x))
           div (CAST(n AS DECIMAL(38,0)) * n * n) AS BIGINT)"""
          .stripMargin.replace("\n", " ")))
    val g = cells.agg(
      sum(expr("CASE WHEN grp = 1 AND period = 1 THEN rate_ppm ELSE 0 END"))
        .as("p11"),
      sum(expr("CASE WHEN grp = 1 AND period = 0 THEN rate_ppm ELSE 0 END"))
        .as("p10"),
      sum(expr("CASE WHEN grp = 0 AND period = 1 THEN rate_ppm ELSE 0 END"))
        .as("p01"),
      sum(expr("CASE WHEN grp = 0 AND period = 0 THEN rate_ppm ELSE 0 END"))
        .as("p00"),
      sum(col("var_micro")).as("var_sum"),
      min(col("n")).as("min_cell"))
    cells.crossJoin(broadcast(g))
      .select(col("grp"), col("period"), col("n"), col("x"),
        col("rate_ppm"),
        expr("(p11 - p10) - (p01 - p00)").as("did_ppm"),
        expr("""CASE WHEN var_sum > 0 AND min_cell > 0 THEN
             CAST((1000 * CAST((p11 - p10) - (p01 - p00) AS DECIMAL(38,0))
                  * ((p11 - p10) - (p01 - p00)))
               div var_sum AS BIGINT) END"""
          .stripMargin.replace("\n", " ")).as("z2_milli"))
      .orderBy(col("grp"), col("period"))
  }

  /** q342 design constants: two-sided α = 0.05 and 80% power — the
    * standard z quantiles in milli (1.960, 0.842), CONSTANTS of the
    * design, not data. */
  val PowerZAlphaMilli = 1960L
  val PowerZBetaMilli = 842L

  /** q342: EXPERIMENT SIZING (power analysis) — the PROSPECTIVE twin
    * of the whole retrospective battery: for every adjacent pair of
    * order priorities, the per-group sample size needed to detect
    * their OBSERVED return-rate difference at α = 0.05 two-sided with
    * 80% power: n = (z_α + z_β)² · (p₁(1−p₁) + p₂(1−p₂)) / (p₁−p₂)²
    * — one integer cross-multiply over ppm rates and milli z
    * constants (ceiling division: the reported n always suffices),
    * plus the feasibility verdict against the data actually on hand
    * (observed min(n₁,n₂) ≥ required ⇒ the battery's verdict on this
    * pair is POWERED; under it, a null result means nothing). No
    * distribution function crosses the engines — z values are fixed
    * design constants. Identical rates report NULL (no finite n
    * detects a zero difference).
    *
    * Shape at 100 TB: one fact scan → 5-row priority grid → 4
    * adjacent-pair rows of row-local arithmetic (a self-join on the
    * tiny grid). */
  def powerSampleSize(spark: SparkSession, d: String): DataFrame = {
    val g = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d)
          .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)")
        .as("w"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END"))
          .as("x"))
      .withColumn("p_ppm", expr("(1000000 * x) div n"))
    val z2 = (PowerZAlphaMilli + PowerZBetaMilli) *
      (PowerZAlphaMilli + PowerZBetaMilli) // milli² = 10⁻⁶ units
    g.as("a").join(g.as("b"), expr("b.w = a.w + 1"))
      .select(col("a.w").as("w_lo"), col("b.w").as("w_hi"),
        col("a.n").as("n_lo"), col("b.n").as("n_hi"),
        col("a.p_ppm").as("p_lo_ppm"), col("b.p_ppm").as("p_hi_ppm"),
        expr("a.p_ppm - b.p_ppm").as("delta_ppm"),
        // n = z²·(v1+v2)/δ²: z² in 10⁻⁶, v in ppm·(1−ppm)=10⁻¹²-scaled
        // units, δ² in ppm² — the 10⁻⁶·10⁻¹²/10⁻¹² scales cancel to
        // 10⁻⁶, so divide by 10⁶ last; ceiling so n always suffices
        expr(s"""CASE WHEN a.p_ppm <> b.p_ppm THEN CAST(
             (CAST($z2 AS DECIMAL(38,0))
               * (CAST(a.p_ppm AS DECIMAL(38,0)) * (1000000 - a.p_ppm)
                  + CAST(b.p_ppm AS DECIMAL(38,0)) * (1000000 - b.p_ppm))
               + CAST(a.p_ppm - b.p_ppm AS DECIMAL(38,0))
                 * (a.p_ppm - b.p_ppm) * 1000000 - 1)
             div (CAST(a.p_ppm - b.p_ppm AS DECIMAL(38,0))
                  * (a.p_ppm - b.p_ppm) * 1000000) AS BIGINT) END"""
          .stripMargin.replace("\n", " ")).as("n_required"),
        expr("""CASE WHEN a.p_ppm <> b.p_ppm THEN
             CASE WHEN least(a.n, b.n) >= CAST(
               (CAST(""" + z2 + """ AS DECIMAL(38,0))
                 * (CAST(a.p_ppm AS DECIMAL(38,0)) * (1000000 - a.p_ppm)
                    + CAST(b.p_ppm AS DECIMAL(38,0)) * (1000000 - b.p_ppm))
                 + CAST(a.p_ppm - b.p_ppm AS DECIMAL(38,0))
                   * (a.p_ppm - b.p_ppm) * 1000000 - 1)
               div (CAST(a.p_ppm - b.p_ppm AS DECIMAL(38,0))
                    * (a.p_ppm - b.p_ppm) * 1000000) AS BIGINT)
             THEN 1L ELSE 0L END END"""
          .stripMargin.replace("\n", " ")).as("powered"))
      .orderBy(col("w_lo"))
  }

  /** q346: CRAMÉR–VON MISES two-sample test — per order priority, the
    * WHOLE-CDF discrepancy between returned and kept fulfillment-lag
    * distributions: T = Σ_v t_v·(m·C₁(v) − n·C₂(v))² / (N²·n·m) over
    * the pooled (priority, lag) grid (C = cumulative counts, t_v =
    * pooled mass at v, N = n+m), reported in milli via ONE
    * cross-multiplied floor. The rank-sum (q302) detects LOCATION
    * shift and KS (q219's statistic) the single worst CDF gap; CvM
    * integrates the gap over the whole distribution — the test that
    * fires when two samples differ in SHAPE (variance, tails) with
    * equal medians. Degenerate groups (either sample empty) report
    * NULL via div-NULL on both engines.
    *
    * Shape at 100 TB: one fact scan → (priority, lag) hash-agg; both
    * cumulatives are windows INSIDE priority partitions over the
    * value-bounded lag grid; the statistic is a 5-row rollup. The
    * ppm-scaled square caps exact HUGEINT replay near SF50 (the q302
    * ceiling argument). */
  def cvmLag(spark: SparkSession, d: String): DataFrame = {
    val h = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d)
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority").as("priority"),
        expr("CAST(datediff(l_shipdate, o_orderdate) AS BIGINT)").as("lag"))
      .agg(sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END"))
        .as("a"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 0L ELSE 1L END"))
        .as("b"))
    val wCum = Window.partitionBy(col("priority")).orderBy(col("lag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col("priority"))
    h.withColumn("c1", sum(col("a")).over(wCum))
      .withColumn("c2", sum(col("b")).over(wCum))
      .withColumn("n", sum(col("a")).over(wAll))
      .withColumn("m", sum(col("b")).over(wAll))
      .withColumn("term", expr(
        """CAST(a + b AS DECIMAL(38,0))
           * (CAST(m AS DECIMAL(38,0)) * c1 - CAST(n AS DECIMAL(38,0)) * c2)
           * (CAST(m AS DECIMAL(38,0)) * c1 - CAST(n AS DECIMAL(38,0)) * c2)"""
          .stripMargin.replace("\n", " ")))
      .groupBy(col("priority"))
      .agg(max(col("n")).as("n_ret"), max(col("m")).as("n_kept"),
        sum(col("term")).as("tsum"))
      .select(col("priority"), col("n_ret"), col("n_kept"),
        expr("""CASE WHEN n_ret > 0 AND n_kept > 0 THEN CAST(
             (1000 * tsum) div
             (CAST(n_ret + n_kept AS DECIMAL(38,0)) * (n_ret + n_kept)
              * n_ret * n_kept) AS BIGINT) END"""
          .stripMargin.replace("\n", " ")).as("cvm_milli"))
      .orderBy(col("priority"))
  }

  /** q343: LITTLE'S LAW AUDIT (L = λ·W) — the queueing identity every
    * operations dashboard should reconcile and almost none does: over
    * the observed calendar, the arrival rate λ (line items ordered
    * per day, milli), the mean time-in-system W (order → ship days,
    * milli), and the mean work-in-progress L (items ordered but not
    * yet shipped, averaged over the day grid, milli) — then the
    * consistency ratio 1000·L/(λ·W). Exactly 1000 only on a closed
    * window; the deviation MEASURES the boundary effect (items in
    * flight at the edges), so the ratio is the audit: a dashboard
    * whose backlog, throughput, and latency tiles disagree by more
    * than the edge mass has a definition bug. All three quantities
    * fold exactly from per-day order/ship counts.
    *
    * Shape at 100 TB: one fact scan → TWO calendar-bounded day grids
    * (ordered-count and shipped-count per day) → driver BigInt fold
    * over the merged grid (the q308 discipline — the running backlog
    * is a prefix sum over ≤ a few thousand days, never a global
    * window over rows). */
  def littleLawAudit(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d)
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        expr("CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT)")
          .as("od"),
        expr("CAST(datediff(l_shipdate, DATE '1970-01-01') AS BIGINT)")
          .as("sd"))
    val grid = li.groupBy(col("od"), col("sd")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val d0 = grid.map(_._1).min
    val d1 = grid.flatMap(t => Seq(t._1, t._2)).max
    val days = d1 - d0 + 1
    val n = grid.map(_._3).sum
    val wSumDays = grid.map(t => BigInt(t._2 - t._1) * t._3).sum
    // backlog by sweep: arrivals at od, departures at sd (an item
    // ships on sd, so it is IN the system on every day in [od, sd))
    val delta = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    grid.foreach { case (od, sd, c) =>
      delta(od) += c
      delta(sd) -= c
    }
    var backlog = 0L
    var lSumItemDays = BigInt(0)
    (d0 to d1).foreach { day =>
      backlog += delta(day)
      lSumItemDays += backlog
    }
    val lambdaMilli = BigInt(1000) * n / days
    val wMilli = BigInt(1000) * wSumDays / n
    val lMilli = BigInt(1000) * lSumItemDays / days
    // ratio = 1000·L/(λ·W), both sides in milli → scale by 10⁶/10⁶
    val ratio = if (lambdaMilli > 0 && wMilli > 0)
      Some((BigInt(1000000) * lMilli / (lambdaMilli * wMilli)).toLong)
    else None
    import spark.implicits._
    Seq((days, n, lambdaMilli.toLong, wMilli.toLong, lMilli.toLong, ratio))
      .toDF("n_days", "n_items", "lambda_milli", "w_milli", "l_milli",
        "consistency_milli")
  }

  /** q339: SEMI-STRUCTURED SCHEMA DISCOVERY — enumerate the JSON keys
    * actually present in the events `props` payload, per event type:
    * presence counts and shares, and each type's key-set size. q87
    * extracts KNOWN paths through the variant type; this answers the
    * prior question — WHICH paths exist and how reliably — the
    * profiling step that decides a promotion-to-column list for an
    * ingest pipeline (a key present in ~100% of a type is a column;
    * a 1% key is a tail attribute left in the variant). Key
    * enumeration only (json_object_keys ↔ DuckDB json_keys): value
    * stringification never crosses the engines, so parity is exact.
    *
    * Shape at 100 TB: one events scan → per-row key explode (bounded
    * by payload key count) → (type, key) hash-agg; per-type totals
    * broadcast back onto the bounded key grid. */
  def propsSchema(spark: SparkSession, d: String): DataFrame = {
    val ev = eventsNs(spark, d).select(col("event_type"), col("props"))
    val keys = ev
      .select(col("event_type"),
        explode(expr("json_object_keys(props)")).as("key"))
      .groupBy(col("event_type"), col("key"))
      .agg(count(lit(1)).as("n_present"))
    val tot = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n_events"))
    val wt = Window.partitionBy(col("event_type"))
    keys.join(broadcast(tot), Seq("event_type"))
      .withColumn("n_keys", count(lit(1)).over(wt))
      .select(col("event_type"), col("key"), col("n_present"),
        col("n_events"),
        expr("(1000 * n_present) div n_events").as("present_share_pm"),
        col("n_keys"))
      .orderBy(col("event_type"), col("key"))
  }

  /** q335: OUT-OF-ORDERNESS / WATERMARK-PLANNING AUDIT — how late do
    * events arrive relative to the stream's high-water mark, per
    * event type? Arrival order is the event_id sequence (the
    * generator's emission order); each event's lateness is
    * max(ts among strictly-earlier arrivals) − ts, floored at 0.
    * Reported per type: the late share, the worst lateness, and the
    * P99 WATERMARK — the smallest whole-minute delay that would have
    * admitted ≥ 99% of events (smallest bucket with 100·cum ≥ 99·n
    * over the minute-bucket histogram). This is the measurement that
    * JUSTIFIES the `withWatermark` delays hard-coded in
    * streaming/DocStream and EventStream: a watermark below P99
    * silently drops the tail, one far above it bloats state — the
    * number every Structured Streaming deployment needs and almost
    * none measures.
    *
    * Shape at 100 TB: one events scan → per-type running-max window
    * (keyed by event_type, never global) → minute-bucket histogram
    * (value-domain-bounded) → in-type cumulative windows on the
    * bucket grid. */
  def oooLateness(spark: SparkSession, d: String): DataFrame = {
    val wArr = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = eventsNs(spark, d)
      .select(col("event_type"), col("event_id"), col("ts"))
      .withColumn("hwm", max(col("ts")).over(wArr))
      .withColumn("late_ns",
        greatest(coalesce(col("hwm") - col("ts"), lit(0L)), lit(0L)))
      .withColumn("late_min", expr("late_ns div 60000000000"))
    val hist = late.groupBy(col("event_type"), col("late_min"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("late_min"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col("event_type"))
    hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n_events"),
        sum(when(col("late_min") > 0L, col("c")).otherwise(0L))
          .as("n_late_1min"),
        max(col("late_min")).as("max_late_min"),
        min(when(expr("100 * cum >= 99 * n"), col("late_min")))
          .as("watermark_p99_min"))
      .select(col("event_type"), col("n_events"), col("n_late_1min"),
        expr("(1000 * n_late_1min) div n_events").as("late_share_pm"),
        col("max_late_min"), col("watermark_p99_min"))
      .orderBy(col("event_type"))
  }

  /** q332: WILCOXON SIGNED-RANK (repeat deceleration) — for every
    * customer with ≥ 3 orders, pair the FIRST repeat gap (order1→2)
    * against the SECOND (order2→3) and test whether repeat intervals
    * LENGTHEN — the paired test the unpaired battery (q302 MW-U)
    * cannot run, because the two gaps share the customer. Standard
    * treatment: zero differences drop, |diff| gets q319's doubled
    * tie-averaged ranks, W₂ = Σ ranks of positive diffs (doubled),
    * dev = W₂ − n(n+1)/2, tie-corrected z² in milli via ONE
    * cross-multiplied floor 12000·dev² / (2n(n+1)(2n+1) − Σ(t³−t)).
    * The one-row sign-test companion (1000·(n₊−n₋)²/(n₊+n₋)) reads
    * the direction alone. decel = sign(dev): positive means later
    * gaps rank longer — the cohort-level churn-onset signal q298's
    * latency histogram only describes.
    *
    * Shape at 100 TB: one orders scan → per-customer window (keyed,
    * never global) → 3-row conditional pivot per customer → the
    * calendar-bounded |diff|-day histogram → driver BigInt fold (the
    * q308 discipline). */
  def wilcoxonRepeat(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val hist = Tables.orders(spark, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .groupBy(col("o_custkey"))
      .agg(max(when(col("rn") === 1, col("o_orderdate"))).as("d1"),
        max(when(col("rn") === 2, col("o_orderdate"))).as("d2"),
        max(when(col("rn") === 3, col("o_orderdate"))).as("d3"))
      .filter(col("d3").isNotNull)
      .select(expr("CAST(datediff(d3, d2) - datediff(d2, d1) AS BIGINT)")
        .as("df"))
      .groupBy(col("df")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nZero = hist.collectFirst { case (0L, c) => c }.getOrElse(0L)
    val byAbs = hist.filter(_._1 != 0L).groupBy(t => math.abs(t._1))
      .view.mapValues { g =>
        (g.map(_._2).sum, g.collect { case (v, c) if v > 0 => c }.sum)
      }.toMap
    var cum = 0L
    var w2 = BigInt(0)
    var tie = BigInt(0)
    byAbs.keys.toSeq.sorted.foreach { v =>
      val (t, pos) = byAbs(v)
      val dr = 2 * cum + t + 1
      w2 += BigInt(pos) * dr
      tie += BigInt(t) * t * t - t
      cum += t
    }
    val n = BigInt(cum)
    val nPos = byAbs.values.map(_._2).sum
    val nNeg = cum - nPos
    val dev = w2 - n * (n + 1) / 2
    val den = BigInt(2) * n * (n + 1) * (2 * n + 1) - tie
    val z2 = if (den > 0 && n > 0)
      Some((BigInt(12000) * dev * dev / den).toLong) else None
    val signZ2 = if (cum > 0)
      Some((BigInt(1000) * (nPos - nNeg) * (nPos - nNeg) / cum).toLong)
    else None
    import spark.implicits._
    Seq((cum + nZero, nZero, nPos, nNeg, w2.toLong, dev.signum.toLong,
      z2, signZ2))
      .toDF("n_pairs", "n_zero", "n_pos", "n_neg", "w2", "decel",
        "z2_milli", "sign_z2_milli")
  }

  /** q333: FRIEDMAN TEST (day-of-week seasonality) — are the seven
    * weekdays exchangeable in daily order volume, BLOCKING on the
    * week? Each complete epoch-week is a block; within the block the
    * seven daily counts get q319's doubled tie-averaged ranks (rank()
    * gives 1 + #strictly-below, the block-and-value peer count gives
    * the tie size — dr = 2·(rank−1) + t + 1, all window arithmetic
    * inside 7-row blocks), and the tie-corrected statistic is
    * Q = (k−1)·Σ_j (R₂ⱼ − b(k+1))² / (Σ dr² − b·k·(k+1)²) in milli
    * via one cross-multiplied floor. Partial boundary weeks drop
    * (their missing days are structural zeros, not observations);
    * interior zero-order days COUNT as zeros via the spine. q319
    * compares independent groups; Friedman is its repeated-measures
    * twin — the test to run when every block sees every treatment,
    * which is exactly what weekly seasonality is. All-tied blocks
    * report NULL Q via div-NULL on both engines.
    *
    * Shape at 100 TB: one orders scan → calendar-bounded (week, dow)
    * grid; the spine is a one-row range scalar broadcast + sequence
    * explode; every window partitions by week (7-row partitions).
    * b and k are calendar constants — the statistic's size is
    * SF-invariant. */
  def friedmanDow(spark: SparkSession, d: String): DataFrame = {
    val counts = Tables.orders(spark, d)
      .select(expr("CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT)")
        .as("day"))
      .groupBy(expr("day div 7").as("week"), expr("day % 7").as("dow"))
      .agg(count(lit(1)).as("n"))
    val range = counts.agg((min(col("week")) + 1).as("w0"),
      (max(col("week")) - 1).as("w1"))
    // Degenerate guard: a corpus spanning < 3 epoch-weeks has
    // w0 = min+1 > w1 = max-1, where Spark's sequence() would count
    // DOWN (phantom weeks) while DuckDB generate_series returns
    // empty. greatest() + the week <= w1 filter makes both empty.
    val spine = broadcast(range)
      .select(explode(expr("sequence(w0, greatest(w0, w1))")).as("week"),
        col("w1"))
      .filter(col("week") <= col("w1")).drop("w1")
      .crossJoin(spark.range(7).select(col("id").as("dow")))
    val grid = spine.join(counts, Seq("week", "dow"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val wRank = Window.partitionBy(col("week"))
      .orderBy(col("n"))
    val wTie = Window.partitionBy(col("week"), col("n"))
    val ranked = grid
      .withColumn("rk", rank().over(wRank).cast("long"))
      .withColumn("t", count(lit(1)).over(wTie))
      .withColumn("dr", expr("2 * (rk - 1) + t + 1"))
    val perDow = ranked.groupBy(col("dow"))
      .agg(count(lit(1)).as("b"), sum(col("dr")).as("rank_sum2"))
      .withColumn("num_j", expr(
        """CAST((rank_sum2 - b * 8) AS DECIMAL(38,0))
           * (rank_sum2 - b * 8)""".stripMargin.replace("\n", " ")))
    // the one-row global: Σ num_j over dows and the tie-corrected
    // denominator Σdr² − b·k·(k+1)² (b from any dow — all equal by
    // the complete-spine construction)
    val glob = perDow.agg(sum(col("num_j")).as("num"),
      max(col("b")).as("bb"))
      .crossJoin(broadcast(ranked.agg(
        sum(expr("CAST(dr AS DECIMAL(38,0)) * dr")).as("sdr2"))))
      .select(col("num"),
        expr("sdr2 - CAST(bb AS DECIMAL(38,0)) * 7 * 64").as("den"))
    perDow.crossJoin(broadcast(glob))
      .select(col("dow"), col("b"), col("rank_sum2"),
        expr("(500 * rank_sum2) div b").as("mean_rank_milli"),
        expr("CASE WHEN den > 0 THEN" +
          " CAST((1000 * 6 * num) div den AS BIGINT) END").as("q_milli"),
        lit(6L).as("df"))
      .orderBy(col("dow"))
  }

  /** q325: ORDER BURSTS (gaps-and-islands) — chain each customer's
    * consecutive orders ≤ BurstGapDays apart into purchasing bursts
    * and profile the burst-length distribution per market segment.
    * The classic islands construction: a window lag per customer
    * marks burst starts (first order, or gap > cut), a running sum of
    * starts numbers the islands, one hash-agg sizes them. q298
    * measures the first-repeat GAP; this segments the whole history
    * into momentum episodes — the session analog (q19/q69) on the
    * ORDERS relation, where multi-order bursts are the
    * cross-sell/campaign signal.
    *
    * Shape at 100 TB: both windows partition by o_custkey (never
    * global), then two keyed hash-aggs; the segment dimension join
    * broadcasts. Output is the (segment, burst_len) grid. */
  def orderBursts(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val bursts = Tables.orders(spark, d)
      .withColumn("gap",
        expr("CAST(datediff(o_orderdate, lag(o_orderdate, 1) OVER" +
          " (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))" +
          " AS BIGINT)"))
      .withColumn("start",
        when(col("gap").isNull || col("gap") > BurstGapDays, 1L).otherwise(0L))
      .withColumn("burst_id", sum(col("start")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("o_custkey"), col("burst_id"))
      .agg(count(lit(1)).as("burst_len"))
    bursts
      .join(Tables.customer(spark, d)
          .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("burst_len"))
      .agg(count(lit(1)).as("n_bursts"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy(col("segment"), col("burst_len"))
  }
}
