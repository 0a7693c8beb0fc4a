package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All queries receive a scale-factor directory and read the parquet
  * directly — schema comes from parquet footers (explicit-at-scan, never
  * inferred from data; mirrors the reference's dtype discipline,
  * reference pb_etl/tasks.py:21-43).
  *
  * Scale notes: `lineitem`/`orders`/`events` are the fact tables (grow
  * with sf); `region`/`nation`/`supplier`/`part`/`customer` are dimension
  * tables small enough to broadcast at any realistic scale — join helpers
  * in Queries use `broadcast()` hints for them so the plans stay
  * shuffle-free on the dimension side at 100 TB.
  */
object Tables {
  val factTables = Seq("lineitem", "orders", "events", "documents", "embeddings")
  val dimTables  = Seq("region", "nation", "customer", "supplier", "part")
  val all: Seq[String] = factTables ++ dimTables

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no native
    * type for. Read it as a LongType of epoch-nanoseconds
    * (`nanosAsLong`) — integer nanos keep event-time arithmetic exact
    * (no micro truncation ambiguity vs the oracle's TIMESTAMP_NS), and
    * long comparisons stay inside whole-stage codegen.
    *
    * The `nanosAsLong` flag must be set at session build (see
    * `requireNanosAsLong` — Bench/Verify/SparkSpec all do); a loader
    * that silently flipped session config would be action-at-a-distance
    * for co-resident queries. */
  def eventsNs(spark: SparkSession, d: String): DataFrame = {
    requireNanosAsLong(spark)
    spark.read.parquet(s"$d/events.parquet")
  }

  /** Fail fast with a pointer at the session-builder fix rather than
    * letting the parquet reader throw an opaque nanos error. */
  def requireNanosAsLong(spark: SparkSession): Unit =
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events.parquet is TIMESTAMP(NANOS): build the session with " +
        "spark.sql.legacy.parquet.nanosAsLong=true")

  /** `documents` spread across cores: the fixtures are single row-group
    * parquet files (one scan task); per-row text hashing then runs
    * single-threaded without this. A production corpus arrives in many
    * splits and scans parallel without the extra exchange. */
  def documentsDist(spark: SparkSession, d: String): DataFrame =
    load(spark, d, "documents").repartition(spark.sparkContext.defaultParallelism)

  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def events(spark: SparkSession, d: String): DataFrame = load(spark, d, "events")
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
