package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Environment-drift tripwire: the driver regenerates /root/testdata
  * between rounds, and round 4 proved a silent schema change there
  * (events.ts TIMESTAMP(NANOS) → TIMESTAMP_MICROS) can crash 13 queries
  * while every fixture-based spec stays green. This spec reads the REAL
  * testdata footers and asserts the engine's table entry points accept
  * the actual loaded types — so the next drift fails in-repo with a
  * named assertion, not in the driver gate.
  */
class TestdataSchemaSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("every testdata table loads and has rows") {
    for (t <- Tables.all) {
      val df = Tables.load(spark, d, t)
      assert(df.columns.nonEmpty, s"$t: empty schema")
      assert(df.limit(1).count() == 1L, s"$t: no rows")
    }
  }

  test("eventsNs accepts the ACTUAL testdata events schema and yields epoch-nanos BIGINT") {
    val ev = Tables.eventsNs(spark, d)
    assert(ev.schema("ts").dataType == LongType,
      s"eventsNs must surface ts as LongType, got ${ev.schema("ts").dataType}")
    // epoch-nanos sanity: testdata events are modern timestamps —
    // nanos since epoch for anything after ~2001 exceeds 1e18 / 1e9 sec.
    val r = ev.agg(min("ts"), max("ts")).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    assert(lo > 9.0e17.toLong && hi < 4.0e18.toLong,
      s"ts range [$lo, $hi] is not plausible epoch-nanos")
    // and the downstream contract that crashed in round 4: `ts div N`
    // (the EXACT expression family the event queries use — integer div
    // analyzes on fewer types than `/`, so `/` here would stay green on
    // a ts type that still breaks the real queries)
    assert(ev.select(expr("ts div 3600000000000")).limit(1).count() == 1L)
  }

  test("eventsNs normalizes all three ts vintages to the same epoch-nanos") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("evschema").toString
    val micros = 1700000000123456L // 2023-11-14 22:13:20.123456 UTC
    val base = Seq((1L, micros)).toDF("event_id", "us")

    // BIGINT vintage (pre-normalized nanos / nanosAsLong surface)
    base.select($"event_id", ($"us" * 1000L).as("ts"))
      .write.parquet(s"$tmp/long/events.parquet")
    // TIMESTAMP_MICROS vintage (current testdata)
    base.select($"event_id", timestamp_micros($"us").as("ts"))
      .write.parquet(s"$tmp/tz/events.parquet")
    // TIMESTAMP_NTZ vintage
    base.select($"event_id", timestamp_micros($"us").cast(TimestampNTZType).as("ts"))
      .write.parquet(s"$tmp/ntz/events.parquet")

    for (v <- Seq("long", "tz", "ntz")) {
      val ev = Tables.eventsNs(spark, s"$tmp/$v")
      assert(ev.schema("ts").dataType == LongType, s"$v: not LongType")
      assert(ev.select("ts").as[Long].head() == micros * 1000L,
        s"$v: wrong epoch-nanos value")
    }
  }

  test("eventsNs rejects an unusable ts type with a named error") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("evschemabad").toString
    Seq((1L, "not-a-time")).toDF("event_id", "ts")
      .write.parquet(s"$tmp/events.parquet")
    val e = intercept[IllegalStateException](Tables.eventsNs(spark, tmp))
    assert(e.getMessage.contains("StringType"))
  }
}
