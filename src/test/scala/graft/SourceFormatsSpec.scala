package graft

import org.apache.spark.sql.functions._

/** Source/sink format breadth beyond parquet/CSV/JSONL: native ORC
  * round-trip, parquet schema evolution with mergeSchema, and
  * streaming checkpoint recovery — the at-rest and restart concerns a
  * long-lived 100 TB corpus hits (a second engine writing ORC; columns
  * added over years of ingest batches; a nightly job resuming from its
  * checkpoint instead of rescanning history). */
class SourceFormatsSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("ORC round-trip preserves documents bit-for-bit (zlib)") {
    val src = Tables.documents(spark, d)
    val dir = java.nio.file.Files.createTempDirectory("docs_orc").toString
    src.write.mode("overwrite").option("compression", "zlib").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      src.schema.map(f => (f.name, f.dataType)))
    assert(back.except(src).isEmpty && src.except(back).isEmpty)
    assert(back.count() == src.count() && back.count() > 0)
  }

  test("parquet schema evolution: mergeSchema unifies old and new ingest batches") {
    val dir = java.nio.file.Files.createTempDirectory("docs_evolve").toString
    val docs = Tables.documents(spark, d)
    // year-1 batch: no n_chars column yet
    docs.filter(col("doc_id") < 20).select(col("doc_id"), col("lang"))
      .write.parquet(s"$dir/batch=1")
    // year-2 batch: schema grew a column
    docs.filter(col("doc_id") >= 20 && col("doc_id") < 40)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .write.parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("doc_id", "lang", "n_chars", "batch"))
    assert(merged.count() == 40)
    // old rows surface the new column as null, new rows keep values
    assert(merged.filter(col("batch") === 1 && col("n_chars").isNotNull).count() == 0)
    assert(merged.filter(col("batch") === 2 && col("n_chars").isNull).count() == 0)
  }

  test("streaming state survives a query restart from its checkpoint") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val schema = Tables.eventsNs(spark, d).schema
    def toTs(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val srcDir = java.nio.file.Files.createTempDirectory("events_ckpt_src")
    val stage = java.nio.file.Files.createTempDirectory("events_ckpt_stage")
    val ckpt = java.nio.file.Files.createTempDirectory("events_ckpt").toString
    val ev = Tables.eventsNs(spark, d)
    val cut = ev.agg(expr("percentile(event_id, 0.5)")).head().getDouble(0).toLong
    def arrive(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$stage/$name")
      java.nio.file.Files.move(
        java.nio.file.Files.list(java.nio.file.Paths.get(s"$stage/$name"))
          .filter(_.toString.endsWith(".parquet")).findFirst().get(),
        srcDir.resolve(s"$name.parquet"))
    }
    def run(): Unit = {
      val src = spark.readStream.schema(schema).parquet(srcDir.toString)
      val q = graft.streaming.EventStream.hourly(toTs(src))
        .writeStream.format("memory").queryName("ckpt_hourly")
        .outputMode("complete").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination(120000) finally q.stop()
    }
    val first = ev.filter(col("event_id") < cut)
    arrive(first, "part-1")
    run()
    val afterFirst = spark.table("ckpt_hourly")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().map(_._3).sum
    assert(afterFirst == first.count(), s"first run aggregated $afterFirst")
    // the second half arrives; a NEW query resumes from the checkpoint
    arrive(ev.filter(col("event_id") >= cut), "part-2")
    run()
    val stream = spark.table("ckpt_hourly")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val batch = graft.streaming.EventStream.hourly(toTs(ev))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    // restart recovered the aggregation state: full-history result from
    // a run that only read the new file
    assert(stream == batch && stream.nonEmpty)
  }
}
