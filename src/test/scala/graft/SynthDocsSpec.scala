package graft

import org.apache.spark.sql.functions._

/** Custom DSv2 connector (graft.sources.SynthDocs): deterministic
  * content, parallel partition planning, and column-pruning pushdown
  * reaching the reader. */
class SynthDocsSpec extends SparkSpec {

  private def read(n: Long, parts: Int = 4) =
    spark.read.format("graft.sources.SynthDocs")
      .option("n", n.toString).option("seed", "7")
      .option("numPartitions", parts.toString).load()

  test("deterministic content, row count, and schema contract") {
    val a = read(500).collect()
    val b = read(500).collect()
    assert(a.length == 500 && a.toSeq == b.toSeq)
    val df = read(500)
    assert(df.columns.toSeq ==
      Seq("doc_id", "lang", "source", "text", "n_chars"))
    // content keys off (doc_id, seed) only — ids unique, stats sane
    assert(df.select("doc_id").distinct().count() == 500)
    assert(df.filter(length(col("text")) =!= col("n_chars")).count() == 0)
    assert(df.select("lang").distinct().count() == 5)
  }

  test("partition planning: numPartitions independent splits, layout-independent content") {
    assert(read(1000, parts = 8).rdd.getNumPartitions == 8)
    // the same corpus through a different split layout is IDENTICAL —
    // content depends on (doc_id, seed), never on the partitioning
    val a = read(1000, parts = 8).orderBy("doc_id").collect().toSeq
    val b = read(1000, parts = 3).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("column pruning pushes the projection into the reader") {
    val pruned = read(100).select("doc_id", "lang")
    assert(pruned.collect().length == 100)
    // the scan planned only the requested columns (spec hook)
    assert(graft.sources.SynthDocs.lastReadSchema.fieldNames.toSeq ==
      Seq("doc_id", "lang"))
    // a full read plans the full schema again
    read(10).collect()
    assert(graft.sources.SynthDocs.lastReadSchema.fieldNames.length == 5)
  }

  test("aggregate pushdown: count/min/max answer from id ranges, zero rows generated") {
    import graft.sources.SynthDocs
    SynthDocs.rowsGenerated.reset()
    val r = read(1234, parts = 7)
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("lo"),
        max(col("doc_id")).as("hi")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (1234L, 0L, 1233L))
    // the scan accepted the pushdown AND never generated a corpus row —
    // the aggregate was answered structurally, like parquet footer stats
    assert(SynthDocs.lastPushedAggs ==
      Seq("COUNT(*)", "MIN(doc_id)", "MAX(doc_id)"))
    assert(SynthDocs.rowsGenerated.sum() == 0L,
      s"pushed aggregate generated ${SynthDocs.rowsGenerated.sum()} rows")
    // plain count() rides the same path
    SynthDocs.rowsGenerated.reset()
    assert(read(50).count() == 50)
    assert(SynthDocs.lastPushedAggs == Seq("COUNT(*)"))
    assert(SynthDocs.rowsGenerated.sum() == 0L)
  }

  test("filter pushdown: doc_id ranges narrow the GENERATED id range exactly") {
    import graft.sources.SynthDocs
    // a doc_id range generates ONLY the range — pushdown saves the
    // generation itself, not just post-scan filtering
    SynthDocs.rowsGenerated.reset()
    val rows = read(1000, parts = 5)
      .filter(col("doc_id") >= 200 && col("doc_id") < 250)
      .collect()
    assert(rows.length == 50)
    assert(rows.map(_.getLong(0)).sorted.toSeq == (200L until 250L).toSeq)
    assert(SynthDocs.rowsGenerated.sum() == 50L,
      s"range filter generated ${SynthDocs.rowsGenerated.sum()} rows, wanted 50")
    // content identical to the unfiltered corpus over the same ids
    val full = read(1000).filter(col("doc_id") === 237L).collect().head
    assert(rows.find(_.getLong(0) == 237L).get.toSeq == full.toSeq)
    // a filtered COUNT composes both pushdowns: zero rows generated
    SynthDocs.rowsGenerated.reset()
    assert(read(1000).filter(col("doc_id") < 123).count() == 123L)
    assert(SynthDocs.lastPushedAggs == Seq("COUNT(*)"))
    assert(SynthDocs.rowsGenerated.sum() == 0L)
    // a non-id predicate stays residual (re-applied by Spark), exact
    val byLang = read(300).filter(col("lang") === "en").collect()
    val ref = read(300).collect().filter(_.getString(1) == "en")
    assert(byLang.map(_.getLong(0)).sorted.toSeq ==
      ref.map(_.getLong(0)).sorted.toSeq)
    // contradictory ranges yield an empty (not negative) split set
    assert(read(1000).filter(col("doc_id") > 500 && col("doc_id") < 100).count() == 0L)
    // Long.MaxValue boundaries must not wrap (v+1 saturates): <= MAX is
    // the full corpus, > MAX is empty — never the other way around
    assert(read(100).filter(col("doc_id") <= Long.MaxValue).count() == 100L)
    assert(read(100).filter(col("doc_id") > Long.MaxValue).count() == 0L)
    assert(read(100).filter(col("doc_id") === Long.MaxValue).count() == 0L)
  }

  test("reported statistics drive the join strategy: small synth side broadcasts") {
    // a 100-row synthetic dim joins a parquet fact: the scan's
    // SupportsReportStatistics estimate sits far under the broadcast
    // threshold, so Catalyst picks a broadcast join with NO ANALYZE
    // pass and no hint
    val dim = read(100).select(col("doc_id").as("k"), col("lang"))
    val fact = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id").as("k"), col("source"))
    val j = fact.join(dim, "k")
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small synth dim did not broadcast:\n${plan.take(2000)}")
    assert(j.count() == 100)
    // a filter-narrowed scan reports the NARROWED row count: still
    // broadcast even when n is huge, because the range is tiny
    val big = read(100000000L, parts = 4)
      .filter(col("doc_id") < 50).select(col("doc_id").as("k"))
    val j2 = fact.join(big, "k")
    val plan2 = j2.queryExecution.executedPlan.toString
    assert(plan2.contains("BroadcastHashJoin"),
      s"filter-narrowed synth side did not broadcast:\n${plan2.take(2000)}")
    assert(j2.count() == 50)
  }

  test("aggregate pushdown declines group-bys and generated columns; fallback is exact") {
    import graft.sources.SynthDocs
    // aggregate over a GENERATED column: decline, full-scan fallback
    SynthDocs.rowsGenerated.reset()
    val s = read(300).agg(sum(col("n_chars"))).collect().head.getLong(0)
    assert(SynthDocs.lastPushedAggs.isEmpty)
    assert(SynthDocs.rowsGenerated.sum() > 0L)
    val sRef = read(300).select("n_chars").collect().map(_.getLong(0)).sum
    assert(s == sRef)
    // grouped aggregate: decline; values match a driver-side recompute
    SynthDocs.rowsGenerated.reset()
    val byLang = read(300).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(SynthDocs.lastPushedAggs.isEmpty)
    assert(SynthDocs.rowsGenerated.sum() > 0L)
    val ref = read(300).select("lang").collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(byLang == ref)
  }

  test("micro-batch stream: incremental offsets, stream content equals batch") {
    import org.apache.spark.sql.streaming.Trigger
    def src = spark.readStream.format("graft.sources.SynthDocs")
      .option("n", "250").option("seed", "7")
      .option("numPartitions", "3").option("rowsPerBatch", "100")
      .load()
    // default trigger: the corpus arrives 100 ids per micro-batch
    // (3 batches); processAllAvailable drains to the id watermark n
    val q = src.writeStream.format("memory").queryName("synth_stream").start()
    try { q.processAllAvailable() } finally q.stop()
    val stream = spark.table("synth_stream").orderBy("doc_id").collect().toSeq
    val batch = read(250).orderBy("doc_id").collect().toSeq
    assert(stream.length == 250 && stream == batch)
    // Trigger.AvailableNow (SupportsTriggerAvailableNow): one drain of
    // everything available, then terminate — same content
    val q2 = src.writeStream.format("memory").queryName("synth_stream_an")
      .trigger(Trigger.AvailableNow()).start()
    try q2.awaitTermination(120000) finally q2.stop()
    val an = spark.table("synth_stream_an").orderBy("doc_id").collect().toSeq
    assert(an == batch)
  }

  test("micro-batch restart: a new stream resumes from the checkpointed offset, no re-emission") {
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("synth_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("synth_out").toString
    def run(n: Long): Unit = {
      // file sink: the one that actually supports checkpoint recovery
      // (its commit log also makes output exactly-once across restarts)
      val q = spark.readStream.format("graft.sources.SynthDocs")
        .option("n", n.toString).option("seed", "7")
        .option("numPartitions", "3").option("rowsPerBatch", "60")
        .load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination(120000) finally q.stop()
    }
    run(150)
    assert(spark.read.parquet(out).count() == 150)
    // the corpus grows; a NEW query instance resumes from offset 150 —
    // the fresh stream object must advance from the checkpointed start,
    // emitting exactly the new ids, never re-emitting committed ones
    run(250)
    val ids = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until 250L).toSeq,
      s"${ids.length} rows after restart; head=${ids.take(3).toSeq}")
  }

  test("the synthetic corpus drives the real operators (dedup family smoke)") {
    val docs = read(2000, parts = 8)
    // exact-dedup over the generated corpus: group sizes sum to corpus
    val groups = docs.groupBy(lower(col("text"))).count()
    assert(groups.agg(sum("count")).head().getLong(0) == 2000)
    // the q57-style gate runs unchanged over the connector output
    val verdicts = TextAnalysis.corpusFilterDf(docs)
    assert(verdicts.count() == 2000)
    assert(verdicts.select("verdict").distinct().count() >= 1)
  }
}
