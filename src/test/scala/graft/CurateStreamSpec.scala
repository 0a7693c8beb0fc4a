package graft

import org.apache.spark.sql.functions._

/** Streaming curation funnel e2e: draining the SynthDocs micro-batch
  * stream through CurateStream must yield exactly the batch CurateDag's
  * curated output on the same corpus — same canonical doc set, same
  * redacted texts, same mixture rows. */
/** Top-level so the Product encoder derives for MemoryStream. */
case class SDoc(doc_id: Long, lang: String, source: String, text: String,
    n_chars: Long)

class CurateStreamSpec extends SparkSpec {

  test("cross-batch cluster merge de-thrones an earlier canonical (planted near-dups)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("curate-merge").toString
    // 60 distinct words; texts are token ranges so Jaccard is exact:
    // A = w1..w40, C = w21..w60 (J(A,C) ≈ 0.31: NOT direct near-dups),
    // bridge D = w1..w60 (J(D,A) ≈ 0.66, J(D,C) ≈ 0.66: links both)
    val w = (1 to 60).map(i => s"w$i")
    def text(from: Int, to: Int) = w.slice(from - 1, to).mkString(" ")
    def doc(id: Long, t: String) = SDoc(id, "en", "src0", t, t.length.toLong)
    val a = doc(1L, text(1, 40))
    val c = doc(5L, text(21, 60))
    val aCopy = doc(10L, text(1, 40)) // exact text twin of A (J = 1)
    val bridge = doc(11L, text(1, 60))
    val noise = doc(2L, (101 to 140).map(i => s"x$i").mkString(" "))

    val mem = MemoryStream[SDoc](spark)
    val (q, _) = streaming.CurateStream.start(mem.toDF(),
      Seq.empty[Long].toDF("h"), s"$tmp/store", s"$tmp/ckpt")
    try {
      // batch 1: two separate singleton clusters {1} and {5} + noise
      mem.addData(a, c, noise)
      q.processAllAvailable()
      val g1 = streaming.CurateStream.snapshot(spark, s"$tmp/store")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(g1 == Set(1L, 5L, 2L))
      // batch 2: the bridge joins BOTH clusters; the exact twin joins A.
      // Component {1,5,10,11} has min 1 — doc 5, canonical in gen 1,
      // must be DE-THRONED in the new snapshot (the retraction an
      // append-only sink cannot express).
      mem.addData(aCopy, bridge)
      q.processAllAvailable()
      val g2 = streaming.CurateStream.snapshot(spark, s"$tmp/store")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(g2 == Set(1L, 2L), s"expected cluster collapse to {1, noise}, got $g2")
    } finally q.stop()

    // and the drained result still equals batch CurateDag on the union
    val all = Seq(a, c, noise, aCopy, bridge)
    all.toDF().write.parquet(s"$tmp/data/documents.parquet")
    val ctx = pipeline.Ctx(spark, pipeline.PbConf(s"$tmp/data", s"$tmp/work"))
    pipeline.CurateDag.run(ctx)
    val batchIds = pipeline.CurateDag.Redact.read(ctx)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val streamIds = streaming.CurateStream.snapshot(spark, s"$tmp/store")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamIds == batchIds)
  }

  test("killed mid-stream and restarted, the funnel resumes from disk and still equals batch") {
    val tmp = java.nio.file.Files.createTempDirectory("curate-restart").toString
    val n = 1500L
    val corpus = spark.read.format("graft.sources.SynthDocs")
      .option("n", n.toString).option("seed", "11").option("numPartitions", "4").load()
    val keep = TextAnalysis.corpusFilterDf(corpus)
      .filter(col("verdict") === "keep").select("doc_id")
    val evalHashes = corpus.join(keep, "doc_id")
      .filter(col("doc_id") % Dedup.EvalMod === 0)
      .select(explode(TextOps.shingleHashSet(col("text"), 4)).as("h"))
      .distinct()
    def stream() = spark.readStream.format("graft.sources.SynthDocs")
      .option("n", n.toString).option("seed", "11").option("numPartitions", "4")
      .option("rowsPerBatch", "150").load()
    // first incarnation: default trigger, killed after ≥ 3 WRITTEN
    // state batches (the dirs lag the seen counter by a batch tail)
    val (q1, f1) = streaming.CurateStream.start(stream(), evalHashes,
      s"$tmp/store", s"$tmp/ckpt")
    val sigRoot = new org.apache.hadoop.fs.Path(s"$tmp/store/state/sigs")
    val fs = sigRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def sigDirs() = if (!fs.exists(sigRoot)) Seq.empty[Long]
      else fs.listStatus(sigRoot).toSeq.map(_.getPath.getName)
        .collect { case n if n.startsWith("batch=") => n.stripPrefix("batch=").toLong }
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (sigDirs().size < 3 && System.nanoTime() < deadline) Thread.sleep(50)
    q1.stop()
    assert(f1.seen >= 450, "first incarnation never committed three batches")
    // maintenance between incarnations: compact everything below the
    // newest written batch (the conservative committed watermark) —
    // the resumed stream must read byte-equivalent standing state
    val before = sigDirs()
    streaming.CurateStream.compactState(spark, s"$tmp/store", before.max)
    val after = sigDirs()
    assert(after.size < before.size, s"compaction absorbed nothing: $before -> $after")
    assert(after.count(_ < before.max) == 1, s"expected one compacted dir below the watermark: $after")
    // second incarnation: FRESH funnel (no in-memory state), same
    // checkpoint + store — resumes from the committed offset and the
    // (compacted) on-disk state generations, drains the rest
    val f2 = streaming.CurateStream.drain(stream(), evalHashes,
      s"$tmp/store", s"$tmp/ckpt")
    assert(f1.seen + f2.seen >= n, "restart lost or skipped documents")
    // the resumed result equals batch CurateDag on the full corpus
    corpus.write.parquet(s"$tmp/data/documents.parquet")
    val ctx = pipeline.Ctx(spark, pipeline.PbConf(s"$tmp/data", s"$tmp/work"))
    pipeline.CurateDag.run(ctx)
    val batchRows = pipeline.CurateDag.Redact.read(ctx)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val streamRows = streaming.CurateStream.snapshot(spark, s"$tmp/store")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(streamRows.nonEmpty && streamRows == batchRows)
  }

  test("compaction crash-recovery: every interrupted-swap window heals without loss or duplicates") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val tmp = java.nio.file.Files.createTempDirectory("compact-crash").toString
    val root = s"$tmp/store/state/sigs"
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def writeBatch(i: Long, rows: Seq[Long], marker: Boolean = false): Unit = {
      rows.map(r => (r, s"t$r")).toDF("doc_id", "x").write
        .mode("overwrite").parquet(s"$root/batch=$i")
      if (marker) fs.create(new Path(s"$root/batch=$i/_COMPACTED"), true).close()
    }
    def writeTmp(t: Long, rows: Seq[Long]): Unit = {
      rows.map(r => (r, s"t$r")).toDF("doc_id", "x").write
        .mode("overwrite").parquet(s"$root/.compact-tmp-$t")
      fs.create(new Path(s"$root/.compact-tmp-$t/_COMPACTED"), true).close()
    }
    def state() = spark.read.option("basePath", root).parquet(root)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted

    // WINDOW A: crash after the tmp write, before ANY delete — the
    // originals are complete, so the tmp must drop and compaction then
    // proceeds normally (no loss, no duplicates)
    (0L to 2L).foreach(i => writeBatch(i, Seq(i)))
    writeTmp(1L, Seq(0L, 1L))
    streaming.CurateStream.compactState(spark, s"$tmp/store", 3L)
    assert(state() == Seq(0L, 1L, 2L), s"window A lost/duplicated rows: ${state()}")
    assert(!fs.exists(new Path(s"$root/.compact-tmp-1")))

    // WINDOW B: crash after the rename landed (merged dir carries the
    // _COMPACTED marker) but before the absorbed-dir cleanup — the
    // leftover original must delete, never surface as duplicates
    fs.delete(new Path(root), true)
    writeBatch(2L, Seq(0L, 1L, 2L), marker = true)
    writeBatch(0L, Seq(0L)) // the not-yet-cleaned-up absorbed dir
    streaming.CurateStream.compactState(spark, s"$tmp/store", 3L)
    assert(state() == Seq(0L, 1L, 2L), s"window B duplicated rows: ${state()}")
    assert(!fs.exists(new Path(s"$root/batch=0")))

    // WINDOW C: crash after the deletes, before the rename — the tmp
    // is the only complete copy and must complete its swap
    fs.delete(new Path(root), true)
    writeBatch(2L, Seq(2L))
    writeTmp(1L, Seq(0L, 1L))
    streaming.CurateStream.compactState(spark, s"$tmp/store", 3L)
    assert(state() == Seq(0L, 1L, 2L), s"window C lost rows: ${state()}")
    assert(!fs.exists(new Path(s"$root/.compact-tmp-1")))
  }

  test("stream curation funnel ≡ batch CurateDag on the drained corpus") {
    val tmp = java.nio.file.Files.createTempDirectory("curate-stream").toString
    val n = 1500L
    def source(read: org.apache.spark.sql.DataFrameReader) = read
      .format("graft.sources.SynthDocs")
      .option("n", n.toString).option("seed", "7").option("numPartitions", "4")

    // batch view of the same deterministic corpus
    val corpus = source(spark.read).load()
    // "benchmark compiled offline": the quality-passed eval split's
    // 4-gram hashes — the static broadcast side of the stream probe
    val keep = TextAnalysis.corpusFilterDf(corpus)
      .filter(col("verdict") === "keep").select("doc_id")
    val evalHashes = corpus.join(keep, "doc_id")
      .filter(col("doc_id") % Dedup.EvalMod === 0)
      .select(explode(TextOps.shingleHashSet(col("text"), 4)).as("h"))
      .distinct()

    // drain the stream through the funnel (4 micro-batches of 400)
    val stream = spark.readStream.format("graft.sources.SynthDocs")
      .option("n", n.toString).option("seed", "7").option("numPartitions", "4")
      .option("rowsPerBatch", "400").load()
    val funnel = streaming.CurateStream.drain(stream, evalHashes,
      s"$tmp/store", s"$tmp/ckpt")
    val snap = streaming.CurateStream.snapshot(spark, s"$tmp/store")

    // batch side: the real CurateDag over the drained corpus
    corpus.write.parquet(s"$tmp/data/documents.parquet")
    val ctx = pipeline.Ctx(spark, pipeline.PbConf(s"$tmp/data", s"$tmp/work"))
    pipeline.CurateDag.run(ctx)

    // the curated store (canonical, redacted) must match exactly
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "lang", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1).toSeq
    val streamRows = rows(snap)
    val batchRows = rows(pipeline.CurateDag.Redact.read(ctx))
    assert(streamRows.nonEmpty)
    assert(streamRows == batchRows)

    // funnel counters saw the whole corpus, monotone narrowing
    assert(funnel.seen == n)
    assert(funnel.qualityKept <= funnel.seen && funnel.deconKept <= funnel.qualityKept)
    assert(streamRows.size <= funnel.deconKept)

    // the mixture stage derived from the streamed store ≡ batch Mixture
    def mixRows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "lang", "copy_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._3)).toSeq
    val mixStream = mixRows(Curation.upsampleCopies(
      snap.join(Curation.sampleCut(snap).select("doc_id"), "doc_id")))
    val mixBatch = mixRows(pipeline.CurateDag.Mixture.read(ctx))
    assert(mixStream == mixBatch)
  }
}
