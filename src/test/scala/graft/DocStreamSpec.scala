package graft

import java.sql.Timestamp
import graft.streaming.DocStream
import graft.streaming.DocStream.Doc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming exact-dedup: first occurrence survives across micro-batches,
  * duplicates within the watermark horizon are suppressed. */
class DocStreamSpec extends SparkSpec {

  private val Base = 1000L
  private def ts(min: Long): Timestamp = new Timestamp((Base + min) * 60000L)

  test("streaming winnowing fingerprints equal the batch q118 selection per doc") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sc = spark.sqlContext
    // row-local graft_winnow needs no window operator, so the SAME
    // projection runs unchanged on the stream — fingerprint-at-ingest
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").as[(Long, String)].collect().take(60)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDS().toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions.winnow(col("text"))).as("fp"))
      .select(col("doc_id"), col("fp.pos").as("pos"), col("fp.h").as("h"))
      .writeStream.format("memory").queryName("winnow_out")
      .outputMode(OutputMode.Append).start()
    try {
      val (a, b) = docs.splitAt(25)
      mem.addData(a: _*); q.processAllAvailable()
      mem.addData(b: _*); q.processAllAvailable()
      val got = spark.table("winnow_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val ids = docs.map(_._1).toSet
      val batch = TextAnalysis.winnowFingerprints(spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .filter(x => ids.contains(x._1)).toSet
      assert(got == batch && got.nonEmpty)
    } finally q.stop()
  }

  test("cross-batch duplicates are suppressed; first occurrence wins") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = DocStream.dedupExact(mem.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Doc(1, ts(0), "Alpha beta"),
        Doc(2, ts(1), "gamma"),
        Doc(3, ts(2), "ALPHA BETA")) // dup of doc 1 (case-insensitive), same batch
      q.processAllAvailable()
      mem.addData(
        Doc(4, ts(10), "alpha beta"), // dup of doc 1, later batch, inside horizon
        Doc(5, ts(11), "delta"))      // novel
      q.processAllAvailable()
      val out = spark.table("dedup_out").as[Doc].collect().map(_.doc_id).toSet
      assert(out == Set(1L, 2L, 5L), out.toString)
    } finally q.stop()
  }

  test("streaming LSH candidates equal the batch band-collision pairs on the corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sc = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    // all docs inside one horizon window → every batch candidate pair
    // must also be a stream candidate pair, and vice versa
    val docs = Tables.documents(spark, d)
      .selectExpr("doc_id", "timestamp_micros(60000000000 + doc_id * 1000000) as ts", "text")
      .as[DocStream.Doc].collect().toSeq
    val mem = MemoryStream[DocStream.Doc]
    val q = DocStream.nearDupCandidates(mem.toDS())
      .writeStream.format("memory").queryName("cand_out")
      .outputMode(OutputMode.Append).start()
    try {
      val (first, rest) = docs.splitAt(docs.size / 2)
      mem.addData(first: _*); q.processAllAvailable()
      mem.addData(rest: _*); q.processAllAvailable()
      val stream = spark.table("cand_out")
        .select("doc_a", "doc_b").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch twin: band-bucket collision pairs (q23's candidate stage)
      val sets = Tables.documents(spark, d)
        .select(col("doc_id"), TextOps.shingleHashSet(col("text"), TextOps.NearDupShingleN).as("hs"))
        .filter(size(col("hs")) > 0)
        .select(col("doc_id"), TextOps.nearDupBandKeys(col("hs")).as("bands"))
      val bands = sets.select(col("doc_id"), posexplode(col("bands")).as(Seq("b", "key")))
      val batch = bands.as("x").join(bands.as("y"),
          col("x.b") === col("y.b") && col("x.key") === col("y.key") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id"), col("y.doc_id")).distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(stream == batch, s"stream ${stream.size} vs batch ${batch.size}")
      assert(batch.nonEmpty)
      // estimated jaccard of a perfect-duplicate pair is 1.0
      val ests = spark.table("cand_out").collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      assert(ests.values.forall(e => e >= 0.0 && e <= 1.0))
    } finally q.stop()
  }

  test("streaming ingest dedup ≡ batch q56: per-batch index probes, append-only survivors") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("ingest-stream").toString
    val fresh = Tables.documents(spark, d)
      .filter(substring(col("source"), 4, 10).cast("int") >= 15)
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        col("n_chars").cast("long").as("n_chars"))
      .as[SDoc].collect().toSeq
    val mem = MemoryStream[SDoc](spark)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$out/ckpt")
      .foreachBatch(DocStream.ingestSink(spark, d, s"$out/surv") _)
      .start()
    try {
      // three arbitrary micro-batches: q56 compares the batch only to
      // the CORPUS, so the survivor union must be partition-independent
      fresh.grouped(math.max(1, fresh.size / 3 + 1)).foreach { c =>
        mem.addData(c: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val streamSurv = spark.read.parquet(s"$out/surv")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val batchSurv = Dedup.ingestDedup(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamSurv == batchSurv && streamSurv.nonEmpty)
  }

  test("streaming decontamination flags exactly the batch q55 doc set") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sc = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    // static eval side: distinct 4-gram hashes of the benchmark docs
    val ev = Tables.documents(spark, d)
      .filter(col("doc_id") % 97 === 0)
      .select(explode(TextOps.shingleHashSet(col("text"), 4)).as("h"))
      .distinct()
    // arriving corpus: the non-eval docs, split across two micro-batches
    val docs = Tables.documents(spark, d)
      .filter(col("doc_id") % 97 =!= 0)
      .selectExpr("doc_id", "timestamp_micros((doc_id + 60000) * 1000000) as ts", "text")
      .as[Doc].collect().toSeq
    val mem = MemoryStream[Doc]
    val q = DocStream.decontaminate(mem.toDS(), ev)
      .writeStream.format("memory").queryName("decon_out")
      .outputMode(OutputMode.Append).start()
    try {
      val (first, rest) = docs.splitAt(docs.size / 2)
      mem.addData(first: _*); q.processAllAvailable()
      mem.addData(rest: _*); q.processAllAvailable()
      val stream = spark.table("decon_out").collect().map(_.getLong(0)).toSet
      val batch = Dedup.decontaminate(spark, d).collect().map(_.getLong(0)).toSet
      assert(stream == batch, s"stream ${stream.size} vs batch ${batch.size}")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("stream dedup agrees with batch q21 on which texts are distinct") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d)
      // offset past epoch 0: the initial watermark is 0 and event-time
      // rows at/below it are dropped as late
      .selectExpr("doc_id", "timestamp_micros((doc_id + 60000) * 1000000) as ts", "text")
      .as[Doc].collect().toSeq
    val mem = MemoryStream[Doc]
    val q = DocStream.dedupExact(mem.toDS())
      .writeStream.format("memory").queryName("dedup_corpus")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("dedup_corpus").count()
      val batch = Dedup.exact(spark, d).count() // one keeper per distinct text
      assert(streamed == batch, s"stream $streamed vs batch $batch")
    } finally q.stop()
  }

  test("streaming media near-dup ≡ batch q245 pairs within one horizon") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sc = spark.sqlContext
    // sf0.01: the radius-9 ball fires there (sf0.001 is empty, and
    // empty ≡ empty proves nothing); all docs inside one horizon so
    // the stream must find exactly the batch pair set
    val d = "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, d)
      .selectExpr("doc_id", "timestamp_micros(60000000000 + doc_id * 1000000) as ts", "text")
      .as[DocStream.Doc].collect().toSeq
    val mem = MemoryStream[DocStream.Doc]
    val q = DocStream.mediaNearDup(mem.toDS())
      .writeStream.format("memory").queryName("media_out")
      .outputMode(OutputMode.Append).start()
    try {
      val (first, rest) = docs.splitAt(docs.size / 2)
      mem.addData(first: _*); q.processAllAvailable()
      mem.addData(rest: _*); q.processAllAvailable()
      val stream = spark.table("media_out")
        .select("doc_a", "doc_b", "dist").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = Multimodal.imageAHashNearDup(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(stream == batch, s"stream ${stream.size} vs batch ${batch.size}")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("streaming conformal coverage monitor ≡ batch windowed recompute") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sc = spark.sqlContext
    val d = "/root/testdata/sf0.01"
    // two 10-minute windows by doc parity; thresholds calibrate OFFLINE
    // via the (oracle-checked) batch operator and ride along static
    val thresholds = Curation.conformalQuality(spark, d)
      .select("source", "thr_milli")
    val thrMap = thresholds.collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val docs = Tables.documents(spark, d)
      .selectExpr("doc_id",
        "timestamp_millis(60000000 + (doc_id % 2) * 600000) as ts", "text")
      .as[DocStream.Doc].collect().toSeq
    val mem = MemoryStream[DocStream.Doc]
    val q = DocStream.conformalMonitor(mem.toDS(), thresholds)
      .writeStream.format("memory").queryName("conf_out")
      .outputMode(OutputMode.Complete).start()
    try {
      val (a, b) = docs.splitAt(docs.size / 2)
      mem.addData(a: _*); q.processAllAvailable()
      mem.addData(b: _*); q.processAllAvailable()
      val got = spark.table("conf_out").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      // local model: q134 score + corpus source law + threshold compare
      val stop = Set("the", "a", "of", "and", "is", "to", "in")
      def qm(t: String): Long = {
        val tk = t.split(" ", -1)
        500L * tk.distinct.length / tk.length +
          200L * tk.count(stop) / tk.length +
          300L * math.min(tk.length, 200L) / 200L
      }
      val exp = docs.groupBy(doc =>
        (doc.ts.getTime / 600000L * 600000L, s"src${doc.doc_id % 20}"))
        .map { case ((w, src), g) =>
          val kept = g.count(doc => thrMap.get(src).flatten
            .forall(thr => qm(doc.text) >= thr)).toLong
          (w, src, g.size.toLong, kept, 1000L * kept / g.size)
        }.toSet
      assert(got == exp)
      // the monitor actually discriminates: some window coverage is
      // below 1000 (a threshold binds) and none is below 0
      assert(got.exists(_._5 < 1000L) && got.forall(_._5 >= 0L))
    } finally q.stop()
  }

  test("streaming rule monitor ≡ local windowed recompute of the q267 flags") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sc = spark.sqlContext
    val d = "/root/testdata/sf0.01"
    // two 10-minute windows by doc parity — same framing as the
    // conformal monitor test
    val docs = Tables.documents(spark, d)
      .selectExpr("doc_id",
        "timestamp_millis(60000000 + (doc_id % 2) * 600000) as ts", "text")
      .as[DocStream.Doc].collect().toSeq
    val mem = MemoryStream[DocStream.Doc]
    val q = DocStream.ruleMonitor(mem.toDS())
      .writeStream.format("memory").queryName("rules_out")
      .outputMode(OutputMode.Complete).start()
    try {
      val (a, b) = docs.splitAt(docs.size / 2)
      mem.addData(a: _*); q.processAllAvailable()
      mem.addData(b: _*); q.processAllAvailable()
      val got = spark.table("rules_out").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1),
          Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6), r.getLong(7)),
          r.getLong(8), r.getLong(9))).toSet
      val stop = Set("the", "a", "of", "and", "is", "to", "in")
      def flags(text: String): Seq[Long] = {
        val t = text.split(" ", -1)
        val (nTok, nUniq) = (t.length.toLong, t.distinct.length.toLong)
        val n5 = math.max(nTok - 4, 0L)
        val u5 = if (n5 == 0) 0L
          else t.sliding(5).map(_.mkString(" ")).toSeq.distinct.length.toLong
        val nPunct = text.count(c =>
          !((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
            (c >= '0' && c <= '9') || c == ' ')).toLong
        Seq(if (nTok < 20) 1L else 0L, if (nTok > 90) 1L else 0L,
          if (nUniq * 100 < nTok * 45) 1L else 0L,
          if ((n5 - u5) * 1000 > n5 * 150) 1L else 0L,
          if (t.count(stop) < 2) 1L else 0L,
          if (nPunct * 1000 > text.length * 30) 1L else 0L)
      }
      val exp = docs.groupBy(_.ts.getTime / 600000L * 600000L)
        .map { case (w, g) =>
          val fs = g.map(doc => flags(doc.text))
          val killed = fs.count(_.sum > 0).toLong
          (w, g.size.toLong, (0 until 6).map(i => fs.map(_(i)).sum),
            killed, 1000L * killed / g.size)
        }.toSet
      assert(got == exp)
      // the monitor discriminates: rules fire in both windows
      assert(got.forall(_._4 > 0))
    } finally q.stop()
  }

  test("streaming loudness audit ≡ batch q281 row-for-row (stateless map)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sc = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d)
      .selectExpr("doc_id", "timestamp_millis(60000000) as ts", "text")
      .as[Doc].collect().toSeq
    val mem = MemoryStream[Doc]
    val q = DocStream.loudnessAudit(mem.toDS())
      .writeStream.format("memory").queryName("loud_out")
      .outputMode(OutputMode.Append).start()
    try {
      val (a, b) = docs.splitAt(docs.size / 2)
      mem.addData(a: _*); q.processAllAvailable()
      mem.addData(b: _*); q.processAllAvailable()
      val got = spark.table("loud_out")
        .select("doc_id", "n_samples", "mean_abs_milli", "energy",
          "peak_abs", "clip_pm", "crest_milli").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).sortBy(_._1).toSeq
      val batch = Multimodal.audioLoudnessAudit(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
      assert(got == batch)
    } finally q.stop()
  }
}
