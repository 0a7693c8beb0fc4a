package graft

import org.apache.spark.sql.functions._

/** Measured-traffic assertions: the scale claims the scaladocs make,
  * verified as numbers from the executed plans' SQL metrics. */
class InstrumentSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("q50 sampling: the output sort is the ONLY shuffle, and it moves only kept rows") {
    // plain loader: documentsDist's round-robin spread is a test-scale
    // fixture artifact (single-row-group files), not part of the operator
    val (rows, s) = Instrument.collectWithPlan(
      Curation.stratifiedSampleDf(Tables.documents(spark, d)))
    assert(s.shuffles == 1, s"expected only the output range sort: $s")
    assert(s.broadcasts == 1) // the rates dimension
    // the filter ran BEFORE the exchange: shuffled records == kept rows
    assert(s.recordsWritten == rows.length, s)
    assert(rows.nonEmpty)
  }

  test("warm ingest dedup shuffles candidate-bounded records, never full corpus postings") {
    Dedup.ingestDedup(spark, d).count() // warm the salted corpus index
    val (rows, s) = Instrument.collectWithPlan(Dedup.ingestDedup(spark, d))
    val corpusPostings = Tables.documents(spark, d)
      .filter(substring(col("source"), 4, 10).cast("int") < 15)
      .select(explode(TextOps.shingleHashSet(col("text"), TextOps.NearDupShingleN)))
      .count()
    assert(rows.nonEmpty)
    // the verify join is pruned to candidate docs before the shingle
    // explode: total shuffled records must stay strictly below even ONE
    // pass of the corpus posting list
    assert(s.recordsWritten < corpusPostings,
      s"shuffled ${s.recordsWritten} records ≥ corpus postings $corpusPostings — " +
        "the corpus-side verify explode is no longer candidate-pruned")
  }

  test("q144 scrub: map-only — the presentation sort is the only shuffle, no broadcasts") {
    val (rows, s) = Instrument.collectWithPlan(
      Curation.piiScrubDf(Tables.events(spark, d)))
    assert(s.shuffles == 1, s"expected only the output range sort: $s")
    assert(s.broadcasts == 0, s)
    assert(s.recordsWritten == rows.length, s) // every event passes once
    assert(rows.nonEmpty)
  }

  test("q155 warm ingest chunk probe shuffles batch-proportional traffic, under one corpus chunk pass") {
    Dedup.ingestChunkDedup(spark, d).count() // warm the salted chunk index
    val (rows, s) = Instrument.collectWithPlan(Dedup.ingestChunkDedup(spark, d))
    val cc = Tables.documents(spark, d)
      .filter(substring(col("source"), 4, 10).cast("int") < 15)
      .select("text").collect()
      .map(r => (r.getString(0).split(" ", -1).length + Dedup.ChunkW - 1) / Dedup.ChunkW)
      .sum
    assert(rows.nonEmpty && cc > 0)
    assert(s.recordsWritten < cc,
      s"warm probe shuffled ${s.recordsWritten} records ≥ corpus chunk stream $cc — " +
        "the corpus side is no longer a persisted probe-only relation")
  }

  test("q03 shape: forcing the broadcast join to shuffle moves strictly more traffic") {
    def q(c: org.apache.spark.sql.DataFrame) =
      Tables.orders(spark, d)
        .join(c, col("o_custkey") === col("c_custkey"), "left_outer")
        .select(col("o_orderkey"), col("o_totalprice"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("o_orderkey"))
    val (_, sb) = Instrument.collectWithPlan(q(broadcast(Tables.customer(spark, d))))
    val (_, ss) = Instrument.collectWithPlan(q(Tables.customer(spark, d).hint("shuffle_merge")))
    assert(sb.broadcasts >= 1 && sb.shuffles == 1, s"broadcast variant: $sb") // output sort only
    assert(ss.shuffles == 3, s"shuffle variant: both join inputs + sort: $ss")
    assert(ss.recordsWritten > sb.recordsWritten, s"bcast=$sb shuffle=$ss")
  }

  test("Dataset.observe: ingest-stats metrics ride the scan, no second pass") {
    import org.apache.spark.sql.Observation
    val obs = Observation("ingest_stats")
    val base = Tables.orders(spark, d)
      .observe(obs,
        count(lit(1)).as("rows_scanned"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents_scanned"),
        count(when(col("o_totalprice") <= 0, 1)).as("rows_suspect"))
    // the downstream query filters aggressively — the observation still
    // sees every scanned row because it is attached BELOW the filter
    val kept = base.filter(col("o_totalprice") > 400000.0).count()
    val m = obs.get
    val full = Tables.orders(spark, d)
    assert(m("rows_scanned") == full.count())
    assert(m("cents_scanned") ==
      full.select(sum(round(col("o_totalprice") * 100).cast("long"))).head().getLong(0))
    assert(m("rows_suspect") == 0L)
    assert(kept > 0 && kept < m("rows_scanned").asInstanceOf[Long])
  }

  test("q21 exact dedup: map-side partials bound the wire to inputs, not input×dups") {
    val (rows, s) = Instrument.collectWithPlan(Dedup.exact(spark, d))
    assert(s.shuffles >= 1 && rows.nonEmpty)
    val nIn = Tables.documents(spark, d).count()
    // per exchange the partial agg caps records at one per (key,
    // partition): fixture spread ≤ nIn, agg exchange ≤ nIn, output
    // sort = survivors
    assert(s.recordsWritten <= 2 * nIn + rows.length, s)
    assert(rows.length <= nIn) // (sf0.001 happens to have no exact dups)
  }

  test("q129/q141: fixed broadcasts stay bucket/alphabet-bounded, never corpus-sized") {
    // the ONLY broadcasts these plans FORCE are structurally bounded
    // state: q129's 1024-bucket weight table (+ the one-row totals),
    // q141's per-event-type counts (×2 sides) and one-row session
    // total. A schema change that silently turns either into a
    // corpus-cardinality relation must fail here, not OOM a driver at
    // scale. Auto-broadcast is disabled for the measurement so AQE's
    // runtime size-gated broadcasts (legitimate, and absent at real
    // scale) don't drown the forced ones being pinned.
    val confs = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = confs.map(k => k -> spark.conf.getOption(k))
    confs.foreach(k => spark.conf.set(k, "-1"))
    try {
      val (r129, s129) = Instrument.collectWithPlan(Curation.importanceWeights(spark, d))
      assert(r129.nonEmpty)
      assert(s129.broadcastRows <= 1024L + 1L,
        s"q129 broadcast ${s129.broadcastRows} rows — weight table no longer bucket-bounded")
      val nTypes = Tables.eventsNs(spark, d).select("event_type").distinct().count()
      val (r141, s141) = Instrument.collectWithPlan(Queries.sessionAssociations(spark, d))
      assert(r141.nonEmpty)
      assert(s141.broadcastRows <= 2L * nTypes + 1L,
        s"q141 broadcast ${s141.broadcastRows} rows for $nTypes event types — " +
          "type-totals no longer alphabet-bounded")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q156: the forced eval broadcast stays carve-bounded, never corpus-sized") {
    // q156's ONLY forced broadcast is the 64-row eval carve (the
    // constant is the bound, not a corpus fraction). If a refactor
    // ever broadcasts the corpus side of the decontam scan, this
    // fails before a driver OOMs at scale. Same auto-broadcast
    // isolation discipline as the q129/q141 pin above.
    val confs = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = confs.map(k => k -> spark.conf.getOption(k))
    confs.foreach(k => spark.conf.set(k, "-1"))
    try {
      val (rows, s) = Instrument.collectWithPlan(Dedup.embedDecontam(spark, d))
      assert(rows.nonEmpty)
      assert(s.broadcastRows <= Dedup.EmbedDecontamEvalK.toLong,
        s"q156 broadcast ${s.broadcastRows} rows — eval carve no longer size-fixed")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q161: every forced broadcast is the k-bounded selection, never the corpus") {
    // per round the coreset broadcasts ONLY the selected vectors'
    // component relation (≤ CoresetK·dim rows) and the 1-row argmax
    // pick; across k−1 rounds that is Σ r·dim + (k−1) rows. A refactor
    // that broadcasts the corpus side must fail here (the q129/q141
    // discipline).
    val confs = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = confs.map(k => k -> spark.conf.getOption(k))
    confs.foreach(k => spark.conf.set(k, "-1"))
    try {
      val (rows, s) = Instrument.collectWithPlan(Similarity.coresetSelect(spark, d))
      assert(rows.length == Similarity.CoresetK)
      val k = Similarity.CoresetK.toLong
      val bound = (2L to k).map(r => r - 1).sum * 64L + (k - 1L)
      assert(s.broadcastRows <= bound,
        s"q161 broadcast ${s.broadcastRows} rows > selection bound $bound")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q120 eval carve: the heap aggregate shuffles k-bounded partials, never documents") {
    // plain loader: documentsDist's round-robin spread is a test-scale
    // fixture artifact (single-row-group files), not part of the operator
    val (rows, s) = Instrument.collectWithPlan(
      Curation.evalCarveDf(Tables.documents(spark, d)))
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, d).count()
    val nStrata = Tables.documents(spark, d).select("source").distinct().count()
    val parts = spark.sparkContext.defaultParallelism.toLong
    // partial heaps: ≤ one buffer row per (stratum, map partition) into
    // the agg exchange, plus the ≤ 50·strata output rows into the
    // presentation sort — strictly below one pass of the corpus (the
    // row_number-window formulation would shuffle every document)
    // (at sf0.001 every stratum is smaller than k, so rows.length ==
    // nDocs and the corpus term is the OUTPUT, not the input — at real
    // scale rows.length caps at 50·strata regardless of corpus size)
    val bound = nStrata * parts + rows.length
    assert(s.recordsWritten <= bound,
      s"carve shuffled ${s.recordsWritten} records (bound $bound, " +
        s"$nDocs docs) — did the top-k aggregate degrade to a document shuffle?")
  }
}
