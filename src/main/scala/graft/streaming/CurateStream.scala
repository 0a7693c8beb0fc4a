package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Dedup, TextAnalysis, TextOps}

/** The curation funnel as a STREAM: every stage of CurateDag's
  * quality→decontaminate→dedup-canonical→redact chain applied
  * incrementally to a micro-batch documents stream via foreachBatch,
  * with the curated store maintained as a generation-dir snapshot
  * (MergeUpsert's exactly-once pattern).
  *
  * Per micro-batch:
  *  1. quality gate + benchmark decontamination — row-local (the
  *     benchmark shingle set is compiled offline and broadcast, the
  *     standard deployment shape);
  *  2. MinHash/LSH pair discovery of the batch against ITSELF and the
  *     standing corpus signatures — the q56 cross-set band-probe shape
  *     (the standing corpus never self-joins);
  *  3. component labels updated by `Dedup.incrementalClusters` — only
  *     what the new edges touch re-propagates;
  *  4. the canonical snapshot (one doc per cluster, min doc_id) is
  *     re-derived from the updated labels, redacted, and written as
  *     `gen=<batchId>` — a later batch can de-throne an earlier
  *     canonical when clusters merge, which an append-only sink cannot
  *     express but a snapshot/merge sink handles naturally.
  *
  * After the stream drains, the newest generation must equal the BATCH
  * CurateDag's redacted output on the same corpus — asserted in
  * CurateStreamSpec, which also re-derives the mixture stage from both
  * stores and compares.
  *
  * Scale notes, honestly: cross-batch state (labels, corpus signatures,
  * survivor texts) is held as persisted DataFrames rotated per batch
  * with lineage truncation — a production deployment would persist them
  * as salted generation dirs exactly like the snapshot itself (the
  * DedupIndex pattern) so a driver restart resumes from disk, and would
  * write the snapshot as a delta MERGE rather than a full rewrite. The
  * per-batch probe work is already the right shape: batch-sized scans,
  * band-key equi-joins, broadcast label remaps. */
object CurateStream {

  /** Cross-batch driver state: each rotation persists the new frame,
    * fully materializes it, truncates lineage (plans must not grow with
    * the number of batches), and releases the predecessor. */
  final class Funnel(evalHashes: DataFrame, storeDir: String) {
    private var labels: DataFrame = _ // (doc_id, cluster_id)
    private var sigs: DataFrame = _ // (doc_id, hs, bands)
    private var survivors: DataFrame = _ // decon survivors, full rows
    private var retained: List[DataFrame] = Nil

    /** Funnel counts observed so far (for the report/specs). */
    @volatile var seen: Long = 0L
    @volatile var qualityKept: Long = 0L
    @volatile var deconKept: Long = 0L

    def apply(batch: DataFrame, batchId: Long): Unit = {
      val spark = batch.sparkSession
      var fresh: List[DataFrame] = Nil
      def materialize(df: DataFrame): DataFrame = {
        val p = df.persist()
        p.count()
        fresh = p :: fresh
        spark.createDataFrame(p.rdd, p.schema)
      }
      seen += batch.count()
      // 1. row-local gates: quality cascade, eval-split removal, then
      // the broadcast benchmark-shingle probe (no corpus-side state)
      val keep = TextAnalysis.corpusFilterDf(batch)
        .filter(col("verdict") === "keep").select("doc_id")
      val quality = batch.join(keep, "doc_id")
        .filter(col("doc_id") % Dedup.EvalMod =!= 0)
      qualityKept += quality.count()
      val flagged = quality
        .select(col("doc_id"), explode(TextOps.shingleHashSet(col("text"), 4)).as("h"))
        .join(broadcast(evalHashes), "h")
        .select("doc_id").distinct()
      val sb = materialize(quality.join(flagged, Seq("doc_id"), "left_anti"))
      deconKept += sb.count()
      // 2. batch signatures + pair discovery vs (batch ∪ standing) —
      // band-key equi-join candidates, exact Jaccard verify, exactly
      // the q23/q56 machinery
      val sigB = materialize(sb
        .select(col("doc_id"), TextOps.shingleHashSet(col("text"), TextOps.NearDupShingleN).as("hs"))
        .filter(size(col("hs")) > 0)
        .withColumn("bands", TextOps.nearDupBandKeys(col("hs"))))
      val sigU = if (sigs == null) sigB else sigs.union(sigB)
      def bandsOf(s: DataFrame) =
        s.select(col("doc_id"), posexplode(col("bands")).as(Seq("b", "key")))
      val cand = bandsOf(sigB).as("x")
        .join(bandsOf(sigU).as("y"), Seq("b", "key"))
        .filter(col("x.doc_id") =!= col("y.doc_id"))
        .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
          greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
        .distinct()
      val h = sigU.select(col("doc_id"), explode(col("hs")).as("h"))
      val common = cand
        .join(h.as("p"), col("doc_a") === col("p.doc_id"))
        .join(h.as("q"), col("doc_b") === col("q.doc_id") && col("p.h") === col("q.h"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("cm"))
      val sz = sigU.select(col("doc_id"), size(col("hs")).as("sz"))
      val pairs = common
        .join(sz.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sa"), "doc_a")
        .join(sz.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sb"), "doc_b")
        .filter(col("cm") / (col("sa") + col("sb") - col("cm")) >= 0.5)
        .select(col("doc_a"), col("doc_b"))
      // 3. incremental component update: only touched labels move
      val base =
        if (labels == null)
          sb.select(col("doc_id"), col("doc_id").as("cluster_id")).limit(0)
        else labels
      val newLabels = materialize(
        Dedup.incrementalClusters(base, sb.select("doc_id"), pairs)
          .select(col("doc_id"), col("cluster_id")))
      val survU = materialize(if (survivors == null) sb else survivors.union(sb))
      // 4. snapshot generation: canonical docs, redacted. Written fresh
      // per batch (idempotent on replay — same batchId, same parent
      // state, same bytes); a merged-cluster takeover simply drops the
      // de-throned doc from the new generation.
      val canonical = newLabels
        .filter(col("doc_id") === col("cluster_id")).select("doc_id")
      TextAnalysis.redactDf(survU.join(canonical, "doc_id"))
        .write.mode("overwrite").parquet(s"$storeDir/gen=$batchId")
      // rotate: predecessors released only after the snapshot action
      labels = newLabels
      sigs = materialize(sigU)
      survivors = survU
      retained.foreach(_.unpersist())
      retained = fresh
    }
  }

  /** Start the funnel over a documents stream with an explicit trigger
    * (specs drive MemoryStream batches by hand with the default
    * trigger + processAllAvailable). */
  def start(stream: DataFrame, evalHashes: DataFrame, storeDir: String,
      checkpoint: String,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : (org.apache.spark.sql.streaming.StreamingQuery, Funnel) = {
    val funnel = new Funnel(evalHashes, storeDir)
    val w = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => funnel(b, id))
    (trigger.fold(w)(w.trigger).start(), funnel)
  }

  /** Run the funnel over a documents stream until it drains
    * (AvailableNow); returns the funnel for its counters. The curated
    * snapshot is the newest `gen=` dir under `storeDir`. */
  def drain(stream: DataFrame, evalHashes: DataFrame, storeDir: String,
      checkpoint: String): Funnel = {
    val (q, funnel) = start(stream, evalHashes, storeDir, checkpoint,
      Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
    q.awaitTermination()
    funnel
  }

  /** Newest snapshot generation (the curated store). */
  def snapshot(spark: SparkSession, storeDir: String): DataFrame =
    graft.operators.MergeUpsert.latestGen(spark, storeDir)
      .getOrElse(sys.error(s"no generations under $storeDir"))
}
