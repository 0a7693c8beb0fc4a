package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming face of the dedup family (Dedup.exact's incremental twin).
  *
  * An arriving-documents stream keeps only the first occurrence of each
  * normalized text. State is the seen-key set, which unbounded would be
  * the classic streaming-dedup OOM; `dropDuplicatesWithinWatermark`
  * bounds it to the watermark horizon — the engine evicts keys whose
  * event time has passed out of the (here 1 hour) late window, which is
  * exactly the guarantee a 100 TB/day ingest pipeline wants: exact
  * dedup within the horizon, bounded state forever.
  *
  * Keyed by the same `lower(text)` as the batch q21, so batch and
  * stream agree on what "duplicate" means (asserted in DocStreamSpec).
  * At production scale the key would be `graft_polyhash(lower(text))`
  * (8 bytes of state per doc instead of the text) — same plan shape.
  */
object DocStream {

  final case class Doc(doc_id: Long, ts: Timestamp, text: String)

  def dedupExact(docs: Dataset[Doc]): DataFrame =
    docs.toDF()
      .withColumn("key", lower(col("text")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("key")
      .select(col("doc_id"), col("ts"), col("text"))
}
