package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches (north-star extension, SURVEY.md §2.9).
  *
  * The container has no codec libraries, so the byte-level decode is a
  * clearly-marked deterministic STUB (`FakeCodec`) — the Spark-side
  * plumbing is real: schema, per-partition batching, metadata pushdown,
  * and the oracle-checked metadata projection. A production deployment
  * replaces `FakeCodec.decode` with an actual decoder (JNI or
  * `mapInPandas`-style Python workers) without touching the plan.
  */
object Multimodal {
  import TextOps._

  /** An opaque media payload + its envelope. */
  final case class MediaFile(doc_id: Long, payload: Array[Byte], source: String)

  /** Decoded (stub) features: what a real image decode would yield. */
  final case class MediaMeta(
      doc_id: Long, byte_len: Long, format: String,
      width: Long, height: Long, n_frames: Long)

  /** STUB decoder: deterministic pseudo-decode from payload bytes alone.
    * A real implementation parses the container header; this fakes the
    * same signature so the distributed plumbing is exercised end-to-end. */
  object FakeCodec {
    val formats = Array("jpeg", "png", "webp")
    def decode(doc_id: Long, payload: Array[Byte]): MediaMeta = {
      // ??? real decode goes here; deterministic fake derived from a
      // polynomial byte hash (same constants as TextOps.polyHash)
      val h = payload.foldLeft(0L)((acc, b) => (acc * 131L + (b & 0xff)) % TextOps.P)
      MediaMeta(doc_id, payload.length.toLong, formats((h % 3L).toInt),
        320L + (h % 8L) * 160L, 240L + (h % 6L) * 120L, 1L + payload.length % 24L)
    }
  }

  /** documents.text reinterpreted as a binary payload column — the test
    * corpus stand-in for real media bytes. */
  def mediaFiles(spark: SparkSession, d: String): Dataset[MediaFile] = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"), col("source"))
      .as[MediaFile]
  }

  /** Typed per-partition decode: the batch boundary a real codec needs
    * (decoder init once per partition, rows streamed through it). */
  def decodeAll(files: Dataset[MediaFile]): Dataset[MediaMeta] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      // per-partition decoder setup would happen here (open codec ctx)
      it.map(f => FakeCodec.decode(f.doc_id, f.payload))
    }
  }

  /** The same metadata as a pure-column projection — whole-stage
    * codegen, no object round-trip — used for the oracle query. The two
    * paths must agree (asserted in MultimodalSpec). */
  def mediaMetadata(spark: SparkSession, d: String): DataFrame = {
    val payload = col("text").cast("binary")
    val h = polyHash(col("text")) // ASCII corpus: byte hash == char hash
    Tables.documentsDist(spark, d)
      .select(col("doc_id"),
        length(payload).cast("long").as("byte_len"),
        element_at(lit(FakeCodec.formats), (h % 3L).cast("int") + 1).as("format"),
        (lit(320L) + (h % 8L) * 160L).as("width"),
        (lit(240L) + (h % 6L) * 120L).as("height"),
        (lit(1L) + length(payload) % 24L).as("n_frames"))
      .orderBy(col("doc_id"))
  }
}
