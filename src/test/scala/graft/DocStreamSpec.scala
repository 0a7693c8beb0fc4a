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
}
