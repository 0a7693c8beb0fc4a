package graft

/** Multimodal plumbing: the typed mapPartitions decode path and the
  * columnar metadata projection must agree row-for-row. */
class MultimodalSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("typed decode path matches the columnar metadata projection") {
    import spark.implicits._
    val typed = Multimodal.decodeAll(Multimodal.mediaFiles(spark, d))
      .collect().map(m => (m.doc_id, m.byte_len, m.format, m.width, m.height, m.n_frames))
      .sortBy(_._1)
    val columnar = Multimodal.mediaMetadata(spark, d)
      .as[(Long, Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(typed.toSeq == columnar.toSeq)
  }

  test("payloads survive the binary round-trip intact") {
    import spark.implicits._
    val back = Multimodal.mediaFiles(spark, d)
      .map(f => (f.doc_id, new String(f.payload, "UTF-8")))
      .toDF("doc_id", "text2")
    val bad = back.join(Tables.documents(spark, d), "doc_id")
      .filter(org.apache.spark.sql.functions.col("text2") =!=
        org.apache.spark.sql.functions.col("text")).count()
    assert(bad == 0)
  }

  test("decode is distributed: runs once per row across partitions") {
    val files = Multimodal.mediaFiles(spark, d).repartition(8)
    val metas = Multimodal.decodeAll(files)
    assert(metas.rdd.getNumPartitions == 8)
    assert(metas.count() == Tables.documents(spark, d).count())
  }
}
