package graft

/** The checkpoint knob must be semantics-free: every Recurrence mode
  * returns bit-identical results — only fault-tolerance and per-round
  * scheduling change. Pinned on the two recurrence shapes that differ
  * most (PageRank: dense re-aggregation; labelProp: argmax votes).
  */
class RecurrenceSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def withMode[A](m: Recurrence.Mode)(f: => A): A = {
    val prev = Recurrence.mode
    Recurrence.mode = m
    try f finally Recurrence.mode = prev
  }

  test("pageRank identical under Lazy / LocalCk / ReliableCk") {
    val base = Graph.pageRank(spark, d).collect().toSeq
    val local = withMode(Recurrence.LocalCk) {
      Graph.pageRank(spark, d).collect().toSeq
    }
    assert(local == base)
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    val reliable = withMode(Recurrence.ReliableCk) {
      Graph.pageRank(spark, d).collect().toSeq
    }
    assert(reliable == base)
    assert(base.nonEmpty)
  }

  test("labelProp identical under Lazy / LocalCk") {
    val base = Graph.labelProp(spark, d).collect().toSeq
    val local = withMode(Recurrence.LocalCk) {
      Graph.labelProp(spark, d).collect().toSeq
    }
    assert(local == base)
    assert(base.nonEmpty)
  }
}
