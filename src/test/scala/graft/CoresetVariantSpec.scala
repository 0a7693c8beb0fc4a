package graft

/** q161's two evaluation strategies (from-scratch O(k²·N·d) vs
  * running-min O(k·N·d)) must be VALUE-IDENTICAL: same exact integer
  * distances, same max(struct(d2, −vec_id)) tie-break, so the greedy
  * traversal picks the same vectors in the same order with the same
  * certified radii. Pinned at two SFs so a divergence that needs
  * corpus mass to surface (a tie, a selected-vector re-pick) is
  * exercised. */
class CoresetVariantSpec extends SparkSpec {
  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("running-min ≡ from-scratch at sf0.001 and sf0.01") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val scratch = rows(Similarity.coresetSelectScratch(spark, d))
      val running = rows(Similarity.coresetSelectRunning(spark, d))
      assert(running == scratch, s"variants diverged at $d")
      assert(scratch.size == Similarity.CoresetK)
      // the greedy radius sequence is non-increasing after the seed —
      // a property of farthest-point traversal both variants must show
      val radii = scratch.drop(1).map(_._3)
      assert(radii.zip(radii.drop(1)).forall { case (a, b) => a >= b })
    }
  }
}
