package graft

/** Property-style tests for the connected-components family: on RANDOM
  * (seeded, reproducible) graphs, the distributed star-contraction
  * result must equal a local union-find, and the incremental label
  * update must equal clustering from scratch — the broad-case
  * guarantee the example-based specs can't give. Case counts are
  * bounded: each case is a full Spark job round-trip. */
class GraphPropertySpec extends SparkSpec {

  private def unionFind(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map((0L until n).map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // union-by-min: the root IS the component's min doc_id
    (0L until n).map(i => i -> find(i)).toMap
  }

  private def randomEdges(rng: scala.util.Random, n: Long, m: Int): Seq[(Long, Long)] =
    Seq.fill(m)((rng.nextLong(n), rng.nextLong(n))).filter(e => e._1 != e._2)

  test("star-contraction components ≡ local union-find on random graphs") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    (1 to 8).foreach { _ =>
      val n = 2L + rng.nextLong(59L)
      val edges = randomEdges(rng, n, rng.nextInt(91))
      val docs = (0L until n).toDF("doc_id")
      val pairs = (if (edges.isEmpty) Seq((0L, 0L)) else edges) // self-loop is filtered inside
        .toDF("doc_a", "doc_b")
      val got = Dedup.nearDupClustersDf(docs, pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == unionFind(n, edges), s"n=$n edges=$edges")
    }
  }

  test("incremental label update ≡ from-scratch on random graph + random new edges") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    (1 to 6).foreach { _ =>
      val n = 2L + rng.nextLong(40L)
      val base = randomEdges(rng, n, rng.nextInt(50))
      val extra = rng.nextLong(10L) // new docs n .. n+extra-1
      val neu = randomEdges(rng, n + extra, 1 + rng.nextInt(25))
      val corpusDocs = (0L until n).toDF("doc_id")
      val basePairs = (if (base.isEmpty) Seq((0L, 0L)) else base).toDF("doc_a", "doc_b")
      val labels = Dedup.nearDupClustersDf(corpusDocs, basePairs)
        .select("doc_id", "cluster_id")
      val newDocs = (n until n + extra).toDF("doc_id")
      val newPairs = (if (neu.isEmpty) Seq((0L, 0L)) else neu).toDF("doc_a", "doc_b")
      val inc = Dedup.incrementalClusters(labels, newDocs, newPairs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      val scratch = Dedup.nearDupClustersDf(
        corpusDocs.union(newDocs), basePairs.union(newPairs)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      assert(inc == scratch, s"n=$n extra=$extra base=$base neu=$neu")
    }
  }
}
