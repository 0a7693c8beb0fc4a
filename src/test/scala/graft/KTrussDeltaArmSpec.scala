package graft

import org.apache.spark.sql.functions._

/** r14: the k-truss loop lifecycle changed (peel-row persists replace
  * the r13 keep-list; rebuild is one persist-through action; survivor
  * counts are derived, not measured). The DELTA maintenance arm never
  * fires on the test corpus (sf0.001 converges at round 1; sf0.01 and
  * sf0.1 rebuild every round), so this spec FORCES it on a planted
  * graph and checks the full output against a local from-scratch
  * replay of the fixed-round peel. */
class KTrussDeltaArmSpec extends SparkSpec {

  test("planted graph: delta arm fires and output ≡ local replay") {
    // K14 clique (support 12 per edge — a stable truss core that keeps
    // the survivor count high) + a fragile gadget: a 12-clique
    // {a, b, c1..c10} with edge (b, c1) REMOVED. Gadget supports start
    // at 9-10 (< thr = 10 for a few edges), so round 1 peels a cascade
    // seed while the K14 survives; later rounds peel the gadget
    // remnant a few edges at a time — nPeeled < nSurv, the delta arm.
    val clique = (1L to 14L)
    val cliqueEdges = for {
      i <- clique; j <- clique if i < j
    } yield (i, j)
    val gadget = 100L +: 101L +: (110L to 119L) // a=100, b=101, c1..c10
    val gadgetEdges = (for {
      i <- gadget; j <- gadget if i < j
    } yield (i, j)).filterNot(e => e == (101L, 110L)) // drop (b, c1)
    val edges = (cliqueEdges ++ gadgetEdges).distinct
    val s = spark
    import s.implicits._
    val edf = edges.toDF("p1", "p2")

    // local replay (the NewOpsRound9eSpec reference, on the planted set)
    val thr = (Graph.KTrussK - 2).toLong
    def supports(es: Set[(Long, Long)]): Map[(Long, Long), Long] = {
      val adj = scala.collection.mutable.Map
        .empty[Long, scala.collection.mutable.Set[Long]]
      es.foreach { case (x, y) =>
        adj.getOrElseUpdate(x, scala.collection.mutable.Set.empty) += y
        adj.getOrElseUpdate(y, scala.collection.mutable.Set.empty) += x
      }
      es.iterator.map { case (x, y) =>
        (x, y) -> (adj(x) & adj(y)).size.toLong
      }.toMap
    }
    var es = edges.toSet
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    var r = 1; var converged = false
    var lastSup: Map[(Long, Long), Long] = Map.empty
    var expDelta = 0
    var total = es.size.toLong
    while (r <= Graph.KTrussRounds && !converged) {
      val sup = supports(es); lastSup = sup
      val peel = sup.filter(_._2 < thr)
      converged = peel.isEmpty
      if (!converged) {
        if (r >= 2 && peel.size < total - peel.size) expDelta += 1
        peel.foreach { case ((x, y), sv) => out += ((x, y, r.toLong, sv)) }
        es = es -- peel.keySet
        total -= peel.size
      }
      r += 1
    }
    val fin = if (converged) lastSup else supports(es)
    fin.foreach { case ((x, y), sv) => out += ((x, y, 0L, sv)) }
    val exp = out.sortBy(t => (t._1, t._2)).toSeq
    assert(expDelta >= 1, "planted graph must make the delta arm eligible")

    val got = Graph.kTrussOf(spark, edf).collect().toSeq
      .map(r2 => (r2.getLong(0), r2.getLong(1), r2.getLong(2), r2.getLong(3)))
    assert(got == exp)
    assert(Graph.ktDeltaRounds >= 1,
      s"delta arm must fire (rebuild=${Graph.ktRebuildRounds}, " +
        s"delta=${Graph.ktDeltaRounds})")
    assert(got.exists(_._3 >= 2L), "peel must cascade past round 1")
    assert(got.exists(_._3 == 0L), "the K14 core must survive")
  }
}
