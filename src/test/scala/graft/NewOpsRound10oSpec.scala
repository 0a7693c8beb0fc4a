package graft

import org.apache.spark.sql.functions._

/** Round-10 batch o: q311 sampled-seed harmonic closeness, q312
  * Markov next-event backtest — local recomputes plus the structural
  * certificates (seed self-exclusion, BFS triangle inequality on the
  * sample; held-out accuracy ≤ in-sample-majority bound). */
class NewOpsRound10oSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("q311 ≡ local multi-source BFS; seeds reach themselves at 0 only") {
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val os = spark.read.parquet(s"$d/orders.parquet")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val undirected = li.flatMap { case (ok, s) =>
      os.get(ok).map(c => (s * 2, c * 2 + 1))
    }.distinct
    val adj: Map[Long, Seq[Long]] = (undirected ++ undirected.map(_.swap))
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).distinct.toSeq }
    val seeds = adj.keys.filter(n => n % 2 == 0 && (n / 2) % 5 == 0)
      .toSeq.sorted.take(Graph.HarmonicSeeds)
    val reach: Seq[(Long, Long)] = seeds.flatMap { seed =>
      // BFS to 4 hops
      var dist = Map[Long, Long](seed -> 0L)
      var frontier = Seq(seed)
      for (h <- 1L to Graph.BfsRounds) {
        frontier = frontier.flatMap(n => adj.getOrElse(n, Seq.empty))
          .distinct.filterNot(n => dist.contains(n))
        dist ++= frontier.map(_ -> h)
      }
      dist.toSeq.filter(_._2 > 0)
    }
    val exp = reach.groupBy(_._1).map { case (node, g) =>
      (node, g.length.toLong, g.map(t => 1000L / t._2).sum)
    }.toSeq.sortBy(_._1)
    val got = Graph.harmonicCloseness(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got == exp)
    // harmonic mass per node is bounded by 1000 × seeds reached
    got.foreach(t => assert(t._3 <= 1000L * t._2 && t._3 >= 1000L * t._2 / 4))
  }

  test("q312 ≡ local recompute; trained predictor beats or ties baseline in-train") {
    val ev = Tables.eventsNs(spark, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (uid, g) =>
      val s = g.sortBy(e => (e._3, e._4)).map(_._2)
      s.zip(s.drop(1)).map { case (f, t) => (uid, f, t) }
    }
    val train = trans.filter(_._1 % 2 == 0)
    val test = trans.filter(_._1 % 2 != 0)
    val counts = train.groupBy(t => (t._2, t._3))
      .map { case ((f, t), g) => (f, t, g.length.toLong) }.toSeq
    val pred = counts.groupBy(_._1).map { case (f, g) =>
      f -> g.minBy(c => (-c._3, c._2))._2
    }
    val basePred = counts.groupBy(_._2).map { case (t, g) =>
      (t, g.map(_._3).sum)
    }.toSeq.minBy(c => (-c._2, c._1))._1
    val exp = test.groupBy(_._2).map { case (f, g) =>
      val n = g.length.toLong
      val p = pred.get(f)
      val hits = g.count(t => p.contains(t._3)).toLong
      val bhits = g.count(_._3 == basePred).toLong
      (f, p, n, hits, 1000L * hits / n, bhits, 1000L * bhits / n,
        if (bhits > 0) Some(1000L * hits / bhits) else None)
    }.toSeq.sortBy(_._1)
    val got = Queries.markovBacktest(spark, d).collect().toSeq
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getString(1)), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        if (r.isNullAt(7)) None else Some(r.getLong(7))))
    assert(got == exp)
    // sanity: on the TRAIN half itself, the conditional predictor's
    // hit count is >= the unconditional baseline's by construction
    val trainHits = train.count(t => pred.get(t._2).contains(t._3))
    val trainBase = train.count(_._3 == basePred)
    assert(trainHits >= trainBase)
  }
}
