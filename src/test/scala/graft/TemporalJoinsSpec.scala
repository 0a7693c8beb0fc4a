package graft

import graft.operators.TemporalJoins

/** Independent brute-force twins for the temporal joins (the DuckDB
  * oracle is the primary gate; these pin the semantics against a plain
  * Scala computation so a same-bug-both-sides oracle slip can't hide). */
class TemporalJoinsSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"
  private val W = 600000000L // 10 min in µs

  private lazy val events: Seq[(Long, Long, Long, String, Double)] =
    Tables.eventsNs(spark, d)
      .selectExpr("event_id", "ts div 1000 as tus", "user_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq

  private lazy val clicks = events.filter(_._4 == "click")
  private lazy val views = events.filter(_._4 == "view")

  test("asof join equals brute-force max-prior-view per click") {
    val expected = clicks.map { case (cid, cts, u, _, _) =>
      val best = views.filter(v => v._3 == u && v._2 <= cts)
        .sortBy(v => (-v._2, -v._1)).headOption // max ts, then max id
      (cid, u, cts, best.map(_._1), best.map(_._2))
    }.sortBy(_._1)
    val got = TemporalJoins.asofJoin(spark, d).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }.toSeq
    assert(got == expected)
    assert(got.exists(_._4.isDefined)) // corpus actually exercises matches
  }

  test("range join agg equals brute-force window scan per click") {
    val expected = clicks.map { case (cid, cts, u, _, _) =>
      val in = views.filter(v => v._3 == u && v._2 <= cts && cts - v._2 <= W)
      (cid, u, in.size.toLong,
        if (in.isEmpty) None else Some(in.map(v => cts - v._2).min),
        if (in.isEmpty) None else Some(in.map(_._5).max))
    }.sortBy(_._1)
    val got = TemporalJoins.rangeJoinAgg(spark, d).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))
    }.toSeq
    assert(got == expected)
    assert(got.exists(_._3 > 0)) // some clicks have views in-window
  }

  test("custom AsOfJoinExec: identical rows to the union+window composition") {
    val viaExec = TemporalJoins.asofJoinExec(spark, d).collect().map(_.toString).toSeq
    val viaWindow = TemporalJoins.asofJoin(spark, d).collect().map(_.toString).toSeq
    assert(viaExec == viaWindow && viaExec.nonEmpty)
  }

  test("custom AsOfJoinExec: planned physical operator, co-clustered merge") {
    val df = TemporalJoins.asofJoinExec(spark, d)
    val p = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(p.contains("AsOfJoin "), s"custom exec not planned:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    // EnsureRequirements supplies exactly one hash exchange + sort per side
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, "side exchanges")
  }

  test("AsOfJoinExec edges: stale match cleared across keys, ties, missing keys") {
    import spark.implicits._
    // key 1: match before, none after late right rows; key 2: no rights;
    // key 3: tie on time resolved to greatest tie-break id
    val l = Seq((1L, 10L, 100L), (1L, 5L, 101L), (2L, 7L, 102L), (3L, 9L, 103L))
      .toDF("k", "t", "lid")
    val r = Seq((1L, 4L, 200L), (1L, 20L, 201L), (3L, 9L, 300L), (3L, 9L, 301L))
      .toDF("rk", "rt", "rid")
    val out = graft.plans.AsOfJoin.asof(l, r,
        l.col("k"), l.col("t"), r.col("rk"), r.col("rt"), r.col("rid"))
      .collect()
      .map(x => (x.getLong(2), if (x.isNullAt(5)) -1L else x.getLong(5)))
      .toMap
    assert(out == Map(
      100L -> 200L, // latest rt<=10 for k=1 is rt=4
      101L -> 200L, // rt=4 <= 5
      102L -> -1L,  // k=2 has no right rows: the k=1 match must not leak
      103L -> 301L  // rt tie at 9: greatest rid wins
    ))
  }

  test("AsOfJoinExec: null keys/times never match and never crash (SQL semantics)") {
    import spark.implicits._
    val l = Seq((Some(1L), Some(10L), 100L), (None, Some(10L), 101L),
      (Some(1L), None, 102L)).toDF("k", "t", "lid")
    val r = Seq((Some(1L), Some(4L), 200L), (None, Some(1L), 201L),
      (Some(1L), None, 202L)).toDF("rk", "rt", "rid")
    val out = graft.plans.AsOfJoin.asof(l, r,
        l.col("k"), l.col("t"), r.col("rk"), r.col("rt"), r.col("rid"))
      .collect()
      .map(x => (x.getLong(2), if (x.isNullAt(5)) -1L else x.getLong(5)))
      .toMap
    assert(out == Map(
      100L -> 200L, // the only fully-non-null right row matches
      101L -> -1L,  // null left key: no match
      102L -> -1L   // null left time: no match
    ))
  }

  test("AsOfJoinExec: mismatched key/time types fail fast at the API") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L)).toDF("k", "t", "lid")
    val r = Seq((1, 4L, 200L)).toDF("rk", "rt", "rid") // Int key vs Long
    val e = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoin.asof(l, r,
        l.col("k"), l.col("t"), r.col("rk"), r.col("rt"), r.col("rid"))
    }
    assert(e.getMessage.contains("key types differ"))
  }
}
