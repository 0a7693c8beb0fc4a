package graft

/** Independent recomputes for the second round-7 batch (q198-q202) —
  * same discipline as NewOpsRound7bSpec: plain Scala collections over
  * the raw parquet rows, identical exact integer arithmetic, no shared
  * code with the operators under test.
  */
class NewOpsRound7cSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("q198 co-purchase pairs ≡ local basket scan") {
    val items = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val freq = items.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val t = items.map(_._1).distinct.size.toLong
    val pairs = collection.mutable.Map[(Long, Long), Long]()
    for ((_, ps) <- items.groupBy(_._1); a <- ps; b <- ps if a._2 < b._2) {
      val k = (a._2, b._2); pairs(k) = pairs.getOrElse(k, 0L) + 1
    }
    val exp = pairs.toSeq.filter(_._2 >= 3)
      .sortBy { case ((a, b), c) => (-c, a, b) }.take(30)
      .map { case ((a, b), c) =>
        (a, b, c, freq(a), freq(b), 1000L * c * t / (freq(a) * freq(b)))
      }.toSet
    val got = Queries.copurchasePairs(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == exp)
    assert(exp.nonEmpty, "corpus must produce supported pairs")
  }

  test("q199 RFM ≡ local value-group quintiles") {
    val per = spark.read.parquet(s"$d/orders.parquet")
      .selectExpr("o_custkey",
        "CAST(datediff(o_orderdate, DATE '1970-01-01') AS LONG) AS day",
        "CAST(round(o_totalprice * 100) AS LONG) AS cents")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (ck, rows) =>
        (ck, rows.map(_._2).max, rows.size.toLong, rows.map(_._3).sum)
      }.toSeq
    val now = per.map(_._2).max
    val base = per.map { case (ck, last, f, m) =>
      (ck, now - last, f, m, m / 10000L) }
    val n = base.size.toLong
    def score[T](vals: Seq[Long], betterIsSmaller: Boolean): Map[Long, Long] = {
      val byV = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
      byV.map { case (v, _) =>
        val before = byV.collect {
          case (w, c) if (if (betterIsSmaller) w > v else w < v) => c
        }.sum
        v -> (before * 5 / n + 1)
      }
    }
    val rs = score(base.map(_._2), betterIsSmaller = true)
    val fs = score(base.map(_._3), betterIsSmaller = false)
    val ms = score(base.map(_._5), betterIsSmaller = false)
    val exp = base.map { case (ck, r, f, m, mh) =>
      (ck, r, f, m / 100L, rs(r), fs(f), ms(mh),
        rs(r) * 100 + fs(f) * 10 + ms(mh))
    }.sortBy(_._1)
    val got = Queries.rfmScores(spark, d).collect().toSeq
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5), x.getLong(6), x.getLong(7)))
    assert(got == exp)
    assert(exp.map(_._5).distinct.size > 1, "recency quintiles must spread")
  }

  test("q200 salt plan ≡ local count profile") {
    val counts = spark.read.parquet(s"$d/orders.parquet")
      .select("o_custkey").collect().map(_.getLong(0)).toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = counts.values.sum; val nkeys = counts.size.toLong
    val target = math.max(1L, 2 * total / nkeys)
    val exp = counts.toSeq.sortBy { case (k, c) => (-c, k) }.take(10)
      .map { case (k, c) =>
        (k, c, 1000 * c / total, 1000 * c * nkeys / total,
          (c + target - 1) / target)
      }
    val got = Queries.saltPlan(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
  }

  test("q201 LOCF ≡ local trailing-window scan") {
    val ev = spark.read.parquet(s"$d/events.parquet")
      .selectExpr("user_id",
        "unix_micros(CAST(ts AS TIMESTAMP)) * 1000 div 86400000000000 AS day",
        "event_type", "CAST(round(value * 100) AS LONG) AS cents")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val days = ev.groupBy(e => (e._1, e._2)).view.mapValues(_.size.toLong)
    val pur = ev.filter(_._3 == "purchase").groupBy(e => (e._1, e._2)).view
      .mapValues(_.map(_._4).sum).toMap
    val exp = days.toSeq.map { case ((u, day), ne) =>
      val cand = (day - 7 to day).filter(pd => pur.contains((u, pd)))
      val lpd = if (cand.isEmpty) None else Some(cand.max)
      (u, day, ne, lpd, lpd.map(p => pur((u, p))).getOrElse(0L),
        lpd.map(day - _))
    }.sortBy(t => (t._1, t._2))
    val got = Queries.locfFeatures(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(got == exp)
    assert(exp.exists(_._6.exists(_ > 0)), "some carry must be older than 0d")
  }

  test("q202 cardinality estimate ≡ local capped-stats formula") {
    val counts = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_partkey").collect().map(_.getLong(0)).toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nRows = counts.values.sum; val nKeys = counts.size.toLong
    val exact = counts.values.map(c => c * c).sum
    val top = counts.toSeq.sortBy { case (k, c) => (-c, k) }.take(20)
    val (topSq, topRows, topKeys) =
      (top.map(t => t._2 * t._2).sum, top.map(_._2).sum, top.size.toLong)
    val est = topSq + (if (nKeys > topKeys)
      (nRows - topRows) * (nRows - topRows) / (nKeys - topKeys) else 0L)
    val exp = (nKeys, nRows, exact, est, 1000 * math.abs(est - exact) / exact)
    val r = Queries.joinCardEst(spark, d).collect().head
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4))
    assert(got == exp)
  }
}
