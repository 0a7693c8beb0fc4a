package graft

/** Independent recomputes for the third round-8 batch (q223/q224). */
class NewOpsRound8cSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def events: Seq[(Long, String, Long)] =
    spark.read.parquet(s"$d/events.parquet")
      .selectExpr("user_id", "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  test("q223 kaplan-meier ≡ local sequential survival fold") {
    val spans = events.groupBy(_._1).view.mapValues { es =>
      val days = es.map(_._3 * 1000 / 86400000000000L)
      (days.min, days.max)
    }.toMap
    val maxDay = spans.values.map(_._2).max
    val grid = (spans.values.map(_._1) ++ spans.values.map(_._2)).toSeq
      .distinct.sorted
    var (cumE, cumXb, s) = (0L, 0L, 1000000L)
    val exp = grid.map { day =>
      cumE += spans.values.count(_._1 == day)
      val x = spans.values.count(_._2 == day).toLong
      val n = cumE - cumXb
      val dd = if (day < maxDay) x else 0L
      s = s * (n - dd) / n
      cumXb += x
      (day, n, dd, x, s)
    }
    val got = Queries.kaplanMeier(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
    // the curve must actually decrease (some user's lifetime ends
    // before the censoring day) and end censored (final day d = 0)
    assert(exp.last._5 < 1000000L && exp.last._3 == 0L)
  }

  test("q224 funnel latency ≡ local stage scan + exact percentiles") {
    val byUser = events.groupBy(_._1)
    val lats = byUser.values.toSeq.flatMap { es =>
      val v = es.filter(_._2 == "view").map(_._3)
      if (v.isEmpty) Nil
      else {
        val v0 = v.min
        val c = es.filter(e => e._2 == "click" && e._3 >= v0).map(_._3)
        if (c.isEmpty) Nil
        else {
          val c0 = c.min
          val first = Seq(("1_view_to_click", (c0 - v0) / 1000000L))
          val p = es.filter(e => e._2 == "purchase" && e._3 >= c0).map(_._3)
          if (p.isEmpty) first
          else first :+ ("2_click_to_purchase", (p.min - c0) / 1000000L)
        }
      }
    }
    def pct(vs: Seq[Long], p: Long): Long = {
      val sorted = vs.sorted
      val n = vs.size.toLong
      val target = (n * p + 99) / 100
      var cum = 0L
      sorted.distinct.map { v =>
        cum += sorted.count(_ == v); (v, cum)
      }.find(_._2 >= target).get._1
    }
    val exp = lats.groupBy(_._1).toSeq.sortBy(_._1).map { case (st, xs) =>
      val vs = xs.map(_._2)
      (st, vs.size.toLong, vs.min, vs.max,
        pct(vs, 50), pct(vs, 90), pct(vs, 99))
    }
    val got = Queries.funnelLatency(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got == exp)
    assert(exp.size == 2 && exp.forall(_._2 > 0))
  }
  test("q227 triples ≡ local A-priori enumeration") {
    val items = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val freq = items.groupBy(_._2).filter(_._2.size >= 2).keySet
    val kept = items.filter(t => freq(t._2))
    val triples = collection.mutable.Map[(Long, Long, Long), Long]()
    kept.groupBy(_._1).values.foreach { b =>
      val ps = b.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.size; k <- j + 1 until ps.size)
        triples((ps(i), ps(j), ps(k))) =
          triples.getOrElse((ps(i), ps(j), ps(k)), 0L) + 1
    }
    val exp = triples.toSeq.filter(_._2 >= 2)
      .map { case ((a, b, c), sp) => (a, b, c, sp) }
      .sortBy(t => (-t._4, t._1, t._2, t._3))
    val got = Queries.copurchaseTriples(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == exp)
    assert(exp.nonEmpty)
    // downward closure: every pair inside a frequent triple must meet
    // the pair support floor too
    val pairs = collection.mutable.Map[(Long, Long), Long]()
    kept.groupBy(_._1).values.foreach { b =>
      val ps = b.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.size)
        pairs((ps(i), ps(j))) = pairs.getOrElse((ps(i), ps(j)), 0L) + 1
    }
    exp.foreach { case (a, b, c, sp) =>
      assert(pairs((a, b)) >= sp && pairs((a, c)) >= sp && pairs((b, c)) >= sp)
    }
  }

  test("q228 backlog ≡ local month-boundary sweep") {
    val close = spark.read.parquet(s"$d/lineitem.parquet")
      .selectExpr("l_orderkey", "CAST(l_shipdate AS DATE) AS sd")
      .collect().toSeq.map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val orders = spark.read.parquet(s"$d/orders.parquet")
      .selectExpr("o_orderkey", "CAST(o_orderdate AS DATE) AS od",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    def mi(dt: java.time.LocalDate) = dt.getYear.toLong * 12 + dt.getMonthValue - 1
    // childless orders have no close date and leave the backlog via
    // the inner join — mirror that
    val rows = orders.flatMap { case (ok, od, cents) =>
      close.get(ok).toSeq.flatMap { cl =>
      (mi(od) + 1 to mi(cl)).map { m =>
        val t = java.time.LocalDate.of((m / 12).toInt, (m % 12).toInt + 1, 1)
        (m, t, cents, java.time.temporal.ChronoUnit.DAYS.between(od, t))
      }
    }}
    val exp = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (m, xs) =>
      (m, xs.head._2.toString, xs.size.toLong, xs.map(_._3).sum,
        xs.map(_._4).max)
    }
    val got = Queries.backlogSnapshots(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got == exp)
    // the backlog must rise and then drain to a final-month tail
    assert(exp.nonEmpty && exp.map(_._3).max > exp.last._3)
  }
}
