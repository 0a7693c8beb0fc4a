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
}
