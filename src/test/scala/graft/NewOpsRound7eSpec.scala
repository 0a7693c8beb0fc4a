package graft

/** Independent recomputes for the fourth round-7 batch (q207-q210) —
  * same discipline as the b/c/d specs: plain Scala over raw parquet
  * rows, identical exact integer arithmetic, no shared code with the
  * operators under test.
  */
class NewOpsRound7eSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("q207 rec eval ≡ local split + top-3 scan") {
    val items = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val train = items.filter(_._1 % 5 != 0)
    val test = items.filter(_._1 % 5 == 0)
    val pairs = collection.mutable.Map[(Long, Long), Long]()
    for ((_, ps) <- train.groupBy(_._1); a <- ps; b <- ps if a._2 != b._2)
      pairs((a._2, b._2)) = pairs.getOrElse((a._2, b._2), 0L) + 1
    val recs = pairs.toSeq.groupBy(_._1._1).view.mapValues { xs =>
      xs.map { case ((_, pb), c) => (pb, c) }
        .sortBy { case (pb, c) => (-c, pb) }.take(3).zipWithIndex
        .map { case ((pb, _), i) => (pb, i + 1L) }
    }.toMap
    val baskets = test.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val cand = test.flatMap { case (ok, p) =>
      recs.getOrElse(p, Seq()).map { case (rec, rk) =>
        (rk, if (baskets(ok).contains(rec)) 1L else 0L) }
    }
    val exp = cand.groupBy(_._1).toSeq.sortBy(_._1).map { case (rk, xs) =>
      val h = xs.map(_._2).sum
      (rk, xs.size.toLong, h, 1000 * h / xs.size)
    }
    val got = Queries.recEval(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == exp)
    assert(exp.exists(_._3 > 0), "some recommendation must hit")
  }

  test("q208 assortativity ≡ local BigInt moments") {
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_suppkey").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1)))
    val os = spark.read.parquet(s"$d/orders.parquet")
      .select("o_orderkey", "o_custkey").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val und = li.flatMap { case (ok, s) =>
      os.get(ok).map(c => (s * 2, c * 2 + 1)) }.distinct
    val arcs = und ++ und.map(_.swap)
    val deg = arcs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val xy = arcs.map { case (u, v) => (deg(u), deg(v)) }
    val n = BigInt(xy.size)
    val sx = BigInt(xy.map(_._1).sum); val sy = BigInt(xy.map(_._2).sum)
    val sxy = xy.map { case (x, y) => BigInt(x) * y }.sum
    val sxx = xy.map { case (x, _) => BigInt(x) * x }.sum
    val syy = xy.map { case (_, y) => BigInt(y) * y }.sum
    val num = n * sxy - sx * sy
    val den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    val expR = if (den == 0) None
      else Some(((if (num < 0) -1 else 1) * (BigInt(1000) * num * num / den)).toLong)
    val r = Graph.degreeAssortativity(spark, d).collect().head
    assert(r.getLong(0) == xy.size.toLong)
    val gotR = if (r.isNullAt(1)) None else Some(r.getLong(1))
    assert(gotR == expR)
    assert(expR.isDefined, "the trade graph must have degree variance")
  }

  test("q209 confusion ≡ recompute from q148's output") {
    val preds = TextAnalysis.nbLangClassify(spark, d)
      .select("lang", "pred").collect().toSeq
      .map(r => (r.getString(0), r.getString(1)))
    val cells = preds.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rt = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ct = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val exp = cells.toSeq.map { case ((l, p), n) =>
      (l, p, n, 1000 * n / rt(l), 1000 * n / ct(p))
    }.sortBy(t => (t._1, t._2))
    val got = TextAnalysis.nbConfusion(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
    // the matrix must have off-diagonal mass (near-chance corpus) and
    // cover every true language
    assert(exp.exists(t => t._1 != t._2) && rt.size == 5)
  }

  test("q210 dow profile ≡ local weekday count") {
    val ev = spark.read.parquet(s"$d/events.parquet")
      .selectExpr("event_type",
        "((unix_micros(CAST(ts AS TIMESTAMP)) * 1000 div 86400000000000) + 3) % 7 AS dow")
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    val cells = ev.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val exp = cells.toSeq.map { case ((et, dw), n) =>
      val t = tot(et)
      (et, dw, n, 1000 * n / t, 1000 * (7 * n - t) / t)
    }.sortBy(t => (t._1, t._2))
    val got = Queries.dowProfile(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
    assert(exp.map(_._2).distinct.size == 7, "all weekdays present")
  }
}
