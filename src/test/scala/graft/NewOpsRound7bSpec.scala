package graft

/** Independent recomputes for the round-7 additions (q190-q197): each
  * distributed result must equal a from-scratch local implementation
  * over the raw parquet rows — plain Scala collections, the same exact
  * integer arithmetic (BigInt where the operators use DECIMAL(38,0)),
  * no shared code with the operators under test.
  */
class NewOpsRound7bSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private lazy val docToks: Seq[(Long, Array[String])] =
    spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))

  test("q190 proximity search ≡ local window scan") {
    val exp = TextAnalysis.ProximityPairs
      .map { case (ta, tb, w) =>
        val perDoc = docToks.flatMap { case (id, tk) =>
          val pa = tk.indices.filter(tk(_) == ta)
          val pb = tk.indices.filter(tk(_) == tb)
          val c = pa.map(i => pb.count(j => math.abs(i - j) <= w)).sum.toLong
          if (c > 0) Some((id, c)) else None
        }
        val best = if (perDoc.isEmpty) None
          else Some(perDoc.minBy { case (id, c) => (-c, id) })
        (s"$ta NEAR/$w $tb", perDoc.size.toLong, perDoc.map(_._2).sum,
          best.map(_._1), best.map(_._2))
      }.sortBy(_._1)
    val got = TextAnalysis.proximitySearch(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(got == exp)
    assert(exp.count(_._2 > 0) >= 2, "corpus must exercise the operator")
  }

  test("q191 skip-gram cooc ≡ local pair count + BigInt lift") {
    val pairs = collection.mutable.Map[(String, String), Long]()
    val uni = collection.mutable.Map[String, Long]()
    var n = 0L
    for ((_, tk) <- docToks; i <- tk.indices) {
      uni(tk(i)) = uni.getOrElse(tk(i), 0L) + 1; n += 1
      for (j <- i + 1 to math.min(i + 3, tk.length - 1)) {
        val k = (tk(i), tk(j)); pairs(k) = pairs.getOrElse(k, 0L) + 1
      }
    }
    val m = pairs.values.sum
    val exp = pairs.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.take(40)
      .map { case ((a, b), c) =>
        val lift = (BigInt(1000) * c * n * n) / (BigInt(m) * uni(a) * uni(b))
        (a, b, c, lift.toLong)
      }.toSet
    val got = TextAnalysis.skipgramCooc(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == exp)
  }

  test("q192 sparse cosine ≡ local tf-idf BigInt floor arithmetic") {
    val tf = collection.mutable.Map[(Long, String), Long]()
    for ((id, tk) <- docToks if tk.length >= 3; i <- 0 to tk.length - 3) {
      val g = tk.slice(i, i + 3).mkString(" ")
      tf((id, g)) = tf.getOrElse((id, g), 0L) + 1
    }
    val df = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      .filter { case (_, c) => c >= 2 && c <= TextAnalysis.SparseCosineDfCap }
    val w = tf.collect { case ((id, g), t) if df.contains(g) =>
      (id, g, t * (100000L / df(g))) }.toSeq
    val n2 = w.groupBy(_._1).view
      .mapValues(_.map(x => BigInt(x._3) * x._3).sum).toMap
    val byG = w.groupBy(_._2)
    val dots = collection.mutable.Map[(Long, Long), BigInt]()
    for ((_, rows) <- byG; a <- rows; b <- rows if a._1 < b._1) {
      val k = (a._1, b._1)
      dots(k) = dots.getOrElse(k, BigInt(0)) + BigInt(a._3) * b._3
    }
    val exp = dots.toSeq.map { case ((da, db), dt) =>
      (da, db, ((BigInt(1000000) * dt * dt) / (n2(da) * n2(db))).toLong)
    }.sortBy { case (da, db, c) => (-c, da, db) }.take(30).toSet
    val got = TextAnalysis.sparseCosineTopK(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exp)
    assert(exp.exists(_._3 > 0), "corpus must produce nonzero similarity")
  }

  test("q193 lag features ≡ local per-user day map") {
    val days = spark.read.parquet(s"$d/events.parquet")
      // the spec session reads parquet micros as NTZ; the UTC session
      // makes the cast exact
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP)) * 1000 AS ns")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1) / 86400000000000L))
    val daily = days.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val exp = daily.toSeq.map { case ((u, day), n) =>
      def at(dd: Long) = daily.getOrElse((u, dd), 0L)
      val sum28 = (day - 27 to day).map(at).sum
      (u, day, n, at(day - 1), at(day - 7), sum28, at(day + 1))
    }.sortBy(t => (t._1, t._2))
    val got = Queries.lagFeatures(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got == exp)
    assert(exp.exists(_._4 > 0) && exp.exists(_._7 > 0),
      "lags and labels must be exercised")
  }

  test("q194 dq audit ≡ local checks") {
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val ord = spark.read.parquet(s"$d/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey", "o_totalprice",
        "CAST(o_orderdate AS STRING) AS od").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    val custKeys = spark.read.parquet(s"$d/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val ordKeys = ord.map(_._1).toSet
    def cents(x: Double) = BigDecimal(x * 100)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val liCents = li.groupBy(_._1).view
      .mapValues(_.map(r => cents(r._4)).sum).toMap
    val nl = li.size.toLong; val no = ord.size.toLong
    val exp = Seq(
      ("li_discount_range", nl, li.count(r => r._3 < 0 || r._3 > 0.5).toLong),
      ("li_orphan_orderkey", nl, li.count(r => !ordKeys(r._1)).toLong),
      ("li_quantity_range", nl, li.count(r => r._2 <= 0 || r._2 > 100).toLong),
      ("ord_childless", no, ord.count(o => !liCents.contains(o._1)).toLong),
      ("ord_date_range", no,
        ord.count(o => o._4 < "1995-01-01" || o._4 >= "2002-01-01").toLong),
      ("ord_dup_pk", no, no - ordKeys.size),
      ("ord_orphan_custkey", no, ord.count(o => !custKeys(o._2)).toLong),
      ("ord_total_recon", no,
        ord.count(o => cents(o._3) != liCents.getOrElse(o._1, 0L)).toLong))
      .map { case (c, n, v) => (c, n, v, 1000000L * v / n) }
    val got = Queries.dqViolations(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == exp)
    assert(exp.exists(_._3 > 0), "at least one check must fire on this data")
  }

  test("q195 chi-square mix ≡ local contingency BigInt") {
    val cells = spark.read.parquet(s"$d/documents.parquet")
      .select("lang", "source").collect().toSeq
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rt = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ct = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = cells.values.sum
    val exp = cells.toSeq.map { case ((l, s), o) =>
      val (r, c) = (rt(l), ct(s))
      val dlt = BigInt(o) * n - BigInt(r) * c
      (l, s, o, 1000L * r * c / n,
        (BigInt(1000) * dlt * dlt / (BigInt(n) * r * c)).toLong)
    }.sortBy(t => (t._1, t._2))
    val got = Curation.chisqMix(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
  }

  test("q196 MRR ≡ recompute from the three top-k plans") {
    def lists(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "neighbor_id", "rank").collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gt1 = lists(Similarity.bruteForceTopK(spark, d))
      .filter(_._3 == 1L).map(t => (t._1, t._2)).toMap
    val ls = lists(Similarity.lshTopK(spark, d))
    val i8 = lists(Similarity.int8TopK(spark, d))
    def rankIn(xs: Seq[(Long, Long, Long)], q: Long): Option[Long] =
      xs.collectFirst { case (`q`, n, rk) if n == gt1(q) => rk }
    val exp = gt1.keys.toSeq.sorted.map { q =>
      val (rl, r8) = (rankIn(ls, q), rankIn(i8, q))
      (q, gt1(q), rl, rl.map(1000000L / _).getOrElse(0L),
        r8, r8.map(1000000L / _).getOrElse(0L))
    }
    val got = Similarity.mrrEval(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5)))
    assert(got == exp)
    assert(exp.exists(_._4 > 0), "LSH must land the true NN for someone")
  }

  test("q197 burstiness ≡ local tf maps") {
    val tf = collection.mutable.Map[(Long, String), Long]()
    for ((id, tk) <- docToks; w <- tk)
      tf((id, w)) = tf.getOrElse((id, w), 0L) + 1
    val exp = tf.groupBy(_._1._2).toSeq.map { case (w, m) =>
      val df = m.size.toLong; val cf = m.values.sum
      val (topDoc, topTf) = m.toSeq
        .map { case ((id, _), t) => (id, t) }.minBy { case (id, t) => (-t, id) }
      (w, df, cf, 1000L * cf / df, topDoc, 1000L * topTf / cf)
    }.sortBy(t => (-t._3, t._1))
    val got = TextAnalysis.termBurstiness(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp)
  }
}
