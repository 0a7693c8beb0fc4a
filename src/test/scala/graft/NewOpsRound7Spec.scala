package graft

/** Independent driver-side recomputes for the r6-snapshot trio
  * (q187-q189) — registered last round without a check; this spec plus
  * their new oracle entries closes that gap. Each distributed result
  * must equal a from-scratch local implementation over the raw parquet
  * rows — plain Scala collections, the same exact integer arithmetic,
  * no shared code with the operators under test.
  */
class NewOpsRound7Spec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private lazy val docToks: Seq[(Long, Array[String])] =
    spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))

  test("q187 phrase search ≡ local sliding-window scan") {
    val exp = TextAnalysis.SearchPhrases.sorted.map { ph =>
      val ws = ph.split(' ')
      val perDoc = docToks.flatMap { case (id, tk) =>
        val c = (0 to tk.length - ws.length)
          .count(i => ws.indices.forall(j => tk(i + j) == ws(j)))
        if (c > 0) Some((id, c.toLong)) else None
      }
      // a phrase with no hits degrades to (0, 0, null, null) — the
      // same shape Spark's min(struct) over an empty group produces
      val best = if (perDoc.isEmpty) None
        else Some(perDoc.minBy { case (id, c) => (-c, id) })
      (ph, perDoc.size.toLong, perDoc.map(_._2).sum,
        best.map(_._1), best.map(_._2))
    }
    val got = TextAnalysis.phraseSearch(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(got == exp)
    // the corpus actually exercises the operator (sf0.001 covers the
    // 2-token phrases; the 3-token one needs sf0.01's larger corpus)
    assert(exp.count(_._2 > 0) >= 2)
  }

  test("q188 equi-depth histogram ≡ local sorted cumulative") {
    val dollars = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_extendedprice").collect()
      .map(r => BigDecimal(r.getDouble(0) * 100)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong / 100L)
    val hist = dollars.groupBy(identity).view
      .mapValues(_.length.toLong).toSeq.sortBy(_._1)
    val n = dollars.length.toLong
    var cum = 0L
    val binned = hist.map { case (v, c) =>
      val bin = (cum * 8L) / n; cum += c; (bin, v, c)
    }
    val exp = binned.groupBy(_._1).toSeq.sortBy(_._1).map { case (b, g) =>
      (b, g.map(_._3).sum, g.map(_._2).min, g.map(_._2).max, g.size.toLong)
    }
    val got = Queries.equiDepthHist(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got == exp && got.nonEmpty)
    // equi-DEPTH, not equi-width: bins deviate from n/8 by at most the
    // largest single dollar-group (a group is never split across bins)
    val maxGroup = hist.map(_._2).max
    assert(got.forall { case (_, rows, _, _, _) =>
      rows <= n / 8 + maxGroup && rows >= 1L
    })
    assert(got.map(_._2).sum == n)
  }

  test("q189 sliding active users ≡ local exact re-derivation per day") {
    val ev = Tables.eventsNs(spark, d).select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1) / (86400L * 1000000000L)))
    val byDay = ev.groupBy(_._2)
    val exp = byDay.toSeq.sortBy(_._1).map { case (day, rows) =>
      val dau = rows.map(_._1).distinct.length.toLong
      val wau = ev.collect {
        case (u, dd) if dd > day - 7 && dd <= day => u
      }.distinct.length.toLong
      (day, rows.length.toLong, dau, wau, 1000L * dau / wau)
    }
    val got = Queries.slidingActiveUsers(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got == exp && got.nonEmpty)
    // WAU dominates DAU; stickiness is a proper per-mille
    assert(got.forall { case (_, _, dau, wau, s) =>
      wau >= dau && s >= 0L && s <= 1000L
    })
  }
}
