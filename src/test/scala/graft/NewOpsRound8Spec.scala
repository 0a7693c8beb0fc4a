package graft

/** Independent recomputes for the round-8 registrations (q211/q212) —
  * the two functions round 7 shipped implemented-but-unregistered.
  * Same discipline as the NewOps family: plain Scala over raw parquet
  * rows, identical exact integer arithmetic, no shared code with the
  * operators under test.
  */
class NewOpsRound8Spec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("q211 benford ≡ local digit histogram") {
    val expected = Array(301L, 176L, 124L, 96L, 79L, 66L, 57L, 51L, 45L)
    val cents = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_extendedprice").collect().toSeq
      .map(r => math.floor(r.getDouble(0) * 100 + 0.5).toLong)
      .filter(_ > 0)
    val cells = cents.map(c => c.toString.head.asDigit.toLong)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = cells.values.sum
    val exp = cells.toSeq.sortBy(_._1).map { case (dg, n) =>
      val share = 1000 * n / t
      (dg, n, share, expected(dg.toInt - 1), share - expected(dg.toInt - 1))
    }
    val got = Queries.benfordAudit(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
    // prices are uniform-ish, not Benford — the audit must REPORT the
    // deviation, and every significant digit 1-9 must appear
    assert(exp.map(_._1) == (1L to 9L) && exp.exists(t => t._5.abs > 10))
  }

  test("q212 forget cascade ≡ local per-table audit") {
    val evIds = spark.read.parquet(s"$d/events.parquet")
      .select("user_id").collect().toSeq.map(_.getLong(0))
    val cuIds = spark.read.parquet(s"$d/customer.parquet")
      .select("c_custkey").collect().toSeq.map(_.getLong(0))
    val ords = spark.read.parquet(s"$d/orders.parquet")
      .select("o_orderkey", "o_custkey").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1)))
    val liOks = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey").collect().toSeq.map(_.getLong(0))
    def audit(tbl: String, n: Long, del: Seq[Long]) = {
      val nd = del.size.toLong
      (tbl, n, nd, n - nd, 1000 * nd / n, del.distinct.size.toLong)
    }
    val delOrd = ords.filter(_._2 % 97 == 0).toMap
    val exp = Seq(
      audit("customer", cuIds.size.toLong, cuIds.filter(_ % 97 == 0)),
      audit("events", evIds.size.toLong, evIds.filter(_ % 97 == 0)),
      audit("lineitem", liOks.size.toLong,
        liOks.flatMap(ok => delOrd.get(ok))),
      audit("orders", ords.size.toLong, ords.map(_._2).filter(_ % 97 == 0)))
    val got = Queries.forgetCascade(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp)
    // the cascade must actually tombstone rows in every table
    assert(exp.forall(_._3 > 0))
  }

  private def docToks: Seq[(Long, Array[String])] =
    spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))

  test("q213/q216 packing ≡ local sequential concat-and-chunk") {
    val C = TextAnalysis.PackChunkTokens
    val toks = docToks.sortBy(_._1)
    var off = 0L
    val exp = toks.map { case (id, tk) =>
      val n = tk.length.toLong
      val (fc, lc) = (off / C, (off + n - 1) / C)
      val row = (id, n, off, fc, lc, lc - fc + 1)
      off += n
      row
    }
    val got = TextAnalysis.contextPacking(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp)
    // chunks must actually span documents at this corpus's doc sizes
    assert(exp.exists(_._6 > 1))

    // chunk manifest from the same local layout
    val perChunk = exp.flatMap { case (id, _, o, fc, lc, _) =>
      (fc to lc).map(c => (c, id, o / C == c))
    }.groupBy(_._1)
    val expM = perChunk.toSeq.sortBy(_._1).map { case (c, xs) =>
      (c, xs.size.toLong, xs.map(_._2).min, xs.map(_._2).max,
        xs.count(_._3).toLong)
    }
    val gotM = TextAnalysis.chunkManifest(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(gotM == expM)
    // every chunk id 0..last must appear (the layout is gap-free)
    assert(expM.map(_._1) == (0L to expM.last._1))
  }

  test("q214 boilerplate ≡ local prefix/suffix histogram") {
    val src = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "source").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1))).toMap
    def ph(t: String): Long =
      t.foldLeft(0L)((a, c) => (a * 131 + c.toLong) % 1000000007L)
    val rows = docToks.filter(_._2.length >= 8).map { case (id, tk) =>
      (src(id), ph(tk.take(8).mkString(" ")), ph(tk.takeRight(8).mkString(" ")))
    }
    def top(xs: Seq[Long]): (Long, Long) =
      xs.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .minBy { case (h, c) => (-c, h) } match { case (h, c) => (h, c) }
    val exp = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (s, xs) =>
      val n = xs.size.toLong
      val (ph1, c1) = top(xs.map(_._2)); val (ph2, c2) = top(xs.map(_._3))
      (s, n, ph1, c1, 1000 * c1 / n, ph2, c2, 1000 * c2 / n)
    }
    val got = TextAnalysis.boilerplateAudit(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got == exp)
    assert(exp.nonEmpty)
  }

  test("q215 kappa ≡ local confusion arithmetic") {
    val p1 = TextAnalysis.langId(spark, d).select("doc_id", "pred")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1))).toMap
    val p2 = TextAnalysis.nbLangClassify(spark, d).select("doc_id", "pred")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1)))
    val pairs = p2.map { case (id, b) => (p1(id), b) }
    val n = pairs.size.toLong
    val a = pairs.count(t => t._1 == t._2).toLong
    val r = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val c = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val sCh = r.keySet.intersect(c.keySet).toSeq
      .map(k => BigInt(r(k)) * c(k)).sum
    val num = BigInt(1000) * (BigInt(a) * n - sCh)
    val den = BigInt(n) * n - sCh
    val expK = if (den == 0) None
      else Some((if (num < 0) -((-num) / den) else num / den).toLong)
    val row = TextAnalysis.classifierKappa(spark, d).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == a)
    assert(row.getLong(2) == sCh.toLong)
    val gotK = if (row.isNullAt(3)) None else Some(row.getLong(3))
    assert(gotK == expK)
    assert(expK.isDefined && a > 0)
  }

  test("q217 token budget ≡ local greedy prefix") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "source", "text").collect().toSeq
      .map { r =>
        val tk = r.getString(2).split(" ", -1)
        val (n, u) = (tk.length.toLong, tk.distinct.length.toLong)
        val st = tk.count(Set("the", "a", "of", "and", "is", "to", "in")).toLong
        val q = 500 * u / n + 200 * st / n + 300 * math.min(n, 200L) / 200
        (r.getLong(0), r.getString(1), n, q)
      }
    val exp = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (s, xs) =>
      val ordered = xs.sortBy { case (id, _, _, q) => (-q, id) }
      var cum = 0L
      val kept = ordered.takeWhile { case (_, _, n, _) =>
        val start = cum; cum += n; start < Curation.TokenBudget
      }
      (s, kept.size.toLong, kept.map(_._3).sum, kept.map(_._4).min)
    }
    val got = Curation.tokenBudgetCutoff(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == exp)
    // the budget must bind: nobody keeps their whole corpus slice
    assert(exp.forall { case (s, k, _, _) => k < docs.count(_._2 == s) })
  }
}
