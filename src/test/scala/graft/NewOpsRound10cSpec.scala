package graft

import org.apache.spark.sql.functions._

/** Round-10 batch c: q275 source-dimension drift attribution and q276
  * rich-club coefficient curve — straight-Scala recomputes from the
  * raw parquet, plus the structural certificates. */
class NewOpsRound10cSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("q275 dim drift ≡ local recompute; ranking is the exact |mean diff|") {
    val src = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val rows = spark.read.parquet(s"$d/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>)").collect()
      .flatMap { r =>
        src.get(r.getLong(0)).map { s =>
          (s, r.getSeq[Double](1).toArray.map(v =>
            math.floor(v * 1000000.0).toLong + 1000000L))
        }
      }.toSeq
    val dim = rows.head._2.length
    val cells = rows.groupBy(_._1).map { case (s, g) =>
      s -> (0 until dim).map(i => (g.map(_._2(i)).sum, g.size.toLong))
    }
    val corpus = (0 until dim).map { i =>
      (cells.values.map(_(i)._1).sum, cells.values.map(_(i)._2).sum)
    }
    val exp = cells.toSeq.flatMap { case (s, perDim) =>
      val scored = (0 until dim).map { i =>
        val (ssd, ns) = perDim(i)
        val (cp, n) = corpus(i)
        val num = BigInt(ssd) * n - BigInt(cp) * ns
        val diff = if (num >= 0) (num / (BigInt(ns) * n)).toLong
          else -((-num) / (BigInt(ns) * n)).toLong
        (i.toLong, num.abs, ssd / ns - 1000000L, cp / n - 1000000L, diff)
      }
      scored.sortBy(t => (-t._2, t._1)).take(Similarity.DimDriftTopK)
        .zipWithIndex.map { case ((dm, _, ms, mc, df), r) =>
          (s, (r + 1).toLong, dm, ms, mc, df)
        }
    }.sortBy(t => (t._1, t._2))
    val got = Similarity.sourceDimDrift(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp)
    // the attribution discriminates: the top dim's |diff| strictly
    // exceeds the rank-3 dim's for at least one source
    val bySrc = got.groupBy(_._1)
    assert(bySrc.exists { case (_, g) =>
      math.abs(g.head._6) > math.abs(g.last._6)
    })
  }

  test("q276 rich club ≡ local recompute; hubs interconnect on this graph") {
    val items = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet.toSeq
    val capped = items.groupBy(_._1).toSeq.flatMap { case (ok, g) =>
      g.map(_._2).distinct.sorted.take(Graph.CoPurchaseCap).map(ok -> _)
    }
    val edges = capped.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, g) => n -> g.size.toLong }
    val elite = deg.toSeq.sortBy { case (n, dg) => (-dg, n) }.map(_._1)
    val (nn, ee) = (deg.size.toLong, edges.size.toLong)
    val exp = Graph.RichClubKs.map { k =>
      val mem = elite.take(k).toSet
      val m = mem.size.toLong
      val ek = edges.count(e => mem(e._1) && mem(e._2)).toLong
      val density = if (m < 2) 0L else 2000L * ek / (m * (m - 1))
      val ratio = if (m < 2 || ee == 0) 0L
        else ((BigInt(1000) * ek * nn * (nn - 1)) /
          (BigInt(ee) * m * (m - 1))).toLong
      (k.toLong, m, ek, density, ratio)
    }
    val got = Graph.richClub(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
    // structural certificates: densities are valid milli fractions and
    // this co-purchase graph's hubs beat the global density (the curve
    // is non-vacuous — measured ≈2-2.6x at sf0.01)
    got.foreach { t => assert(t._4 >= 0 && t._4 <= 2000, t) }
    assert(got.exists(_._5 > 1000L), "rich club binds on this graph")
  }

  test("q277 association rules ≡ local recompute; direction matters") {
    val items = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val byBasket = items.groupBy(_._1).map { case (ok, g) =>
      ok -> g.map(_._2)
    }
    val pairCounts = byBasket.values.toSeq.flatMap { ps =>
      val s = ps.toSeq.sorted
      for (i <- s.indices; j <- (i + 1) until s.length) yield (s(i), s(j))
    }.groupBy(identity).map { case (p, g) => p -> g.size.toLong }
      .filter(_._2 >= 3)
    val freq = items.groupBy(_._2).map { case (p, g) => p -> g.size.toLong }
    val tb = byBasket.size.toLong
    val rules = pairCounts.toSeq.flatMap { case ((a, b), cab) =>
      Seq((a, b, cab), (b, a, cab))
    }.map { case (ante, cons, cab) =>
      val (ca, cb) = (freq(ante), freq(cons))
      val conf = 1000L * cab / ca
      val conv = if (ca == cab) None
        else Some(((BigInt(1000) * (tb - cb) * ca) /
          (BigInt(tb) * (ca - cab))).toLong)
      (ante, cons, cab, ca, cb, conf, conv)
    }
    val exp = rules.sortBy(t => (-t._6, t._1, t._2)).take(30)
    val got = Queries.associationRules(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
    assert(got == exp)
    got.foreach { t =>
      assert(t._6 > 0 && t._6 <= 1000, s"confidence out of range: $t")
      assert(t._7.isEmpty == (t._3 == t._4),
        s"conviction NULL iff deterministic rule: $t")
      t._7.foreach(c => assert(c > 0, s"conviction must be positive: $t"))
    }
    // directionality is real on this corpus: some pair's two
    // directions have different confidence
    val confOf = rules.map(t => (t._1, t._2) -> t._6).toMap
    assert(rules.exists(t => confOf.get((t._2, t._1)).exists(_ != t._6)))
  }
}
