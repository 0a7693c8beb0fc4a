package graft

/** Independent recomputes for the fourth round-8 batch (q229-q232):
  * each operator replayed as a plain Scala fold over collected rows —
  * no Spark SQL in the expected side, so a shared planner bug can't
  * hide. BigInt throughout where the operator routes DECIMAL(38,0). */
class NewOpsRound8dSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def lineRows: Seq[(Long, Long, Long, Long, Long)] =
    spark.read.parquet(s"$d/lineitem.parquet")
      .selectExpr("l_partkey", "l_suppkey",
        "CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT)",
        "CAST(round(l_extendedprice * 100) AS BIGINT)",
        "CAST(round(l_quantity) AS BIGINT)")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

  test("q229 cohort LTV ≡ local triangle fold") {
    val o = spark.read.parquet(s"$d/orders.parquet")
      .selectExpr("o_custkey",
        "CAST(round(o_totalprice * 100) AS BIGINT)",
        "CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cohort = o.groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val sizes = cohort.values.groupBy(identity).view.mapValues(_.size.toLong)
    val cells = o.groupBy(x => (cohort(x._1), x._3 - cohort(x._1)))
      .map { case ((cm, off), xs) =>
        (cm, off, xs.map(_._1).distinct.size.toLong, xs.map(_._2).sum)
      }.toSeq
    val exp = cells.groupBy(_._1).toSeq.flatMap { case (cm, xs) =>
      var cum = 0L
      xs.sortBy(_._2).map { case (_, off, na, rev) =>
        cum += rev
        val sz = sizes(cm)
        (cm, off, na, rev, cum, sz, Math.floorDiv(cum, sz))
      }
    }.sortBy(x => (x._1, x._2))
    val got = Queries.cohortLtv(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got == exp)
    // cumulative actually accumulates: some cohort has offset > 0 with
    // cum_rev > first-month rev
    assert(exp.exists(x => x._2 > 0 && x._5 > x._4))
  }

  private def unitPrices: Map[(Long, Long, Long), (Long, Long)] =
    // (part, supp, month) -> (unit milli-cents, qty) building block
    lineRows.groupBy(x => (x._1, x._2, x._3)).map { case (k, xs) =>
      val sc = xs.map(_._4).sum; val sq = xs.map(_._5).sum
      k -> (Math.floorDiv(1000L * sc, sq), sq)
    }

  test("q230 Laspeyres index ≡ local matched-sample fold") {
    val brand = spark.read.parquet(s"$d/part.parquet")
      .selectExpr("p_partkey", "p_brand").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val pm = lineRows.groupBy(x => (x._1, x._3)).map { case ((pk, m), xs) =>
      val sc = xs.map(_._4).sum; val sq = xs.map(_._5).sum
      (pk, m, Math.floorDiv(1000L * sc, sq), sq)
    }.toSeq.filter(x => brand.contains(x._1))
    val bp = pm.map(x => (brand(x._1), x._1, x._2, x._3, x._4))
    val m0 = bp.groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val base = bp.filter(x => x._3 == m0(x._1))
      .map(x => ((x._1, x._2), (x._5, x._4))).toMap // (brand,pk)->(q0,p0)
    val exp = bp.filter(x => base.contains((x._1, x._2)))
      .groupBy(x => (x._1, x._3)).toSeq.map { case ((b, m), xs) =>
        val num = xs.map(x => BigInt(base((b, x._2))._1) * x._4).sum
        val den = xs.map(x => BigInt(base((b, x._2))._1) * base((b, x._2))._2).sum
        (b, m, xs.size.toLong, ((BigInt(1000) * num) / den).toLong)
      }.sortBy(x => (x._1, x._2))
    val got = Queries.priceIndex(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == exp)
    // base month indexes at exactly 1000 (the fixed basket priced at
    // its own base prices)
    assert(exp.filter(x => x._2 == m0(x._1)).forall(_._4 == 1000L))
    assert(exp.exists(_._4 != 1000L))
  }

  test("q231 cheapest supplier ≡ local arg-min with suppkey tie-break") {
    val ps = lineRows.groupBy(x => (x._1, x._2)).map { case ((pk, sk), xs) =>
      val sc = xs.map(_._4).sum; val sq = xs.map(_._5).sum
      (pk, sk, Math.floorDiv(1000L * sc, sq))
    }.toSeq
    val exp = ps.groupBy(_._1).toSeq.map { case (pk, xs) =>
      val best = xs.map(x => (x._3, x._2)).min
      (pk, best._2, best._1, xs.size.toLong, xs.map(_._3).max - xs.map(_._3).min)
    }.sortBy(_._1)
    val got = Queries.cheapestSupplier(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
    // the market disagrees somewhere: at least one part has >1 supplier
    // with a nonzero spread
    assert(exp.exists(x => x._4 > 1 && x._5 > 0))
  }

  test("q232 length Gini ≡ local pairwise mean-absolute-difference") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .selectExpr("source", "n_chars").collect().toSeq
      .map(r => (r.getString(0), r.getLong(1)))
    val exp = docs.groupBy(_._1).toSeq.map { case (src, xs) =>
      val vs = xs.map(_._2)
      val n = BigInt(vs.size)
      val s = vs.map(BigInt(_)).sum
      // brute-force Δ/2 = Σ_{i<j} |vi - vj| — O(n²) is fine at spec
      // scale and is a genuinely independent formula
      val sorted = vs.sorted
      val hd = sorted.zipWithIndex
        .map { case (v, i) => BigInt(i) * v - sorted.take(i).map(BigInt(_)).sum }
        .sum
      (src, vs.size.toLong, (s / n).toLong,
        ((BigInt(1000) * hd) / (n * s)).toLong)
    }.sortBy(_._1)
    val got = Curation.lengthGini(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == exp)
    // lengths are unequal enough to register but Gini stays a proper
    // fraction
    assert(exp.forall(x => x._4 > 0 && x._4 < 1000))
  }
}
