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
}
