package graft

import org.apache.spark.sql.functions._

/** Round-12 batch a: q347 repeat-purchase discrete hazard, q348
  * pairwise source total-variation distance — local recomputes plus
  * the structural invariances each statistic must satisfy (hazard's
  * at-risk column telescopes to the total gap count; TV is symmetric,
  * zero on self-comparison by construction, and ≤ 10⁶). */
class NewOpsRound12aSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("q347 ≡ local life-table recompute; at_risk telescopes") {
    val orders = spark.read.parquet(s"$d/orders.parquet")
      .selectExpr("o_custkey", "CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT) AS dy",
        "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps = orders.groupBy(_._1).values.flatMap { os =>
      val sorted = os.sortBy(o => (o._2, o._3))
      sorted.sliding(2).collect { case Array(a, b) => b._2 - a._2 }
    }.toSeq
    val hist = gaps.groupBy(_ / 7).view.mapValues(_.size.toLong).toMap
    val wks = hist.keys.toSeq.sorted
    val exp = wks.map { wk =>
      val atRisk = hist.filter(_._1 >= wk).values.sum
      (wk, hist(wk), atRisk, 1000L * hist(wk) / atRisk)
    }
    val got = Queries.repeatHazard(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == exp)
    // the at-risk column telescopes: smallest bucket's at_risk is the
    // total gap count, and hazard is within (0, 1000]
    assert(got.head._3 == gaps.size.toLong)
    assert(got.forall(r => r._4 >= 0 && r._4 <= 1000))
    assert(got.last._4 > 0) // largest bucket: all remaining gaps end here
  }

  test("q348 ≡ local TV recompute; symmetric, bounded, zero on self") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = docs.groupBy(_._1).view.mapValues { ds =>
      ds.flatMap(_._2.split(" ", -1)).groupBy(identity).view
        .mapValues(_.length.toLong).toMap
    }.toMap
    val totals = counts.view.mapValues(_.values.sum).toMap
    val srcs = counts.keys.toSeq.sorted
    def tvPpm(a: String, b: String): (Long, Long) = {
      val (ca, cb) = (counts(a), counts(b))
      val (t1, t2) = (BigInt(totals(a)), BigInt(totals(b)))
      val keys = ca.keySet ++ cb.keySet
      val num = keys.toSeq.map { w =>
        (BigInt(ca.getOrElse(w, 0L)) * t2 - BigInt(cb.getOrElse(w, 0L)) * t1).abs
      }.sum
      val shared = ca.keySet.intersect(cb.keySet).size.toLong
      ((BigInt(1000000) * num / (2 * t1 * t2)).toLong, shared)
    }
    val exp = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
    } yield {
      val (tv, sh) = tvPpm(srcs(i), srcs(j))
      (srcs(i), srcs(j), sh, tv)
    }).toSeq
    val got = TextAnalysis.sourceTvDistance(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got == exp)
    // invariances: TV(a,b) = TV(b,a) by the |·| symmetry of the local
    // recompute; self-distance is 0; every pair within [0, 10⁶]
    assert(tvPpm(srcs.head, srcs.head)._1 == 0L)
    assert(got.forall(r => r._4 >= 0 && r._4 <= 1000000))
  }

  test("q348 emits disjoint-vocabulary pairs with n_shared=0, tv_ppm=10^6") {
    // r12 ADVICE: the shared-term inner join alone drops pairs with no
    // common vocabulary; the totals pair spine must restore them. The
    // corpus fixtures never contain such a pair, so build one.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q348disjoint").toFile
    try {
      Seq(("alpha", "aa bb aa"), ("beta", "cc dd"), ("gamma", "aa ee"))
        .toDF("source", "text")
        .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
      val got = TextAnalysis.sourceTvDistance(spark, dir.getAbsolutePath)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq
      // alpha∩beta = ∅ → exactly 10⁶; alpha∩gamma = {aa}; beta∩gamma = ∅
      assert(got.map(r => (r._1, r._2, r._3)) ==
        Seq(("alpha", "beta", 0L), ("alpha", "gamma", 1L), ("beta", "gamma", 0L)))
      assert(got.filter(_._3 == 0L).forall(_._4 == 1000000L))
      // alpha={aa:2,bb:1} t1=3, gamma={aa:1,ee:1} t2=2:
      // num = |2·2−1·3| + |1·2−0| + |0−1·3| = 1+2+3 = 6 → 6·10⁶/12 = 500000
      assert(got.find(r => r._1 == "alpha" && r._2 == "gamma").get._4 == 500000L)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).toSeq.flatten.foreach(rm); f.delete(); ()
      }
      rm(dir)
    }
  }
}
