package graft

import org.apache.spark.sql.functions._

/** Round-11 batch i: q344 McNemar on the dedup-method 2×2, q345
  * function-word style cosine, q346 Cramér–von Mises — local
  * recomputes plus identities (McNemar counts reconcile with q270's
  * categories; cosine bounded by 10⁶ and symmetric in construction;
  * CvM of a sample against itself is zero). */
class NewOpsRound11iSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("q344 ≡ q270-category recompute; discordant counts reconcile") {
    val cats = Dedup.textMethodAgreement(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val r = Dedup.mcnemarDedup(spark, d).collect()(0)
    val (a, b, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(a == cats.getOrElse("both", 0L))
    assert(b == cats.getOrElse("minhash_only", 0L))
    assert(c == cats.getOrElse("simhash_only", 0L))
    val z2 = if (b + c > 0) Some(1000L * (b - c) * (b - c) / (b + c)) else None
    assert((if (r.isNullAt(3)) None else Some(r.getLong(3))) == z2)
    val odds = if (c > 0) Some(1000L * b / c) else None
    assert((if (r.isNullAt(4)) None else Some(r.getLong(4))) == odds)
    assert(r.getLong(5) == (b - c).signum.toLong)
  }

  test("q345 ≡ local lexicon recompute; cos² within (0, 10⁶]") {
    val ds = spark.read.parquet(s"$d/documents.parquet")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val lex = TextAnalysis.StyleLexicon.toSet
    val counts = ds.flatMap { case (s, t) =>
      t.split(" ", -1).filter(lex).map(w => (s, w))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val srcs = counts.keys.map(_._1).toSeq.distinct.sorted
    def vec(s: String) = TextAnalysis.StyleLexicon
      .map(w => counts.getOrElse((s, w), 0L))
    val exp = (for {
      i <- srcs.indices; j <- srcs.indices if i < j
      va = vec(srcs(i)); vb = vec(srcs(j))
      dot = va.zip(vb).map { case (x, y) => BigInt(x) * y }.sum
      if dot > 0
      na2 = va.map(x => BigInt(x) * x).sum
      nb2 = vb.map(x => BigInt(x) * x).sum
    } yield (srcs(i), srcs(j), va.sum, vb.sum, dot.toLong,
      Some((BigInt(1000000) * dot * dot / (na2 * nb2)).toLong))).toSeq
    val got = TextAnalysis.styleCosine(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(got == exp && got.nonEmpty)
    got.foreach(t => t._6.foreach(v => assert(v > 0L && v <= 1000000L)))
  }

  test("q346 ≡ local grid recompute; self-comparison scores zero") {
    val rows = spark.read.parquet(s"$d/lineitem.parquet")
      .join(spark.read.parquet(s"$d/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .selectExpr("o_orderpriority AS priority",
        "CAST(datediff(l_shipdate, o_orderdate) AS BIGINT) AS lag",
        "CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END AS ret")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def cvm(g: Seq[(Long, Long, Long)]): (Long, Long, Option[Long]) = {
      // g: (lag, a, b) histogram rows
      val sorted = g.sortBy(_._1)
      val n = sorted.map(_._2).sum
      val m = sorted.map(_._3).sum
      var c1 = 0L
      var c2 = 0L
      var t = BigInt(0)
      sorted.foreach { case (_, a, b) =>
        c1 += a; c2 += b
        val dev = BigInt(m) * c1 - BigInt(n) * c2
        t += BigInt(a + b) * dev * dev
      }
      val res = if (n > 0 && m > 0)
        Some((BigInt(1000) * t /
          (BigInt(n + m) * (n + m) * n * m)).toLong)
      else None
      (n, m, res)
    }
    val exp = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (p, g) =>
      val hist = g.groupBy(_._2).toSeq.map { case (lag, xs) =>
        (lag, xs.count(_._3 == 1L).toLong, xs.count(_._3 == 0L).toLong)
      }
      val (n, m, v) = cvm(hist)
      (p, n, m, v)
    }
    val got = Queries.cvmLag(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(got == exp && got.nonEmpty)
    // a distribution against itself: C1·m = C2·n at every value ⇒ 0
    val self = Seq((1L, 5L, 5L), (2L, 3L, 3L), (9L, 2L, 2L))
    assert(cvm(self)._3 == Some(0L))
  }
}
