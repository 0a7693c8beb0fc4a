package graft

/** Independent recomputes for the sixth round-8 batch (q237-q239):
  * plain Scala folds over collected rows. q238 takes the persisted
  * cluster labels and the q28 predictions as INPUTS (both pinned by
  * their own specs/oracles) and independently refolds the
  * majority/minority arithmetic — the same dependency discipline as
  * the q221 yield spec. */
class NewOpsRound8fSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("q237 gapped triples ≡ local subsequence enumeration") {
    val ev = spark.read.parquet(s"$d/events.parquet")
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP))",
        "event_type", "event_id")
      .collect().toSeq
      // µs → day via the same ns-domain floor the operator uses
      .map(r => (r.getLong(0), r.getLong(1) * 1000L / 86400000000000L,
        r.getString(2), r.getLong(1), r.getLong(3)))
    val bySess = ev.groupBy(x => (x._1, x._2)).values.toSeq
    val support = bySess.flatMap { xs =>
      val ts = xs.sortBy(x => (x._4, x._5)).take(Queries.SeqCap).map(_._3)
      (for {
        i <- ts.indices; j <- i + 1 until ts.size; k <- j + 1 until ts.size
      } yield (ts(i), ts(j), ts(k))).distinct
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val exp = support.filter(_._2 >= Queries.SeqMinSup)
      .map { case ((a, b, c), s) => (a, b, c, s) }
      .sortBy(x => (x._1, x._2, x._3))
    val got = Queries.eventSeqTriples(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got == exp)
    // ordering carries signal: some ordered pattern's support differs
    // from its reverse (so this is NOT just co-occurrence counting)
    val all = support.toMap
    assert(exp.exists { case (a, b, c, s) =>
      all.getOrElse((c, b, a), 0L) != s
    })
    // the min-support filter bites
    assert(support.exists(_._2 < Queries.SeqMinSup))
  }

  test("q238 cluster language mix ≡ local majority fold over the labels") {
    val labels = Dedup.nearDupClusters(spark, d)
      .selectExpr("doc_id", "cluster_id", "cluster_n").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._3 > 1)
    val pred = TextAnalysis.langId(spark, d)
      .selectExpr("doc_id", "pred").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val exp = labels.groupBy(_._2).toSeq.map { case (cid, xs) =>
      val langs = xs.map(x => pred(x._1))
      val counts = langs.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      val (majL, majN) = counts.maxBy { case (l, n) => (n, l) }
      val n = langs.size.toLong
      (cid, n, counts.size.toLong, majL,
        Math.floorDiv(1000L * (n - majN), n))
    }.sortBy(_._1)
    val got = Dedup.clusterLangMix(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4)))
    assert(got == exp)
    // multi-doc clusters exist; monolingual majorities dominate (the
    // corpus is not all translation pairs)
    assert(exp.nonEmpty && exp.exists(_._5 == 0L))
  }

  test("q243 cluster diff stats ≡ local pairwise fold over the labels") {
    val labels = Dedup.nearDupClusters(spark, d)
      .selectExpr("doc_id", "cluster_id", "cluster_n").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(x => x._3 >= 2 && x._3 <= Dedup.DiffStatsMaxCluster)
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .selectExpr("doc_id", "n_chars", "text").collect().toSeq
      .map { r =>
        // the q31 polyhash, refolded locally char-by-char
        val h = r.getString(2).foldLeft(BigInt(0))(
          (acc, c) => (acc * 131 + c.toInt) % 1000000007)
        (r.getLong(0), (r.getLong(1), h.toLong))
      }.toMap
    val exp = labels.groupBy(_._2).toSeq.map { case (cid, xs) =>
      val ds = xs.map(_._1).sorted
      val pairs = for { i <- ds.indices; k <- i + 1 until ds.size }
        yield (docs(ds(i)), docs(ds(k)))
      val lds = pairs.map { case ((la, _), (lb, _)) => math.abs(la - lb) }.sum
      val ex = pairs.count { case ((_, fa), (_, fb)) => fa == fb }.toLong
      (cid, pairs.size.toLong,
        Math.floorDiv(1000L * lds, pairs.size.toLong), ex)
    }.sortBy(_._1)
    val got = Dedup.clusterDiffStats(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == exp)
    // the geometry separates clusters: deltas vary, and near-dups are
    // not all byte-identical
    assert(exp.nonEmpty && exp.map(_._3).distinct.size > 1)
    assert(exp.map(_._4).sum < exp.map(_._2).sum)
  }

  test("q239 perfect-order rate ≡ local all-lines fold") {
    val om = spark.read.parquet(s"$d/orders.parquet")
      .selectExpr("o_orderkey",
        "CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)",
        "CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT)")
      .collect().toSeq
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val worst = spark.read.parquet(s"$d/lineitem.parquet")
      .selectExpr("l_orderkey",
        "CAST(datediff(l_shipdate, DATE '1970-01-01') AS BIGINT)")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq.map { case (ok, xs) =>
        val (m, od) = om(ok)
        (m, xs.map(_._2).max - od)
      }
    def signDiv(a: Long, b: Long): Long =
      if (a >= 0) Math.floorDiv(a, b) else -Math.floorDiv(-a, b)
    val exp = worst.groupBy(_._1).toSeq.map { case (m, xs) =>
      val n = xs.size.toLong
      val p = xs.count(_._2 <= 30L).toLong
      (m, n, p, Math.floorDiv(1000L * p, n),
        signDiv(1000L * xs.map(_._2).sum, n))
    }.sortBy(_._1)
    val got = Queries.perfectOrderRate(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
    // the quantifier matters: perfect rate is neither 0 nor 1000
    // everywhere
    assert(exp.exists(x => x._4 > 0L && x._4 < 1000L))
  }
}
