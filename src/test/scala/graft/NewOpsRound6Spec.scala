package graft

/** Independent driver-side recomputes for the late-round-6 additions
  * (q167-q171): each distributed result must equal a from-scratch
  * local implementation over the raw parquet rows — plain Scala
  * collections, the same exact integer arithmetic, no shared code
  * with the operators under test.
  */
class NewOpsRound6Spec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  /** Local symmetric trade-graph adjacency (s ↦ 2s, c ↦ 2c+1). */
  private lazy val tradeAdj: Map[Long, Set[Long]] = {
    val om = spark.read.parquet(s"$d/orders.parquet")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val undirected = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_suppkey").collect()
      .flatMap(r => om.get(r.getLong(0)).map(c => (2 * r.getLong(1), 2 * c + 1)))
      .toSet
    val arcs = undirected.flatMap { case (s, c) => Seq(s -> c, c -> s) }
    arcs.groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2) }
  }

  /** Local (doc_id, lang, tokens) rows — split on single space, the
    * engine's corpus-wide convention. */
  private lazy val docToks: Seq[(Long, String, Array[String])] =
    spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "lang", "text").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1)))

  test("q167 link prediction ≡ local wedge count + exact Jaccard") {
    val adj = tradeAdj
    val deg = adj.map { case (n, vs) => n -> vs.size.toLong }
    // wedges through intermediates under the hub cap
    val common = scala.collection.mutable.Map[(Long, Long), Long]()
    for ((m, nbrs) <- adj if deg(m) <= Graph.LinkDegCap) {
      val ns = nbrs.toSeq.sorted
      for (i <- ns.indices; j <- i + 1 until ns.size) {
        val k = (ns(i), ns(j))
        common(k) = common.getOrElse(k, 0L) + 1L
      }
    }
    val exp = common.toSeq.collect {
      case ((a, b), c) if c >= 2 =>
        (a, b, c, deg(a), deg(b), 1000L * c / (deg(a) + deg(b) - c))
    }.sortBy(t => (t._1, t._2))
    val got = Graph.linkPredict(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp && got.nonEmpty)
    // bipartite graph: candidate endpoints sit on the same side, so no
    // pair may also be an edge, and parities must agree
    assert(got.forall { case (a, b, _, _, _, _) =>
      (a % 2 == b % 2) && !adj(a).contains(b)
    })
  }

  test("q168 event gaps ≡ local sorted-diff order statistics") {
    val byUser = Tables.eventsNs(spark, d)
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val exp = byUser.toSeq.collect {
      case (u, ts) if ts.length >= 2 =>
        val gaps = ts.sliding(2).map(p => (p(1) - p(0)) / 1000000000L)
          .toSeq.sorted
        val n = gaps.length.toLong
        (u, n, gaps.head, gaps(((n + 1) / 2 - 1).toInt),
          gaps(((9 * n + 9) / 10 - 1).toInt), gaps.last, gaps.sum / n)
    }.sortBy(_._1)
    val got = Queries.eventGaps(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got == exp && got.nonEmpty)
    // order statistics are monotone: min ≤ median ≤ p90 ≤ max
    assert(got.forall(t => t._3 <= t._4 && t._4 <= t._5 && t._5 <= t._6))
  }

  test("q169 token concentration ≡ local exact HHI/top-share/TTR") {
    val exp = docToks.map { case (id, _, tk) =>
      val c = tk.groupBy(identity).map(_._2.length.toLong).toSeq
      val n = c.sum
      (id, n, c.size.toLong, 1000000L * c.map(x => x * x).sum / (n * n),
        1000L * c.max / n, 1000L * c.size / n)
    }.sortBy(_._1)
    val got = TextAnalysis.tokenConcentration(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp && got.nonEmpty)
    // HHI lower bound 1e6/n_distinct (uniform), upper bound 1e6
    assert(got.forall(t => t._4 >= 1000000L / t._3 - 1 && t._4 <= 1000000L))
  }

  test("q170 frequency spectrum ≡ local pow-2 bucketing; masses add up") {
    val wc = docToks.flatMap(_._3).groupBy(identity)
      .map { case (w, xs) => w -> xs.length.toLong }
    val exp = wc.toSeq
      .map { case (w, c) => (63 - java.lang.Long.numberOfLeadingZeros(c).toLong, w, c) }
      .groupBy(_._1).toSeq
      .map { case (b, xs) =>
        (b, xs.size.toLong, xs.map(_._3).sum, xs.map(_._2).min)
      }.sortBy(_._1)
    val got = TextAnalysis.freqSpectrum(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got == exp && got.nonEmpty)
    // bucket masses partition the corpus token count exactly
    assert(got.map(_._3).sum == docToks.map(_._3.length.toLong).sum)
  }

  test("q171 k-anonymity ≡ local group audit; suppression exact at K") {
    val groups = docToks
      .map { case (_, lang, tk) => (lang, tk.length.toLong / Curation.AnonBucketTokens) }
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val exp = groups.map { case ((lang, b), n) =>
      (lang, b, n, if (n < Curation.AnonK) 1L else 0L,
        if (n < Curation.AnonK) 0L else n)
    }.sortBy(t => (t._1, t._2))
    val got = Curation.kAnonymity(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp && got.nonEmpty)
    // suppressed groups retain zero docs; retained groups all of them
    assert(got.forall(t => (t._4 == 1L) == (t._5 == 0L)))
  }
}
