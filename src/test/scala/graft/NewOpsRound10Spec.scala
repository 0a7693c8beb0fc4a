package graft

import org.apache.spark.sql.functions._

/** Round-10 batch a: q267 curation rule audit, q268 RFM segment
  * migration, q269 int8 quantization fidelity, q270 text near-dup
  * method agreement. Each pinned against an independent straight-Scala
  * recompute; the corpus-vacuous rules (q267 r4/r6) and the fidelity
  * floor (q269 n_below) are exercised by planted fixtures so "always
  * zero on this corpus" can't hide broken arithmetic. */
class NewOpsRound10Spec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private val stopEn = Set("the", "a", "of", "and", "is", "to", "in")

  /** The six q267 flags over a raw text, straight Scala. */
  private def ruleFlags(text: String): Seq[Long] = {
    val t = text.split(" ", -1)
    val nTok = t.length.toLong
    val nUniq = t.distinct.length.toLong
    val nStop = t.count(stopEn).toLong
    val n5 = math.max(nTok - 4, 0L)
    val u5 = if (n5 == 0) 0L
      else t.sliding(5).map(_.mkString(" ")).toSeq.distinct.length.toLong
    val len = text.length.toLong
    val nPunct = text.count(c =>
      !((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == ' ')).toLong
    Seq(
      if (nTok < 20) 1L else 0L,
      if (nTok > 90) 1L else 0L,
      if (nUniq * 100 < nTok * 45) 1L else 0L,
      if ((n5 - u5) * 1000 > n5 * 150) 1L else 0L,
      if (nStop < 2) 1L else 0L,
      if (nPunct * 1000 > len * 30) 1L else 0L)
  }

  private def auditOf(flags: Seq[Seq[Long]]): Seq[(String, Long, Long, Long, Long, Long)] = {
    val names = Seq("r1_short", "r2_long", "r3_low_uniq", "r4_dup5gram",
      "r5_no_stop", "r6_symbol")
    val nDocs = flags.length.toLong
    val nKilled = flags.count(_.sum > 0).toLong
    names.zipWithIndex.map { case (nm, i) =>
      val nf = flags.map(_(i)).sum
      val uniq = flags.count(f => f(i) == 1L && f.sum == 1L).toLong
      (nm, nf, 1000 * nf / nDocs, uniq, nDocs, nKilled)
    }.sortBy(_._1)
  }

  test("q267 rule audit ≡ local recompute; corpus rules bind") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("text").collect().map(_.getString(0)).toSeq
    val exp = auditOf(docs.map(ruleFlags))
    val got = TextAnalysis.ruleAudit(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp)
    // the corpus exercises the table: at least one rule fires, at
    // least one doc is flagged by >1 rule (unique < flagged somewhere)
    assert(got.exists(_._2 > 0))
    assert(got.exists(t => t._2 > t._4))
  }

  test("q267 planted fixture: the corpus-vacuous rules r4/r6 fire") {
    import spark.implicits._
    val rep = (("ab cd ef gh ij " * 12) + "tail").trim // dup 5-grams
    val sym = "x!!! y??? z;;; " * 8 + "the of and is to in a" // symbols
    val clean = (1 to 50).map(i => s"w$i").mkString(" ") +
      " the of and is to in" // fires nothing
    val docs = Seq((1L, rep), (2L, sym), (3L, clean)).toDF("doc_id", "text")
    val got = TextAnalysis.ruleAuditDf(docs).collect().toSeq
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    val exp = auditOf(Seq(rep, sym, clean).map(ruleFlags))
      .map(t => t._1 -> ((t._2, t._4))).toMap
    assert(got == exp)
    assert(got("r4_dup5gram")._1 >= 1L, "r4 must fire on the repeated doc")
    assert(got("r6_symbol")._1 >= 1L, "r6 must fire on the symbol doc")
  }

  test("q268 migration matrix ≡ local recompute + mass conservation") {
    val o = spark.read.parquet(s"$d/orders.parquet")
      .selectExpr("o_custkey",
        "CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT) AS dy",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val pivot = (o.map(_._2).min + o.map(_._2).max) / 2
    def seg(rows: Seq[(Long, Long, Long)]): Map[Long, Long] = {
      val mh = rows.groupBy(_._1).map { case (c, rs) =>
        c -> rs.map(_._3).sum / 10000
      }
      val n = mh.size.toLong
      mh.map { case (c, v) =>
        val before = mh.values.count(_ < v).toLong
        c -> (before * 5 / n + 1)
      }
    }
    val a = seg(o.filter(_._2 < pivot))
    val b = seg(o.filter(_._2 >= pivot))
    val exp = (a.keySet ++ b.keySet).toSeq
      .map(c => (a.getOrElse(c, 0L), b.getOrElse(c, 0L)))
      .groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }
      .toSeq.sortBy(t => (t._1, t._2))
    val got = Queries.rfmMigration(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got == exp)
    // mass conservation: every customer lands in exactly one cell
    assert(got.map(_._3).sum == (a.keySet ++ b.keySet).size.toLong)
    // segments are quintiles-or-absent
    assert(got.forall(t => t._1 >= 0 && t._1 <= 5 && t._2 >= 0 && t._2 <= 5))
    // (0,0) is impossible — a customer absent from both halves has no
    // orders at all
    assert(!got.exists(t => t._1 == 0 && t._2 == 0))
  }

  /** Straight-Scala q269 fidelity of one vector (same sequential fold). */
  private def fidPpm(v: Array[Double]): Option[Long] = {
    val ma = v.map(math.abs).max
    if (ma <= 0) return None
    val sc = 127.0 / ma
    val q = v.map(x =>
      if (x >= 0) math.floor(math.abs(x * sc) + 0.5)
      else -math.floor(math.abs(x * sc) + 0.5))
    var nn = 0.0; var qn = 0.0; var dt = 0.0
    var i = 0
    while (i < v.length) {
      nn += v(i) * v(i); qn += q(i) * q(i); dt += v(i) * q(i); i += 1
    }
    if (qn <= 0) None
    else {
      val f = 1000000.0 * dt * dt / (nn * qn.toLong)
      Some(if (dt >= 0) math.floor(f).toLong else -math.floor(f).toLong)
    }
  }

  test("q269 quant fidelity ≡ local recompute per source") {
    val src = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val fids = spark.read.parquet(s"$d/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>)").collect()
      .flatMap { r =>
        val v = r.getSeq[Double](1).toArray
        for (s <- src.get(r.getLong(0)); f <- fidPpm(v)) yield (s, f)
      }.toSeq
    val exp = fids.groupBy(_._1).toSeq.map { case (s, rows) =>
      val fs = rows.map(_._2)
      (s, fs.length.toLong, fs.sum / fs.length, fs.min,
        fs.count(_ < Similarity.QuantFidFloorPpm).toLong)
    }.sortBy(_._1)
    val got = Similarity.quantFidelity(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
    // int8 with per-vector scale keeps this corpus far above the floor
    assert(got.forall(_._3 > Similarity.QuantFidFloorPpm))
  }

  test("q269 planted heavy-tailed fixture: the floor binds") {
    // one outlier coordinate of 254 (sc = 0.5) vs 63 coordinates of 1:
    // every small coordinate lands exactly on the quantizer half-point
    // (1·sc = 0.5 → q = 1, a 2× overestimate) — the hard-to-quantize
    // geometry the audit exists to catch (fid ≈ 999033 ppm)
    val heavy = Array.tabulate(64)(i => if (i == 0) 254.0 else 1.0)
    val f = fidPpm(heavy).get
    assert(f < Similarity.QuantFidFloorPpm,
      s"heavy-tailed fidelity $f must fall below the floor")
    // and the kernel agrees with the local model on the same vector
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_q269").toString
    Seq((0L, heavy.map(_.toFloat))).toDF("vec_id", "embedding")
      .write.parquet(s"$tmp/embeddings.parquet")
    Seq((0L, "a")).toDF("doc_id", "source")
      .write.parquet(s"$tmp/documents.parquet")
    val got = Similarity.quantFidelity(spark, tmp).collect()
    assert(got.length == 1 && got(0).getLong(2) == f &&
      got(0).getLong(4) == 1L)
  }

  test("q270 agreement ≡ set algebra over the two pair operators") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = pairs(Dedup.minhashNearDup(spark, d))
    val sh = pairs(Dedup.simhash(spark, d))
    // local exact 3-gram Jaccard from scratch
    val hs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect().map { r =>
        val t = r.getString(1).split(" ", -1)
        val set = t.sliding(3).filter(_.length == 3).map { w =>
          w.mkString(" ").foldLeft(0L)((a, c) => (a * 131 + c.toLong) % 1000000007L)
        }.toSet
        r.getLong(0) -> set
      }.toMap
    def jpm(p: (Long, Long)): Long = {
      val (a, b) = (hs(p._1), hs(p._2))
      val cm = (a intersect b).size.toLong
      1000 * cm / (a.size + b.size - cm)
    }
    val cats = Seq(
      ("both", mh intersect sh),
      ("minhash_only", mh diff sh),
      ("simhash_only", sh diff mh))
    val exp = cats.filter(_._2.nonEmpty).map { case (c, ps) =>
      val js = ps.toSeq.map(jpm)
      (c, ps.size.toLong, js.sum / js.length, js.min, js.max)
    }.sortBy(_._1)
    val got = Dedup.textMethodAgreement(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
    // the arbiter discriminates: when both categories exist, pairs
    // found by both methods are exactly-more-similar than
    // simhash-only pairs (the SimHash false-candidate signature)
    val byCat = got.map(t => t._1 -> t._3).toMap
    for (b <- byCat.get("both"); s <- byCat.get("simhash_only"))
      assert(b > s)
  }
}
