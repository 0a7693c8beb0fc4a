package graft

import org.apache.spark.sql.functions._

/** Round-10 batch d: q278 dedup-weighted effective size, q279 kNN
  * source purity, q280 dyadic revenue momentum, q281 audio loudness
  * audit — straight-Scala recomputes from the raw parquet (or, for
  * q278, from the independently-spec'd q49 labels), plus the
  * structural certificates and the PcmStats kernel fixtures. */
class NewOpsRound10dSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("q278 effective size ≡ local fold over the q49 labels; bounds hold") {
    val labels = Dedup.nearDupClusters(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val src = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val exp = labels.groupBy(t => src(t._1)).map { case (s, g) =>
      val nDocs = g.length.toLong
      val nCanon = g.count(t => t._1 == t._2).toLong
      val eff = g.map(t => 1000L / t._3).sum
      val nSing = g.count(_._3 == 1L).toLong
      (s, nDocs, nCanon, eff, nSing, 1000000L * nDocs / eff)
    }.toSeq.sortBy(_._1)
    val got = Dedup.dedupEffectiveSize(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp)
    // certificates: inflation ≥ 1000 (eff ≤ raw); summed effective
    // mass ≈ 1000·n_clusters (per-doc floors lose < 1 per doc)
    assert(got.forall(_._6 >= 1000L))
    val nClusters = labels.map(_._2).distinct.length.toLong
    val effSum = got.map(_._4).sum
    assert(effSum <= 1000L * nClusters && effSum > 1000L * nClusters - labels.length)
    // the corpus has planted near-dups: somewhere inflation > 1000
    assert(got.exists(_._6 > 1000L))
  }

  test("q279 purity ≡ local exact-cosine recompute; sample is the mod slice") {
    val src = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>)").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val norms = vecs.map { case (id, v) => id -> dot(v, v) }.toMap
    val byQ = vecs.filter(_._1 % Similarity.PurityStride == 0L).map { case (qid, qv) =>
      val top = vecs.filter(_._1 != qid)
        .map { case (nid, nv) =>
          (nid, dot(qv, nv) / math.sqrt(norms(qid) * norms(nid)))
        }
        .sortBy { case (nid, c) => (-c, nid) }.take(5)
      val matches = top.count { case (nid, _) => src(nid) == src(qid) }.toLong
      (src(qid), matches)
    }
    val exp = byQ.groupBy(_._1).map { case (s, g) =>
      val nq = g.length.toLong
      val nm = g.map(_._2).sum
      (s, nq, nm, 1000L * nm / (5L * nq),
        g.count(_._2 == 5L).toLong, g.count(_._2 <= 1L).toLong)
    }.toSeq.sortBy(_._1)
    val got = Similarity.knnSourcePurity(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp)
    // the audit discriminates: purity is not uniform 1000 everywhere
    assert(got.exists(_._4 < 1000L))
  }

  test("q280 momentum ≡ local dyadic fold; full-window gating holds") {
    val bm = spark.read.parquet(s"$d/lineitem.parquet")
      .join(spark.read.parquet(s"$d/part.parquet"),
        col("l_partkey") === col("p_partkey"))
      .selectExpr("p_brand AS brand",
        "CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT) AS m",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents")
      .groupBy("brand", "m").agg(sum("cents").as("rev")).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val mn = bm.keys.map(_._2).min
    val mx = bm.keys.map(_._2).max
    val brands = bm.keys.map(_._1).toSeq.distinct.sorted
    def level(b: String, m: Long): Long =
      (0 until Queries.MomentumTaps).map { k =>
        bm.getOrElse((b, m - k), 0L) * (1L << (Queries.MomentumTaps - 1 - k))
      }.sum / 4095L
    val exp = (for {
      b <- brands
      m <- (mn + Queries.MomentumTaps) to mx
    } yield {
      val lv = level(b, m); val pv = level(b, m - 1)
      (b, m, lv, pv, lv - pv, (lv - pv).sign.toLong)
    }).sortBy(t => (t._1, t._2))
    val got = Queries.dyadicMomentum(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp)
    // both directions occur — the turn detector has signal
    assert(got.exists(_._6 > 0L) && got.exists(_._6 < 0L))
  }

  test("q281 loudness ≡ local virtual-PCM recompute; length gate ≡ q246") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val exp = docs.flatMap { case (id, t) =>
      val cps = t.codePoints().toArray
      val ns = math.max(cps.length - 64, 0) / 2
      if (ns < 32) None else {
        var sa = 0L; var sq = 0L; var pk = 0L; var cl = 0L
        for (k <- 0 until ns) {
          val raw = cps(64 + 2 * k).toLong + 256L * cps(64 + 2 * k + 1)
          val v = if (raw >= 32768L) raw - 65536L else raw
          val a = math.abs(v)
          sa += a; sq += v * v; pk = math.max(pk, a)
          if (a >= graft.functions.PerceptualHash.ClipThreshold) cl += 1L
        }
        Some((id, ns.toLong, 1000L * sa / ns, sq, pk, 1000L * cl / ns,
          if (sa > 0) 1000L * pk * ns / sa else 0L))
      }
    }.toSeq.sortBy(_._1)
    val got = Multimodal.audioLoudnessAudit(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got == exp)
    // crest ≥ 1000 wherever defined (peak ≥ mean |s| by construction)
    assert(got.forall(r => r._7 == 0L || r._7 >= 1000L))
  }

  test("PcmStats kernel: signed decode, clipping, and zero-pad fixtures") {
    import graft.functions.PerceptualHash
    // payload: 64-char header + 4 samples: +1, -1 (0xFFFF), +30000
    // (0x7530, clipped), -32768 (0x0080 high byte only = -32768)
    val header = "h" * 64
    val bytes = Array[Int](
      0x01, 0x00, // +1
      0xFF, 0xFF, // -1
      0x30, 0x75, // +30000 → clipped
      0x00, 0x80) // -32768 → clipped
    val payload = header + bytes.map(_.toChar).mkString
    val st = PerceptualHash.pcmstats(
      org.apache.spark.unsafe.types.UTF8String.fromString(payload))
    assert(st(0) == 4L)
    assert(st(1) == 1L + 1L + 30000L + 32768L)
    assert(st(2) == 1L + 1L + 30000L * 30000L + 32768L * 32768L)
    assert(st(3) == 32768L)
    assert(st(4) == 2L)
    // under-64 payload: total zero vector, never a crash
    val tiny = PerceptualHash.pcmstats(
      org.apache.spark.unsafe.types.UTF8String.fromString("short"))
    assert(tiny.toSeq == Seq(0L, 0L, 0L, 0L, 0L))
  }
}
