package graft

import org.apache.spark.sql.functions._

/** Round-10 batch j: q297 deterministic bootstrap CI, q298
  * repeat-purchase latency, q299 neighbor concentration — local
  * recomputes plus the coverage/ordering certificates. */
class NewOpsRound10jSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private val P = 1000000007L
  private def polyhash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * 131L + s.charAt(i)) % P; i += 1 }
    h
  }

  test("q297 bootstrap ≡ local recompute; band brackets the mean") {
    val base = spark.read.parquet(s"$d/orders.parquet")
      .join(spark.read.parquet(s"$d/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .selectExpr("c_mktsegment AS segment", "o_orderkey AS ok",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exp = base.groupBy(_._1).map { case (seg, g) =>
      val n = g.length.toLong
      val mean = g.map(_._3).sum / n
      val means = (0 until Queries.BootstrapB).flatMap { b =>
        val ws = g.map { case (_, ok, cents) =>
          (java.lang.Long.bitCount(polyhash(s"$ok:$b") % 16).toLong, cents)
        }
        val sw = ws.map(_._1).sum
        if (sw == 0L) None
        else Some((ws.map { case (w, c) => BigInt(w) * c }.sum /
          BigInt(sw)).toLong, b.toLong)
      }
      val sorted = means.sortBy(identity)
      val lo = sorted(1)._1
      val hi = sorted(Queries.BootstrapB - 2)._1
      (seg, n, mean, lo, hi, hi - lo)
    }.toSeq.sortBy(_._1)
    val got = Queries.bootstrapCi(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp)
    // coverage sanity: a mean-2 weighted resample of its own data
    // brackets the point estimate
    got.foreach(t => assert(t._4 <= t._3 + 1 && t._5 >= t._3 - 1))
  }

  test("q298 latency ≡ local recompute; quartiles ordered") {
    val orders = spark.read.parquet(s"$d/orders.parquet")
      .selectExpr("o_custkey", "o_orderkey",
        "CAST(o_orderdate AS DATE) AS od").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate))
    val segOf = spark.read.parquet(s"$d/customer.parquet")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val gaps = orders.groupBy(_._1).toSeq.map { case (ck, g) =>
      val sorted = g.sortBy(o => (o._3.toEpochDay, o._2))
      val gap =
        if (sorted.length < 2) None
        else Some(sorted(1)._3.toEpochDay - sorted.head._3.toEpochDay)
      (segOf(ck), gap)
    }
    val exp = gaps.groupBy(_._1).map { case (seg, g) =>
      val n = g.length.toLong
      val rep = g.count(_._2.isDefined).toLong
      val hs = g.flatMap(_._2).sorted
      def q(rank: Long): Option[Long] =
        if (hs.isEmpty) None else Some(hs((rank - 1).toInt))
      val m = hs.length.toLong
      (seg, n, rep, 1000L * rep / n,
        q((m + 3) / 4), q((m + 1) / 2), q((3 * m + 3) / 4))
    }.toSeq.sortBy(_._1)
    val got = Queries.repeatLatency(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
    assert(got == exp)
    got.foreach { t =>
      for (a <- t._5; b <- t._6; c <- t._7) assert(a <= b && b <= c)
    }
  }

  test("q299 concentration ≡ local recompute; shares sum to ~1000") {
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
    val slots = vecs.filter(_._1 % Similarity.PurityStride == 0L)
      .flatMap { case (qid, qv) =>
        vecs.filter(_._1 != qid)
          .map { case (nid, nv) =>
            (nid, dot(qv, nv) / math.sqrt(norms(qid) * norms(nid)))
          }
          .sortBy { case (nid, c) => (-c, nid) }.take(5).map(_._1)
      }
    val indeg = slots.groupBy(identity).map { case (nid, g) =>
      nid -> g.length.toLong
    }
    val corpus = vecs.map(v => src(v._1)).groupBy(identity)
      .map { case (s, g) => s -> g.size.toLong }
    val bySrc = indeg.groupBy(t => src(t._1))
    val ts = indeg.values.sum
    val tc = corpus.values.sum
    val exp = bySrc.map { case (s, g) =>
      val cited = g.values.sum
      (s, corpus(s), cited, g.size.toLong, g.values.max,
        1000L * cited / ts, 1000L * cited * tc / (ts * corpus(s)))
    }.toSeq.sortBy(_._1)
    val got = Similarity.neighborConcentration(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got == exp)
    // per-mille shares rebuild the whole (floor loss < |sources|)
    assert(got.map(_._6).sum > 1000L - got.length && got.map(_._6).sum <= 1000L)
  }
}
