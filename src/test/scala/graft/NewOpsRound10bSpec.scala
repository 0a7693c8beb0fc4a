package graft

import org.apache.spark.sql.functions._

/** Round-10 batch b: q271 interleaving audit, q272 MAD anomaly
  * calendar, q273 Kendall-τ brand co-movement — each pinned against an
  * independent straight-Scala recompute from the raw parquet. */
class NewOpsRound10bSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def polyHash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 131 + c.toLong) % 1000000007L)

  test("q271 interleave audit ≡ local recompute; mass adds up") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val s = Curation.InterleaveShards
    val hashed = docs.map { case (id, src, t) =>
      val h = polyHash("interleave42:" + t)
      (h % s, h, id, src)
    }
    val n = docs.length.toLong
    val ss = docs.groupBy(_._2).values.map(g => g.size.toLong).toSeq
    val expectedPm = 1000L * ss.map(x => x * x).sum / (n * n)
    val exp = hashed.groupBy(_._1).toSeq.map { case (shard, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      val adj = ordered.sliding(2).count {
        case Seq(a, b) => a._4 == b._4
        case _ => false
      }.toLong
      (shard, rows.size.toLong, adj,
        1000L * adj / (rows.size - 1), expectedPm)
    }.sortBy(_._1)
    val got = Curation.interleaveAudit(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
    assert(got.map(_._2).sum == n, "every doc lands in exactly one shard")
  }

  test("q272 MAD calendar ≡ local recompute; anomalies exist and obey 3-MAD") {
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .selectExpr("l_partkey",
        "CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT) AS m",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brandOf = spark.read.parquet(s"$d/part.parquet")
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val bm = li.groupBy(t => (brandOf(t._1), t._2))
      .map { case ((b, m), rows) => (b, m, rows.map(_._3).sum) }.toSeq
    def lowerMedian(vs: Seq[(Long, Long)]): Long = {
      // vs = (value, month); rank (n+1)/2 under (value, month) order
      val sorted = vs.sortBy(identity)
      sorted((vs.size + 1) / 2 - 1)._1
    }
    val exp = bm.groupBy(_._1).toSeq.flatMap { case (b, rows) =>
      val med = lowerMedian(rows.map(r => (r._3, r._2)))
      val devs = rows.map(r => (math.abs(r._3 - med), r._2))
      val mad = lowerMedian(devs)
      rows.map { case (_, m, rev) =>
        val dev = math.abs(rev - med)
        (b, m, rev, med, mad, dev, if (dev > 3 * mad) 1L else 0L)
      }
    }.sortBy(t => (t._1, t._2))
    val got = Queries.madAnomalyCalendar(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got == exp)
    assert(got.exists(_._7 == 1L), "the corpus has anomaly months")
    assert(got.exists(_._7 == 0L), "and on-trend months")
    got.foreach { t =>
      assert((t._6 > 3 * t._5) == (t._7 == 1L), s"flag must equal 3-MAD: $t")
    }
  }

  test("q273 Kendall tau ≡ local pairwise recompute; bounded and symmetric-free") {
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .selectExpr("l_partkey",
        "CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT) AS m",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brandOf = spark.read.parquet(s"$d/part.parquet")
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val series: Map[String, Map[Long, Long]] = li
      .groupBy(t => brandOf(t._1))
      .map { case (b, rows) =>
        b -> rows.groupBy(_._2).map { case (m, rs) => m -> rs.map(_._3).sum }
      }
    val brands = series.keys.toSeq.sorted
    val exp = (for {
      i <- brands.indices; j <- (i + 1) until brands.length
    } yield {
      val (a, b) = (brands(i), brands(j))
      val common = (series(a).keySet intersect series(b).keySet).toSeq.sorted
      val pairs = for {
        x <- common.indices; y <- (x + 1) until common.length
      } yield {
        val sa = java.lang.Long.signum(
          series(a)(common(y)) - series(a)(common(x)))
        val sb = java.lang.Long.signum(
          series(b)(common(y)) - series(b)(common(x)))
        sa * sb
      }
      val (c0, d0, np) = (pairs.count(_ > 0).toLong,
        pairs.count(_ < 0).toLong, pairs.length.toLong)
      val tau = if (c0 >= d0) 1000 * (c0 - d0) / np
        else -(1000 * (d0 - c0) / np)
      (a, b, common.length.toLong, c0, d0, tau)
    }).sortBy(t => (t._1, t._2))
    val got = Queries.kendallComovement(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp)
    got.foreach { t =>
      assert(t._6 >= -1000 && t._6 <= 1000, s"tau out of range: $t")
      assert(t._4 + t._5 <= t._3 * (t._3 - 1) / 2, s"C+D exceeds C(n,2): $t")
      assert(t._1 < t._2, "pairs are canonical (a < b), no diagonal")
    }
  }

  test("q274 projection energy ≡ local recompute over the certified directions") {
    // directions from the spec-certified recurrences (q240/q244 pin
    // powerIterate/deflatedIterate against hand Grams + eigen
    // certificates); the spec's job HERE is the per-source energy
    // arithmetic, recomputed in straight Scala
    val src = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>)").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    def quant(v: Array[Double]): Option[Array[Long]] = {
      val ma = v.map(math.abs).max
      if (ma <= 0) None
      else Some(v.map(x =>
        if (x >= 0) math.floor(math.abs(x * (127.0 / ma)) + 0.5).toLong
        else -math.floor(math.abs(x * (127.0 / ma)) + 0.5).toLong))
    }
    val qs = vecs.flatMap { case (id, v) => quant(v).map(id -> _) }
    val dim = 64
    val g = Array.fill(dim * dim)(0L)
    qs.foreach { case (_, q) =>
      for (i <- 0 until dim; j <- 0 until dim) g(i * dim + j) += q(i) * q(j)
    }
    val (v1, _, den1) = Similarity.powerIterate(g, dim)
    val (x2, _, den2) = Similarity.deflatedIterate(g, dim, v1, den1)
    val exp = qs.groupBy(t => src(t._1)).toSeq.map { case (s, rows) =>
      def dots(dir: Array[BigInt]): BigInt = rows.map { case (_, q) =>
        val dt = (0 until dim).map(i => BigInt(q(i)) * dir(i)).sum
        dt * dt
      }.sum
      val sqn = rows.map { case (_, q) => q.map(x => BigInt(x) * x).sum }.sum
      (s, rows.size.toLong,
        ((BigInt(1000) * dots(v1)) / (den1 * sqn)).toLong,
        ((BigInt(1000) * dots(x2)) / (den2 * sqn)).toLong)
    }.sortBy(_._1)
    val got = Similarity.sourceProjectionEnergy(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == exp)
    // energies are fractions of total squared norm: bounded
    got.foreach { t =>
      assert(t._3 >= 0 && t._3 <= 1000 && t._4 >= 0 && t._4 <= 1000, t)
    }
  }
}
