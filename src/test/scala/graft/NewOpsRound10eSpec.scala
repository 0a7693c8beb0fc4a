package graft

import org.apache.spark.sql.functions._

/** Round-10 batch e: q282 representation alignment (CrossGramAgg),
  * q283 n-gram diversity spectrum, q284 hourly autocorrelation, q285
  * brand modularity — straight-Scala BigInt recomputes from the raw
  * parquet plus kernel fixtures and the eigen/Cauchy-Schwarz
  * certificates. */
class NewOpsRound10eSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private val P = 1000000007L
  private def polyhash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 131L + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  test("q282 alignment ≡ local BigInt recompute; Cauchy-Schwarz holds") {
    val dim = Similarity.ReprDim
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2)))).toMap
    val rows = spark.read.parquet(s"$d/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>)").collect()
      .flatMap { r =>
        val id = r.getLong(0)
        docs.get(id).map { case (src, text) =>
          val v = r.getSeq[Double](1).toArray
          val ma = v.map(math.abs).max
          val sc = 127.0 / ma
          val q = v.map(x =>
            if (x >= 0) math.floor(math.abs(x * sc) + 0.5).toLong
            else -math.floor(math.abs(x * sc) + 0.5).toLong)
          val bow = new Array[Long](dim)
          text.split(" ", -1).foreach { t =>
            val b = (polyhash(t) % dim).toInt
            if (bow(b) < Similarity.BowCap) bow(b) += 1L
          }
          (src, bow, q)
        }
      }.filter { case (_, _, q) => true }
    val exp = rows.groupBy(_._1).map { case (src, g) =>
      val n = BigInt(g.length)
      def sumv(f: ((String, Array[Long], Array[Long])) => Array[Long]) =
        (0 until dim).map(i => BigInt(g.map(t => f(t)(i)).sum)).toArray
      val sx = sumv(_._2); val sy = sumv(_._3)
      def cross(fa: ((String, Array[Long], Array[Long])) => Array[Long],
          fb: ((String, Array[Long], Array[Long])) => Array[Long]) =
        Array.tabulate(dim, dim)((i, j) =>
          BigInt(g.map(t => fa(t)(i) * fb(t)(j)).sum))
      val cxy = cross(_._2, _._3); val cxx = cross(_._2, _._2)
      val cyy = cross(_._3, _._3)
      var fxy, fxx, fyy, trx, trY = BigInt(0)
      for (i <- 0 until dim; j <- 0 until dim) {
        val mxy = n * cxy(i)(j) - sx(i) * sy(j)
        val mxx = n * cxx(i)(j) - sx(i) * sx(j)
        val myy = n * cyy(i)(j) - sy(i) * sy(j)
        fxy += mxy * mxy; fxx += mxx * mxx; fyy += myy * myy
        if (i == j) { trx += mxx; trY += myy }
      }
      val alx = if (fxx > 0) (BigInt(1000000) * fxy / fxx).toLong else 0L
      val aly = if (fyy > 0) (BigInt(1000000) * fxy / fyy).toLong else 0L
      // Cauchy-Schwarz for the Frobenius inner product: CKA² ≤ 1
      assert(fxy * fxy <= fxx * fyy)
      (src, n.toLong, trx.toLong, trY.toLong, alx, aly)
    }.toSeq.sortBy(_._1)
    val got = Similarity.reprAlignment(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp)
    // the statistic has signal: some alignment is strictly positive
    assert(got.exists(t => t._5 > 0L && t._6 > 0L))
  }

  test("CrossGramAgg kernel: Σ x·yᵀ on a fixture ≡ manual rank-1 sums") {
    val s = spark
    import s.implicits._
    val data = Seq(
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),
      (Array(-1L, 0L, 2L), Array(7L, -8L, 9L)))
    val df = data.toDF("x", "y")
    val g = df.agg(graft.functions.GramAgg.crossGram(col("x"), col("y"), 3))
      .head().getSeq[Long](0)
    val exp = Array.tabulate(3, 3)((i, j) =>
      data.map { case (x, y) => x(i) * y(j) }.sum).flatten.toSeq
    assert(g == exp)
    // null on either side skips the row (joint-observation contract)
    val withNull = df.unionAll(Seq((null.asInstanceOf[Array[Long]],
      Array(1L, 1L, 1L))).toDF("x", "y"))
    val g2 = withNull.agg(
      graft.functions.GramAgg.crossGram(col("x"), col("y"), 3))
      .head().getSeq[Long](0)
    assert(g2 == exp)
  }

  test("BowCounts kernel: bucket counts, cap, and empty-token fixtures") {
    import org.apache.spark.unsafe.types.UTF8String
    val toks = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array("a", "b", "a", "").map(UTF8String.fromString))
    val out = graft.functions.NativeVec.bowCounts(toks, 8, 2L)
      .toLongArray()
    val ba = (polyhash("a") % 8).toInt
    val bb = (polyhash("b") % 8).toInt
    assert(out(ba) >= 1L && out(bb) >= 1L)
    assert(out(0) >= 1L) // "" hashes to 0 → bucket 0
    assert(out.sum == 4L)
    // cap binds: 5 copies of "a" at cap 2 count 2
    val five = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array.fill(5)("a").map(UTF8String.fromString))
    assert(graft.functions.NativeVec.bowCounts(five, 8, 2L)
      .toLongArray()(ba) == 2L)
  }

  test("q283 spectrum ≡ local recompute; diversity falls with n for some source") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val exp = TextAnalysis.DiversityNs.flatMap { n =>
      val occ = docs.flatMap { case (src, text) =>
        val tk = text.split(" ", -1)
        (0 to tk.length - n).map(i =>
          (src, polyhash(tk.slice(i, i + n).mkString(" "))))
      }
      occ.groupBy(_._1).map { case (src, g) =>
        val counts = g.groupBy(_._2).map(_._2.length.toLong)
        val total = counts.sum
        val dist = counts.size.toLong
        val hapax = counts.count(_ == 1L).toLong
        (src, n.toLong, total, dist, 1000L * dist / total, hapax,
          1000L * hapax / dist)
      }
    }.sortBy(t => (t._1, t._2))
    val got = TextAnalysis.ngramDiversity(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got == exp)
    // natural text: unigram repetition exceeds trigram repetition
    val bySrc = got.groupBy(_._1)
    assert(bySrc.exists { case (_, g) =>
      g.find(_._2 == 1L).get._5 < g.find(_._2 == 3L).get._5
    })
  }

  test("q284 autocorrelation ≡ local BigInt recompute over the hour spine") {
    val ev = Tables.eventsNs(spark, d)
      .selectExpr("event_type", "ts div 3600000000000 AS h").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val counts = ev.groupBy(identity).map { case ((t, h), g) =>
      (t, h) -> g.length.toLong
    }
    val mn = ev.map(_._2).min; val mx = ev.map(_._2).max
    val types = ev.map(_._1).distinct.sorted
    val exp = (for {
      t <- types
      l <- Queries.AcfLags
    } yield {
      val pairs = ((mn + l) to mx).map(h =>
        (counts.getOrElse((t, h), 0L), counts.getOrElse((t, h - l), 0L)))
      val n = BigInt(pairs.length)
      val sx = BigInt(pairs.map(_._1).sum); val sy = BigInt(pairs.map(_._2).sum)
      val sxy = pairs.map { case (x, y) => BigInt(x) * y }.sum
      val sxx = pairs.map { case (x, _) => BigInt(x) * x }.sum
      val syy = pairs.map { case (_, y) => BigInt(y) * y }.sum
      val num = n * sxy - sx * sy
      val dx = n * sxx - sx * sx; val dy = n * syy - sy * sy
      val r2 =
        if (dx == 0 || dy == 0) 0L
        else if (num >= 0) (BigInt(1000000) * num * num / (dx * dy)).toLong
        else -(BigInt(1000000) * num * num / (dx * dy)).toLong
      (t, l, pairs.length.toLong, r2)
    }).toSeq.sortBy(t => (t._1, t._2))
    val got = Queries.hourlyAutocorr(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == exp)
  }

  test("q285 modularity ≡ local recompute; Σ contrib ≈ Q, |Q| ≤ 1e6") {
    val items = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet.toSeq
    val capped = items.groupBy(_._1).toSeq.flatMap { case (ok, g) =>
      g.map(_._2).distinct.sorted.take(Graph.CoPurchaseCap).map(ok -> _)
    }
    val edges = capped.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val brand = spark.read.parquet(s"$d/part.parquet")
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val m = BigInt(edges.size)
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (nd, g) => nd -> g.size.toLong }
    val byBrand = deg.keys.groupBy(brand)
    val exp = byBrand.map { case (b, nodes) =>
      val nn = nodes.size.toLong
      val ew = edges.count(e => brand(e._1) == b && brand(e._2) == b).toLong
      val ds = BigInt(nodes.toSeq.map(deg).sum)
      val num = 4 * m * ew - ds * ds
      val den = 4 * m * m
      val contrib =
        if (num >= 0) (BigInt(1000000) * num / den).toLong
        else -(BigInt(1000000) * (-num) / den).toLong
      (b, nn, ew, ds.toLong, contrib)
    }.toSeq.sortBy(_._1)
    val got = Graph.brandModularity(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
    // Q = Σ contribs (each floored by < 1 micro): within |brands| micro
    // of the exact BigInt Q, and |Q| ≤ 1 by definition
    val qExact = {
      val num = exp.map { case (b, _, ew, ds, _) =>
        4 * m * ew - BigInt(ds) * ds
      }.sum
      BigInt(1000000) * num / (4 * m * m)
    }
    val qSum = exp.map(_._5).sum
    assert((qExact - qSum).abs <= exp.length)
    assert(qSum.abs <= 1000000L)
  }
}
