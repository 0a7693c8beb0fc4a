package graft

import org.apache.spark.sql.functions._

/** Round-10 batch g: q289 Wilson lower-bound ranking, q290
  * shingle-size ablation, q291 scene-cut detection — local BigInt
  * recomputes, the bound/monotonicity certificates, and a planted
  * smooth-then-cut fixture. */
class NewOpsRound10gSpec extends SparkSpec {
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

  test("q289 Wilson LB ≡ local recompute; bound below rate, n-monotone") {
    val ag = spark.read.parquet(s"$d/lineitem.parquet")
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") =!= "R", 1L).otherwise(0L)).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def ceilSqrt(x: Long): Long = {
      var s0 = math.floor(math.sqrt(x.toDouble)).toLong
      if (s0 * s0 > x) s0 -= 1
      val fl = if ((s0 + 1) * (s0 + 1) <= x) s0 + 1 else s0
      if (fl * fl == x) fl else fl + 1
    }
    val exp = ag.map { case (k, n, s) =>
      val rad = ceilSqrt(n * (s * (n - s) + n))
      val lb = math.max(0L,
        1000000L * (n * (s + 2) - 2 * rad) / (n * (n + 4)))
      (k, n, s, 1000000L * s / n, lb)
    }.toSeq.sortBy(_._1)
    val got = Queries.wilsonRanking(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
    // the bound is a LOWER bound: never above the raw rate
    assert(got.forall(t => t._5 <= t._4))
    // shrinkage monotonicity wherever exactly comparable: equal raw
    // rates, larger n ⇒ LB at least as high (vacuous if no such pair)
    for {
      a <- got; b <- got
      if a._3 * b._2 == b._3 * a._2 && a._2 > b._2
    } assert(a._5 >= b._5)
  }

  test("q290 ablation ≡ local recompute; identity sharpens with n") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val srcOf = docs.map(t => (t._1, t._2)).toMap
    val exp = Dedup.AblationNs.map { n =>
      val sh = docs.flatMap { case (id, _, text) =>
        val tk = text.split(" ", -1)
        (0 to tk.length - n).map(i =>
          (id, polyhash(tk.slice(i, i + n).mkString(" ")))).distinct
      }
      val df = sh.groupBy(_._2).map { case (h, g) => h -> g.length.toLong }
      val gd = df.size.toLong
      val gx = df.count(_._2 > Dedup.AblationDfCap).toLong
      val byGram = sh.filter(t => df(t._2) <= Dedup.AblationDfCap)
        .groupBy(_._2).values
      val pairs = byGram.flatMap { g =>
        val ids = g.map(_._1).toSeq.sorted
        for (i <- ids.indices; j <- (i + 1) until ids.length)
          yield (ids(i), ids(j))
      }.toSet
      val within = pairs.count(p => srcOf(p._1) == srcOf(p._2)).toLong
      val cross = pairs.size.toLong - within
      (n.toLong, gd, gx, within, cross,
        if (within + cross == 0L) 0L
        else 1000L * cross / (within + cross))
    }
    val got = Dedup.shingleSizeAblation(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp)
    // distinctiveness grows with n: the corpus-ubiquitous (dropped)
    // share can only shrink as windows lengthen
    val dropShare = got.map(t => (t._1, t._3.toDouble / t._2)).toMap
    assert(dropShare(3L) >= dropShare(8L))
  }

  test("q291 cuts ≡ local recompute over the corpus") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val exp = docs.flatMap { case (id, text) =>
      val flen = (text.length - 64) / Multimodal.SceneFrames
      if (flen < Multimodal.AHashBlocks) Nil
      else {
        val hs = (0 until Multimodal.SceneFrames).map { f =>
          val seg = text.substring(0, 64) +
            text.substring(64 + f * flen, 64 + f * flen + flen)
          graft.functions.PerceptualHash.ahash64(
            org.apache.spark.unsafe.types.UTF8String.fromString(seg))
        }
        (1 until Multimodal.SceneFrames).map { f =>
          val dist = java.lang.Long.bitCount(hs(f) ^ hs(f - 1)).toLong
          (id, f.toLong, dist,
            if (dist > Multimodal.SceneCutBits) 1L else 0L)
        }
      }
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = Multimodal.sceneCuts(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == exp)
  }

  test("q291 planted fixture: smooth halves, one boundary mid-clip") {
    val s = spark
    import s.implicits._
    // SceneFrames frames of 64 chars each: the first half identical
    // bright/dark pattern, the second half its inversion —
    // within-half distances 0, the half boundary flips every block
    val a = ("Az" * 32).take(64)
    val b = ("zA" * 32).take(64)
    val half = Multimodal.SceneFrames / 2
    val payload = ("h" * 64) + (a * half) + (b * half)
    val docs = Seq((1L, payload)).toDF("doc_id", "text")
    val rows = Multimodal.sceneCutsDf(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == Multimodal.SceneFrames - 1)
    rows.foreach { case (f, dist, cut) =>
      if (f == half.toLong) assert(cut == 1L && dist > Multimodal.SceneCutBits)
      else assert(cut == 0L && dist == 0L)
    }
  }
}
