package graft

import org.apache.spark.sql.functions._

/** Round-11 batch b: q326 term keyness, q327 LIX readability — local
  * exact recomputes over the collected sf0.001 corpus, plus the
  * structural invariants (dense ranks per source, histogram mass
  * conservation, the df caps actually excluding). */
class NewOpsRound11bSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def docs() = spark.read.parquet(s"$d/documents.parquet")
    .select(col("doc_id"), col("source"), col("text")).collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("q326 ≡ local chi² keyness recompute with df caps and top-k") {
    val ds = docs()
    val nn = ds.length.toLong
    val srcN = ds.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairs = ds.flatMap { case (_, s, t) =>
      t.split(" ", -1).distinct.map(w => (s, w))
    }
    val sdf = pairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val gdf = pairs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val scored = sdf.toSeq.flatMap { case ((s, w), a) =>
      val df = gdf(w)
      if (df < TextAnalysis.KeynessMinDf || df * 2 > nn) None
      else {
        val ns = srcN(s)
        val adbc = BigInt(a) * ((nn - ns) - (df - a)) - BigInt(ns - a) * (df - a)
        if (adbc <= 0) None
        else Some((s, w, a, df,
          (BigInt(1000) * nn * adbc * adbc /
            (BigInt(ns) * (nn - ns) * df * (nn - df))).toLong))
      }
    }
    val exp = scored.groupBy(_._1).toSeq.flatMap { case (s, g) =>
      g.sortBy(t => (-t._5, t._2)).take(TextAnalysis.KeynessTopK).zipWithIndex
        .map { case ((_, w, a, df, chi), i) => (s, (i + 1).toLong, w, a, df, chi) }
    }.sortBy(t => (t._1, t._2))
    val got = TextAnalysis.termKeyness(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp && got.nonEmpty)
    // dense contiguous ranks per source; df caps held
    got.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._2).sorted == (1L to g.length.toLong))
    }
    got.foreach { t =>
      assert(t._5 >= TextAnalysis.KeynessMinDf && t._5 * 2 <= nn)
    }
  }

  test("q327 ≡ local LIX recompute; histogram mass = corpus size") {
    val ds = docs()
    val perDoc = ds.map { case (_, s, t) =>
      val tokens = t.split(" ", -1)
      val w = math.max(tokens.length.toLong, 1L)
      val l = tokens.count(_.length > 6).toLong
      val sents = math.max("[.!?]+".r.findAllIn(t).length.toLong, 1L)
      (s, 1000L * w / sents + 100000L * l / w, w)
    }
    val exp = perDoc.groupBy(t => (t._1, t._2 / 5000L)).map { case ((s, b), g) =>
      (s, b, g.length.toLong, g.map(_._3).sum,
        g.map(_._2).sum / g.length)
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = TextAnalysis.lixReadability(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp && got.nonEmpty)
    assert(got.map(_._3).sum == ds.length.toLong)
  }
}
