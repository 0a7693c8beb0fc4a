package graft

import org.apache.spark.sql.functions._

/** q240: the GramAgg kernel pinned against a hand-computed matrix on a
  * synthetic frame, and the full operator against a driver-side
  * recompute (independent Gram via nested Scala fold; same fixed-round
  * recurrence — a recurrence's spec replays its definition, the q126
  * discipline) plus eigen-PROPERTY certificates the recompute can't
  * fake: symmetry, ∞-norm pin, PSD Rayleigh, and dominance over every
  * coordinate direction. */
class NewOpsRound8gSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("GramAgg ≡ hand-computed Gram on a synthetic frame") {
    import spark.implicits._
    val rows = Seq(
      Array(1L, 2L, 0L, -1L),
      Array(0L, 3L, 1L, 2L),
      Array(-2L, 0L, 4L, 1L))
    val got = rows.toDF("q")
      .select(graft.functions.GramAgg.gram(col("q"), 4).as("g"))
      .head().getSeq[Long](0).toArray
    val exp = Array.tabulate(4, 4) { (i, j) =>
      rows.map(r => r(i) * r(j)).sum
    }.flatten
    assert(got.toSeq == exp.toSeq)
    // spot the symmetry + a known cell: G(0,1) = 1·2 + 0·3 + (−2)·0 = 2
    assert(got(0 * 4 + 1) == 2L && got(1 * 4 + 0) == 2L)
  }

  test("q240 principal direction ≡ local integer power iteration") {
    val dim = 64
    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .selectExpr("CAST(embedding AS ARRAY<DOUBLE>)").collect().toSeq
      .map(_.getSeq[Double](0).toArray)
      .filter(v => v.map(math.abs).max > 0)
    val quant = vecs.map { v =>
      val sc = 127.0 / v.map(math.abs).max
      v.map(x =>
        if (x >= 0) math.floor(math.abs(x * sc) + 0.5).toLong
        else -math.floor(math.abs(x * sc) + 0.5).toLong)
    }
    val gram = Array.tabulate(dim, dim) { (i, j) =>
      quant.map(q => BigInt(q(i)) * q(j)).sum
    }
    def matVec(v: Array[BigInt]): Array[BigInt] =
      Array.tabulate(dim)(i => (0 until dim).map(j => gram(i)(j) * v(j)).sum)
    var v = Array.fill(dim)(BigInt(1000))
    for (_ <- 1 to Similarity.PowerRounds) {
      val w = matVec(v)
      val m = w.map(_.abs).max
      v = w.map(x =>
        if (x.signum >= 0) (BigInt(1000) * x) / m
        else -((BigInt(1000) * -x) / m))
    }
    val gv = matVec(v)
    val num = (0 until dim).map(i => v(i) * gv(i)).sum
    val den = v.map(x => x * x).sum
    val ray = (BigInt(1000) * num) / den
    val exp = v.zipWithIndex.map { case (x, i) =>
      (i.toLong, x.toLong, ray.toLong)
    }.toSeq
    val got = Similarity.principalDirection(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got == exp)
    // eigen-certificates, independent of the shared recurrence:
    // symmetry of the local Gram (the kernel mirrors its triangle)
    assert((0 until dim).forall(i => (0 until dim)
      .forall(j => gram(i)(j) == gram(j)(i))))
    // the iterate is ∞-normalized and the quotient is PSD-nonnegative
    assert(v.map(_.abs).max == BigInt(1000) && ray >= 0)
    // DOMINANCE: the found direction's Rayleigh quotient (milli) beats
    // every coordinate axis e_k, whose quotient is exactly G(k,k) — a
    // top-eigenvector property a buggy-but-self-consistent recurrence
    // would fail (λ_max ≥ max diagonal entry for any PSD matrix)
    val maxDiag = (0 until dim).map(k => gram(k)(k)).max
    assert(ray >= BigInt(1000) * maxDiag)
  }

  test("q242 per-source anisotropy ≡ local per-source iteration") {
    val dim = 64
    val src = spark.read.parquet(s"$d/documents.parquet")
      .selectExpr("doc_id", "source").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>)").collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .filter(_._2.map(math.abs).max > 0)
    def quantize(v: Array[Double]): Array[Long] = {
      val sc = 127.0 / v.map(math.abs).max
      v.map(x =>
        if (x >= 0) math.floor(math.abs(x * sc) + 0.5).toLong
        else -math.floor(math.abs(x * sc) + 0.5).toLong)
    }
    def iterate(qs: Seq[Array[Long]]): (Array[BigInt], BigInt, BigInt) = {
      val gram = Array.tabulate(dim, dim) { (i, j) =>
        qs.map(q => BigInt(q(i)) * q(j)).sum
      }
      def mv(v: Array[BigInt]) =
        Array.tabulate(dim)(i => (0 until dim).map(j => gram(i)(j) * v(j)).sum)
      var v = Array.fill(dim)(BigInt(1000))
      for (_ <- 1 to Similarity.PowerRounds) {
        val w = mv(v); val m = w.map(_.abs).max
        v = w.map(x => if (x.signum >= 0) (BigInt(1000) * x) / m
                       else -((BigInt(1000) * -x) / m))
      }
      val gv = mv(v)
      (v, (0 until dim).map(i => v(i) * gv(i)).sum, v.map(x => x * x).sum)
    }
    val exp = vecs.groupBy(x => src(x._1)).toSeq.map { case (s, xs) =>
      val qs = xs.map(x => quantize(x._2))
      val (v, num, den) = iterate(qs)
      val trace = qs.map(q => q.map(x => BigInt(x) * x).sum).sum
      val top = v.zipWithIndex.minBy { case (x, i) => (-x.abs, i) }._2
      (s, xs.size.toLong, trace.toLong,
        ((BigInt(1000) * num) / den).toLong,
        ((BigInt(1000) * num) / (den * trace)).toLong, top.toLong)
    }.sortBy(_._1)
    val got = Similarity.sourceAnisotropy(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp)
    // anisotropy is a proper share: ≥ uniform floor 1000/64, ≤ 1000,
    // and the sources are not all identical
    assert(exp.forall(x => x._5 >= 10L && x._5 <= 1000L))
    assert(exp.map(_._5).distinct.size > 1 || exp.size == 1)
  }

  test("q241 seasonal-naive MASE ≡ local lag fold") {
    val brand = spark.read.parquet(s"$d/part.parquet")
      .selectExpr("p_partkey", "p_brand").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val bm = spark.read.parquet(s"$d/lineitem.parquet")
      .selectExpr("l_partkey",
        "CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT)",
        "CAST(round(l_extendedprice * 100) AS BIGINT)")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(x => brand.contains(x._1))
      .groupBy(x => (brand(x._1), x._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val exp = bm.keys.map(_._1).toSeq.distinct.flatMap { b =>
      val evals = bm.collect {
        case ((`b`, m), r) if bm.contains((b, m - 12)) && bm.contains((b, m - 1)) =>
          (math.abs(r - bm((b, m - 12))), math.abs(r - bm((b, m - 1))))
      }.toSeq
      if (evals.isEmpty) None else {
        val n = evals.size.toLong
        val ae12 = evals.map(x => BigInt(x._1)).sum
        val ae1 = evals.map(x => BigInt(x._2)).sum
        Some((b, n, (ae12 / n).toLong, (ae1 / n).toLong,
          ((BigInt(1000) * ae12) / ae1).toLong))
      }
    }.sortBy(_._1)
    val got = Queries.seasonalNaiveBacktest(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
    // the metric separates brands (not all exactly the 1000 tie), and
    // each brand's eval set is genuinely cut by the 12-month lag
    assert(exp.map(_._5).distinct.size > 1)
    val monthsPerBrand = bm.keys.toSeq.groupBy(_._1).view.mapValues(_.size)
    assert(exp.forall { case (b, n, _, _, _) => n <= monthsPerBrand(b) - 12 })
  }
}
