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
}
