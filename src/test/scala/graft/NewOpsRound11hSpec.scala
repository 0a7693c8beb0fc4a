package graft

import org.apache.spark.sql.functions._

/** Round-11 batch h: q343 Little's-law audit — local recompute plus
  * the closed-window identity (on a synthetic queue with no boundary
  * mass, L = λ·W holds to floor precision). */
class NewOpsRound11hSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("q343 ≡ local sweep recompute") {
    val grid = spark.read.parquet(s"$d/lineitem.parquet")
      .join(spark.read.parquet(s"$d/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .selectExpr(
        "CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT) AS od",
        "CAST(datediff(l_shipdate, DATE '1970-01-01') AS BIGINT) AS sd")
      .groupBy(col("od"), col("sd")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val d0 = grid.map(_._1).min
    val d1 = grid.flatMap(t => Seq(t._1, t._2)).max
    val days = d1 - d0 + 1
    val n = grid.map(_._3).sum
    val wSum = grid.map(t => BigInt(t._2 - t._1) * t._3).sum
    val delta = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    grid.foreach { case (od, sd, c) => delta(od) += c; delta(sd) -= c }
    var b = 0L
    var lSum = BigInt(0)
    (d0 to d1).foreach { dy => b += delta(dy); lSum += b }
    val lam = BigInt(1000) * n / days
    val w = BigInt(1000) * wSum / n
    val l = BigInt(1000) * lSum / days
    val ratio = (BigInt(1000000) * l / (lam * w)).toLong
    val r = Queries.littleLawAudit(spark, d).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) ==
      (days, n, lam.toLong, w.toLong, l.toLong, ratio))
    // the sweep conserves mass: backlog returns to zero at the end
    assert(b == 0L)
    // identity check on a boundary-free synthetic queue: 100 items
    // arriving day i, each in system 5 days, window padded so edge
    // mass is inside — L = λ·W exactly up to the milli floors
    val synth = (0L until 50L).map(i => (i, i + 5L, 100L))
    val sd0 = 0L
    val sd1 = 54L
    val sdays = sd1 - sd0 + 1
    val sn = synth.map(_._3).sum
    val sw = synth.map(t => BigInt(t._2 - t._1) * t._3).sum
    val sdelta = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    synth.foreach { case (od, sd, c) => sdelta(od) += c; sdelta(sd) -= c }
    var sb = 0L
    var sl = BigInt(0)
    (sd0 to sd1).foreach { dy => sb += sdelta(dy); sl += sb }
    // item-days both ways: Σ backlog over days == Σ per-item duration
    assert(sl == sw)
  }
}
