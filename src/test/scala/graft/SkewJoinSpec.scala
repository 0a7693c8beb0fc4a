package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

/** Salted join ≡ plain join, and the skew profile finds the hot key. */
class SkewJoinSpec extends SparkSpec {

  private lazy val (facts, dim) = {
    import spark.implicits._
    // 90% of fact rows on one hot key — the shape that melts one task
    val f = spark.range(10000).select(
      when(col("id") % 10 =!= 0, 7L).otherwise(col("id") % 100).as("k"),
      (col("id") * 3).as("payload"))
    val dm = spark.range(100).select(col("id").as("k"),
      concat(lit("dim"), col("id")).as("name"))
    (f, dm)
  }

  test("salted inner join returns exactly the plain join's rows") {
    val plain = facts.join(dim, "k").select("k", "payload", "name")
    val salted = SkewJoin.saltedInnerJoin(facts, dim, "k", salts = 8)
      .select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt actually spreads the hot key across partitions") {
    val l = facts.withColumn("__salt",
      pmod(hash(facts.columns.map(col).toIndexedSeq: _*), lit(8)))
    val spread = l.filter(col("k") === 7).select("__salt").distinct().count()
    assert(spread >= 6, s"hot key only reached $spread of 8 salt buckets")
  }

  test("skew profile surfaces the hot key") {
    val hot = SkewJoin.skewProfile(facts, "k", threshold = 1000).collect()
    assert(hot.length == 1 && hot.head.getLong(0) == 7L)
  }
}
