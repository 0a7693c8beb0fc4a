package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates: bounded error against exact answers (the oracle
  * can't hash-match another engine's HLL/t-digest bytes). */
class SketchSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("approx_count_distinct within HLL++ rsd of exact; approx median within data range") {
    val approx = Queries.eventSketches(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    val exact = Tables.eventsNs(spark, d)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("u"),
        expr("percentile(value, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    exact.foreach { case (k, (u, m)) =>
      val (au, am, n) = approx(k)
      assert(math.abs(au - u) <= math.max(2.0, 0.1 * u), s"$k: hll $au vs exact $u")
      assert(math.abs(am - m) <= 0.2 * math.max(1.0, math.abs(m)), s"$k: median $am vs $m")
      assert(n > 0)
    }
  }
}
