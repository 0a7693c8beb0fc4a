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

  test("q74: HLL partials persisted to parquet merge to the direct sketch exactly") {
    val out = Queries.userReachSketch(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val exact = Tables.eventsNs(spark, d)
      .groupBy("event_type").agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == exact.keySet && out.nonEmpty)
    out.foreach { case (k, (nDays, merged, direct)) =>
      // register-wise max is associative: union-of-partials must equal
      // the one-pass sketch EXACTLY, not just approximately
      assert(merged == direct, s"$k: merged $merged != direct $direct")
      assert(nDays > 0)
      val u = exact(k)
      assert(math.abs(merged - u) <= math.max(2.0, 0.1 * u), s"$k: $merged vs exact $u")
    }
    // the IVM-critical property: sketch partials survive a parquet
    // round trip (binary column) and still merge to the same estimate
    val e = Tables.eventsNs(spark, d)
      .select(col("event_type"), expr("ts div 86400000000000").as("day"),
        col("user_id"))
    val partials = e.groupBy(col("event_type"), col("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val dir = java.nio.file.Files.createTempDirectory("hll_partials").toString
    partials.write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (k, (_, merged, _)) => assert(reloaded(k) == merged) }
  }

  test("count-min estimates: one-sided, within eps*N, threshold has no false negatives") {
    import graft.functions.CountMinAgg.{cms, cmsEstimate}
    val e = Tables.eventsNs(spark, d)
    val exact = e.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val sk = e.agg(cms(col("user_id"), Queries.CmsWidth, Queries.CmsDepth).as("sk"))
    val est = e.select(col("user_id")).distinct().crossJoin(broadcast(sk))
      .select(col("user_id"),
        cmsEstimate(col("sk"), col("user_id"), Queries.CmsWidth, Queries.CmsDepth).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet && est.nonEmpty)
    val epsN = math.max(1.0, math.E / Queries.CmsWidth * n)
    exact.foreach { case (u, c) =>
      assert(est(u) >= c, s"user $u: CMS undercounted ${est(u)} < $c")
      assert(est(u) - c <= epsN, s"user $u: overcount ${est(u) - c} > eps*N $epsN")
    }
    // one-sidedness ⇒ every truly-heavy user appears in q66
    val heavy = Queries.heavyUsers(spark, d).collect().map(_.getLong(0)).toSet
    exact.filter(_._2 >= 75L).keySet.foreach(u => assert(heavy.contains(u)))
  }

  test("count-min aggregate runs unchanged in a streaming aggregation (mergeable state)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.functions.CountMinAgg.cms
    implicit val sc = spark.sqlContext
    val users = Tables.eventsNs(spark, d).select("user_id").as[Long].collect().toSeq
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("user_id")
      .agg(cms(col("user_id"), 64, 4).as("sk"))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      val (a, b) = users.splitAt(users.size / 2)
      mem.addData(a: _*); q.processAllAvailable()
      mem.addData(b: _*); q.processAllAvailable()
      val stream = spark.table("cms_stream").head().getSeq[Long](0)
      val batch = Tables.eventsNs(spark, d)
        .agg(cms(col("user_id"), 64, 4).as("sk")).head().getSeq[Long](0)
      // cross-batch state merge produced the identical counter matrix
      assert(stream == batch && stream.sum > 0)
    } finally q.stop()
  }

  test("count-min sketches merge by vector addition: shard-merged == whole-stream") {
    import graft.functions.CountMinAgg.cms
    val e = Tables.eventsNs(spark, d)
    def sketchOf(df: org.apache.spark.sql.DataFrame): Array[Long] =
      df.agg(cms(col("user_id"), 64, 4).as("sk"))
        .collect()(0).getSeq[Long](0).toArray
    val whole = sketchOf(e)
    val a = sketchOf(e.filter(col("event_id") % 2 === 0))
    val b = sketchOf(e.filter(col("event_id") % 2 === 1))
    assert(whole.toSeq == a.zip(b).map { case (x, y) => x + y }.toSeq)
    // a deliberately tiny sketch saturates with collisions but must
    // still never undercount (the guarantee heavy-hitter cuts rely on)
    val tiny = e.agg(cms(col("user_id"), 4, 2).as("sk"))
      .collect()(0).getSeq[Long](0).toArray
    val exact = e.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    exact.foreach { case (u, c) =>
      val estT = (0 until 2).map(r =>
        tiny(r * 4 + graft.functions.CountMinAgg.bucket(u, r, 4))).min
      assert(estT >= c)
    }
  }

  test("sliding WAU from merged daily HLL sketches within published ε of q189's exact WAU") {
    // q189 gives the EXACT 7-day sliding distinct count; the q74
    // mergeable-partial path at window scale is: one HLL sketch per
    // day, union the trailing 7 — never rescanning history. The two
    // must agree within the sketch's published error: DataSketches HLL
    // at the default lgK=12 has RSE ≈ 1.04/√4096 ≈ 1.63%; we assert
    // 3·RSE (≈4.9%) with a small-count absolute floor.
    val daily = Tables.eventsNs(spark, d)
      .select(expr("ts div 86400000000000").as("day"), col("user_id"))
      .groupBy(col("day")).agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val est = daily
      .select(explode(sequence(col("day"), col("day") + 6L)).as("day"),
        col("sk"))
      .groupBy(col("day"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("wau_est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = Queries.slidingActiveUsers(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(exact.nonEmpty && exact.keySet.subsetOf(est.keySet))
    exact.foreach { case (day, wau) =>
      val e = est(day)
      assert(math.abs(e - wau) <= math.max(3.0, 0.049 * wau),
        s"day $day: HLL WAU $e vs exact $wau exceeds 3·RSE")
    }
  }
}
