package graft

import java.sql.Timestamp
import graft.streaming.EventStream
import graft.streaming.EventStream.{Event, SessionUpdate}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming specs: MemoryStream-fed micro-batches, asserting
  * stream results equal the batch run of the SAME transform, and that
  * watermark-driven session state opens/closes correctly. */
class EventStreamSpec extends SparkSpec {

  // offset all event times well past epoch 0: the initial watermark is 0,
  // and stateful ops drop rows at-or-before the watermark
  private val Base = 1000L
  private def ts(min: Long): Timestamp = new Timestamp((Base + min) * 60000L)

  private val evs = Seq(
    Event(1, ts(0), 1, "click", 1.0),
    Event(2, ts(10), 1, "click", 2.0),
    Event(3, ts(70), 1, "view", 3.0), // >30min gap: 2nd session for user 1
    Event(4, ts(5), 2, "view", 4.0),
    Event(5, ts(65), 2, "view", 5.0), // 2nd session for user 2
    Event(6, ts(75), 2, "click", 6.0), // same session (10 min gap)
  )

  test("watermarked hourly aggregation: stream equals batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.hourly(mem.toDF())
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      val stream = spark.table("hourly_out")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      val batch = EventStream.hourly(evs.toDF())
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(stream == batch)
      assert(batch.nonEmpty && batch.toSeq.map(_._3).sum == evs.size)
    } finally q.stop()
  }

  test("sessionization: sessions close via watermark timeout with exact bounds") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      // watermark far past every session end + gap: all sessions emit.
      // Each advancing batch raises the watermark computed from the
      // PREVIOUS batch's max event time, so user 3's own first session
      // needs one extra advance to become final.
      mem.addData(Event(99, ts(10000), 3, "click", 0.0))
      q.processAllAvailable()
      mem.addData(Event(100, ts(20000), 3, "click", 0.0))
      q.processAllAvailable()
      mem.addData(Event(101, ts(30000), 3, "click", 0.0))
      q.processAllAvailable()
      val out = spark.table("sess_out").as[SessionUpdate].collect()
        .map(s => (s.user_id, s.session_start.getTime / 60000 - Base,
          s.session_end.getTime / 60000 - Base, s.n_events)).toSet
      assert(out.contains((1L, 0L, 10L, 2L)))  // user 1: [0,10] 2 events
      assert(out.contains((1L, 70L, 70L, 1L))) // user 1: singleton at 70
      assert(out.contains((2L, 5L, 5L, 1L)))   // user 2: singleton at 5
      assert(out.contains((2L, 65L, 75L, 2L))) // user 2: [65,75] 2 events
      // + user 3's first two advancing events, themselves finalized once
      // the watermark passed them; only the newest (30000) stays open
      assert(out.size == 6, out.toString)
    } finally q.stop()
  }

  test("sessionization: late events within the watermark merge with exact bounds") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sess_late_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1 opens user 7's session at [100,100]
      mem.addData(Event(1, ts(100), 7, "click", 1.0))
      q.processAllAvailable()
      // batch 2: late events at 92/95 (inside the 10-min watermark) must
      // extend session_start BACKWARDS to 92 — not be silently absorbed
      // with the start stuck at 100. Same batch: user 9's two events sit
      // >gap apart, so the earlier one closes immediately in-batch.
      mem.addData(Event(2, ts(95), 7, "view", 1.0), Event(3, ts(92), 7, "view", 1.0),
        Event(4, ts(91), 9, "view", 1.0), Event(5, ts(150), 9, "click", 1.0))
      q.processAllAvailable()
      // push the watermark far ahead so open sessions time out
      mem.addData(Event(9, ts(10000), 8, "click", 0.0))
      q.processAllAvailable()
      mem.addData(Event(10, ts(20000), 8, "click", 0.0))
      q.processAllAvailable()
      val out = spark.table("sess_late_out").as[SessionUpdate].collect()
        .map(s => (s.user_id, s.session_start.getTime / 60000 - Base,
          s.session_end.getTime / 60000 - Base, s.n_events)).toSet
      assert(out.contains((7L, 92L, 100L, 3L)), out.toString) // backward-extended
      assert(out.contains((9L, 91L, 91L, 1L)), out.toString)  // in-batch gap close
      assert(out.contains((9L, 150L, 150L, 1L)), out.toString)
    } finally q.stop()
  }

  test("sessionization: a late bridge event unifies clusters that arrived > gap apart") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sess_bridge_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: two events 35 min apart — two clusters, but neither is
      // final (watermark hasn't passed end+gap), so NOTHING emits yet
      mem.addData(Event(1, ts(200), 11, "click", 1.0), Event(2, ts(235), 11, "click", 1.0))
      q.processAllAvailable()
      // batch 2: a late event at 227 (admissible: watermark is 225)
      // bridges the clusters — batch q19 semantics say ONE session
      mem.addData(Event(3, ts(227), 11, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Event(9, ts(10000), 12, "click", 0.0))
      q.processAllAvailable()
      mem.addData(Event(10, ts(20000), 12, "click", 0.0))
      q.processAllAvailable()
      val out = spark.table("sess_bridge_out").as[SessionUpdate].collect()
        .filter(_.user_id == 11L)
        .map(s => (s.session_start.getTime / 60000 - Base,
          s.session_end.getTime / 60000 - Base, s.n_events)).toSet
      assert(out == Set((200L, 235L, 3L)), out.toString)
    } finally q.stop()
  }

  test("transformWithState sessionization emits the same sessions as flatMapGroupsWithState") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Event]
      val q = EventStream.sessionizeTws(mem.toDS())
        .writeStream.format("memory").queryName("sess_tws")
        .outputMode(OutputMode.Append).start()
      try {
        mem.addData(evs: _*)
        q.processAllAvailable()
        mem.addData(Event(99, ts(10000), 3, "click", 0.0))
        q.processAllAvailable()
        mem.addData(Event(100, ts(20000), 3, "click", 0.0))
        q.processAllAvailable()
        mem.addData(Event(101, ts(30000), 3, "click", 0.0))
        q.processAllAvailable()
        val out = spark.table("sess_tws").as[SessionUpdate].collect()
          .map(s => (s.user_id, s.session_start.getTime / 60000 - Base,
            s.session_end.getTime / 60000 - Base, s.n_events)).toSet
        // identical expectations to the flatMapGroupsWithState test
        assert(out.contains((1L, 0L, 10L, 2L)))
        assert(out.contains((1L, 70L, 70L, 1L)))
        assert(out.contains((2L, 5L, 5L, 1L)))
        assert(out.contains((2L, 65L, 75L, 2L)))
        assert(out.size == 6, out.toString)
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("Update output mode: only changed groups emit; last-emit state equals batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.hourly(mem.toDF())
      .writeStream.format("memory").queryName("hourly_upd")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(5), 1, "view", 2.0))
      q.processAllAvailable()
      val afterB1 = spark.table("hourly_upd").count()
      // batch 2 touches ONLY the click group: exactly one update row
      // emits, not a re-emission of every group (that's Complete mode)
      mem.addData(Event(3, ts(10), 2, "click", 3.0))
      q.processAllAvailable()
      val emitted = spark.table("hourly_upd")
        .as[(java.sql.Timestamp, String, Long, Double)].collect()
      assert(emitted.length == afterB1 + 1, emitted.mkString(";"))
      // last emission per group == the batch answer over all events
      val lastPerGroup = emitted.zipWithIndex
        .groupBy(t => (t._1._1, t._1._2))
        .map { case (_, vs) => vs.maxBy(_._2)._1 }.toSet
      val batch = EventStream.hourly(Seq(
        Event(1, ts(0), 1, "click", 1.0), Event(2, ts(5), 1, "view", 2.0),
        Event(3, ts(10), 2, "click", 3.0)).toDF())
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
      assert(lastPerGroup == batch)
    } finally q.stop()
  }

  test("stream-stream interval join (attribution): stream equals batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    val q = EventStream.attribution(clicks.toDF(), views.toDF())
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append).start()
    try {
      val cs = Seq(Event(10, ts(20), 1, "click", 1.0),
        Event(11, ts(40), 1, "click", 1.0), Event(12, ts(25), 2, "click", 1.0))
      val vs = Seq(Event(1, ts(15), 1, "view", 1.0), Event(2, ts(19), 1, "view", 1.0),
        Event(3, ts(35), 1, "view", 1.0), Event(4, ts(24), 3, "view", 1.0))
      clicks.addData(cs: _*)
      views.addData(vs: _*)
      q.processAllAvailable()
      val stream = spark.table("attr_out")
        .as[(Long, Long, Long, Long)].collect().toSet
      val batch = EventStream.attribution(cs.toDF(), vs.toDF())
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(stream == batch)
      // click@20 matches views@15,19 (≤10 min back); click@40 matches
      // view@35; user 2's click and user 3's view stay unmatched
      assert(stream.map(t => (t._1, t._3)) == Set((10L, 1L), (10L, 2L), (11L, 3L)))
    } finally q.stop()
  }

  test("attribution batch twin equals q72's bucket-blocked interval pairs") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val ev = Tables.eventsNs(spark, d)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val batch = EventStream.attribution(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "view"))
      .select("click_id", "user_id", "view_id", "gap_us")
    val q72 = operators.TemporalJoins.intervalPairs(spark, d)
      .select("click_id", "user_id", "view_id", "gap_us")
    assert(batch.except(q72).isEmpty && q72.except(batch).isEmpty)
    assert(q72.count() > 0)
  }

  test("file source → hourly agg → sink (Trigger.AvailableNow) equals batch") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    // The stream source must read with the file's RAW schema (whatever
    // ts vintage the testdata generator shipped) and then apply the SAME
    // normalization as the batch path (Tables.normalizeTsNs) — declaring
    // LongType over a TIMESTAMP file would reinterpret the raw INT64
    // micros as nanos and shift every hour bucket.
    val schema = spark.read.parquet(s"$d/events.parquet").schema
    def toTs(df: org.apache.spark.sql.DataFrame) =
      Tables.normalizeTsNs(df).withColumn("ts", timestamp_micros(expr("ts div 1000")))
    // the file stream source wants a directory of arriving files
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$d/events.parquet"), dir.resolve("part-0.parquet"))
    val src = spark.readStream.schema(schema).parquet(dir.toString)
    val q = EventStream.hourly(toTs(src))
      .writeStream.format("memory").queryName("file_hourly")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(120000) finally q.stop()
    val stream = spark.table("file_hourly")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val batch = EventStream.hourly(toTs(Tables.eventsNs(spark, d)))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(stream == batch && stream.nonEmpty)
  }

  test("sliding WAU: chained stateful aggs, stream closed windows equal batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val DayMs = 86400000L
    def dayTs(day: Long, min: Long): Timestamp =
      new Timestamp(day * DayMs + min * 60000L)
    // users active across a 10-day span with day gaps; day 100 base
    // keeps every window end well past the initial zero watermark
    val evs = (for {
      (u, days) <- Seq(1L -> Seq(100L, 101L, 103L), 2L -> Seq(100L, 108L),
        3L -> Seq(105L, 106L, 107L), 4L -> Seq(109L))
      d <- days
    } yield Event(u * 1000 + d, dayTs(d, u * 7 % 60), u, "click", 1.0)) ++
      // sentinel far ahead: advances the watermark past every real
      // window so append mode emits them all
      Seq(Event(9, dayTs(130, 0), 99, "click", 1.0))
    val mem = MemoryStream[Event]
    val q = EventStream.slidingActive(mem.toDF())
      .writeStream.format("memory").queryName("wau_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      mem.addData(Event(10, dayTs(131, 0), 99, "click", 1.0))
      q.processAllAvailable()
      val stream = spark.table("wau_out")
        .as[(Timestamp, Long, Long)].collect().toSet
      val batch = EventStream.slidingActive(evs.toDF())
        .as[(Timestamp, Long, Long)].collect().toSet
      // append emits only watermark-closed windows: every closed
      // window must match batch exactly, and the real span must be
      // fully closed (only the sentinel's own windows may be open)
      assert(stream.subsetOf(batch))
      val realSpan = batch.filter(_._1.getTime <= 117L * DayMs)
      assert(realSpan.subsetOf(stream), "all real-span windows closed and exact")
      // hand-check one window: end day 104 covers days 97..103 →
      // users 1 (100,101,103) and 2 (100) → wau 2, events 4
      assert(stream.contains((new Timestamp(104L * DayMs), 2L, 4L)))
    } finally q.stop()
  }

  test("sliding WAU batch twin matches q189 at sf0.001 on common days") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val ev = Tables.eventsNs(spark, d)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val twin = EventStream.slidingActive(ev)
      .select(expr("unix_millis(win_end) div 86400000 - 1").as("day"),
        col("wau")).as[(Long, Long)].collect().toMap
    val batch = Queries.slidingActiveUsers(spark, d)
      .select(col("day"), col("wau")).as[(Long, Long)].collect().toMap
    // q189 reports only days with daily activity; the twin reports
    // every touched window — on common days they must agree exactly
    assert(batch.nonEmpty)
    batch.foreach { case (day, wau) =>
      assert(twin.get(day).contains(wau), s"day $day: ${twin.get(day)} vs $wau")
    }
  }

  test("sessionize on batch matches q19's window-lag session counts at sf0.001") {
    import spark.implicits._
    // rebuild Event rows from the batch events table (ts is epoch-nanos)
    val batchEvents = Tables.eventsNs(spark, "/root/testdata/sf0.001")
      .selectExpr("event_id", "timestamp_micros(ts div 1000) as ts", "user_id",
        "event_type", "value").as[Event]
    // run the same per-user gap logic in batch via groupByKey (no
    // watermark in batch mode: every session is final at EOF)
    val sessions = batchEvents.groupByKey(_.user_id).flatMapGroups { (u, it) =>
      val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val out = scala.collection.mutable.Buffer.empty[(Long, Long)]
      var n = 0L
      var count = 0L
      var lastEnd = Long.MinValue
      sorted.foreach { e =>
        if (lastEnd == Long.MinValue || e.ts.getTime - lastEnd > EventStream.SessionGapMs) n += 1
        lastEnd = e.ts.getTime; count += 1
      }
      Iterator.single((u, n))
    }.toDF("user_id", "n_sessions")
    val oracle = Queries.eventsSessionize(spark, "/root/testdata/sf0.001")
      .select("user_id", "n_sessions")
    assert(sessions.except(oracle).isEmpty && oracle.except(sessions).isEmpty)
  }

  test("funnel stages match an independent per-user event-log walk") {
    import org.apache.spark.sql.functions.col
    val d = "/root/testdata/sf0.001"
    // independent recompute: literally walk each user's ordered log
    val byUser = Tables.eventsNs(spark, d)
      .select("user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 1000L, r.getString(2)))
      .groupBy(_._1)
    val expect = byUser.flatMap { case (u, evs) =>
      val s = evs.sortBy(_._2)
      s.find(_._3 == "view").map { v =>
        val c = s.find(e => e._3 == "click" && e._2 >= v._2)
        val p = c.flatMap(cc => s.find(e => e._3 == "purchase" && e._2 >= cc._2))
        (u, v._2, c.map(_._2), p.map(_._2),
          1L + c.size.toLong + p.size.toLong)
      }
    }.toSeq.sortBy(_._1)
    val got = Queries.eventFunnel(spark, d).collect().map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getLong(4))
    }.toSeq
    assert(got == expect && got.nonEmpty)
    // ordering property the SQL twin could get wrong identically: no
    // stage timestamp precedes its predecessor
    got.foreach { case (_, v, c, p, _) =>
      c.foreach(x => assert(x >= v)); (c zip p).foreach { case (x, y) => assert(y >= x) }
    }
  }

  test("SRM monitor: chained stateful aggs, stream closed windows equal batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val DayMs = 86400000L
    def dayTs(day: Long, min: Long): Timestamp =
      new Timestamp(day * DayMs + min * 60000L)
    // 40 users across two days (some active both days, some once; a
    // repeat event the same day exercises the distinct step)
    val evs = (for {
      u <- 1L to 40L
      day <- Seq(100L) ++ (if (u % 3 == 0) Seq(101L) else Nil)
    } yield Event(u * 1000 + day, dayTs(day, u % 60), u, "click", 1.0)) ++
      Seq(Event(7, dayTs(100, 30), 5, "click", 1.0), // same-day repeat
        // sentinel: advances the watermark past both real days
        Event(9, dayTs(130, 0), 99, "click", 1.0))
    val mem = MemoryStream[Event]
    val q = EventStream.srmMonitor(mem.toDF())
      .writeStream.format("memory").queryName("srm_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      mem.addData(Event(10, dayTs(131, 0), 98, "click", 1.0))
      q.processAllAvailable()
      val stream = spark.table("srm_out")
        .as[(Timestamp, Long, Long, Long, Long, Long)].collect().toSet
      val batch = EventStream.srmMonitor(evs.toDF())
        .as[(Timestamp, Long, Long, Long, Long, Long)].collect().toSet
      assert(stream.subsetOf(batch))
      val realSpan = batch.filter(_._1.getTime <= 102L * DayMs)
      assert(realSpan.subsetOf(stream), "all real-day windows closed and exact")
      // local recompute: day-100 row of every experiment — 40 distinct
      // users hashed with q206's split (the repeat event must not count)
      // q206's split; operands here never overflow or go negative
      // (u ≤ 40), so Scala % ≡ SQL % on this domain
      def arm(u: Long, e: Long): String =
        if (((u % 1000000007L + e * 1000003L) * 2654435761L) % 1000L < 500L)
          "a" else "b"
      for (e <- 0L to 4L) {
        val na = (1L to 40L).count(u => arm(u, e) == "a").toLong
        val nb = 40L - na
        val chi = 1000L * (na - nb) * (na - nb) / 40L
        assert(stream.contains(
          (new Timestamp(100L * DayMs), e, 40L, na, nb, chi)),
          s"exp $e: expected (40, $na, $nb, $chi)")
        // the ≤1-milli floor interplay vs q206's per-arm contributions
        val perArm = 2L * (1000L * (na - nb) * (na - nb) / 80L)
        assert(chi - perArm >= 0L && chi - perArm <= 1L)
      }
    } finally q.stop()
  }

  test("volume monitor: stream equals batch; alarms fire both ways") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // baseline: clicks expect 1/window, views expect 10/window — the
    // view feed is under-delivering in `evs`, clicks are on target
    val baseline = Seq(("click", 1000L), ("view", 10000L))
      .toDF("event_type", "expected_milli")
    val mem = MemoryStream[Event]
    val q = EventStream.volumeMonitor(mem.toDF(), baseline)
      .writeStream.format("memory").queryName("vol_out")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      val stream = spark.table("vol_out")
        .as[(Timestamp, String, Long, Long, Long, Long)].collect().toSet
      val batch = EventStream.volumeMonitor(evs.toDF(), baseline)
        .as[(Timestamp, String, Long, Long, Long, Long)].collect().toSet
      assert(stream == batch)
      assert(batch.nonEmpty)
      // every view window under-delivers 10x -> low-side alarm; click
      // windows hold 1 click each -> ratio 1000, no alarm
      batch.filter(_._2 == "view").foreach { r =>
        assert(r._5 < 333L && r._6 == 1L)
      }
      batch.filter(_._2 == "click").foreach { r =>
        assert(r._5 == 1000L && r._6 == 0L)
      }
    } finally q.stop()
  }

  test("livenessMonitor pages exactly the silent closed windows (dead-feed twin of q329)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val W = EventStream.LivenessWinMs
      def ev(id: Long, t: String, win: Long): Event =
        Event(id, new Timestamp(win * W + 1000L), 1L, t, 0.0)
      // a: alive 0..12 (drives the watermark); b: silent 3..7 and 10;
      // c: one event then dead forever (timers must fire with NO input)
      val batches = Seq(
        Seq(ev(1, "a", 0), ev(2, "b", 0), ev(3, "c", 0)),
        Seq(ev(4, "a", 1), ev(5, "a", 2), ev(6, "a", 3), ev(7, "b", 1),
          ev(8, "b", 2)),
        Seq(ev(9, "a", 4), ev(10, "a", 5), ev(11, "a", 6), ev(12, "a", 7),
          ev(13, "a", 8)),
        Seq(ev(14, "a", 9), ev(15, "a", 10), ev(16, "a", 11),
          ev(17, "a", 12), ev(18, "b", 8), ev(19, "b", 9)))
      val mem = MemoryStream[Event]
      val q = EventStream.livenessMonitor(mem.toDS())
        .writeStream.format("memory").queryName("liveness")
        .outputMode(OutputMode.Append).start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        val out = spark.table("liveness")
          .as[EventStream.DeadWindow].collect()
          .map(dw => (dw.event_type, dw.win)).toSet
        // watermark after the last batch = 12·W + 1000 − 10 min ⇒ the
        // last CLOSED window is 10; batch recompute of the documented
        // per-key rule over the same feed:
        val all = batches.flatten
        val wm = all.map(_.ts.getTime).max - W
        val lastClosed = wm / W - 1
        val expect = all.groupBy(_.event_type).toSeq.flatMap { case (t, es) =>
          val seen = es.map(_.ts.getTime / W).toSet
          (seen.min + 1 to lastClosed).filterNot(seen).map(w => (t, w))
        }.toSet
        assert(lastClosed == 10L)
        assert(out == expect, s"got $out expected $expect")
        assert(out == Set(("b", 3L), ("b", 4L), ("b", 5L), ("b", 6L),
          ("b", 7L), ("b", 10L)) ++ (1L to 10L).map(("c", _)))
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }
}
