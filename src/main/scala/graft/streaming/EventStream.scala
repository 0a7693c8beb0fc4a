package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` stream shape
  * (TESTDATA.md). The reference has no streaming at all (SURVEY.md
  * §2.9); this is the north-star extension, built the Spark-native way:
  * `readStream` → watermarked event-time transforms → `writeStream`,
  * with `flatMapGroupsWithState` for custom session state.
  *
  * Both transforms are written against plain Datasets so the SAME code
  * runs in batch (for the oracle-checked q18/q19 analogs) and on a
  * stream (asserted stream≡batch in EventStreamSpec). At scale: state is
  * keyed by user_id — partitioned across executors by the groupBy
  * shuffle; the watermark bounds state size (sessions older than the
  * gap + watermark are emitted and evicted).
  */
object EventStream {

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionUpdate(
      user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Open-session accumulator (epoch millis to keep state compact). */
  final case class SessionState(start: Long, end: Long, n: Long)

  /** All of a user's not-yet-final session clusters. More than one can
    * be open at once: a cluster is final only when the watermark passes
    * its end + gap — until then a late in-watermark event may still
    * bridge into it, so emitting it early would fragment the session. */
  final case class SessionsState(sessions: List[SessionState])

  val SessionGapMs: Long = 30L * 60 * 1000

  /** Per-type hourly counts/sums with a 2-hour watermark — the
    * streaming twin of Queries.eventsHourly (q18). */
  def hourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("total_value"))

  /** q189's STREAMING twin: exact sliding 7-day distinct users (WAU)
    * per daily window, as two CHAINED stateful aggregations — the
    * Spark-native form of the batch fan-out rewrite. The first
    * aggregation groups by (sliding 7-day/1-day window, user): its
    * output is exactly one row per user per window it was active in —
    * the DISTINCT step, with Spark's window exploder playing the role
    * of q189's bounded 7× fan-out. The second counts those rows per
    * window: exact WAU, no sketch. Chained windowed aggregations are
    * watermark-legal (append mode) since Spark 3.4; state is one row
    * per LIVE (window, user) — bounded by 7·|daily actives| — and
    * per closed window, evicted by the 2-day watermark.
    *
    * Same transform runs on a batch frame for the stream ≡ batch spec;
    * window ends are day boundaries, so WAU(window ending E) equals
    * q189's WAU at day E−1 — pinned by spec at sf0.001. */
  def slidingActive(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 days")
      .groupBy(window(col("ts"), "7 days", "1 day"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("window"))
      .agg(count(lit(1)).as("wau"), sum(col("n")).as("n_events"))
      .select(col("window.end").as("win_end"), col("wau"), col("n_events"))

  /** q206's STREAMING twin: per event-time DAY and experiment, exact
    * per-arm distinct-user assignment counts and the sample-ratio-
    * mismatch chi-square in milli — the live experiment guardrail
    * (an SRM fires within a day of a bad rollout, not at the weekly
    * batch readout). Same chained stateful-agg shape as
    * [[slidingActive]]: the first aggregation groups by (1-day window,
    * exp, arm, user) — the exact DISTINCT step, state bounded by
    * |daily active users|·|experiments| live rows, watermark-evicted;
    * the second collapses to per-(window, exp) arm counts. The
    * assignment hash is q206's overflow-safe replayable split. The
    * twin emits the two-arm closed form (1000·(n_a−n_b)²) div
    * (n_a+n_b); with n = n_a+n_b this differs from the sum of q206's
    * two per-arm floors by at most one milli (floor(x/n) vs
    * 2·floor(x/2n)) — both the agreement and the ≤1 bound are pinned
    * in the spec. */
  def srmMonitor(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .select(col("ts"), col("user_id"),
        explode(sequence(lit(0L), lit(4L))).as("exp"))
      .withColumn("arm", when(expr(
        "((user_id % 1000000007 + exp * 1000003) * 2654435761) % 1000") < 500L,
        lit("a")).otherwise(lit("b")))
      .groupBy(window(col("ts"), "1 day"), col("exp"), col("arm"),
        col("user_id"))
      .agg(count(lit(1)).as("k"))
      .groupBy(col("window"), col("exp"))
      .agg(sum(when(col("arm") === "a", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "b", 1L).otherwise(0L)).as("n_b"))
      .select(col("window.start").as("day_start"), col("exp"),
        (col("n_a") + col("n_b")).as("n_users"), col("n_a"), col("n_b"),
        expr("(1000 * (n_a - n_b) * (n_a - n_b)) div (n_a + n_b)")
          .as("srm_chi2_milli"))

  /** q301/q305's DEPLOYMENT loop — the online half of the offline
    * changepoint/overdispersion audits: arriving events aggregate into
    * watermarked 10-minute tumbling windows per event type, an
    * offline-calibrated BASELINE relation (event_type →
    * expected_milli, the expected events per window in milli — e.g.
    * q301's post-break rate) rides in as a broadcast static join, and
    * every emitted row carries the observed/expected ratio in milli
    * plus a 3×-either-way alarm flag. Stateless beyond the windowed
    * count: one streaming aggregation + one static broadcast join
    * (conformalMonitor's shape on the event stream). Integer ratio
    * arithmetic, so the batch run of the SAME transform is
    * bit-identical (EventStreamSpec).
    *
    * SCOPE OF THE ALARM — this catches feed FLOODS and PARTIAL
    * droughts only. A window with ZERO events for an event type emits
    * no aggregated row at all (streaming aggregation state is keyed by
    * observed rows), and a baseline event type absent from the stream
    * is dropped by the inner join — so a COMPLETELY dead feed produces
    * silence, not a low-side alarm row. A deployment must therefore
    * pair this with a liveness check DOWNSTREAM of the sink: alert
    * when a (window, event_type) expected by the baseline has no
    * emitted row by watermark + allowed lateness (absence-of-row IS
    * the dead-feed signal; a streaming job cannot conjure rows for
    * keys it never saw without an auxiliary clock-tick source).
    * `livenessMonitor` below IS that pager — transformWithState
    * event-time timers ride the GLOBAL watermark, so a silent key
    * still adjudicates its windows; q329 is its batch twin. */
  def volumeMonitor(events: DataFrame, baseline: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(baseline), "event_type")
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("expected_milli"),
        expr("(1000000 * n) div expected_milli").as("ratio_milli"),
        expr("CASE WHEN (1000000 * n) div expected_milli > 3000" +
          " OR (1000000 * n) div expected_milli < 333" +
          " THEN 1L ELSE 0L END").as("alarm"))

  /** q19 sessionization on Spark 4's `transformWithState` — the
    * arbitrary-stateful-processing API that replaces
    * flatMapGroupsWithState (explicit typed state handles, event-time
    * timers, RocksDB-backed state). Same interval-merge semantics as
    * `sessionize`; EventStreamSpec asserts the two APIs emit identical
    * sessions. Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`). */
  def sessionizeTws(events: Dataset[Event]): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor, TimeMode.EventTime(), OutputMode.Append())
  }

  /** The transformWithState twin of sessionize's merge logic: state is
    * a ValueState of open session clusters; a cluster emits when the
    * event-time watermark passes its end + gap, driven by input rows
    * or by an event-time timer on the oldest open cluster. */
  class SessionProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, SessionUpdate] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var sessions: ValueState[SessionsState] = _
    // the expiry of the one timer currently armed for this key — lets
    // advance() delete a superseded timer instead of accumulating one
    // pending timer per input batch (each would later fire a spurious
    // advance(Nil) and cost state-store reads)
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      sessions = getHandle.getValueState[SessionsState]("sessions",
        Encoders.product[SessionsState], TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    /** Merge open clusters with new points, emit final clusters, keep
      * the rest; shared by the input and timer paths. */
    private def advance(user: Long, points: Seq[(Long, Long, Long)],
        wm: Long): Iterator[SessionUpdate] = {
      val existing = if (sessions.exists()) sessions.get().sessions else Nil
      val intervals =
        (existing.map(s => (s.start, s.end, s.n)) ++ points).sortBy(x => (x._1, x._2))
      val merged = scala.collection.mutable.Buffer.empty[(Long, Long, Long)]
      intervals.foreach { case (s0, e0, n0) =>
        merged.lastOption match {
          case Some((ps, pe, pn)) if s0 - pe <= SessionGapMs =>
            merged(merged.length - 1) = (ps, math.max(pe, e0), pn + n0)
          case _ => merged += ((s0, e0, n0))
        }
      }
      val (closed, open) = merged.partition { case (_, e0, _) =>
        e0 + SessionGapMs <= wm
      }
      val prev = if (armed.exists()) Some(armed.get()) else None
      if (open.nonEmpty) {
        sessions.update(SessionsState(
          open.toList.map { case (s0, e0, n0) => SessionState(s0, e0, n0) }))
        val expiry = open.map(_._2).min + SessionGapMs
        // re-arm only when the expiry moved, deleting the superseded
        // timer — at most ONE pending timer per key (a fired timer is
        // already removed by the engine; deleting it again is a no-op)
        if (!prev.contains(expiry)) {
          prev.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(expiry)
          armed.update(expiry)
        }
      } else {
        prev.foreach(getHandle.deleteTimer)
        armed.clear()
        sessions.clear()
      }
      closed.iterator.map { case (s0, e0, n0) =>
        SessionUpdate(user, new Timestamp(s0), new Timestamp(e0), n0)
      }
    }

    override def handleInputRows(user: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[SessionUpdate] =
      advance(user,
        rows.map(e => (e.ts.getTime, e.ts.getTime, 1L)).toSeq,
        timerValues.getCurrentWatermarkInMs())

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionUpdate] =
      // a stale timer (cluster already merged/emitted) finds no
      // finalizable cluster and re-arms for the current oldest
      advance(user, Nil, timerValues.getCurrentWatermarkInMs())
  }

  /** Stream-stream interval join: every (click, view) pair of the same
    * user with the view in the 10 minutes up to the click — the
    * streaming twin of `operators.TemporalJoins.intervalPairs` (q72),
    * asserted stream ≡ batch in EventStreamSpec.
    *
    * Both inputs carry watermarks, and the join condition bounds
    * view_ts relative to click_ts from BOTH sides — that pair is what
    * lets the streaming engine evict state: a buffered view can be
    * dropped once the click watermark passes view_ts + 10 min, a
    * buffered click once the view watermark passes click_ts. Without
    * the range bound the state store grows forever. State is keyed by
    * user_id — partitioned across executors by the join shuffle.
    *
    * The same code runs in batch (watermarks are a no-op there);
    * `clicks`/`views` are pre-filtered event frames with columns
    * (event_id, ts: timestamp, user_id). */
  def attribution(clicks: DataFrame, views: DataFrame): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "20 minutes")
    val v = views
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "20 minutes")
    c.join(v,
        col("user_id") === col("v_user") &&
          col("view_ts") <= col("click_ts") &&
          col("view_ts") >= col("click_ts") - expr("INTERVAL 10 MINUTES"))
      .select(col("click_id"), col("user_id"), col("view_id"),
        (unix_micros(col("click_ts")) - unix_micros(col("view_ts"))).as("gap_us"))
  }

  /** 30-minute-gap sessionization — the streaming twin of
    * Queries.eventsSessionize (q19), with true incremental state:
    * a session closes (and is emitted) when the event-time watermark
    * passes its end + gap. */
  def sessionize(events: Dataset[Event]): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionsState, SessionUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Event], state: GroupState[SessionsState]) =>
          // gap-cluster the open sessions and this batch's events as
          // sorted INTERVALS: a late event inside the watermark can
          // extend a session backwards (min-start merge), bridge two
          // clusters, or form its own earlier session — never silently
          // absorbed with wrong bounds. The same code handles the
          // timeout case (evs is simply empty then).
          val existing = state.getOption.map(_.sessions).getOrElse(Nil)
          val intervals =
            (existing.map(s => (s.start, s.end, s.n)) ++
              evs.map(e => (e.ts.getTime, e.ts.getTime, 1L)))
              .sortBy(x => (x._1, x._2))
          val merged = scala.collection.mutable.Buffer.empty[(Long, Long, Long)]
          intervals.foreach { case (s0, e0, n0) =>
            merged.lastOption match {
              case Some((ps, pe, pn)) if s0 - pe <= SessionGapMs =>
                merged(merged.length - 1) = (ps, math.max(pe, e0), pn + n0)
              case _ => merged += ((s0, e0, n0))
            }
          }
          // a cluster is FINAL only once the watermark passes its
          // end + gap: no admissible event can bridge into it anymore.
          // Everything else (even clusters separated by > gap inside
          // this batch) stays open — emitting early would fragment a
          // session a late in-watermark event later bridges.
          val wm = state.getCurrentWatermarkMs()
          val (closed, open) = merged.partition { case (_, e0, _) =>
            e0 + SessionGapMs <= wm
          }
          if (open.nonEmpty) {
            state.update(SessionsState(
              open.toList.map { case (s0, e0, n0) => SessionState(s0, e0, n0) }))
            // wake when the OLDEST open cluster becomes final
            state.setTimeoutTimestamp(open.map(_._2).min + SessionGapMs)
          } else state.remove()
          closed.iterator.map { case (s0, e0, n0) =>
            SessionUpdate(user, new Timestamp(s0), new Timestamp(e0), n0)
          }
      }
  }

  /** Liveness window width (ms) — the 10-minute volumeMonitor window
    * (and q329's LivenessWinNs in milliseconds). */
  val LivenessWinMs: Long = 600000L

  final case class DeadWindow(event_type: String, win: Long)
  final case class LivenessState(emittedThrough: Long, seen: List[Long])

  /** The DEAD-FEED PAGER volumeMonitor cannot be (its scaladoc's
    * documented blind spot, and q329's STREAMING twin): emit a row for
    * every 10-minute window in which a previously-seen event type
    * produced ZERO events, as soon as the event-time watermark closes
    * that window. A streaming aggregation keyed by observed rows can
    * never emit for input it did not receive — this works because
    * `transformWithState` EVENT-TIME TIMERS fire on the GLOBAL
    * watermark, which other (alive) keys keep advancing: the dead
    * key's timer fires with no input and adjudicates its silent
    * windows. Per-key liveness starts at the key's FIRST event
    * (the operator pages on "was alive, went dead"; a type never seen
    * has no key, which is the documented seeding contract — register
    * baseline types with one synthetic control event at deploy time).
    *
    * Scale shape: state per key is one (emittedThrough, pending-seen-
    * windows) pair — the seen list is bounded by the watermark delay
    * divided by the window width, never by throughput; exactly one
    * armed timer per key. */
  def livenessMonitor(events: Dataset[Event]): Dataset[DeadWindow] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.event_type)
      .transformWithState(new LivenessProcessor, TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Keeps the last adjudicated window and the with-data windows past
    * it; every watermark advancement (input or timer) closes all
    * windows whose end has passed and emits the silent ones. */
  class LivenessProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, Event, DeadWindow] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var st: ValueState[LivenessState] = _
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      st = getHandle.getValueState[LivenessState]("liveness",
        Encoders.product[LivenessState], TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    private def advance(key: String, newWins: Seq[Long], wm: Long)
        : Iterator[DeadWindow] = {
      val W = LivenessWinMs
      val prior = if (st.exists()) Some(st.get()) else None
      // a timer can only exist for a key that has state; guard anyway
      if (prior.isEmpty && newWins.isEmpty) return Iterator.empty
      // first sighting: liveness is adjudicated from this window on
      val start = prior.map(_.emittedThrough)
        .getOrElse(newWins.min - 1)
      val seen = (prior.map(_.seen).getOrElse(Nil) ++ newWins)
        .distinct.filter(_ > start)
      // window w = [w·W, (w+1)·W) is closed once wm ≥ (w+1)·W
      val lastClosed = math.max(wm / W - 1, start)
      val dead = ((start + 1) to lastClosed)
        .filterNot(seen.contains).map(DeadWindow(key, _))
      st.update(LivenessState(lastClosed, seen.filter(_ > lastClosed)))
      // always exactly one armed timer: the next window close keeps a
      // silent key adjudicating off other keys' watermark progress
      val expiry = (lastClosed + 2) * W
      val prev = if (armed.exists()) Some(armed.get()) else None
      if (!prev.contains(expiry)) {
        prev.foreach(getHandle.deleteTimer)
        getHandle.registerTimer(expiry)
        armed.update(expiry)
      }
      dead.iterator
    }

    override def handleInputRows(key: String, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[DeadWindow] =
      advance(key, rows.map(_.ts.getTime / LivenessWinMs).toSeq.distinct,
        timerValues.getCurrentWatermarkInMs())

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[DeadWindow] =
      advance(key, Nil, timerValues.getCurrentWatermarkInMs())
  }
}
