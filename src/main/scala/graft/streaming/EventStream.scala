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

  /** 30-minute-gap sessionization — the streaming twin of
    * Queries.eventsSessionize (q19), with true incremental state:
    * a session closes (and is emitted) when the event-time watermark
    * passes its end + gap. */
  def sessionize(events: Dataset[Event]): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed end+gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(SessionUpdate(user, new Timestamp(s.start), new Timestamp(s.end), s.n))
          } else {
            val closed = scala.collection.mutable.Buffer.empty[SessionUpdate]
            var cur = state.getOption
            evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= SessionGapMs =>
                  cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1))
                case Some(s) => // gap exceeded inside the batch: emit, start fresh
                  closed += SessionUpdate(user, new Timestamp(s.start), new Timestamp(s.end), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + SessionGapMs)
            }
            closed.iterator
          }
      }
  }
}
