package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.4): the reference tool
  * is batch (monthly report windows), but the same event data arrives
  * continuously at scale — these are the streaming twins of
  * q_window_time (windowed aggregation with a watermark) and the
  * line-list "latest status per user" (stateful sessionization).
  *
  * Scale: state is partitioned by the group key; watermark bounds
  * state size; sessionization uses processing timeouts so idle keys
  * are evicted, not accumulated.
  */
object EventStream {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Session(user_id: Long, n_events: Long, total_value: Double,
      first_ts: Timestamp, last_ts: Timestamp, closed: Boolean)

  /** Tumbling 1-hour counts per event_type with a 10-minute watermark
    * (late data beyond the watermark is dropped, state is bounded).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Session per user: events within `gapMinutes` of each other belong
    * to one session; a session closes when the event-time watermark
    * passes last_ts + gap (EventTimeTimeout — deterministic, and state
    * is bounded by event time rather than wall clock, which is what
    * survives reprocessing/backfill at scale).
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[Session]) =>
          if (state.hasTimedOut) {
            val closed = state.get.copy(closed = true)
            state.remove()
            Iterator.single(closed)
          } else {
            val evs = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val out = scala.collection.mutable.ListBuffer.empty[Session]
            var cur = state.getOption
            evs.foreach { e =>
              cur = cur match {
                case None =>
                  Some(Session(userId, 1, e.value, e.ts, e.ts, closed = false))
                case Some(s) if e.ts.getTime - s.last_ts.getTime <= gapMinutes * 60000L =>
                  Some(s.copy(n_events = s.n_events + 1,
                    total_value = s.total_value + e.value, last_ts = e.ts))
                case Some(s) => // event-time gap exceeded: close, start new
                  out += s.copy(closed = true)
                  Some(Session(userId, 1, e.value, e.ts, e.ts, closed = false))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close when the watermark passes the session gap. If the
              // expiry is already at/behind the watermark (late-arriving
              // final event), clamp to watermark+1 — skipping the
              // registration entirely would leave the session open and
              // its state retained forever unless the key sees another
              // event.
              val timeoutAt = s.last_ts.getTime + gapMinutes * 60000L
              state.setTimeoutTimestamp(
                math.max(timeoutAt, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  /** Streaming exact dedup — the streaming twin of d_exact_dedup for
    * continuous ingestion: an event is dropped when its dedup key was
    * already seen within the watermark horizon. State is keyed by the
    * dedup key and evicted by the watermark, so memory is bounded by
    * (arrival rate × delay), not stream length — the property that
    * matters at 100 TB/day.
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream time-bounded join (click attribution): each click
    * joins the views of the same user that happened at most
    * `withinMinutes` before it. Both sides are watermarked AND the
    * join condition carries the time bound — together they let Spark
    * evict buffered rows once the watermark passes view_ts + bound,
    * so join state is (arrival rate × bound), not stream length.
    * Without the range predicate a stream-stream join must buffer a
    * side forever — the bound is what makes this run at 100 TB/day.
    */
  def attributeClicks(views: DataFrame, clicks: DataFrame,
      withinMinutes: Int = 10, delay: String = "10 minutes"): DataFrame = {
    val v = views.select(col("user_id").as("v_user"),
      col("ts").as("view_ts"), col("event_id").as("view_id"))
      .withWatermark("view_ts", delay)
    val c = clicks.select(col("user_id").as("c_user"),
      col("ts").as("click_ts"), col("event_id").as("click_id"), col("value"))
      .withWatermark("click_ts", delay)
    c.join(v, expr(
        s"""c_user = v_user AND click_ts >= view_ts
           AND click_ts <= view_ts + INTERVAL $withinMinutes MINUTES"""))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        col("view_ts"), col("click_ts"), col("value"))
  }

  /** Batch twin of [[attributeClicks]] for parity checks. */
  def attributeClicksBatch(views: DataFrame, clicks: DataFrame,
      withinMinutes: Int = 10): DataFrame = {
    val v = views.select(col("user_id").as("v_user"),
      col("ts").as("view_ts"), col("event_id").as("view_id"))
    val c = clicks.select(col("user_id").as("c_user"),
      col("ts").as("click_ts"), col("event_id").as("click_id"), col("value"))
    c.join(v, expr(
        s"""c_user = v_user AND click_ts >= view_ts
           AND click_ts <= view_ts + INTERVAL $withinMinutes MINUTES"""))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        col("view_ts"), col("click_ts"), col("value"))
  }

  /** Batch-equivalent of windowedCounts for parity checks. */
  def windowedCountsBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
}
