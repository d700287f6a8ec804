package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.Tables

/** Typed Dataset[T] surface for the event/line-list domain — the
  * case-class + Encoder API where compile-time safety matters more
  * than dynamic schemas (the brief's Dataset-where-it-helps rule).
  *
  * Note the trade: reduceGroups is object-based (deserializes each
  * row), so the untyped window formulation in LatestPerKey stays the
  * hot path; this API exists for callers who want typed domain logic,
  * and the spec pins both to identical results.
  */
object TypedOps {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class UserSummary(user_id: Long, n_events: Long,
      total_value: Double, last_event_id: Long)

  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    Tables(spark, dir).events
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
  }

  /** Latest event per user via typed reduceGroups. */
  def latestPerUser(ds: Dataset[Event]): Dataset[Event] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .reduceGroups { (a: Event, b: Event) =>
        val c = java.lang.Long.compare(a.ts.getTime, b.ts.getTime)
        if (c > 0 || (c == 0 && a.event_id > b.event_id)) a else b
      }
      .map(_._2)
  }

  /** Typed aggregation per user. */
  def summarize(ds: Dataset[Event]): Dataset[UserSummary] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .mapGroups { (uid: Long, it: Iterator[Event]) =>
        var n = 0L; var total = 0.0; var lastTs = Long.MinValue; var lastId = -1L
        it.foreach { e =>
          n += 1; total += e.value
          if (e.ts.getTime > lastTs ||
            (e.ts.getTime == lastTs && e.event_id > lastId)) {
            lastTs = e.ts.getTime; lastId = e.event_id
          }
        }
        UserSummary(uid, n, total, lastId)
      }
  }
}
