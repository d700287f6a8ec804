package graft

import org.apache.spark.sql.functions._
import graft.operators.{LatestPerKey, TypedOps}

class TypedOpsSpec extends SparkSpec {

  test("typed latest-per-user equals untyped window formulation") {
    val ds = TypedOps.events(spark, sf)
    val typed = TypedOps.latestPerUser(ds)
      .collect().map(e => e.user_id -> e.event_id).toMap
    val untyped = LatestPerKey(Tables(spark, sf).events,
        Seq(col("user_id")), Seq(col("ts").desc, col("event_id").desc))
      .select("user_id", "event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(typed == untyped)
  }

  test("typed summary matches untyped aggregation") {
    val ds = TypedOps.events(spark, sf)
    val typed = TypedOps.summarize(ds)
      .collect().map(s => s.user_id -> ((s.n_events, s.last_event_id))).toMap
    val untyped = Tables(spark, sf).events
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        max(struct(col("ts"), col("event_id"))).as("m"))
      .select(col("user_id"), col("n"), col("m.event_id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(typed == untyped)
  }
}
