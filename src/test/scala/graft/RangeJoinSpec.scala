package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {

  test("bucketized range join equals naive range predicate join") {
    val ev = Tables(spark, sf).events
    val iv = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("iv_id"), col("ts").as("start_ts"),
        (col("ts") + expr("INTERVAL 45 MINUTES")).as("end_ts"))
    val left = ev.select("event_id", "ts")

    val naive = left.join(iv,
        col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
      .select("event_id", "iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // bucket width deliberately NOT a divisor/multiple of the interval
    val bucketed = RangeJoin.pointInInterval(left, "ts", iv,
        "start_ts", "end_ts", bucketSeconds = 700)
      .select("event_id", "iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    assert(bucketed == naive)
  }

  test("equi-key variant restricts matches per key") {
    val ev = Tables(spark, sf).events
    val iv = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("iv_id"), col("user_id"),
        col("ts").as("start_ts"), (col("ts") + expr("INTERVAL 45 MINUTES")).as("end_ts"))
    val withKey = RangeJoin.pointInInterval(
        ev.select("event_id", "user_id", "ts"), "ts",
        iv, "start_ts", "end_ts", bucketSeconds = 700, alsoOn = Seq("user_id"))
      .select("event_id", "iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val global = RangeJoin.pointInInterval(
        ev.select("event_id", "ts"), "ts",
        iv.drop("user_id"), "start_ts", "end_ts", bucketSeconds = 700)
      .select("event_id", "iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(withKey.subsetOf(global))
    assert(withKey.size < global.size)
  }
}
