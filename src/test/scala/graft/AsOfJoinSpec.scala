package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  test("as-of picks latest right at-or-before each left row") {
    import spark.implicits._
    val left = Seq(
      (1L, 7L, "2024-01-01 10:00:00"),
      (2L, 7L, "2024-01-01 12:00:00"),
      (3L, 8L, "2024-01-01 09:00:00")) // user 8 has no predecessor
      .toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val right = Seq(
      (7L, "2024-01-01 09:30:00", 10.0),
      (7L, "2024-01-01 10:00:00", 20.0), // same instant as left 1 → visible
      (7L, "2024-01-01 11:30:00", 30.0),
      (8L, "2024-01-01 23:00:00", 99.0)) // after left 3 → not visible
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")

    val out = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("value"))
      .select("event_id", "right_value")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L) == Some(20.0)) // equal-ts right visible
    assert(out(2L) == Some(30.0)) // latest preceding, not just any
    assert(out(3L) == None)       // no predecessor → null
  }

  test("equal (key, ts) right rows resolve by the declared tiebreak") {
    import spark.implicits._
    val left = Seq((1L, 7L, "2024-01-01 12:00:00"))
      .toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val right = Seq(
      (7L, "2024-01-01 10:00:00", 10.0, 1L),
      (7L, "2024-01-01 10:00:00", 20.0, 2L), // same key+ts: id 2 wins
      (7L, "2024-01-01 10:00:00", 15.0, 3L)) // id 3 is last in order
      .toDF("user_id", "ts_s", "value", "rid")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts",
        Seq("value", "rid"), tieBreakCol = Some("rid"))
      .select("right_value", "right_rid").head()
    assert(out.getLong(1) === 3L)
    assert(out.getDouble(0) === 15.0)
  }

  test("tolerance bounds match staleness (merge_asof semantics)") {
    import spark.implicits._
    val left = Seq((1L, 7L, "2024-01-01 12:00:00"), (2L, 7L, "2024-01-01 10:30:00"))
      .toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val right = Seq((7L, "2024-01-01 10:00:00", 10.0))
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("value"),
        toleranceSeconds = Some(3600L))
      .select("event_id", "right_value")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(2L) == Some(10.0)) // 30 min stale: within tolerance
    assert(out(1L) == None)       // 2 h stale: match dropped entirely
  }

  test("nullable payload cells never mix across right rows (struct carry)") {
    import spark.implicits._
    val left = Seq((1L, 7L, "2024-01-01 12:00:00"))
      .toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    // newest right row has a NULL value: the output must be
    // (null, 11:00), not (10.0 from the older row, 11:00)
    val right = Seq(
      (7L, "2024-01-01 10:00:00", Some(10.0), "a"),
      (7L, "2024-01-01 11:00:00", Option.empty[Double], "b"))
      .toDF("user_id", "ts_s", "value", "tag")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("value", "tag"))
      .select("right_value", "right_tag").head()
    assert(out.isNullAt(0), s"value mixed from older row: $out")
    assert(out.getString(1) === "b")
  }
}
