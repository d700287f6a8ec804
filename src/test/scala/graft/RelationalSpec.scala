package graft

import org.apache.spark.sql.functions._
import graft.operators.{LatestPerKey, Relational}
import graft.functions.{EthiopianCalendar => EC}

class RelationalSpec extends SparkSpec {

  test("every registered query runs and projects its declared shape") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, name)
      assert(df.count() >= 0, name)
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("latest per key picks max ts with id tiebreak") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, "2024-01-01 00:00:00", "a"),
      (1L, 11L, "2024-01-02 00:00:00", "b"),
      (1L, 12L, "2024-01-02 00:00:00", "c"), // same ts, higher id wins
      (2L, 20L, "2024-01-01 00:00:00", "d"))
      .toDF("k", "id", "ts_s", "v")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val out = LatestPerKey(df, Seq(col("k")), Seq(col("ts").desc, col("id").desc))
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "c", 2L -> "d"))
  }

  test("latest-per-key aggregation form equals window form and partial-aggregates") {
    val ev = Tables(spark, sf).events
    val win = LatestPerKey(ev, Seq(col("user_id")),
        Seq(col("ts").desc, col("event_id").desc))
      .select("user_id", "event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = LatestPerKey.viaAggregation(ev, Seq("user_id"), Seq("ts", "event_id"))
      .select("user_id", "event_id")
    agg.collect()
    assert(agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == win)
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("partial_max_by") || plan.contains("partial_"),
      "expected map-side partial aggregation:\n" + plan)
  }

  test("ethiopian Column conversion agrees with scalar conversion") {
    import spark.implicits._
    val dates = Seq("1995-06-15", "2000-01-01", "2023-09-12", "2024-01-21")
    val got = dates.toDF("d")
      .select(EC.ethiopianDMY(col("d")).as("ec")).as[String].collect()
    val want = dates.map { s =>
      val (y, m, dd) = EC.toEthiopian(java.time.LocalDate.parse(s))
      s"$dd/$m/$y"
    }
    assert(got.toSeq == want)
  }

  test("ethiopian Column inverse roundtrips through gregorianDate") {
    import spark.implicits._
    val dates = Seq("1995-06-15", "2000-01-01", "2023-09-11", "2024-01-21", "2016-02-29")
    val bad = dates.toDF("d")
      .select(col("d"),
        EC.gregorianDate(EC.ethYear(col("d")), EC.ethMonth(col("d")), EC.ethDay(col("d")))
          .cast("string").as("rt"))
      .filter(col("d") =!= col("rt")).count()
    assert(bad == 0)
  }

  test("plans keep filters on the scan and broadcast dims") {
    val plan = Relational.lineListEntry(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dim joins should broadcast")
  }
}
