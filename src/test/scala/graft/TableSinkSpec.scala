package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.TableSink

class TableSinkSpec extends SparkSpec {

  test("csv/json/parquet round-trips preserve data") {
    val src = Tables(spark, sf).nation
    val dir = Files.createTempDirectory("graft_fmt")
    TableSink.writeCsv(src, s"$dir/csv")
    TableSink.writeJson(src, s"$dir/json")
    TableSink.writeParquet(src, s"$dir/pq")
    val want = src.collect().map(_.toString).sorted
    assert(TableSink.readCsv(spark, s"$dir/csv").collect().map(_.toString).sorted
      .sameElements(want))
    assert(TableSink.readJson(spark, s"$dir/json")
      .select("n_nationkey", "n_name", "n_regionkey") // json reorders
      .collect().map(_.toString).sorted.sameElements(want))
    assert(spark.read.parquet(s"$dir/pq").collect().map(_.toString).sorted
      .sameElements(want))
  }

  test("orc round-trip preserves data and pushes filters to the scan") {
    val src = Tables(spark, sf).nation
    val dir = Files.createTempDirectory("graft_orc")
    TableSink.writeOrc(src, s"$dir/orc")
    val back = TableSink.readOrc(spark, s"$dir/orc")
    assert(back.collect().map(_.toString).sorted
      .sameElements(src.collect().map(_.toString).sorted))
    // same pushdown machinery as parquet
    val filtered = back.filter(col("n_regionkey") === 1).select("n_name")
    filtered.collect()
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("n_regionkey"), plan)
    assert(plan.contains("ReadSchema") && !plan.contains("n_comment"),
      "orc scan must prune unused columns: " + plan)
  }

  test("date-partitioned write prunes partitions on read") {
    val dir = Files.createTempDirectory("graft_part")
    TableSink.writeDatePartitioned(Tables(spark, sf).events, "ts", s"$dir/events")
    val df = TableSink.readPartitioned(spark, s"$dir/events")
      .filter(col("p_date") === "2024-01-05")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(p_date"), plan)
    // pruned scan reads only the matching partition directory
    val allDays = TableSink.readPartitioned(spark, s"$dir/events")
      .select(countDistinct(col("p_date"))).head().getLong(0)
    assert(allDays > 1, "test premise: multiple partitions exist")
    val prunedDays = df.select(countDistinct(col("p_date"))).head().getLong(0)
    assert(prunedDays <= 1)
  }

  test("compaction merges small files, preserves rows, and is idempotent") {
    val dir = Files.createTempDirectory("graft_compact")
    val src = Tables(spark, sf).customer
    // simulate incremental ingest: 40 tiny files
    src.repartition(40).write.parquet(s"$dir/small")
    val (inFiles, outFiles) = TableSink.compact(spark,
      s"$dir/small", s"$dir/compacted", targetFileBytes = 512L * 1024)
    assert(inFiles == 40, s"premise: 40 input files, saw $inFiles")
    assert(outFiles < inFiles, s"compaction must reduce files: $inFiles -> $outFiles")
    // no rows lost or duplicated
    val before = src.count()
    val after = spark.read.parquet(s"$dir/compacted").count()
    assert(after == before)
    assert(spark.read.parquet(s"$dir/compacted").select("c_custkey").distinct().count()
      == src.select("c_custkey").distinct().count())
    // idempotent: compacting the compacted output converges (stays put)
    val (in2, out2) = TableSink.compact(spark,
      s"$dir/compacted", s"$dir/compacted2", targetFileBytes = 512L * 1024)
    assert(in2 == outFiles && out2 <= in2 + 1, s"$in2 -> $out2")
  }

  test("compaction of a hive-partitioned dataset preserves the layout") {
    val dir = Files.createTempDirectory("graft_compact_part")
    val src = Tables(spark, sf).events
    // incremental ingest under a date-partitioned layout: many tiny
    // files nested below p_date=... directories
    src.withColumn("p_date", date_format(col("ts"), "yyyy-MM-dd"))
      .repartition(8)
      .write.partitionBy("p_date").parquet(s"$dir/small")
    val (inFiles, outFiles) = TableSink.compact(spark,
      s"$dir/small", s"$dir/compacted", targetFileBytes = 16L * 1024 * 1024)
    assert(inFiles > 8, s"premise: nested files counted recursively, saw $inFiles")
    assert(outFiles < inFiles, s"must reduce files: $inFiles -> $outFiles")
    // layout survives: key=value directories exist and pruning still works
    val back = spark.read.parquet(s"$dir/compacted")
    assert(back.columns.contains("p_date"))
    val days = back.select(countDistinct(col("p_date"))).head().getLong(0)
    val srcDays = src.select(countDistinct(date_format(col("ts"), "yyyy-MM-dd")))
      .head().getLong(0)
    assert(days == srcDays, s"partition values preserved: $days vs $srcDays")
    assert(back.count() == src.count())
    val oneDay = back.filter(col("p_date") === "2024-01-05")
    oneDay.collect()
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(p_date"),
      "pruning must survive compaction: " + plan)
  }
}
