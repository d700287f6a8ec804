package graft

import org.apache.spark.sql.functions._
import graft.sources.BucketedTables

class BucketedTablesSpec extends SparkSpec {

  test("bucketed join plans without an exchange") {
    val t = Tables(spark, sf)
    // fresh JVM = fresh derby metastore, but the warehouse dir persists:
    // clear both so Overwrite semantics hold across runs
    Seq("orders_b", "customer_b").foreach { tb =>
      spark.sql(s"DROP TABLE IF EXISTS $tb")
      val dir = new java.io.File(s"/tmp/graft_warehouse/$tb")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    BucketedTables.writeBucketed(
      t.orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumnRenamed("o_custkey", "custkey"),
      "orders_b", "custkey", nBuckets = 8, sortCols = Seq("custkey"))
    BucketedTables.writeBucketed(
      t.customer.withColumnRenamed("c_custkey", "custkey"),
      "customer_b", "custkey", nBuckets = 8, sortCols = Seq("custkey"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedTables.bucketedJoin(spark, "orders_b", "customer_b", "custkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), "bucketed join must not shuffle:\n" + plan)
      // correctness: same result as the plain join
      val expected = t.orders.join(t.customer,
        col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
