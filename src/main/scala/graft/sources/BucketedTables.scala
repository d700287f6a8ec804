package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for repeat-join workloads: co-locating both
  * sides of a frequent equi-join by bucket (and sorting within
  * buckets) removes the shuffle AND the sort from every subsequent
  * join — at 100 TB that's the difference between an hourly pipeline
  * re-shuffling the fact table per query and reading pre-organized
  * buckets.
  *
  * Spark bucketing is table-catalog based: write with bucketBy via
  * saveAsTable, read back with spark.table.
  */
object BucketedTables {

  /** Persist df as a bucketed (+ sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).format("parquet")
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on the bucket key — planner emits a
    * shuffle-free SortMergeJoin when bucket counts line up.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
