package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-format read/write + partitioned layout (SURVEY.md "sources/
  * sinks"). The reference exports CSV from a SQL store; at 100 TB the
  * layout IS the index: date-partitioned parquet means every
  * report-window query prunes to the window's partitions before a
  * byte is read.
  */
object TableSink {

  // ------------------------------------------------------- formats

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** ORC — the other columnar format a warehouse migration meets;
    * same pushdown/pruning machinery as parquet in Spark.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  // --------------------------------------------- partitioned layout

  /** Write date-partitioned parquet: one directory per day of `tsCol`.
    * Queries filtering on `p_date` prune partitions at planning time.
    */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String,
      maxRecordsPerFile: Int = 5000000): Unit =
    df.withColumn("p_date", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("p_date")
      .parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  // -------------------------------------------------- compaction

  /** Compact a parquet dataset's small files into ~`targetFileBytes`
    * files (the operational fix for the small-files problem: a 100 TB
    * table ingested in many increments accumulates thousands of tiny
    * files per partition, and scan planning + open() overhead — not
    * IO — starts to dominate). The output file count is derived from
    * the CURRENT on-disk bytes, so compaction is idempotent: running
    * it twice converges. Rewrite goes through repartition (round
    * robin), which spreads rows evenly regardless of input skew.
    *
    * Returns (inputFiles, outputFiles).
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val conf = spark.sparkContext.hadoopConfiguration
    val in = new org.apache.hadoop.fs.Path(inPath)
    val fs = in.getFileSystem(conf)
    val dataFiles = fs.listStatus(in)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inPath)
      .repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    val outFiles = fs.listStatus(new org.apache.hadoop.fs.Path(outPath))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    (dataFiles.length, outFiles)
  }
}
