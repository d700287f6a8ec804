package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Loaders for the driver-generated parquet tables under a scale
  * factor directory (see TESTDATA.md). Column pruning / predicate
  * pushdown is left to Catalyst — callers select/filter and the
  * parquet scan only reads what survives.
  *
  * A `dir` starting with `jdbc:` routes every table through
  * `spark.read.jdbc` instead — the reference tool's actual source is
  * a SQL database (export.py db_properties), and this makes the whole
  * registered query surface runnable against one unchanged. Connection
  * and scan options come from session conf keys `graft.jdbc.*`
  * (user, password, driver, fetchsize, and the partitioned-read
  * knobs partitionColumn/numPartitions/lowerBound/upperBound — the
  * single-partition default is the classic JDBC-at-scale trap; set
  * them when the fact tables share a numeric key column). Predicate
  * and projection pushdown into the database happen through Spark's
  * JDBC source as usual.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame =
    if (dir.startsWith("jdbc:")) {
      val props = new java.util.Properties()
      Seq("user", "password", "driver").foreach { k =>
        spark.conf.getOption(s"graft.jdbc.$k").foreach(props.setProperty(k, _))
      }
      val reader = spark.read
      Seq("partitionColumn", "numPartitions", "lowerBound", "upperBound",
        "fetchsize").foreach { k =>
        spark.conf.getOption(s"graft.jdbc.$k").foreach(reader.option(k, _))
      }
      reader.jdbc(dir, name, props)
    } else Tables.parquetWithCachedSchema(spark, s"$dir/$name.parquet")

  def region: DataFrame    = table("region")
  def nation: DataFrame    = table("nation")
  def customer: DataFrame  = table("customer")
  def supplier: DataFrame  = table("supplier")
  def part: DataFrame      = table("part")
  def orders: DataFrame    = table("orders")
  def lineitem: DataFrame  = table("lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; read it as raw nanos (legacy conf, set here so it
    * works under any session) and convert to a microsecond timestamp
    * with exact integer arithmetic.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object Tables {

  /** Driver-side parquet schema cache, keyed by table path with a
    * file-signature staleness check (sorted name:length:mtime — the
    * IvfIndex artifact-cache pattern). Every `Tables(...)` accessor
    * used to run a footer-inference DRIVER JOB per call — one job-gap
    * per table reference per query construction, which across a
    * 131-query bench sweep (warmup + 2 timed drives each) is hundreds
    * of pure-scheduling round-trips against immutable inputs. The
    * signature re-lists the directory per call (driver-side metadata,
    * no job), so an in-place regeneration of a table is picked up on
    * the next read; a corpus FLIP between directories is a different
    * key entirely (the SoakCheck axis). Bounded: test suites churn
    * fixture dirs, so the map clears past 64 entries.
    */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, org.apache.spark.sql.types.StructType)]()

  private def sig(spark: SparkSession, path: String): String =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).map(st =>
          s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
        .sorted.mkString(";")
    } catch { case _: java.io.IOException => "" }

  /** Shared by the session-cache read-backs (CellAssignCache dirs are
    * generation-unique, so the signature always matches after first
    * read) — same footer-job trim as the table loaders.
    */
  private[graft] def parquetWithCachedSchema(spark: SparkSession,
      path: String): DataFrame = {
    val sg = sig(spark, path)
    val hit = schemaCache.get(path)
    if (sg.nonEmpty && hit != null && hit._1 == sg)
      spark.read.schema(hit._2).parquet(path)
    else {
      val df = spark.read.parquet(path)
      if (sg.nonEmpty) {
        if (schemaCache.size > 64) schemaCache.clear()
        schemaCache.put(path, (sg, df.schema))
      }
      df
    }
  }
}
