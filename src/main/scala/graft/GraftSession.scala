package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the tuning every graft job wants.
  *
  * Scale notes (designed for a ~1000-executor cluster, tested on
  * local[N]): AQE handles runtime coalescing + skew-join splitting;
  * a modest autoBroadcastJoinThreshold keeps dimension tables
  * (region/nation/supplier/part) on the broadcast path so fact-side
  * scans never shuffle for star joins.
  */
object GraftSession {

  /** Apply graft tuning to an existing builder (used by Verify/Bench
    * which own master/partitions settings).
    */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.sql.parquet.aggregatePushdown", "true")
    .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")

  /** Local session for tests / ad-hoc runs. */
  def local(cores: Int = 4, app: String = "graft"): SparkSession = {
    val s = tune(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
