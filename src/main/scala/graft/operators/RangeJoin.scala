package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized range join: `left.ts ∈ [iv.start, iv.end)`.
  *
  * Spark plans a raw range predicate as BroadcastNestedLoopJoin —
  * O(|left|·|iv|). Bucketizing the time axis turns it into an
  * equi-join: each left row lands in exactly one bucket of width w;
  * each interval is exploded to the buckets it overlaps
  * (≈ len/w + 1 rows). Shuffle is O(|left| + |iv|·spans), and the
  * exact predicate re-checked after the equi-join keeps semantics
  * identical.
  *
  * Width selection: [[autoBucketSeconds]] derives w from the median
  * interval length (approx_percentile over the interval table — one
  * cheap stats pass), so the explode factor stays ≈ 2 regardless of
  * data; a manual override remains for callers that know better.
  *
  * Skew: intervals stacked on the same time range all explode to the
  * same bucket ids. AQE's skew-join split handles moderate hot
  * buckets; for pathological stacking pass `nSalts > 1` — interval
  * rows get a uniform salt, point rows replicate across all salts, so
  * a hot bucket fans out into nSalts shuffle keys (cost: |left|×nSalts
  * shuffle rows; results unchanged — the exact re-filter is the
  * correctness boundary either way).
  */
object RangeJoin {

  /** Median interval length in seconds (≥ 1), the bucket width that
    * bounds the per-interval explode factor at ~2 buckets. One
    * aggregation job over `intervals` — O(|iv|) scan, constant-memory
    * sketch; at scale run it once and reuse the width.
    */
  def autoBucketSeconds(intervals: DataFrame,
      startCol: String, endCol: String): Long = {
    // cast("timestamp") first: sources written without timezone info
    // (e.g. plain-micros parquet) read back as TIMESTAMP_NTZ, which
    // unix_micros rejects
    val med = intervals
      .select((unix_micros(col(endCol).cast("timestamp"))
        - unix_micros(col(startCol).cast("timestamp"))).as("len"))
      .agg(expr("approx_percentile(len, 0.5)"))
      .head()
    val micros = if (med.isNullAt(0)) 1000000L else med.getLong(0)
    math.max(1L, micros / 1000000L)
  }

  /** Join left rows (point tsCol) to intervals [startCol, endCol).
    * Pass extra equi-keys through `alsoOn` when present — they join
    * alongside the bucket. `bucketSeconds <= 0` derives the width from
    * interval-length stats; `nSalts > 1` spreads hot buckets.
    */
  def pointInInterval(left: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long = 0L, alsoOn: Seq[String] = Nil,
      nSalts: Int = 1): DataFrame = {
    val width =
      if (bucketSeconds > 0) bucketSeconds
      else autoBucketSeconds(intervals, startCol, endCol)
    val w = lit(width)
    // Bucket arithmetic uses unix_timestamp (whole seconds) on BOTH
    // sides, and the interval's last bucket is floor(end/w) — NOT
    // floor((end-1)/w): with sub-second timestamps a point in the
    // final second of an interval would otherwise land one bucket
    // past the computed range and be silently dropped. The occasional
    // extra bucket (end exactly on a boundary, exclusive) only adds
    // candidates that the exact re-filter removes.
    var l = left.withColumn("__bucket",
      floor(unix_timestamp(col(tsCol).cast("timestamp")) / w))
    var iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(unix_timestamp(col(startCol).cast("timestamp")) / w),
        floor(unix_timestamp(col(endCol).cast("timestamp")) / w))))
    val joinKeys =
      if (nSalts <= 1) Seq("__bucket") ++ alsoOn
      else {
        // deterministic-per-run uniform salt on the interval side;
        // points replicate across every salt so all pairs still meet
        iv = iv.withColumn("__salt", (rand(42) * nSalts).cast("int"))
        l = l.withColumn("__salt",
          explode(sequence(lit(0), lit(nSalts - 1))))
        Seq("__bucket", "__salt") ++ alsoOn
      }
    l.join(iv, joinKeys)
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket", "__salt")
  }
}
