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
  * identical. Choose w ≈ median interval length.
  */
object RangeJoin {

  /** Join left rows (point tsCol) to intervals [startCol, endCol).
    * Pass extra equi-keys through `alsoOn` when present — they join
    * alongside the bucket.
    */
  def pointInInterval(left: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long, alsoOn: Seq[String] = Nil): DataFrame = {
    val w = lit(bucketSeconds)
    val l = left.withColumn("__bucket", floor(unix_timestamp(col(tsCol)) / w))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / w),
        // end is exclusive: last overlapped bucket is floor((end-1s)/w)
        floor((unix_timestamp(col(endCol)) - 1) / w))))
    l.join(iv, Seq("__bucket") ++ alsoOn)
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }
}
