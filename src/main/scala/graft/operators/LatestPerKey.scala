package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** "Latest record per key" — the reference's single most common
  * operator (ROW_NUMBER() OVER (PARTITION BY client ORDER BY date
  * DESC, id DESC) = 1 appears 68× across the line-list queries, e.g.
  * Tx_Curr_LineList.sql:64).
  *
  * Scale: one shuffle on the partition key, then a sort within
  * partitions — Spark's window exec with a rank-limit pushes the
  * running row_number filter into the sort (WindowGroupLimit), so the
  * full per-key history is never materialized. This beats the
  * join-against-max alternative (2 shuffles) at any scale.
  */
object LatestPerKey {
  def apply(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(keys: _*).orderBy(order: _*)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** Aggregation formulation: max_by(payload, ordering-struct) — the
    * same semantics when "latest" means max of (ts, id, …) ascending
    * tiebreaks. Unlike the window form this is a HashAggregate with
    * map-side partial aggregation: each input partition reduces to
    * ≤ |keys| rows BEFORE the shuffle, so on a 1000-executor cluster
    * the shuffle moves |keys| rows, not |events|. Prefer this form
    * when the per-key history is deep; the window form when you also
    * need rank > 1 rows.
    */
  def viaAggregation(df: DataFrame, keys: Seq[String],
      maxOf: Seq[String]): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    val ordering = struct(maxOf.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, ordering).as("__row"))
      .select(col("__row.*"))
  }
}
