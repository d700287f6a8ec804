package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Constant-memory exact quantiles over integer-valued columns.
  *
  * Spark's exact `percentile` aggregate merges a value→count map into
  * ONE aggregation buffer — for a corpus-sized frame with mostly
  * distinct values that buffer is corpus-sized on a single task (the
  * round-5 verdict's only structural 100×-scale risk, flagged in
  * d_curriculum / d_dataset_card). The scale-safe form is the same
  * value→count map kept RELATIONAL: `groupBy(value).count()` is a
  * map-side-combinable shuffle whose result is bounded by the number
  * of DISTINCT values, and the quantile is then a cumulative-sum
  * lookup over that histogram frame. The only unpartitioned window
  * here runs over the histogram, never the corpus — callers must pass
  * a column whose distinct-value count is bounded by construction
  * (word counts bounded by document length; grid-coarsened scores
  * bounded by the grid), which is what keeps the single-partition
  * cum-sum stage constant-sized as the corpus grows.
  *
  * Both entry points are formulated so a DuckDB oracle can replay
  * them operation-for-operation (same IEEE ops in the same order for
  * [[interpolated]]; pure integer arithmetic for [[typeOneBoundaries]])
  * — the repo's oracle-determinism rule.
  */
object Quantiles {

  /** (v, cnt, cum) histogram of `valueCol` with an inclusive running
    * count in value order.
    */
  def histogram(df: DataFrame, valueCol: String): DataFrame = {
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(w))
  }

  /** Exact `percentile` semantics from the value histogram: position
    * p·(n−1), linear interpolation between the bracketing order
    * statistics. Returns one row with `names`-named DOUBLE columns
    * (un-rounded — callers round to their output precision). The
    * interpolation replays Spark Percentile.getPercentile's exact op
    * order — (hi−pos)·v_lo + (pos−lo)·v_hi, v_lo alone when pos is
    * integral — which differs from v_lo + frac·(v_hi−v_lo) in the
    * last ulp; mirror the same CASE + two-sided form in the oracle.
    */
  def interpolated(df: DataFrame, valueCol: String, ps: Seq[Double],
      names: Seq[String]): DataFrame = {
    require(ps.nonEmpty && ps.length == names.length)
    val n = df.groupBy().agg(count(lit(1)).as("n"))
    val j = histogram(df, valueCol).crossJoin(broadcast(n))
    // one conditional-aggregation pass over the histogram finds both
    // bracketing order statistics for every p
    val aggs = ps.indices.flatMap { i =>
      val pos = lit(ps(i)) * (col("n") - 1).cast("double")
      val lo = floor(pos).cast("long")
      val hi = lo + 1
      Seq(
        max(when(col("cum") - col("cnt") <= lo && lo < col("cum"), col("v")))
          .as(s"__vlo_$i"),
        max(when(col("cum") - col("cnt") <= hi && hi < col("cum"), col("v")))
          .as(s"__vhi_$i"),
        max(pos).as(s"__pos_$i"), max(lo).as(s"__lo_$i"))
    }
    val row = j.agg(aggs.head, aggs.tail: _*)
    row.select(ps.indices.map { i =>
      val pos = col(s"__pos_$i")
      val lo = col(s"__lo_$i").cast("double")
      val vlo = col(s"__vlo_$i").cast("double")
      val vhi = col(s"__vhi_$i").cast("double")
      when(pos === lo, vlo)
        .otherwise((lo + 1 - pos) * vlo + (pos - lo) * vhi)
        .as(names(i))
    }: _*)
  }

  /** Type-1 (lower) quantile boundaries, all-integer: for each
    * fraction num/den, the smallest value v with cum(v) ≥
    * ⌈num·n/den⌉. Zero floating point anywhere, so the DuckDB twin is
    * `MIN(CASE WHEN cum >= (num*n + den - 1) // den THEN v END)` —
    * bit-exact by construction. Returns one row of LONG columns.
    */
  def typeOneBoundaries(df: DataFrame, valueCol: String,
      fracs: Seq[(Int, Int)], names: Seq[String]): DataFrame = {
    require(fracs.nonEmpty && fracs.length == names.length)
    val n = df.groupBy().agg(count(lit(1)).as("n"))
    val j = histogram(df, valueCol).crossJoin(broadcast(n))
    val aggs = fracs.zip(names).map { case ((num, den), nm) =>
      val target = expr(s"($num * n + ${den - 1}) div $den")
      min(when(col("cum") >= target, col("v"))).as(nm)
    }
    j.agg(aggs.head, aggs.tail: _*)
  }
}
