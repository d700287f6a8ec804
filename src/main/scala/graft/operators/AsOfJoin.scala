package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, the single latest right
  * row with right.ts <= left.ts on the same key.
  *
  * Spark-first formulation (SURVEY.md §2 custom-operator ladder step
  * (a) — compose existing ops): tag and union both sides, then one
  * window pass per key ordered by (ts, side) carries the most recent
  * right payload forward onto each left row. ONE shuffle on the key,
  * no range-join explosion, no per-key driver loop — the same
  * technique Flink/QuestDB docs describe for distributed as-of.
  *
  * vs. the naive left.join(right, ts <= ts).groupBy(max): that is a
  * partial cross product per key — quadratic in events per key.
  */
object AsOfJoin {

  /** left(keyCol, tsCol, ...) ⟕asof right(keyCol, tsCol, payload...).
    * Right payload columns arrive null when no right row precedes.
    *
    * Constraint: payload columns must be non-null in right rows — the
    * carry uses last(ignoreNulls) per column, so a legitimately-null
    * payload cell would be filled from an OLDER right row (columns
    * would mix across rows). Wrap nullable payloads in a struct
    * column first if needed.
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      payloadCols: Seq[String], tieRightFirst: Boolean = true): DataFrame = {
    val lCols = left.columns
    // side 0 = right (sorts before left at equal ts so a same-instant
    // right row is visible to the left row when tieRightFirst)
    val sideOfRight = if (tieRightFirst) 0 else 2
    val taggedRight = right.select(
      Seq(col(keyCol), col(tsCol).as("__ts"), lit(sideOfRight).as("__side")) ++
        payloadCols.map(c => col(c).as(s"__p_$c")): _*)
    val taggedLeft = left
      .withColumn("__ts", col(tsCol))
      .withColumn("__side", lit(1))
    val unioned = taggedLeft
      .unionByName(taggedRight, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__p_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(lCols.map(col) ++
        payloadCols.map(c => col(s"__p_$c").as(s"right_$c")): _*)
  }
}
