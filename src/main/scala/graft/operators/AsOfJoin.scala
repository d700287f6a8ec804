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
    * The whole right payload is carried as ONE struct, so output
    * columns always come from the same right row — individually-null
    * payload cells can never be filled from older rows. Ties on
    * (key, ts) among right rows are broken deterministically:
    * `tieBreakCol` (e.g. a right-side id — the LAST row in its
    * ascending order wins) when given, else a stable hash of the
    * payload, so results are identical across runs and partitionings.
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      payloadCols: Seq[String], tieRightFirst: Boolean = true,
      tieBreakCol: Option[String] = None,
      toleranceSeconds: Option[Long] = None): DataFrame = {
    val lCols = left.columns
    // side 0 = right (sorts before left at equal ts so a same-instant
    // right row is visible to the left row when tieRightFirst)
    val sideOfRight = if (tieRightFirst) 0 else 2
    val tie = tieBreakCol.map(col)
      .getOrElse(xxhash64(payloadCols.map(col): _*))
    val taggedRight = right.select(
      col(keyCol), col(tsCol).as("__ts"), lit(sideOfRight).as("__side"),
      tie.as("__tie"),
      // carry the right row's own ts so tolerance can bound staleness
      struct((payloadCols.map(col) :+ col(tsCol).as("__rts")): _*).as("__p"))
    val taggedLeft = left
      .withColumn("__ts", col(tsCol))
      .withColumn("__side", lit(1))
    val unioned = taggedLeft
      .unionByName(taggedRight, allowMissingColumns = true)
    // left rows have __tie null; it only orders right rows among
    // themselves (sides differ otherwise), so null placement is moot
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    // tolerance (pandas merge_asof / QuestDB semantics): a match older
    // than the bound is no match at all — null the whole struct so
    // every payload column drops together
    val bounded = toleranceSeconds.fold(carried) { tol =>
      carried.withColumn("__p",
        when(unix_timestamp(col(tsCol).cast("timestamp"))
          - unix_timestamp(col("__p").getField("__rts").cast("timestamp")) <= tol,
          col("__p")))
    }
    bounded.filter(col("__side") === 1)
      .select(lCols.map(col) ++
        payloadCols.map(c => col("__p").getField(c).as(s"right_$c")): _*)
  }
}
