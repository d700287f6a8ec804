package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Expression↔Column conversion private[sql]; custom
  * Catalyst expressions still need it. This shim is the single place
  * graft crosses that boundary (same technique public extension
  * libraries use to register native expressions).
  */
object GraftShim {
  /** Spark 4 made AbstractDataType private[sql]; an
    * ImplicitCastInputTypes implementor outside the sql package still
    * needs the type to declare `inputTypes`. Public alias from inside
    * the boundary.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Test support: SparkContext.setCheckpointDir has no public
    * inverse; specs that exercise the reliable-checkpoint mode of the
    * iterative operators need to restore the default afterwards.
    */
  def clearCheckpointDir(sc: org.apache.spark.SparkContext): Unit =
    sc.checkpointDir = None

  /** Accurate in-memory size of a PERSISTED frame once materialized
    * (the InMemoryRelation's measured batch stats), None when the
    * plan is not in the cache manager — the session cache ledger's
    * byte source (estimates only for checkpoint-barrier frames,
    * which carry their origin plan's stats instead).
    */
  def cachedPlanBytes(df: org.apache.spark.sql.Dataset[_]): Option[BigInt] = {
    val d = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    d.sparkSession.sharedState.cacheManager.lookupCachedData(d)
      .map(_.cachedRepresentation.stats.sizeInBytes)
  }

  /** Register a function into a live session's registry (the
    * SparkSessionExtensions path only applies at session build time).
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(ident, info, builder)
}
