package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named capability from SURVEY.md §2: a Spark-first builder plus
  * (when SQL-expressible) a DuckDB oracle twin with IDENTICAL output
  * column names/aliases and a total ORDER BY, so the driver's
  * sort-columns-then-hash compare is deterministic.
  *
  * Determinism rules (see SURVEY.md §4): decimal-cast sums, dates
  * rendered as strings, doubles only passed through or produced by
  * identical exact-decimal pipelines.
  */
final case class GraftQuery(
    name: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame)
