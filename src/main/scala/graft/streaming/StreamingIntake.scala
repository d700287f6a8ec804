package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.TextAnalysis

/** Streaming corpus intake (SURVEY.md §2.4) — the continuous-ingestion
  * twin of the batch prep pipeline: quality gate → PII scrub →
  * normalized exact dedup, as ONE streaming graph over documents
  * arriving with an event-time column.
  *
  * Everything before the dedup is stateless Column arithmetic (the
  * same TextAnalysis/TextFns expressions the batch ops use, so stream
  * and batch admit byte-identical documents); the only state is the
  * dedup key set, bounded by the watermark horizon — memory scales
  * with (arrival rate × allowed lateness), not stream length.
  */
object StreamingIntake {

  /** docs needs (doc_id, ts, text). Returns admitted documents with
    * the scrubbed text, dedup key and quality score.
    */
  def intake(docs: DataFrame, minQuality: Double = 0.5,
      delay: String = "10 minutes"): DataFrame =
    docs
      .select(Seq(col("doc_id"), col("ts"), col("text"))
        ++ TextAnalysis.quality(col("text")): _*)
      .filter(col("quality_score") >= minQuality)
      // scrub before hashing: two docs differing only in their PII
      // spans are the same document after redaction
      .withColumn("clean_text", TextAnalysis.piiRedact(col("text")))
      .withColumn("dedup_key", md5(TextFns.normalize(col("clean_text"))))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("dedup_key")
      .select("doc_id", "ts", "clean_text", "dedup_key", "quality_score")

  /** Batch twin for parity tests: identical admit logic, batch dedup
    * keeps the FIRST doc per key in (ts, doc_id) order (streaming
    * keeps the first seen — same doc when the stream is in order).
    */
  def intakeBatch(docs: DataFrame, minQuality: Double = 0.5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("dedup_key").orderBy(col("ts"), col("doc_id"))
    docs
      .select(Seq(col("doc_id"), col("ts"), col("text"))
        ++ TextAnalysis.quality(col("text")): _*)
      .filter(col("quality_score") >= minQuality)
      .withColumn("clean_text", TextAnalysis.piiRedact(col("text")))
      .withColumn("dedup_key", md5(TextFns.normalize(col("clean_text"))))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("doc_id", "ts", "clean_text", "dedup_key", "quality_score")
  }
}
