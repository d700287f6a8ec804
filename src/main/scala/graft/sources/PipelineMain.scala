package graft.sources

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.{DedupPipeline, Sampling, TextAnalysis}

/** End-to-end training-data preparation pipeline over the documents
  * table — the composed "prepare a corpus" flow a 100 TB ingest runs:
  *
  *   1. annotate: language ID, quality metrics, token counts
  *   2. filter: quality/length gates (on RAW text — the same order as
  *      StreamingIntake, so stream and batch admit identical docs)
  *   3. scrub: PII redaction on the admitted text
  *   4. dedup: exact + minhash near-dup -> one doc per component
  *   5. fingerprint: winnowing summary for downstream contamination checks
  *   6. sample: consistent per-language cap
  *   7. split: deterministic train/val/test holdout
  *   8. write parquet partitioned by split (small demo output)
  *
  *   runMain graft.sources.PipelineMain <sfDir> <outDir>
  */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("/tmp/graft_pipeline")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt, "graft-pipeline")
    val docs = Tables(spark, sfDir).documents

    val annotated = docs.select(
      (col("doc_id") +: col("text") +: col("lang") +: col("source") +:
        (TextAnalysis.quality(col("text")) :+
          TextAnalysis.langId(col("text")).as("lang_pred"))): _*)
    val filtered = annotated
      .filter(col("quality_score") >= 0.5 && col("n_tokens") >= 10)
      .withColumn("text", TextAnalysis.piiRedact(col("text")))
    val deduped = DedupPipeline.dedupedCorpus(
      filtered.select("doc_id", "text", "lang", "source"), threshold = 0.8)
      .join(filtered.drop("text", "lang", "source"), "doc_id")
    val fingerprinted = deduped.select(
      (deduped.columns.filterNot(_ == "text").map(col).toSeq ++
        TextAnalysis.fingerprint(col("text"))): _*)
    val sampled = Sampling.consistentSample(fingerprinted, Seq("lang"), "doc_id", k = 1000)
    val split = Sampling.holdoutSplit(sampled, "doc_id")

    split.write.mode("overwrite").partitionBy("split").parquet(outDir)
    val total = docs.count(); val out = spark.read.parquet(outDir)
    val kept = out.count()
    val byLang = out.groupBy("lang").count()
      .orderBy("lang").collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(",")
    val bySplit = out.groupBy("split").count()
      .orderBy("split").collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(",")
    println(s"[pipeline] in=$total kept=$kept by_lang=$byLang by_split=$bySplit out=$outDir")
    spark.stop()
  }
}
