package graft.sources

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.{DedupPipeline, Sampling, TextAnalysis}

/** End-to-end training-data preparation pipeline over the documents
  * table — the composed "prepare a corpus" flow a 100 TB ingest runs:
  *
  *   1. annotate: language ID, quality metrics, token counts
  *   2. filter: quality/length gates
  *   3. dedup: exact + minhash near-dup -> one doc per component
  *   4. fingerprint: winnowing summary for downstream contamination checks
  *   5. sample: consistent per-language cap
  *   6. write date-partition-free parquet (small demo output)
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
    val deduped = DedupPipeline.dedupedCorpus(
      filtered.select("doc_id", "text", "lang", "source"), threshold = 0.8)
      .join(filtered.drop("text", "lang", "source"), "doc_id")
    val fingerprinted = deduped.select(
      (deduped.columns.filterNot(_ == "text").map(col).toSeq ++
        TextAnalysis.fingerprint(col("text"))): _*)
    val sampled = Sampling.consistentSample(fingerprinted, Seq("lang"), "doc_id", k = 1000)

    sampled.write.mode("overwrite").parquet(outDir)
    val total = docs.count(); val kept = spark.read.parquet(outDir).count()
    val byLang = spark.read.parquet(outDir).groupBy("lang").count()
      .orderBy("lang").collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(",")
    println(s"[pipeline] in=$total kept=$kept by_lang=$byLang out=$outDir")
    spark.stop()
  }
}
