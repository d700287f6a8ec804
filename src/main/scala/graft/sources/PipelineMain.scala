package graft.sources

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.{DedupPipeline, Sampling, Similarity, TextAnalysis}

/** End-to-end training-data preparation pipeline over the documents
  * table — the composed "prepare a corpus" flow a 100 TB ingest runs:
  *
  *   1. annotate: language ID, quality metrics, token counts
  *   2. filter: quality/length gates (on RAW text — the same order as
  *      StreamingIntake, so stream and batch admit identical docs)
  *   3. scrub: PII redaction on the admitted text
  *   4. dedup: exact + minhash near-dup -> one doc per component
  *      (components computed ONCE, reported as the duplicate-family
  *      histogram AND used to pick representatives)
  *   5. fingerprint: winnowing summary for downstream contamination checks
  *   6. sample: consistent per-language cap
  *   7. split: deterministic train/val/test holdout
  *   8. write parquet partitioned by split (small demo output)
  *   9. report: dup-family histogram + embedding-cluster topic labels
  *      (the d_dup_families / d_cluster_topics ops, chained on the
  *      pipeline's own frames)
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
    // one component computation feeds BOTH the kept-representative set
    // and the dup-family report (dedupedCorpus would re-derive the
    // same labels a second time)
    val components = DedupPipeline.componentsOf(
        filtered.select("doc_id", "text"), threshold = 0.8)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deduped = filtered
      .join(components.filter(col("doc_id") === col("component"))
        .select("doc_id"), "doc_id")
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

    // corpus report: duplicate-family histogram (size -> families) from
    // the SAME component labels that drove the dedup step
    val famHist = components
      .groupBy("component").agg(count(lit(1)).as("family_size"))
      .groupBy("family_size").agg(count(lit(1)).as("n_families"))
      .orderBy("family_size").collect()
      .map(r => s"${r.getLong(0)}x${r.getLong(1)}").mkString(",")
    components.unpersist()
    println(s"[pipeline] dup_families=$famHist")

    // embedding-cluster topic labels over the full annotated corpus
    // (cells x top terms — a constant-size frame, safe to collect)
    val topics = Similarity.clusterTopics(
        Tables(spark, sfDir).embeddings, docs, nClusters = 4, topTerms = 3)
      .orderBy("cell", "rank").collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (cell, rows) =>
        s"c$cell(${rows.head.getLong(1)}d):" +
          rows.sortBy(_.getInt(3)).map(_.getString(4)).mkString("|")
      }.mkString(" ")
    println(s"[pipeline] topics=$topics")

    // round-5 tail of the prep flow, chained on the pipeline's own
    // frames: tokenizer trained on the CLEANED corpus (the real
    // order — training on raw text bakes boilerplate into merges),
    // temperature weights for the mixture the sampler feeds, and
    // denoising targets built from the train split
    // the written table drops text (fingerprints replace it); re-key
    // the text-bearing FILTERED frame to the output — out's doc_ids
    // already passed dedup/sample/split, so joining through `deduped`
    // would only drag the components lineage (unpersisted above) back
    // into three more actions, re-running the CC subtree per action
    val cleaned = filtered.join(out.select("doc_id", "split"), "doc_id")
      .select("doc_id", "text", "split")
    val merges = graft.operators.Bpe.trainReport(cleaned)
      .orderBy("rank").collect()
      .map(r => s"${r.getString(1)}+${r.getString(2)}").mkString(",")
    val tokStats = graft.operators.Bpe.encodeStats(cleaned)
      .agg(sum("n_words").as("w"), sum("n_chars").as("c"),
        sum("n_tokens").as("t")).collect().head
    println(s"[pipeline] bpe_merges=$merges words=${tokStats.getLong(0)} " +
      s"chars=${tokStats.getLong(1)} bpe_tokens=${tokStats.getLong(2)}")
    val mix = Sampling.temperatureWeights(out, "lang")
      .orderBy("lang").collect()
      .map(r => s"${r.getString(0)}:${r.getLong(3)}ppm").mkString(",")
    println(s"[pipeline] temperature_mix=$mix")
    val corrupted = TextAnalysis.spanCorrupt(
        cleaned.filter(col("split") === "train").select("doc_id", "text"))
      .agg(count(lit(1)).as("docs"), sum("n_masked").as("spans"))
      .collect().head
    println(s"[pipeline] span_targets docs=${corrupted.getLong(0)} " +
      s"masked_spans=${corrupted.getLong(1)}")
    spark.stop()
  }
}
