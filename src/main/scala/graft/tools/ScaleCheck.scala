package graft.tools

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Reproducible scale check: blow the documents/embeddings tables up
  * by an integer factor and time registered queries against the
  * result through the noop sink (same honest-materialization rule as
  * graft.Bench).
  *
  * The blow-up is NOT naive duplication: replica texts get a distinct
  * replica-tagged token appended, and replica embeddings are
  * deterministically perturbed per (replica, dimension). Exact
  * duplication would plant 64-copy exact-dup families and identical
  * vectors — the stacked worst case whose output cardinality, not the
  * plan, dominates (measured in round 2); distinct replicas measure
  * how the PLAN scales with data volume.
  *
  * Usage: ScaleCheck <sfDir> <factor> <workDir> <query> [query ...]
  */
object ScaleCheck {

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: ScaleCheck <sfDir> <factor> <workDir> <query> [query ...]")
    val Array(sfDir, factorS, workDir) = args.take(3)
    val factor = factorS.toInt
    val queries = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.local(cpus, "graft-scale-check")

    val t = graft.Tables(spark, sfDir)
    val reps = spark.range(0, factor).select(col("id").as("rep"))

    t.documents.crossJoin(reps)
      .select(
        (col("doc_id") + col("rep") * 10000000L).as("doc_id"),
        concat(col("text"), lit(" rep"), col("rep").cast("string"),
          lit("x"), col("doc_id").cast("string")).as("text"),
        col("lang"), col("source"),
        (length(col("text")) + length(col("rep").cast("string"))
          + length(col("doc_id").cast("string")) + 5).cast("long").as("n_chars"))
      .write.mode(SaveMode.Overwrite).parquet(s"$workDir/documents.parquet")

    t.embeddings.crossJoin(reps)
      .select(
        (col("vec_id") + col("rep") * 10000000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x + ((col("rep") * 31 + i) % 17).cast("float") * lit(0.013f))
          .as("embedding"),
        col("label"))
      .write.mode(SaveMode.Overwrite).parquet(s"$workDir/embeddings.parquet")

    val nDocs = spark.read.parquet(s"$workDir/documents.parquet").count()
    println(s"[scale] built ${factor}x blow-up: $nDocs docs at $workDir")

    queries.foreach { name =>
      val build = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val t0 = System.nanoTime()
      try {
        build(spark, workDir)
          .write.format("noop").mode(SaveMode.Overwrite).save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[scale] $name%-22s $sec%8.2f s")
      } catch {
        case e: Exception =>
          println(s"[scale] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
