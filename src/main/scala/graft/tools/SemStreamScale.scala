package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Throughput drive of the streaming SEMANTIC decontamination gate at
  * blow-up scale (the QualityStreamScale pattern for the embedding
  * rung): fit the capped benchmark artifact OFFLINE from the streamed
  * corpus's smallest vec_ids (the deployment premise — a fixed
  * benchmark matrix ships to every worker as a plan constant), then
  * stream the blow-up embeddings through the full intake graph
  * (quality → semantic gate → PII scrub → watermarked dedup) in
  * micro-batches and report docs/s. The gate itself is a stateless
  * per-row native argmax, so the number to watch is flat per-batch
  * wall; the built-in sanity check is the PLANTED rejections — the
  * 256 benchmark members themselves stream through at cosine 1.0 and
  * must be gated (the stream gate uses a sentinel self-id, so the
  * batch kernel's same-table self-exclusion stays inert and the id
  * coincidence cannot grant a pass). Expect a further ~12% of clean
  * replicas gated at the default tau on ScaleCheck geometry: the max
  * of 256 near-random cosines in 64 dims concentrates around
  * sqrt(2·ln 256 / 64) ≈ 0.42, right at the 0.40 threshold — the
  * corpus's own cross-similarity statistics, not a gate bug
  * (numpy-verified against the exact grid).
  *
  * Usage: SemStreamScale <blowUpDir> [batches=16]
  */
object SemStreamScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.local(cpus, "graft-sem-stream-scale")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val emb = graft.Tables(spark, dir).embeddings
    val tFit0 = System.nanoTime()
    val art = graft.operators.Similarity.benchArtifact(emb, lit(true))
    println(f"[semstream] artifact: ${art.ids.length} bench vectors," +
      f" dim ${art.dim}, ${(System.nanoTime() - tFit0) / 1e9}%.1f s")

    // synthetic text rides along so the FULL intake graph runs (the
    // quality columns and scrub are part of the measured pipeline);
    // unique per doc so the dedup state sees one key per row
    val rows = emb.select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = rows.count()
    println(s"[semstream] streaming $nDocs docs in $nBatches micro-batches")

    val source = MemoryStream[(Long, Long, Array[Float])]
    val docs = source.toDF().toDF("doc_id", "ts_us", "embedding")
      .select(col("doc_id"), timestamp_micros(col("ts_us")).as("ts"),
        concat(lit("synthetic intake document body for the stream "),
          col("doc_id").cast("string")).as("text"),
        col("embedding"))
    val query = graft.streaming.StreamingIntake.intake(docs,
        minQuality = 0.0, semBench = Some(art))
      .writeStream.format("memory").queryName("semstream_out")
      .outputMode("append").start()

    val base = 1700000000000000L // fixed epoch micros — in-order stream
    val t0 = System.nanoTime()
    (0 until nBatches).foreach { b =>
      val tb = System.nanoTime()
      val batch = rows.filter(pmod(col("vec_id"), lit(nBatches)) === b)
        .collect().map(r =>
          (r.getLong(0), base + b * 60000000L, r.getSeq[Float](1).toArray))
      source.addData(batch.toSeq: _*)
      query.processAllAvailable()
      if ((b + 1) % 4 == 0)
        println(f"[semstream] batch ${b + 1}%3d: ${batch.length} docs," +
          f" ${(System.nanoTime() - tb) / 1e9}%.2f s")
      Console.flush()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val out = spark.table("semstream_out")
    val admitted = out.count()
    val rejected = nDocs - admitted
    query.stop()
    println(f"[semstream] $admitted admitted / $rejected gated" +
      f" of $nDocs in $secs%.1f s (${nDocs / secs}%.0f docs/s/$cpus-core)")
    // planted check: every artifact member must have been gated
    // (self-cosine 1.0 ≥ any sane tau)
    val benchIds = art.ids.toSet
    val leaked = out.filter(col("doc_id").isin(
      benchIds.toSeq.map(Long.box): _*)).count()
    require(leaked == 0L,
      s"$leaked benchmark members leaked through the semantic gate")
    println("[semstream] PASS: all benchmark members gated at cosine 1.0")
    spark.stop()
  }
}
