package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of a persisted IVF index (SURVEY §2.4 /
  * §2.5): embeddings arrive as a stream and each micro-batch is
  * APPENDED to an already-built [[graft.sources.IvfIndex]] via
  * `foreachBatch` — the build-once / ingest-forever shape a real ANN
  * deployment runs (CCMatrix-style mining over a growing corpus:
  * centroids refit on an operator-chosen cadence, the ingest path
  * never does).
  *
  * Correctness under retries: `foreachBatch` is at-least-once — a
  * failed micro-batch is REPLAYED with the same batchId, and a blind
  * append would double every vector in it (duplicate code rows =
  * duplicate neighbor candidates in every later probe). The sink is
  * made idempotent the standard way: a commit LEDGER inside the index
  * dir (`stream_commits/<batchId>`, one empty marker file per
  * committed batch) — a replayed batchId is skipped whole. The
  * marker is written AFTER the append, so the remaining failure
  * window (crash between the data write and the marker) can land a
  * batch twice; that window is the documented at-least-once residue
  * every non-transactional sink carries, and the next [[graft
  * .sources.IvfIndex.compact]] pass rewrites cells and can be
  * followed by an offline dedup if a deployment needs exactly-once
  * code rows. Probe RESULTS are unaffected by the ledger mechanics:
  * the spec pins stream-ingested probes ≡ batch-append probes
  * bit-for-bit, and replayed batches append nothing.
  *
  * Small-file hygiene: every append lands new files in each touched
  * cell directory, so after N batches a cell holds N fragments — the
  * sink compacts every `compactEvery` committed batches (compaction
  * changes file layout only; bit-identical probes are already
  * spec-asserted on IvfIndex.compact). Compaction cost is a full
  * rewrite of the codes dataset — O(index size), NOT O(batch) — so
  * the cadence is the operator's trade between steady-state probe
  * read amplification and periodic rewrite IO (measured in
  * tools/IndexStreamScale: steady batches flat, the every-K batch
  * absorbs the rewrite; pick K by index-size/ingest-rate, or run
  * compaction out-of-band from the offline refit job instead).
  */
object StreamingIndexer {

  private def ledgerPath(dir: String, batchId: Long) =
    new org.apache.hadoop.fs.Path(s"$dir/stream_commits/$batchId")

  /** Idempotent per-batch append: returns true when the batch was
    * appended, false when its batchId was already committed (the
    * foreachBatch replay case). Factored out of the sink so the
    * replay contract is directly testable without a streaming query.
    */
  def appendBatch(batch: DataFrame, dir: String, batchId: Long): Boolean = {
    val spark = batch.sparkSession
    val marker = ledgerPath(dir, batchId)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) false
    else {
      graft.sources.IvfIndex.append(batch, dir)
      fs.mkdirs(marker.getParent)
      fs.create(marker, true).close()
      true
    }
  }

  /** Number of committed stream batches in the ledger. */
  def committedBatches(batch: DataFrame, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/stream_commits")
    val fs = p.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.listStatus(p).length.toLong else 0L
  }

  /** Attach the maintenance sink to a streaming (vec_id, embedding)
    * frame: idempotent append per micro-batch, compaction every
    * `compactEvery` committed batches. The index at `dir` must be
    * [[graft.sources.IvfIndex.build]]-built already (the deployment
    * premise: an index predates its ingest stream).
    */
  def indexSink(emb: DataFrame, dir: String,
      compactEvery: Int = 16): StreamingQuery =
    emb.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (appendBatch(batch, dir, batchId) &&
            compactEvery > 0 &&
            committedBatches(batch, dir) % compactEvery == 0) {
          val (before, after) =
            graft.sources.IvfIndex.compact(batch.sparkSession, dir)
          // compaction is maintenance, not correctness — surface it
          System.err.println(
            s"[indexer] compacted $dir after batch $batchId:" +
              s" $before -> $after files")
        }
        ()
      }
      .outputMode("update")
      .start()
}
