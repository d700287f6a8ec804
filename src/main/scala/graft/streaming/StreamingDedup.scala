package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.TimestampType

import graft.operators.Dedup

/** Incremental near-duplicate detection for CONTINUOUS ingestion —
  * the streaming face of Dedup.minhashLsh: documents arrive in
  * micro-batches, and every new document is checked against the
  * history seen so far, not just its own batch.
  *
  * Mechanics: the same minhash signature + band hashing as the batch
  * path (Dedup.bandedIds — bit-identical buckets, so stream and batch
  * agree on candidates), then state keyed by (band, bucket) holds the
  * doc ids previously seen in that bucket. A new doc emits one
  * candidate pair per previously-seen bucket member. Candidates are
  * UNVERIFIED (like the batch band join) and may repeat across bands
  * — downstream dedupes and verifies exactly as the batch pipeline
  * does (DedupPipeline unions edges through a distinct).
  *
  * Scale/state: raw state size is O(docs × bands) ids, partitioned by
  * bucket — the shuffle per micro-batch moves only the batch's band
  * rows. Unbounded retention is the streaming scale-killer, so two
  * independent bounds exist:
  *
  *  - `horizonMinutes > 0` (requires `tsCol` + a watermark delay):
  *    buckets cold for longer than the horizon are EVICTED via
  *    event-time timeout. Recall trade: a new doc no longer matches
  *    duplicates whose bucket went cold before it arrived; within the
  *    horizon, candidates are identical to the unbounded path. This is
  *    the standard production compromise for endless ingest.
  *  - `maxBucket > 0`: a bucket that reaches the cap SATURATES — later
  *    arrivals in it emit no pairs and are not remembered (the
  *    streaming analog of simhashPairs' cut-not-split cap: a bucket
  *    that hot is a boilerplate family that exact-dedup upstream
  *    should collapse). Bounds both per-bucket state and the O(k²)
  *    pair blow-up of a k-copy template family.
  *
  * Both default OFF — the zero-arg form is bit-compatible with batch.
  */
object StreamingDedup {

  final case class BandRow(doc_id: Long, ts: java.sql.Timestamp,
    band: Int, bucket: Long)
  final case class CandidatePair(doc_a: Long, doc_b: Long)

  /** docs: a STREAMING DataFrame with (doc_id, text) and, when
    * eviction is on, the `tsCol` event-time column. Returns the stream
    * of candidate near-dup pairs (doc_a < doc_b).
    */
  def candidatePairs(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", tsCol: String = "",
      horizonMinutes: Long = 0, watermarkDelay: String = "10 minutes",
      maxBucket: Int = 0): Dataset[CandidatePair] = {
    require(horizonMinutes == 0 || tsCol.nonEmpty,
      "state eviction (horizonMinutes > 0) needs an event-time column (tsCol)")
    import docs.sparkSession.implicits._
    val src =
      if (horizonMinutes > 0) docs.withWatermark(tsCol, watermarkDelay)
      else docs
    val ts = if (tsCol.nonEmpty) col(tsCol) else lit(null).cast(TimestampType)
    val banded = Dedup.bandedIds(
        Dedup.minhashSignature(src.withColumn("__ts", ts), textCol, idCol,
          carry = Seq("__ts")).drop("shingles"),
        carry = Seq("__ts"))
      .select(col("doc_id"), col("__ts").as("ts"), col("band"), col("bucket"))
      .as[BandRow]
    val conf =
      if (horizonMinutes > 0) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val horizonMs = horizonMinutes * 60000L
    banded
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState[Array[Long], CandidatePair](
        OutputMode.Append(), conf) {
        (_, rows: Iterator[BandRow], state: GroupState[Array[Long]]) =>
          if (state.hasTimedOut) { // bucket cold beyond the horizon
            state.remove()
            Iterator.empty
          } else {
            // Set-backed membership: contains() is O(1), insertion
            // order preserved so pair output stays deterministic
            val prev: Array[Long] = state.getOption.getOrElse(Array.empty[Long])
            val seen = scala.collection.mutable.LinkedHashSet.empty[Long]
            seen ++= prev
            val out = scala.collection.mutable.ListBuffer.empty[CandidatePair]
            var maxTs = Long.MinValue
            // deterministic order within the batch
            rows.toArray.sortBy(_.doc_id).foreach { r =>
              if (r.ts != null) maxTs = math.max(maxTs, r.ts.getTime)
              if (!seen.contains(r.doc_id)
                  && (maxBucket <= 0 || seen.size < maxBucket)) {
                seen.foreach { s =>
                  out += CandidatePair(math.min(s, r.doc_id), math.max(s, r.doc_id))
                }
                seen += r.doc_id
              }
            }
            state.update(seen.toArray)
            if (horizonMs > 0) {
              // last activity (or the watermark if this batch carried
              // no usable event time) + horizon; must exceed watermark
              val base = math.max(maxTs, state.getCurrentWatermarkMs() + 1)
              state.setTimeoutTimestamp(base + horizonMs)
            }
            out.iterator
          }
      }
  }
}
