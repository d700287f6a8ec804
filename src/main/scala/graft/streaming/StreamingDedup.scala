package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, lit, xxhash64}
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
  * rows. Unbounded retention is the streaming scale-killer, so three
  * independent bounds exist:
  *
  *  - `horizonMinutes > 0` (requires `tsCol` + a watermark delay):
  *    buckets cold for longer than the horizon are EVICTED via
  *    event-time timeout. Recall trade: a new doc no longer matches
  *    duplicates whose bucket went cold before it arrived; within the
  *    horizon, candidates are identical to the unbounded path. This is
  *    the standard production compromise for endless ingest.
  *  - `exciseExact = true`: the streaming twin of DedupPipeline's
  *    exact-dup representative routing. Each bucket remembers one
  *    representative per DISTINCT text (64-bit content hash): an
  *    arrival whose text was already seen emits ONE (representative,
  *    doc) edge and is not added to the bucket — so a k-copy
  *    boilerplate family costs k-1 edges and ONE state row instead of
  *    k² pairs and k rows, and components come out identical through
  *    the representative (transitivity), exactly as in the batch
  *    pipeline. Note the emitted pair set is no longer a superset of
  *    the uncapped batch band join's (copy↔copy pairs route through
  *    the representative), which is why it is opt-in.
  *  - `maxBucket > 0`: a bucket that reaches the cap SATURATES — later
  *    arrivals in it emit no pairs and are not remembered (the
  *    streaming analog of simhashPairs' cut-not-split cap). With
  *    excision on, the cap counts distinct-text representatives.
  *
  * All default OFF — the zero-arg form is bit-compatible with batch.
  */
object StreamingDedup {

  final case class BandRow(doc_id: Long, ts: java.sql.Timestamp,
    h: Long, band: Int, bucket: Long)
  final case class CandidatePair(doc_a: Long, doc_b: Long)

  /** docs: a STREAMING DataFrame with (doc_id, text) and, when
    * eviction is on, the `tsCol` event-time column. Returns the stream
    * of candidate near-dup pairs (doc_a < doc_b).
    */
  def candidatePairs(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", tsCol: String = "",
      horizonMinutes: Long = 0, watermarkDelay: String = "10 minutes",
      maxBucket: Int = 0, exciseExact: Boolean = false): Dataset[CandidatePair] = {
    require(horizonMinutes == 0 || tsCol.nonEmpty,
      "state eviction (horizonMinutes > 0) needs an event-time column (tsCol)")
    import docs.sparkSession.implicits._
    val src =
      if (horizonMinutes > 0) docs.withWatermark(tsCol, watermarkDelay)
      else docs
    val ts = if (tsCol.nonEmpty) col(tsCol) else lit(null).cast(TimestampType)
    // content hash only when excising — no per-doc text hash CPU on
    // the default path (state packs (id, 0) pairs either way; like any
    // state-layout change, upgrading across versions means discarding
    // streaming checkpoints, per the bandedIds versioning note)
    val h = if (exciseExact) xxhash64(col(textCol)) else lit(0L)
    val banded = Dedup.bandedIds(
        Dedup.minhashSignature(
          src.withColumn("__ts", ts).withColumn("__h", h), textCol, idCol,
          carry = Seq("__ts", "__h")).drop("shingles"),
        carry = Seq("__ts", "__h"))
      .select(col("doc_id"), col("__ts").as("ts"), col("__h").as("h"),
        col("band"), col("bucket"))
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
            // state is (id, contentHash) pairs packed flat in a
            // primitive long array (hash 0 when excision is off);
            // Set/Map-backed lookups, insertion order preserved so
            // pair output stays deterministic
            val prev: Array[Long] = state.getOption.getOrElse(Array.empty[Long])
            val members = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
            val seen = scala.collection.mutable.HashSet.empty[Long]
            val hashRep = scala.collection.mutable.HashMap.empty[Long, Long]
            var p = 0
            while (p < prev.length) {
              val id = prev(p); val hh = prev(p + 1)
              members += ((id, hh)); seen += id
              if (exciseExact && hh != 0L && !hashRep.contains(hh)) hashRep(hh) = id
              p += 2
            }
            val out = scala.collection.mutable.ListBuffer.empty[CandidatePair]
            var maxTs = Long.MinValue
            // deterministic order within the batch
            rows.toArray.sortBy(_.doc_id).foreach { r =>
              if (r.ts != null) maxTs = math.max(maxTs, r.ts.getTime)
              if (!seen.contains(r.doc_id)) {
                if (exciseExact && r.h != 0L && hashRep.contains(r.h)) {
                  // exact duplicate of a remembered text: one edge to
                  // the representative, nothing remembered
                  val rep = hashRep(r.h)
                  out += CandidatePair(math.min(rep, r.doc_id), math.max(rep, r.doc_id))
                } else if (maxBucket <= 0 || members.size < maxBucket) {
                  members.foreach { case (mid, _) =>
                    out += CandidatePair(math.min(mid, r.doc_id), math.max(mid, r.doc_id))
                  }
                  members += ((r.doc_id, r.h)); seen += r.doc_id
                  if (exciseExact && r.h != 0L) hashRep(r.h) = r.doc_id
                }
              }
            }
            val packed = new Array[Long](members.size * 2)
            var q = 0
            members.foreach { case (id, hh) =>
              packed(q) = id; packed(q + 1) = hh; q += 2
            }
            state.update(packed)
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
