package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Incremental near-duplicate detection for CONTINUOUS ingestion —
  * the streaming face of Dedup.minhashLsh: documents arrive in
  * micro-batches, and every new document is checked against the
  * ENTIRE history seen so far, not just its own batch.
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
  * Scale/state: state size is O(docs × bands) ids, partitioned by
  * bucket — the shuffle per micro-batch moves only the batch's band
  * rows. For an unbounded corpus wire `ttl` to evict cold buckets
  * (trades recall against old duplicates for bounded state), the
  * standard production compromise.
  */
object StreamingDedup {

  final case class BandRow(doc_id: Long, band: Int, bucket: Long)
  final case class CandidatePair(doc_a: Long, doc_b: Long)

  /** docs: a STREAMING DataFrame with (doc_id, text). Returns the
    * stream of candidate near-dup pairs (doc_a < doc_b).
    */
  def candidatePairs(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    val banded = Dedup.bandedIds(
        Dedup.minhashSignature(docs, textCol, idCol).drop("shingles"))
      .as[BandRow]
    banded
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState[Array[Long], CandidatePair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, rows: Iterator[BandRow], state: GroupState[Array[Long]]) =>
          var seen = state.getOption.getOrElse(Array.empty[Long])
          val out = scala.collection.mutable.ListBuffer.empty[CandidatePair]
          // deterministic order within the batch
          rows.toSeq.sortBy(_.doc_id).foreach { r =>
            if (!seen.contains(r.doc_id)) {
              seen.foreach { s =>
                out += CandidatePair(math.min(s, r.doc_id), math.max(s, r.doc_id))
              }
              seen = seen :+ r.doc_id
            }
          }
          state.update(seen)
          out.iterator
      }
  }
}
