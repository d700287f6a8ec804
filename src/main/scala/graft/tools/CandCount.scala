package graft.tools

import org.apache.spark.sql.functions._

/** One-off: candidate-pair volume of the minhash LSH banding at a
  * blow-up dir — evidence for the quadratic replica-collision growth
  * diagnosis (SURVEY §13/§15).
  */
object CandCount {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.local(cpus, "graft-cand-count")
    args.foreach { dir =>
      val docs = graft.Tables(spark, dir).documents
      val signed = graft.operators.Dedup.minhashSignature(docs, "text", "doc_id")
        .select("doc_id", "buckets")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = signed.count()
      val banded = graft.operators.Dedup.bandedIds(signed)
        .select("bucket", "doc_id")
      val cands = graft.operators.Dedup.sortedRunCandidatePairs(
        banded, "bucket", "doc_id", 0,
        n * graft.operators.Dedup.Bands).count()
      println(s"[cand] $dir docs=$n candidates=$cands")
      Console.flush()
      signed.unpersist()
    }
    spark.stop()
  }
}
