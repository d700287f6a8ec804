package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Blow-up-scale check for the STREAMING near-dup path (VERDICT r3
  * #9): feeds a ScaleCheck-built corpus (≥100k docs) through
  * StreamingDedup.candidatePairs as event-time-ordered micro-batches
  * with horizon eviction ON, then asserts the two properties the
  * design documents:
  *
  *  1. RECALL WITHIN THE TRADE — every batch band-join candidate pair
  *     whose arrival gap is ≤ horizon must be emitted by the stream
  *     (eviction may only cost pairs whose bucket went cold first);
  *  2. STATE CEILING — the final state-store row count must sit well
  *     below the unbounded total (= every (band, bucket) ever
  *     touched), i.e. eviction actually bounds endless ingest.
  *
  * Replica id doubles as the event-time axis: replica r's documents
  * arrive at minute r, one micro-batch per replica.
  *
  * With `nCopies > 0`, every (nDocs/nCopies)-th document's text is
  * replayed one minute later under a fresh id with `exciseExact = on`
  * — the k-copy boilerplate bound: each copy must emit exactly its
  * one representative edge (asserted), and none of the copies may
  * grow the bucket state.
  *
  * With `maxBucket > 0` (4th arg) the run becomes the SATURATION-cap
  * scale test instead: excision off, a handful of copy-families far
  * larger than the cap are planted across the minutes, and the run
  * asserts the cap's three documented properties — family emissions
  * bounded by C(cap,2) (not C(k,2)), recovery of every pair that
  * shares at least one never-saturating bucket, and the
  * Σ min(bucketSize, cap) state ceiling.
  *
  * Usage: StreamScale <blowUpDir> [horizonMinutes=16] [nCopies=0] [maxBucket=0]
  */
object StreamScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val horizon = args.lift(1).map(_.toLong).getOrElse(16L)
    val nCopies = args.lift(2).map(_.toInt).getOrElse(0)
    val maxBucket = args.lift(3).map(_.toInt).getOrElse(0)
    if (maxBucket > 0) { capMode(dir, maxBucket); return }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.local(cpus, "graft-stream-scale")
    import spark.implicits._
    import graft.operators.Dedup

    val docs = graft.Tables(spark, dir).documents
      .select(col("doc_id"), col("text"),
        (col("doc_id") / 10000000L).cast("long").as("rep"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count()
    val reps = docs.select(max(col("rep"))).head().getLong(0).toInt + 1
    println(s"[stream] $nDocs docs, $reps replica-minutes, horizon ${horizon}m")

    // ---- streaming run ------------------------------------------
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String, java.sql.Timestamp)]
    val pairs = graft.streaming.StreamingDedup.candidatePairs(
      source.toDF().toDF("doc_id", "text", "ts"),
      tsCol = "ts", horizonMinutes = horizon, watermarkDelay = "1 minute",
      exciseExact = nCopies > 0)
    val query = pairs.writeStream.format("memory").queryName("stream_pairs")
      .outputMode("append").start()
    // planted exact copies: doc d's text re-enters in the same
    // micro-batch as d + 2·10^9 (event time +1 minute; copy ids sort
    // after originals, so the original is the remembered
    // representative) — excision must route each copy to ONE
    // representative edge and keep it out of the bucket state
    val copyStep = if (nCopies > 0) math.max(1, (nDocs / nCopies).toInt) else 0
    val planted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val t0 = System.nanoTime()
    (0 until reps).foreach { r =>
      val batch = docs.filter(col("rep") === r)
        .select("doc_id", "text").collect()
        .map(row => (row.getLong(0), row.getString(1),
          new java.sql.Timestamp(base + r * 60000L)))
      val copies =
        if (copyStep > 0)
          batch.filter(_._1 % copyStep == 0).map { case (id, text, _) =>
            planted += ((id, id + 2000000000L))
            (id + 2000000000L, text, new java.sql.Timestamp(base + (r + 1) * 60000L))
          }
        else Array.empty[(Long, String, java.sql.Timestamp)]
      source.addData((batch ++ copies).toSeq)
      query.processAllAvailable()
      if ((r + 1) % 16 == 0) {
        val rows = query.lastProgress.stateOperators(0).numRowsTotal
        println(f"[stream] after minute ${r + 1}%3d: state rows = $rows")
        Console.flush()
      }
    }
    val streamSecs = (System.nanoTime() - t0) / 1e9
    val finalState = query.lastProgress.stateOperators(0).numRowsTotal
    val streamed = spark.table("stream_pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    query.stop()
    println(f"[stream] streamed ${streamed.size} pairs in $streamSecs%.1f s; final state rows = $finalState")

    // ---- batch reference ----------------------------------------
    val banded = Dedup.bandedIds(Dedup.minhashSignature(docs, "text", "doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totalBuckets = banded.select("band", "bucket").distinct().count()
    val batchPairs = banded.select(col("band"), col("bucket"), col("doc_id").as("a"))
      .join(banded.select(col("band"), col("bucket"), col("doc_id").as("b")),
        Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
      .withColumn("gap", abs((col("a") / 10000000L).cast("long")
        - (col("b") / 10000000L).cast("long")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val allBatch = batchPairs.count()
    val inHorizon = batchPairs.filter(col("gap") <= horizon)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[stream] batch candidates: $allBatch total, ${inHorizon.size} within horizon; $totalBuckets buckets ever touched")

    // 0. excision: every planted copy pair must surface as exactly
    //    its representative edge
    if (planted.nonEmpty) {
      val missedCopies = planted.toSet -- streamed
      println(s"[stream] planted copy pairs: ${planted.size}, missed: ${missedCopies.size}")
      assert(missedCopies.isEmpty,
        s"excision must emit each copy's representative edge; missed ${missedCopies.take(5)}")
    }

    // 1. recall: within-horizon batch pairs are a subset of streamed —
    //    directly without excision; up to representative transitivity
    //    with it (a copy's pairs route through its rep, the documented
    //    opt-in trade — the pair's endpoints must still land in one
    //    streamed component)
    val missed =
      if (nCopies == 0) inHorizon -- streamed
      else {
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        streamed.foreach { case (a, b) => parent(find(a)) = find(b) }
        inHorizon.filter { case (a, b) => find(a) != find(b) }
      }
    println(s"[stream] within-horizon pairs unrecovered: ${missed.size}" +
      (if (nCopies > 0) " (component-level, excision on)" else ""))
    assert(missed.isEmpty,
      s"stream must recover every within-horizon candidate; missed ${missed.take(5)}")
    // 2. eviction bounds state: final rows well under the unbounded
    //    total (which only ever grows)
    println(f"[stream] state ceiling: $finalState of $totalBuckets unbounded (${100.0 * finalState / totalBuckets}%.1f%%)")
    assert(finalState < totalBuckets / 2,
      s"eviction must bound state: $finalState vs unbounded $totalBuckets")
    // streamed-only pairs are fine (chained warm buckets extend reach
    // past the pairwise gap); report for the record
    println(s"[stream] streamed-beyond-horizon extras: ${(streamed -- inHorizon).size}")
    println("[stream] PASS")
    spark.stop()
  }

  /** Saturation-cap mode: 4 planted copy-families of ~reps+1 docs each
    * (every family ≫ cap), horizon wide open so eviction never fires —
    * the cap is the ONLY state bound under test.
    */
  private def capMode(dir: String, cap: Int): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.local(cpus, "graft-stream-cap")
    import spark.implicits._
    import graft.operators.Dedup

    val docs = graft.Tables(spark, dir).documents
      .select(col("doc_id"), col("text"),
        (col("doc_id") / 10000000L).cast("long").as("rep"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count()
    val reps = docs.select(max(col("rep"))).head().getLong(0).toInt + 1
    val horizon = reps + 2L // nothing ever goes cold: pure cap test
    val seeds = docs.filter(col("rep") === 0).orderBy("doc_id")
      .limit(4).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    println(s"[stream-cap] $nDocs docs, $reps minutes, cap $cap, " +
      s"families of ${reps + 1} from seeds ${seeds.map(_._1).mkString(",")}")

    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String, java.sql.Timestamp)]
    val pairs = graft.streaming.StreamingDedup.candidatePairs(
      source.toDF().toDF("doc_id", "text", "ts"),
      tsCol = "ts", horizonMinutes = horizon, watermarkDelay = "1 minute",
      maxBucket = cap)
    val query = pairs.writeStream.format("memory").queryName("stream_cap_pairs")
      .outputMode("append").start()
    def copyId(seedIdx: Int, minute: Int): Long =
      3000000000L + seedIdx * 1000000L + minute
    (0 until reps).foreach { r =>
      val batch = docs.filter(col("rep") === r)
        .select("doc_id", "text").collect()
        .map(row => (row.getLong(0), row.getString(1),
          new java.sql.Timestamp(base + r * 60000L)))
      val copies = seeds.zipWithIndex.map { case ((_, text), i) =>
        (copyId(i, r), text, new java.sql.Timestamp(base + r * 60000L))
      }
      source.addData((batch ++ copies).toSeq)
      query.processAllAvailable()
    }
    val finalState = query.lastProgress.stateOperators(0).numRowsTotal
    val streamed = spark.table("stream_cap_pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    query.stop()
    println(s"[stream-cap] streamed ${streamed.size} pairs; final state rows = $finalState")

    // batch reference over EVERY arrival (originals + planted copies)
    val copiesDf = (0 until reps).flatMap { r =>
      seeds.zipWithIndex.map { case ((_, text), i) => (copyId(i, r), text) }
    }.toDF("doc_id", "text")
    val arrivals = docs.select("doc_id", "text").union(copiesDf)
    val banded = Dedup.bandedIds(Dedup.minhashSignature(arrivals, "text", "doc_id"))
      .select("band", "bucket", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sized = banded.groupBy("band", "bucket").agg(count(lit(1)).as("sz"))

    // 1. family emissions: C(cap,2) bound instead of C(famSize,2)
    seeds.zipWithIndex.foreach { case ((seedId, _), i) =>
      val fam = Set(seedId) ++ (0 until reps).map(copyId(i, _))
      val within = streamed.count { case (a, b) => fam(a) && fam(b) }
      val capBound = cap * (cap - 1) / 2
      val uncapped = fam.size * (fam.size - 1) / 2
      println(s"[stream-cap] family $i: $within pairs (cap bound $capBound, uncapped $uncapped)")
      assert(within > 0, s"family $i must emit its first-arrival pairs")
      assert(within <= capBound,
        s"family $i emitted $within pairs — saturation must bound it by $capBound")
    }

    // 2. recall outside saturation: any pair sharing a bucket that
    //    NEVER reaches the cap has both endpoints admitted -> must be
    //    streamed (horizon is wide open in this mode)
    val small = banded.join(sized.filter(col("sz") < cap), Seq("band", "bucket"))
    val mustHave = small.select(col("band"), col("bucket"), col("doc_id").as("a"))
      .join(small.select(col("band"), col("bucket"), col("doc_id").as("b")),
        Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = mustHave -- streamed
    println(s"[stream-cap] pairs via never-saturating buckets: ${mustHave.size}, missed: ${missed.size}")
    assert(missed.isEmpty,
      s"cap may only cost saturated-bucket pairs; missed ${missed.take(5)}")

    // 3. state ceiling: rows <= sum(min(size, cap)) and well under the
    //    uncapped sum the planted families would force
    val ceil = sized.agg(
        sum(least(col("sz"), lit(cap.toLong))).as("capped"),
        sum(col("sz")).as("uncapped"))
      .head()
    val (capped, uncapped) = (ceil.getLong(0), ceil.getLong(1))
    println(s"[stream-cap] state: $finalState rows, ceiling $capped, uncapped would be $uncapped")
    assert(finalState <= capped,
      s"state $finalState exceeds the sum-min(size,cap) ceiling $capped")
    assert(capped < uncapped,
      "planted families must actually inflate the uncapped total")
    println("[stream-cap] PASS")
    spark.stop()
  }
}
