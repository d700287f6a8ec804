package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed counts with watermark match batch computation") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val events = Seq(
      Event(1, ts("2024-01-01 10:05:00"), 1, "view", 1.0),
      Event(2, ts("2024-01-01 10:45:00"), 1, "view", 2.0),
      Event(3, ts("2024-01-01 11:05:00"), 2, "click", 3.0),
      Event(4, ts("2024-01-01 11:55:00"), 2, "view", 4.0))
    mem.addData(events: _*)
    val q = EventStream.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("wc")
      .outputMode(OutputMode.Append()).start()
    mem.addData(Event(5, ts("2024-01-01 13:00:00"), 1, "view", 5.0)) // advances watermark
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("wc")
      .select("window_start", "event_type", "n", "sum_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = EventStream.windowedCountsBatch(events.toDF())
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(batch.subsetOf(streamed ++ batch) && streamed.subsetOf(batch),
      s"streamed=$streamed batch=$batch")
  }

  test("streaming sessions agree with the batch gaps-and-islands query") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // real events table, streamed in one batch + a watermark-advancing
    // sentinel far in the future so every real session closes
    val ds = graft.operators.TypedOps.events(spark, sf)
      .map(e => Event(e.event_id, e.ts, e.user_id, e.event_type, e.value))
    val mem = MemoryStream[Event]
    val q = EventStream.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_x")
      .outputMode(OutputMode.Append()).start()
    mem.addData(ds.collect().toSeq: _*)
    q.processAllAvailable()
    mem.addData(Event(-1, ts("2030-01-01 00:00:00"), -1, "sentinel", 0.0))
    q.processAllAvailable()
    mem.addData(Event(-2, ts("2030-01-01 00:01:00"), -1, "sentinel", 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sess_x").as[EventStream.Session]
      .filter(_.user_id >= 0)
      .collect().map(s => (s.user_id, s.first_ts.getTime / 1000,
        s.last_ts.getTime / 1000, s.n_events)).toSet
    val batch = SparkEntry.queries("q_sessionize_batch")(spark, sf)
      .collect().map { r =>
        (r.getLong(0),
          java.sql.Timestamp.valueOf(r.getString(4)).getTime / 1000,
          java.sql.Timestamp.valueOf(r.getString(5)).getTime / 1000,
          r.getLong(2))
      }.toSet
    assert(streamed == batch,
      s"only-streamed=${(streamed -- batch).take(3)} only-batch=${(batch -- streamed).take(3)}")
  }

  test("streaming dedup drops within-watermark duplicates, keeps the rest") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.dedupStream(mem.toDF(), Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      Event(1, ts("2024-01-01 10:00:00"), 7, "view", 1.0),
      Event(2, ts("2024-01-01 10:03:00"), 7, "view", 2.0), // dup key in window
      Event(3, ts("2024-01-01 10:04:00"), 7, "click", 3.0),
      Event(4, ts("2024-01-01 10:05:00"), 8, "view", 4.0))
    q.processAllAvailable()
    // advance the watermark far past the horizon, then the same key
    // again: state was evicted, so the event is KEPT (bounded state,
    // horizon-scoped semantics)
    mem.addData(Event(5, ts("2024-01-01 12:00:00"), 9, "view", 0.0))
    q.processAllAvailable()
    mem.addData(Event(6, ts("2024-01-01 12:01:00"), 7, "view", 9.0))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("dedup").as[Event].collect().map(_.event_id).toSet
    assert(kept == Set(1L, 3L, 4L, 5L, 6L), kept.toSeq.sorted.mkString(","))
  }

  test("streaming intake admits, scrubs and dedups exactly like the batch twin") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val good = ("spark holds the table and the sort and the merge " * 5).trim
    val docs = Seq(
      (1L, ts("2024-01-01 10:00:00"), good),
      (2L, ts("2024-01-01 10:01:00"), "tiny"), // fails quality gate
      (3L, ts("2024-01-01 10:02:00"), good + " mail bob@example.org"), // pii
      // same doc as 3 after scrub+normalize (punct variant of the pii span)
      (4L, ts("2024-01-01 10:03:00"), good + " mail sue@other.net"),
      (5L, ts("2024-01-01 10:04:00"), good + " but a different ending here"))
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = graft.streaming.StreamingIntake.intake(
        mem.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("intake")
      .outputMode(OutputMode.Append()).start()
    mem.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("intake")
    val kept = streamed.select("doc_id").as[Long].collect().toSet
    // 1 admitted; 2 rejected (quality); 3 admitted (scrubbed); 4 is a
    // dup of 3 once both emails collapse to <EMAIL>; 5 admitted
    assert(kept == Set(1L, 3L, 5L), kept.toSeq.sorted.mkString(","))
    // no unredacted pii survives
    val texts = streamed.select("clean_text").as[String].collect().mkString("\n")
    assert(!texts.contains("@example.org") && texts.contains("<EMAIL>"), texts)
    // batch twin admits the identical set
    val batch = graft.streaming.StreamingIntake.intakeBatch(docs.toDF("doc_id", "ts", "text"))
      .select("doc_id").as[Long].collect().toSet
    assert(batch == kept, s"batch=$batch streamed=$kept")
  }

  test("streaming intake decontamination gate rejects benchmark-overlapping docs") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // the offline-fit artifact: a bloom over a planted benchmark doc
    val benchText = ("the held out benchmark question asks about the " +
      "famous bridge and the answer names the engineer who built it " * 3).trim
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val bloom = graft.operators.TextAnalysis.benchmarkBloomBytes(bench)
    val clean = ("spark holds the table and the sort and the merge " * 5).trim
    val docs = Seq(
      (1L, ts("2024-01-01 10:00:00"), clean),                 // admitted
      (2L, ts("2024-01-01 10:01:00"), benchText + " padded"), // contaminated
      (3L, ts("2024-01-01 10:02:00"), clean + " another tail here"))
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = graft.streaming.StreamingIntake.intake(
        mem.toDF().toDF("doc_id", "ts", "text"), benchBloom = Some(bloom))
      .writeStream.format("memory").queryName("intake_decontam")
      .outputMode(OutputMode.Append()).start()
    mem.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("intake_decontam")
    val kept = streamed.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L), kept.toSeq.sorted.mkString(","))
    // the one-sided guarantee, per doc: the gate's ratio must bracket
    // the exact winnowing self-overlap (no false negatives)
    val ratios = streamed.select("doc_id", "contam_ratio").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ratios.values.forall(r => r >= 0 && r <= 0.5), ratios.toString)
    // batch twin gates the identical set with the identical ratios
    val batch = graft.streaming.StreamingIntake.intakeBatch(
        docs.toDF("doc_id", "ts", "text"), benchBloom = Some(bloom))
      .select("doc_id", "contam_ratio").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(batch == ratios, s"batch=$batch streamed=$ratios")
    // no-bloom mode keeps the original schema (no contam column)
    val plain = graft.streaming.StreamingIntake.intakeBatch(
      docs.toDF("doc_id", "ts", "text"))
    assert(!plain.columns.contains("contam_ratio"))
  }

  test("streaming intake semantic gate rejects embedding-level benchmark overlap") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // offline-fit artifact: two orthogonal benchmark directions
    val benchEmb = Seq(
      (100L, Array(1f, 0f, 0f, 0f)),
      (101L, Array(0f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
    val art = graft.operators.Similarity.benchArtifact(
      benchEmb, org.apache.spark.sql.functions.col("vec_id") >= 0)
    val good = ("spark holds the table and the sort and the merge " * 5).trim
    // doc 2 is a PARAPHRASE stand-in: clean text (no string-rung
    // overlap) but its embedding sits on a benchmark direction —
    // exactly the class only the semantic rung can reject
    val docs = Seq(
      (1L, ts("2024-01-01 10:00:00"), good, Array(0f, 0f, 1f, 0f)),
      (2L, ts("2024-01-01 10:01:00"), good + " reworded benchmark answer",
        Array(0.1f, 0.99f, 0f, 0f)),
      (3L, ts("2024-01-01 10:02:00"), good + " a different ending",
        Array(0.5f, 0.5f, 0.5f, 0.5f)),
      // doc_id COLLIDES with bench vec_id 100: stream doc ids live in
      // a different id space, so the batch kernel's self-id exclusion
      // must stay inert — this doc sits ON the benchmark direction
      // and must be gated despite the id match
      (100L, ts("2024-01-01 10:03:00"), good + " id collision case",
        Array(1f, 0f, 0f, 0f)),
      // NULL embedding: the doc cannot be semantically screened — the
      // documented policy ADMITS it (no benchmark match is clean) with
      // sem_cos6 = NULL (auditably distinct from -1 = screened against
      // an empty benchmark), instead of the silent null-predicate
      // rejection that would be indistinguishable from real
      // contamination
      (4L, ts("2024-01-01 10:04:00"), good + " embedding never computed",
        null.asInstanceOf[Array[Float]]))
    val mem = MemoryStream[(Long, Timestamp, String, Array[Float])]
    val q = graft.streaming.StreamingIntake.intake(
        mem.toDF().toDF("doc_id", "ts", "text", "embedding"),
        semBench = Some(art), semTauMicro = 900000L)
      .writeStream.format("memory").queryName("intake_sem")
      .outputMode(OutputMode.Append()).start()
    mem.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("intake_sem")
    val kept = streamed.select("doc_id").as[Long].collect().toSet
    // doc 1 orthogonal (cos 0), doc 3 at cos 0.5 < 0.9, doc 4
    // unscreenable-null admitted; doc 2 at cos ≈ 0.995 ≥ 0.9 → rejected
    assert(kept == Set(1L, 3L, 4L), kept.toSeq.sorted.mkString(","))
    // the emitted cosine is the SAME grid value the batch screen
    // computes, and the batch twin admits the identical rows; the
    // unscreenable (null-embedding) admit carries a NULL audit value
    def cosMap(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "sem_cos6").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val sc = cosMap(streamed)
    val batch = cosMap(graft.streaming.StreamingIntake.intakeBatch(
      docs.toDF("doc_id", "ts", "text", "embedding"),
      semBench = Some(art), semTauMicro = 900000L))
    assert(batch == sc, s"batch=$batch streamed=$sc")
    assert(sc(1L) == Some(0.0) && sc(3L) == Some(0.5) && sc(4L) == None,
      sc.toString)
    // schema compat: the semantic column appears only when the gate is
    // on, composes with the bloom gate's column, and the no-gate
    // schema is unchanged
    assert(streamed.columns.toSeq ==
      Seq("doc_id", "ts", "clean_text", "dedup_key", "quality_score",
        "sem_cos6"))
    val bloom = graft.operators.TextAnalysis.benchmarkBloomBytes(
      Seq((100L, ("benchmark question text " * 8).trim)).toDF("doc_id", "text"))
    val both = graft.streaming.StreamingIntake.intakeBatch(
      docs.toDF("doc_id", "ts", "text", "embedding"),
      benchBloom = Some(bloom), semBench = Some(art), semTauMicro = 900000L)
    assert(both.columns.toSeq ==
      Seq("doc_id", "ts", "clean_text", "dedup_key", "quality_score",
        "contam_ratio", "sem_cos6"))
    val plain = graft.streaming.StreamingIntake.intakeBatch(
      docs.toDF("doc_id", "ts", "text", "embedding")
        .drop("embedding"))
    assert(!plain.columns.contains("sem_cos6"))
  }

  test("streaming minhash dedup finds every batch near-dup, across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = Tables(spark, sf).documents
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // split so planted pairs straddle the two micro-batches: streaming
    // state must match batch-2 docs against batch-1 history
    val (b1, b2) = docs.partition(_._1 % 2 == 0)
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingDedup.candidatePairs(
        mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append()).start()
    mem.addData(b1.toSeq: _*)
    q.processAllAvailable()
    mem.addData(b2.toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sdedup")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: the batch pipeline's VERIFIED pairs (subset of the
    // band candidates by construction — same signatures, same buckets)
    val verified = graft.operators.Dedup.minhashLsh(docs.toSeq.toDF("doc_id", "text"),
        threshold = 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.nonEmpty)
    assert(verified.subsetOf(streamed),
      s"missing cross-batch candidates: ${(verified -- streamed).take(5)}")
    val crossBatch = verified.count(p => (p._1 % 2) != (p._2 % 2))
    assert(crossBatch > 0, "test split produced no cross-batch pairs")
  }

  test("streaming dedup bucket state survives a restart from its checkpoint") {
    // the minhash bucket state is the heaviest state any graft stream
    // carries (O(docs × bands) ids) — the same restart treatment the
    // intake/drift spec gives their state: stop the query mid-stream,
    // restart from the checkpoint, and a post-restart doc must still
    // pair with bucket members seen BEFORE the restart; the full pair
    // set must equal an uninterrupted run's.
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = Tables(spark, sf).documents
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val batches = Seq(
      docs.filter(_._1 % 3 == 0), docs.filter(_._1 % 3 == 1),
      docs.filter(_._1 % 3 == 2))
    def run(split: Boolean): Set[(Long, Long)] = {
      val out = java.nio.file.Files
        .createTempDirectory("graft-sdd-out").toString
      val chk = java.nio.file.Files
        .createTempDirectory("graft-sdd-chk").toString
      val mem = MemoryStream[(Long, String)]
      def start() = graft.streaming.StreamingDedup.candidatePairs(
          mem.toDF().toDF("doc_id", "text"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", chk)
        .outputMode(OutputMode.Append()).start()
      var q = start()
      batches.zipWithIndex.foreach { case (b, i) =>
        if (split && i == 2) { q.stop(); q = start() }
        mem.addData(b.toSeq: _*); q.processAllAvailable()
      }
      q.stop()
      spark.read.parquet(out).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val unbroken = run(split = false)
    val restarted = run(split = true)
    assert(restarted == unbroken,
      s"restart lost/invented pairs: -${(unbroken -- restarted).take(3)}" +
        s" +${(restarted -- unbroken).take(3)}")
    // and the restart really crossed state: some pair joins a batch-0/1
    // doc with a batch-2 (post-restart) doc
    assert(unbroken.exists(p => (p._1 % 3 != 2) != (p._2 % 3 != 2)),
      "fixture produced no cross-restart pair")
  }

  test("streaming dedup evicts cold buckets past the horizon, keeps warm ones") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val textA = "the quick brown fox jumps over the lazy dog tonight"
    val textB = "a completely different second document about spark shuffles"
    val textC = "yet another third document concerning catalyst plan rules"
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = graft.streaming.StreamingDedup.candidatePairs(
        mem.toDF().toDF("doc_id", "ts", "text"),
        tsCol = "ts", horizonMinutes = 30, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sdedup_ttl")
      .outputMode(OutputMode.Append()).start()
    def stateRows(): Long = q.lastProgress.stateOperators(0).numRowsTotal
    // batch 1: a near-dup pair inside the horizon
    mem.addData((1L, ts("2024-01-01 10:00:00"), textA),
      (2L, ts("2024-01-01 10:01:00"), textA))
    q.processAllAvailable()
    val rowsAfterA = stateRows()
    // batch 2: unrelated docs 3h later — the watermark jumps past
    // bucket A's 10:01 + 30min timeout, and the timeout-only follow-up
    // batch evicts A's buckets: state must NOT grow even though two
    // new bucket families (B, C) were added
    mem.addData((3L, ts("2024-01-01 13:00:00"), textB),
      (4L, ts("2024-01-01 13:01:00"), textC))
    q.processAllAvailable()
    assert(stateRows() <= rowsAfterA + rowsAfterA,
      s"state grew past the horizon: $rowsAfterA -> ${stateRows()}")
    // batch 3: duplicate of evicted text A -> silently admitted, NO
    // pair against docs 1/2 (the documented recall trade)
    mem.addData((5L, ts("2024-01-01 13:02:00"), textA))
    q.processAllAvailable()
    // batch 4: duplicate of WARM text B -> pair found
    mem.addData((6L, ts("2024-01-01 13:03:00"), textB))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("sdedup_ttl")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (3L, 6L)), pairs.toSeq.sorted.mkString(","))
  }

  test("streaming dedup saturates capped buckets, bounding state and pairs") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val boiler = "identical boilerplate template text repeated across the corpus"
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingDedup.candidatePairs(
        mem.toDF().toDF("doc_id", "text"), maxBucket = 3)
      .writeStream.format("memory").queryName("sdedup_cap")
      .outputMode(OutputMode.Append()).start()
    mem.addData((1L to 10L).map(i => (i, boiler)): _*)
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("sdedup_cap")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // only the first 3 members of the saturated bucket pair up: C(3,2)
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      pairs.toSeq.sorted.mkString(","))
  }

  test("streaming exact-excision routes copies through one representative per bucket") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val boiler = "identical boilerplate template text repeated across the corpus"
    val pairA = (0 until 60).map(i => s"p$i").mkString(" ")
    val pairB = pairA.replace("p59", "px")
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingDedup.candidatePairs(
        mem.toDF().toDF("doc_id", "text"), exciseExact = true)
      .writeStream.format("memory").queryName("sdedup_ex")
      .outputMode(OutputMode.Append()).start()
    // copies split across micro-batches: batch-2 copies must still
    // route to the batch-1 representative through state
    mem.addData((1L to 5L).map(i => (i, boiler)) :+ ((100L, pairA)): _*)
    q.processAllAvailable()
    val rowsAfterB1 = q.lastProgress.stateOperators(0).numRowsTotal
    mem.addData((6L to 10L).map(i => (i, boiler)) :+ ((101L, pairB)): _*)
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("sdedup_ex")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 10-copy family collapses to 9 representative edges (1,i) —
    // copy-to-copy pairs route through doc 1 — and the genuine
    // near-dup pair survives
    assert(pairs == ((2L to 10L).map(i => (1L, i)).toSet + ((100L, 101L))),
      pairs.toSeq.sorted.mkString(","))
    // state did not grow with the copies: batch 2 added only doc 101's
    // buckets, every copy was absorbed by the batch-1 representative
    val rowsAfterB2 = q.lastProgress.stateOperators(0).numRowsTotal
    assert(rowsAfterB2 <= rowsAfterB1 + 16,
      s"copies leaked into state: $rowsAfterB1 -> $rowsAfterB2")
    // transitivity check: union-find over the streamed edges yields the
    // same kept set as the batch dedup pipeline on the same docs
    val docs = ((1L to 10L).map(i => (i, boiler)) ++
      Seq((100L, pairA), (101L, pairB))).toDF("doc_id", "text")
    val batchKept = graft.operators.DedupPipeline.dedupedCorpus(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val streamKept = ((1L to 10L) ++ Seq(100L, 101L)).filter(i => find(i) == i).toSet
    assert(streamKept == batchKept, s"stream=$streamKept batch=$batchKept")
  }

  test("sessionization closes on event-time gap") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      Event(1, ts("2024-01-01 10:00:00"), 7, "view", 1.0),
      Event(2, ts("2024-01-01 10:10:00"), 7, "click", 2.0),
      // > 30 min event-time gap: closes the first session inline
      Event(3, ts("2024-01-01 11:00:00"), 7, "view", 10.0))
    q.processAllAvailable()
    // other-user event far in the future advances the watermark past
    // 11:00 + 30min -> user 7's open session closes via timeout
    mem.addData(Event(4, ts("2024-01-01 16:00:00"), 9, "view", 1.0))
    q.processAllAvailable()
    mem.addData(Event(5, ts("2024-01-01 16:01:00"), 9, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sess").as[EventStream.Session].collect()
      .sortBy(_.first_ts.getTime)
    assert(sessions.length == 2, sessions.mkString(";"))
    assert(sessions(0).user_id == 7 && sessions(0).n_events == 2
      && sessions(0).total_value == 3.0 && sessions(0).closed)
    assert(sessions(1).user_id == 7 && sessions(1).n_events == 1
      && sessions(1).total_value == 10.0 && sessions(1).closed)
  }

  test("stream-stream click attribution matches the batch twin across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val views = Seq(
      Event(10, ts("2024-01-01 10:00:00"), 1, "view", 0.0),
      Event(11, ts("2024-01-01 10:20:00"), 1, "view", 0.0),
      Event(12, ts("2024-01-01 10:00:00"), 2, "view", 0.0))
    val clicks = Seq(
      Event(20, ts("2024-01-01 10:05:00"), 1, "click", 1.0), // → view 10
      Event(21, ts("2024-01-01 10:25:00"), 1, "click", 2.0), // → view 11 only (10 is >10min old)
      Event(22, ts("2024-01-01 10:30:00"), 2, "click", 3.0)) // no view within 10min
    val vMem = MemoryStream[Event]
    val cMem = MemoryStream[Event]
    val q = EventStream.attributeClicks(vMem.toDF(), cMem.toDF())
      .writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append()).start()
    // views and clicks arrive in different micro-batches: the join
    // must buffer the view side in state until its click shows up
    vMem.addData(views: _*)
    q.processAllAvailable()
    cMem.addData(clicks.take(2): _*)
    q.processAllAvailable()
    cMem.addData(clicks.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("attr")
      .select("click_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = EventStream.attributeClicksBatch(views.toDF(), clicks.toDF())
      .select("click_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch == Set((20L, 10L), (21L, 11L)), batch.toSeq.sorted.mkString(","))
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
  }

  test("streaming heavy hitters: guarantee holds, state stays at capacity") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    // one hour window, skewed stream across 40 distinct items:
    // "hot" 50x, "warm" 12x, 40 cold singletons split over two batches
    def at(m: Int) = ts(f"2024-01-01 10:${m % 60}%02d:00")
    val batch1 = (1 to 30).map(i => (at(i % 50), "hot")) ++
      (1 to 6).map(i => (at(i), "warm")) ++
      (1 to 20).map(i => (at(i), s"cold$i"))
    val batch2 = (1 to 20).map(i => (at(i % 50), "hot")) ++
      (1 to 6).map(i => (at(i), "warm")) ++
      (21 to 40).map(i => (at(i % 50), s"cold$i"))
    val q = EventStream.heavyHitters(
        mem.toDF().toDF("ts", "item"), "item", capacity = 6,
        delay = "1 hour")
      .writeStream.format("memory").queryName("hh")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    mem.addData(batch1: _*); q.processAllAvailable()
    mem.addData(batch2: _*); q.processAllAvailable()
    // close the window: advance the watermark well past 11:00
    mem.addData((ts("2024-01-01 12:30:00"), "later")); q.processAllAvailable()
    val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
    q.stop()
    val out = spark.table("hh").collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    val n = batch1.length + batch2.length
    // ≤ capacity counters survive per window
    assert(out.size <= 6, out.toString)
    assert(stateRows <= 2, s"state keyed per window, got $stateRows")
    // SpaceSaving guarantee: any item with true count > N/capacity is
    // present, and est bounds bracket the truth
    val truth = (batch1 ++ batch2).groupBy(_._2).map { case (k, v) => k -> v.size }
    truth.filter(_._2 > n / 6).keys.foreach { k =>
      assert(out.contains(k), s"guaranteed item $k missing from $out")
    }
    out.foreach { case (item, (est, err)) =>
      val t = truth.getOrElse(item, 0).toLong
      assert(t <= est && est - err <= t, s"$item est=$est err=$err true=$t")
    }
    // the planted heavies rank first
    val ranked = spark.table("hh").orderBy("rank").collect().map(_.getString(1))
    assert(ranked.take(2).toSet == Set("hot", "warm"), ranked.mkString(","))
  }

  test("sessionize folds a cross-batch late event without dragging the session endpoint backward") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // the r13 review find: a late-but-in-watermark event used to
    // ASSIGN last_ts backward, so a following in-gap event measured
    // an inflated gap and wrongly split the session (and the emitted
    // interval could invert). The fix tracks [min(first), max(last)].
    val mem = MemoryStream[Event]
    val q = EventStream.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_ooo")
      .outputMode(OutputMode.Append()).start()
    mem.addData(Event(1, ts("2024-01-01 10:00:00"), 7, "view", 1.0))
    q.processAllAvailable()
    // batch 2: a LATE event (9:55, inside the 10-min watermark) and a
    // following event 28 min after the session's true endpoint —
    // within the 30-min gap, so all three are ONE session
    mem.addData(
      Event(2, ts("2024-01-01 09:55:00"), 7, "view", 1.0),
      Event(3, ts("2024-01-01 10:28:00"), 7, "view", 1.0))
    q.processAllAvailable()
    mem.addData(Event(-1, ts("2030-01-01 00:00:00"), -1, "sentinel", 0.0))
    q.processAllAvailable()
    mem.addData(Event(-2, ts("2030-01-01 00:01:00"), -1, "sentinel", 0.0))
    q.processAllAvailable()
    q.stop()
    val sess = spark.table("sess_ooo").as[EventStream.Session]
      .filter(_.user_id == 7).collect()
    assert(sess.length == 1, s"late event split the session: ${sess.toSeq}")
    assert(sess.head.n_events == 3 && sess.head.closed)
    assert(sess.head.first_ts == ts("2024-01-01 09:55:00") &&
      sess.head.last_ts == ts("2024-01-01 10:28:00"),
      s"interval ${sess.head.first_ts}..${sess.head.last_ts}")
  }

  test("null event-times and items are dropped, not query-fatal") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // heavyHitters: a null ts row and a null item row ride along with
    // real data — the query must survive and count the real rows
    // (the driftStream isNotNull guard, now on every stateful op).
    // Pre-epoch rows ride along too: they sit below Spark's INITIAL
    // watermark (epoch 0) and are absorbed by the late-row filter
    // before window assignment — asserted dropped-not-fatal here; the
    // Math.floorDiv in the window key is defense-in-depth for any
    // path where such a row could still reach assignment (plain
    // division would misassign it one window late)
    val mem = MemoryStream[(Timestamp, String)]
    val q = EventStream.heavyHitters(
        mem.toDF().toDF("ts", "item"), "item", capacity = 4,
        windowMinutes = 60)
      .writeStream.format("memory").queryName("hh_null")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      (new Timestamp(-60000L), "old"), // 1969-12-31 23:59:00 UTC
      (null.asInstanceOf[Timestamp], "ghost"),
      (ts("2024-01-01 10:00:00"), null.asInstanceOf[String]),
      (ts("2024-01-01 10:01:00"), "real"))
    q.processAllAvailable()
    mem.addData((ts("2030-01-01 00:00:00"), "sentinel"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("hh_null")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1),
        r.getLong(2)))
    assert(out.exists(t => t._2 == "real" && t._3 == 1L), out.toSeq.toString)
    assert(!out.exists(_._2 == "ghost") && !out.exists(_._2 == null))
    assert(!out.exists(t => t._2 == "old" && t._1 == 0L),
      "a pre-epoch row must never land in the epoch window")
    // sessionize: a null-ts event among real ones is dropped silently
    val mem2 = MemoryStream[Event]
    val q2 = EventStream.sessionize(mem2.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_null")
      .outputMode(OutputMode.Append()).start()
    mem2.addData(
      Event(1, ts("2024-01-01 10:00:00"), 9, "view", 1.0),
      Event(2, null, 9, "view", 1.0))
    q2.processAllAvailable()
    mem2.addData(Event(-1, ts("2030-01-01 00:00:00"), -1, "sentinel", 0.0))
    q2.processAllAvailable()
    mem2.addData(Event(-2, ts("2030-01-01 00:01:00"), -1, "sentinel", 0.0))
    q2.processAllAvailable()
    q2.stop()
    val s9 = spark.table("sess_null").as[EventStream.Session]
      .filter(_.user_id == 9).collect()
    assert(s9.length == 1 && s9.head.n_events == 1, s9.toSeq.toString)
  }

  test("stateful streams recover from a checkpoint: dedup state and drift windows survive a restart") {
    // the recovery leg of the soak story (VERDICT r12 #5): the batch
    // parity specs above drive one uninterrupted query per stream —
    // this one stops the query MID-STREAM and restarts it from its
    // checkpoint (parquet sink + checkpointLocation, the production
    // shape StreamingMain runs), asserting the restarted run's output
    // is identical to an uninterrupted run of the same feed. The
    // state crossing the restart is the point: a pre-restart doc must
    // still suppress its post-restart duplicate (dropDuplicates
    // WithinWatermark state), and a drift window must combine token
    // counts from both sides of the restart (flatMapGroupsWithState).
    import spark.implicits._
    implicit val sq = spark.sqlContext

    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString

    // ---- intake: cross-restart dedup ----------------------------
    val textA = "spark keeps the shuffle and the sort and the merge plan"
    val textB = "a wholly different document body with its own words here"
    val textC = "the third body of text that is unlike the other two docs"
    val b1 = Seq((1L, ts("2024-01-01 10:00:00"), textA),
      (2L, ts("2024-01-01 10:01:00"), textB))
    val b2 = Seq((3L, ts("2024-01-01 10:02:00"), textC))
    // doc 4 duplicates doc 1 AFTER the restart — only recovered dedup
    // state can drop it; doc 5 is fresh and must land
    val b3 = Seq((4L, ts("2024-01-01 10:03:00"), textA),
      (5L, ts("2024-01-01 10:04:00"), textB + " plus a fresh tail"))
    val batches = Seq(b1, b2, b3)

    def runIntake(split: Boolean): Set[(Long, String)] = {
      val out = tmp("graft-rst-out"); val chk = tmp("graft-rst-chk")
      val mem = MemoryStream[(Long, Timestamp, String)]
      def start() = graft.streaming.StreamingIntake.intake(
          mem.toDF().toDF("doc_id", "ts", "text"), minQuality = 0.0)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", chk)
        .outputMode(OutputMode.Append()).start()
      var q = start()
      batches.zipWithIndex.foreach { case (b, i) =>
        if (split && i == 2) { q.stop(); q = start() } // the "driver restart"
        mem.addData(b: _*); q.processAllAvailable()
      }
      q.stop()
      spark.read.parquet(out).select("doc_id", "dedup_key").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    }
    val unbroken = runIntake(split = false)
    val restarted = runIntake(split = true)
    assert(unbroken.map(_._1) == Set(1L, 2L, 3L, 5L), unbroken.toString)
    assert(restarted == unbroken,
      s"restarted=$restarted unbroken=$unbroken")

    // ---- drift: a window OPEN across the restart ------------------
    val model = graft.streaming.StreamingDrift.fit(
      Seq((1L, textA), (2L, textB)).toDF("doc_id", "text"))
    val base = ts("2024-01-01 10:00:00").getTime
    def at(min: Int) = new Timestamp(base + min * 60000L)
    // window [10:00, 11:00) receives tokens BEFORE and AFTER the
    // restart; the sentinel then closes it
    val d1 = Seq((at(5), textA))
    val d2 = Seq((at(10), textB))
    val d3 = Seq((at(20), textC), (at(48 * 60), "sentinel flush"))

    def runDrift(split: Boolean): Set[String] = {
      val out = tmp("graft-rst-dout"); val chk = tmp("graft-rst-dchk")
      val mem = MemoryStream[(Timestamp, String)]
      def start() = graft.streaming.StreamingDrift.driftStream(
          mem.toDF().toDF("ts", "text"), model)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", chk)
        .outputMode(OutputMode.Append()).start()
      var q = start()
      Seq(d1, d2, d3).zipWithIndex.foreach { case (b, i) =>
        if (split && i == 2) { q.stop(); q = start() }
        mem.addData(b: _*); q.processAllAvailable()
      }
      q.stop()
      spark.read.parquet(out)
        .filter(org.apache.spark.sql.functions.col("window_start") < at(47 * 60))
        .collect().map(_.toString).toSet
    }
    val dUnbroken = runDrift(split = false)
    val dRestarted = runDrift(split = true)
    assert(dUnbroken.nonEmpty, "drift fixture emitted no closed window")
    assert(dRestarted == dUnbroken,
      s"restarted=$dRestarted unbroken=$dUnbroken")
  }
}
