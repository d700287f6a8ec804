package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingDrift
import graft.streaming.StreamingDrift.{DriftModel, DriftState, WindowDrift}

class StreamingDriftSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("window close: hand-computed L1, OOV mass and top mover") {
    // reference: "a b" → ppm {a: 500000, b: 500000}
    val m = DriftModel(Map("a" -> 500000L, "b" -> 500000L))
    // window "a a": ppm_a 1e6 (d 5e5), b absent (d 5e5), no OOV;
    // tie at d=5e5 breaks to the lexicographically smaller term
    val w1 = StreamingDrift.finishWindow(0L,
      DriftState(Map("a" -> 2L), 0L, 2L), m)
    assert(w1 == WindowDrift(new Timestamp(0L), 2L, 0L, 1000000L,
      "a", 500000L), w1.toString)
    // window "a z z": a 333333 (d 166667), b 0 (d 500000), oov 666666
    val w2 = StreamingDrift.finishWindow(0L,
      DriftState(Map("a" -> 1L), 2L, 3L), m)
    assert(w2 == WindowDrift(new Timestamp(0L), 3L, 666666L,
      166667L + 500000L + 666666L, "b", 500000L), w2.toString)
  }

  test("fit: ppm from the corpus, vocab cap refuses unbounded artifacts") {
    import spark.implicits._
    val ref = Seq("a a b", "a c").toDF("text")
    val m = StreamingDrift.fit(ref)
    // counts a3 b1 c1, tot 5
    assert(m.ppm == Map("a" -> 600000L, "b" -> 200000L, "c" -> 200000L))
    val e = intercept[IllegalArgumentException] {
      StreamingDrift.fit(Tables(spark, sf).documents, maxVocab = 10)
    }
    assert(e.getMessage.contains("cap"))
  }

  test("model refresh: a restarted stream under a refit reference matches that model's replay") {
    // the deployment lifecycle (the StreamingQuality refresh rule):
    // the monitor runs under reference A, a refit produces B, the
    // (stateless-scoring) query restarts under B — each phase must
    // match ITS OWN model's window replay, and the swap must change
    // the reported drift where the references disagree
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mA = StreamingDrift.fit(Seq("a a b").toDF("text"))
    val mB = StreamingDrift.fit(Seq("c c d").toDF("text"))
    val rows = Seq((ts("2024-01-01 10:10:00"), "a b c"))
    def streamUnder(m: DriftModel, name: String) = {
      val mem = MemoryStream[(Timestamp, String)]
      mem.addData(rows: _*)
      val q = StreamingDrift.driftStream(
          mem.toDF().toDF("ts", "text"), m, windowMinutes = 60,
          delay = "10 minutes")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 14:00:00"), "x")); q.processAllAvailable()
      q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    }
    val underA = streamUnder(mA, "drift_swap_a")
    val underB = streamUnder(mB, "drift_swap_b")
    def replay(m: DriftModel) = {
      val toks = Seq("a", "b", "c")
      val s = DriftState(
        toks.filter(m.ppm.contains).groupBy(identity)
          .map { case (k, v) => k -> v.size.toLong },
        toks.count(t => !m.ppm.contains(t)).toLong, 3L)
      val w = StreamingDrift.finishWindow(0L, s, m)
      (w.n_tokens, w.oov_ppm, w.l1_ppm)
    }
    assert(underA == replay(mA), s"$underA vs ${replay(mA)}")
    assert(underB == replay(mB), s"$underB vs ${replay(mB)}")
    assert(underA != underB, "refit must change the reported drift")
  }

  test("streamed drift matches a local replay across micro-batch splits; state bounded per window") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val model = StreamingDrift.fit(Tables(spark, sf).documents)

    // two one-hour windows fed across THREE micro-batches, splitting
    // window 10:00 mid-way — counts must merge across batches
    val rowsW1 = Seq(
      (ts("2024-01-01 10:05:00"), "the cat sat"),
      (ts("2024-01-01 10:15:00"), "qqqxyz1 qqqxyz2"), // OOV-heavy
      (ts("2024-01-01 10:45:00"), "the dog ran"))
    val rowsW2 = Seq(
      (ts("2024-01-01 11:10:00"), "the the the"),
      (ts("2024-01-01 11:20:00"), "entirely qqqnovel tokens"))
    val mem = MemoryStream[(Timestamp, String)]
    val q = StreamingDrift.driftStream(
        mem.toDF().toDF("ts", "text"), model, windowMinutes = 60,
        delay = "30 minutes")
      .writeStream.format("memory").queryName("drift_stream")
      .outputMode(OutputMode.Append()).start()
    mem.addData(rowsW1.take(2): _*); q.processAllAvailable()
    mem.addData(rowsW1.drop(2) ++ rowsW2: _*); q.processAllAvailable()
    // advance the watermark far past both windows to close them
    mem.addData((ts("2024-01-01 14:00:00"), "flush")); q.processAllAvailable()
    val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
    q.stop()

    val got = spark.table("drift_stream").collect()
      .map(r => r.getTimestamp(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getLong(5))).toMap
    // local replay of both windows (same tokenization: split on ' ')
    def replay(rows: Seq[(Timestamp, String)], winStart: String) = {
      val toks = rows.flatMap(_._2.toLowerCase.split(" ", -1))
      val inVocab = toks.filter(model.ppm.contains)
      val s = DriftState(
        inVocab.groupBy(identity).map { case (k, v) => k -> v.size.toLong },
        toks.count(t => !model.ppm.contains(t)).toLong, toks.size.toLong)
      val w = StreamingDrift.finishWindow(ts(winStart).getTime, s, model)
      (w.n_tokens, w.oov_ppm, w.l1_ppm, w.top_term, w.top_d_ppm)
    }
    assert(got.size == 2, got.toString)
    assert(got(ts("2024-01-01 10:00:00")) == replay(rowsW1, "2024-01-01 10:00:00"))
    assert(got(ts("2024-01-01 11:00:00")) == replay(rowsW2, "2024-01-01 11:00:00"))
    // state: one row per in-flight window, never per term/doc
    assert(stateRows <= 2, s"state must be per-window, got $stateRows")

    // the reference-shaped window must drift LESS than the OOV-heavy
    // one: score orders windows by distribution distance
    val l1w1 = got(ts("2024-01-01 10:00:00"))._3
    val l1w2 = got(ts("2024-01-01 11:00:00"))._3
    assert(l1w1 > 0 && l1w2 > 0)
  }
}
