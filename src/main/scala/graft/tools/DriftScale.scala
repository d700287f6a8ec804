package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Throughput/state drive of the streaming drift monitor at blow-up
  * scale: fit the reference distribution offline (the deployment
  * premise), then stream the blow-up corpus through driftStream with
  * synthetic event times spreading docs across `windows` tumbling
  * hours, in replica-sized micro-batches. The numbers to watch:
  *
  *  - per-batch wall stays flat (state is bounded by the MODEL vocab
  *    per in-flight window, never by the stream),
  *  - state rows ≤ in-flight windows (one row per window — the spec's
  *    bound, re-checked here at volume),
  *  - fit-on-self → low L1 per window (every window is a uniform
  *    sample of the fit corpus); fit on the BASE corpus while
  *    streaming a TAGGED blow-up → the replica tag tokens are OOV and
  *    every window reports the drift loudly — out-of-distribution
  *    detection working, the QualityStreamScale sanity pattern.
  *
  * Usage: DriftScale <blowUpDir> [fitDir=<blowUpDir>] [batches=16] [windows=8]
  */
object DriftScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val fitDir = args.lift(1).getOrElse(dir)
    val nBatches = args.lift(2).map(_.toInt).getOrElse(16)
    val nWindows = args.lift(3).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.local(cpus, "graft-drift-scale")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val tFit0 = System.nanoTime()
    // blow-up vocabularies carry per-replica tag tokens (linear in the
    // factor), so the drive raises the deployable-artifact cap — the
    // cap's job is refusing SILENT unboundedness, and here it's loud
    val model = graft.streaming.StreamingDrift.fit(
      graft.Tables(spark, fitDir).documents, maxVocab = 50L * 1000 * 1000)
    println(f"[drift] fit on $fitDir: vocab=${model.ppm.size}," +
      f" ${(System.nanoTime() - tFit0) / 1e9}%.1f s")

    require(nBatches % nWindows == 0,
      s"batches=$nBatches must be a multiple of windows=$nWindows so " +
        "event time is non-decreasing across batches")
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val docs = graft.Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count()
    // the ground truth for the no-silent-drop assertion below: total
    // tokens under the monitor's exact tokenization
    val nTokens = docs.select(explode(graft.functions.TextFns.words(
      lower(col("text")))).as("t")).count()
    println(s"[drift] streaming $nDocs docs ($nTokens tokens) over" +
      s" $nWindows windows in $nBatches micro-batches")

    val source = MemoryStream[(Timestamp, String)]
    val query = graft.streaming.StreamingDrift.driftStream(
        source.toDF().toDF("ts", "text"), model,
        windowMinutes = 60, delay = "10 minutes")
      .writeStream.format("memory").queryName("drift_out")
      .outputMode("append").start()

    val t0 = System.nanoTime()
    var maxState = 0L
    // Window index derives from the BATCH index, not doc_id: batch b
    // feeds window b/batchesPerWindow, so event time never decreases
    // across batches and no window is re-fed after the watermark
    // closed it (the round-7 drive windowed by doc_id % nWindows and
    // silently dropped the second half of the corpus as late data).
    // Each window still merges batchesPerWindow batches — the
    // cross-batch state-merge claim is exercised — and consecutive
    // batches within a window occupy staggered sub-slots whose gap
    // (slotMs/3 ≥ the 10 min delay at the defaults) keeps every row
    // at-or-above the watermark left by the previous batch.
    val batchesPerWindow = nBatches / nWindows
    val windowMs = 3600000L
    val slotMs = windowMs / batchesPerWindow
    val spreadS = math.max(slotMs * 2 / 3 / 1000L, 1L)
    (0 until nBatches).foreach { b =>
      val tb = System.nanoTime()
      val w = b / batchesPerWindow
      val slot = b % batchesPerWindow
      val batch = docs.filter(pmod(col("doc_id"), lit(nBatches)) === b)
        .collect().map { r =>
          val id = r.getLong(0)
          val ts = new Timestamp(base + w * windowMs + slot * slotMs
            + (id % spreadS) * 1000L)
          (ts, r.getString(1))
        }
      source.addData(batch.toSeq: _*)
      query.processAllAvailable()
      maxState = math.max(maxState,
        query.lastProgress.stateOperators(0).numRowsTotal)
      if ((b + 1) % 4 == 0)
        println(f"[drift] batch ${b + 1}%3d: ${batch.length} docs," +
          f" ${(System.nanoTime() - tb) / 1e9}%.2f s, state=$maxState")
      Console.flush()
    }
    // close every window
    source.addData((new Timestamp(base + (nWindows + 24) * 3600000L), "flush"))
    query.processAllAvailable()
    val secs = (System.nanoTime() - t0) / 1e9
    val out = spark.table("drift_out")
      .orderBy("window_start").collect()
    query.stop()
    out.foreach { r =>
      println(f"[drift] window ${r.getTimestamp(0)}: n=${r.getLong(1)}" +
        f" oov_ppm=${r.getLong(2)} l1_ppm=${r.getLong(3)}" +
        f" top=${r.getString(4)}(${r.getLong(5)})")
    }
    require(out.length == nWindows,
      s"expected $nWindows closed windows, got ${out.length}")
    val emittedTokens = out.map(_.getLong(1)).sum
    require(emittedTokens == nTokens,
      s"emitted window token counts sum to $emittedTokens but the " +
        s"corpus has $nTokens — rows were silently dropped as late")
    require(maxState <= nWindows + 1,
      s"state must be one row per in-flight window, saw $maxState")
    println(f"[drift] $nDocs docs / $secs%.1f s" +
      f" (${nDocs / secs}%.0f docs/s/$cpus-core), max state rows $maxState")
  }
}
