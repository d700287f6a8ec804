package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Blow-up-scale drive for EventStream.heavyHitters (the streaming
  * SpaceSaving summary): streams one event per blow-up document
  * (≥320k events, one micro-batch per replica-minute) with a
  * heavy/tail item split — every ~10th document contributes a UNIQUE
  * tail item (tens of thousands of distinct keys), the rest their
  * source domain (the head) — and asserts at scale what the spec
  * pins at toy scale:
  *
  *  1. STATE: the state store holds ≤ in-flight-windows rows (the
  *     whole point — an exact windowed count would key state by item
  *     and hold every distinct key);
  *  2. GUARANTEE: every item with true count > N/capacity appears in
  *     the emitted summary, with est−err ≤ true ≤ est (checked
  *     against an exact batch groupBy of the same events).
  *
  * Usage: HHScale <blowUpDir> [capacity=32]
  */
object HHScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val capacity = args.lift(1).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.local(cpus, "graft-hh-scale")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = graft.Tables(spark, dir).documents
      .select(col("doc_id"), col("source"),
        (col("doc_id") / 10000000L).cast("long").as("rep"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count()
    val reps = docs.select(max(col("rep"))).head().getLong(0).toInt + 1
    // one replica = one minute; the guarantee check below compares
    // ALL-replica truth against the FIRST 120-minute window's summary,
    // which is only sound while every replica-minute lands in it
    require(reps <= 120,
      s"$reps replicas spill past the single 120-minute window the " +
        "guarantee check reads — use a smaller blow-up factor")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime

    // (ts, item): minute = replica; every 10th doc is a unique tail key
    def eventsOfRep(r: Int): Array[(java.sql.Timestamp, String)] =
      docs.filter(col("rep") === r)
        .select(col("doc_id"), col("source")).collect()
        .map { row =>
          val id = row.getLong(0)
          val item = if (id % 10 == 0) s"tail$id" else row.getString(1)
          (new java.sql.Timestamp(base + r * 60000L), item)
        }

    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val q = graft.streaming.EventStream.heavyHitters(
        mem.toDF().toDF("ts", "item"), "item",
        capacity = capacity, windowMinutes = 120, delay = "180 minutes")
      .writeStream.format("memory").queryName("hh_scale")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    val t0 = System.nanoTime()
    var fed = 0L
    (0 until reps).foreach { r =>
      val evs = eventsOfRep(r)
      fed += evs.length
      mem.addData(evs.toSeq: _*)
      q.processAllAvailable()
    }
    val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
    // close the window
    mem.addData((new java.sql.Timestamp(base + 999 * 60000L), "closer"))
    q.processAllAvailable()
    val secs = (System.nanoTime() - t0) / 1e9
    q.stop()

    val out = spark.table("hh_scale")
      .filter(col("window_start") === new java.sql.Timestamp(base))
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    val truth = (0 until reps).iterator.flatMap(eventsOfRep).toSeq
      .groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val distinctItems = truth.size
    println(f"[hh] $fed events, $distinctItems distinct items, " +
      f"capacity $capacity, ${secs}%.1f s, state rows (pre-close) $stateRows")

    require(stateRows <= 2,
      s"state must be per-window, not per-item: $stateRows rows")
    require(out.size <= capacity, s"summary over capacity: ${out.size}")
    val guaranteed = truth.filter(_._2 > fed / capacity)
    val missing = guaranteed.keys.filterNot(out.contains).toSeq
    require(missing.isEmpty, s"guaranteed items missing: $missing")
    out.foreach { case (item, (est, err)) =>
      val t = truth.getOrElse(item, 0L)
      require(t <= est && est - err <= t, s"$item est=$est err=$err true=$t")
    }
    println(s"[hh] guarantee held for ${guaranteed.size} heavy items; " +
      s"summary ${out.size} counters vs $distinctItems exact keys")
    spark.stop()
  }
}
