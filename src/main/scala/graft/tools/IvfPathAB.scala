package graft.tools

import org.apache.spark.sql.functions._

/** A/B of IvfIndex.topK's two probe-side join strategies (the
  * `graft.ivf.probePath` hook) at a given workload — the measurement
  * behind the path gate. The broadcast path pays the ~1 µs/row
  * TypedImperativeAggregate boundary on EVERY probes×cellSize
  * candidate row; the kernel path pays a pinned-width exchange of the
  * probed code slice + probes. The bytes-only gate (can we broadcast
  * the probe frame?) answers feasibility, not which path is FASTER —
  * a moderate probe frame over fat cells (40k probes × 8 cells ×
  * 1.4k-row cells ≈ 460M candidate rows at 64 MB of probe bytes)
  * rides broadcast and loses 2.6× (measured, r12 planted curve).
  *
  * Usage:
  *   IvfPathAB table <dir> <everyNth> <nProbe>          — index on full emb
  *   IvfPathAB plant <dir> <factor> <jitter> <probeReps> <nProbe> [indexDir]
  */
object IvfPathAB {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val dir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.local(cpus, "graft-ivf-path-ab")
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_PARTITIONS",
        math.max(cpus, 64).toString))

    val (probes, idx, nProbe) = mode match {
      case "table" =>
        val everyNth = args(2).toInt
        val nP = args(3).toInt
        val emb = graft.Tables(spark, dir).embeddings
        val i = graft.sources.AnnIndexCache.dirFor(emb, s"$dir#embeddings")
        (emb.filter(col("vec_id") % everyNth === 0), i, nP)
      case "plant" =>
        val factor = args(2).toInt
        val jitter = args(3).toDouble
        val probeReps = args(4).toInt
        val nP = args(5).toInt
        val frame = PlantGeom.frame(
            graft.Tables(spark, dir).embeddings
              .select(col("vec_id"), col("embedding")),
            shift = 0.1, factor = factor, jitter = jitter, plant = true,
            probeReps = probeReps)
          .repartition(cpus * 4)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        frame.count()
        val i = args.lift(6).getOrElse(
          graft.sources.AnnIndexCache.dirFor(
            frame.filter(PlantGeom.targetFilter(plant = true)),
            s"$dir#embeddings#plant#f=$factor#j=$jitter#p=$probeReps#targets"))
        (frame.filter(PlantGeom.probeFilter), i, nP)
      case other => sys.error(s"unknown mode $other")
    }
    val probesP = probes
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nProbes = probesP.count()
    val nCells = spark.read.parquet(s"$idx/codes.parquet")
      .select("cell").distinct().count()
    val nCodes = spark.read.parquet(s"$idx/codes.parquet").count()
    println(f"[ivfab] $nProbes probes, nProbe=$nProbe, index $nCodes rows" +
      f" / $nCells cells (≈${nProbes * nProbe * (nCodes / nCells) / 1e6}%.1f M" +
      " candidate rows)")

    def run(path: String): Double = {
      sys.props("graft.ivf.probePath") = path
      try {
        // probesP stays persisted for BOTH paths (equal footing);
        // interleaved min-of-2 below absorbs page-cache warm-up
        val t0 = System.nanoTime()
        graft.sources.IvfIndex.topK(spark, idx, probesP, k = 32,
          nProbe = nProbe).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } finally sys.props.remove("graft.ivf.probePath")
    }
    // interleave two rounds per path; report mins
    val r1 = Seq("broadcast" -> run("broadcast"), "kernel" -> run("kernel"))
    val r2 = Seq("broadcast" -> run("broadcast"), "kernel" -> run("kernel"))
    val best = (r1 ++ r2).groupBy(_._1).map { case (k, v) =>
      k -> v.map(_._2).min }
    println(f"[ivfab] broadcast ${best("broadcast")}%.1f s" +
      f" vs kernel ${best("kernel")}%.1f s" +
      f" (kernel/broadcast ${best("kernel") / best("broadcast")}%.2f)")
    spark.stop()
  }
}
