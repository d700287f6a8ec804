package graft.tools

import org.apache.spark.sql.functions._

/** Diagnostic for the escalated margin miner on planted geometry:
  * reconstructs an EscCurve planted frame, probes an EXISTING index
  * dir, and reports where the escalation pipeline's rows go — base /
  * wide / escalated verdict counts, the flagged set, the
  * incremental (excludeNProbe) candidate volume, and per-probe
  * verdict agreement between esc and wide on the flagged subset.
  *
  * Usage: EscDebug <dir> <factor> <jitter> <probeReps> <indexDir> [eps]
  */
object EscDebug {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val factor = args(1).toInt
    val jitter = args(2).toDouble
    val probeReps = args(3).toInt
    val idx = args(4)
    val eps = args.lift(5).map(_.toDouble).getOrElse(0.01)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.local(cpus, "graft-esc-debug")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTITIONS",
      math.max(cpus, 512).toString)
    spark.conf.set("spark.sql.shuffle.partitions", parts)

    val emb = PlantGeom.frame(
        graft.Tables(spark, dir).embeddings
          .select(col("vec_id"), col("embedding")),
        shift = 0.1, factor = factor, jitter = jitter, plant = true,
        probeReps = probeReps)
      .repartition(cpus * 4)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[escdbg] frame ${emb.count()} rows; index $idx")
    val probeF = PlantGeom.probeFilter
    val targetF = PlantGeom.targetFilter(plant = true)
    val marginMin = 1.02

    def verdicts(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "match_id", "margin").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val base = verdicts(graft.operators.Similarity.marginAlignIvf(
      emb, probeF, targetF, idx, marginMin = marginMin, nProbe = 8))
    println(s"[escdbg] base nProbe=8: ${base.size} emitted")
    val wide = verdicts(graft.operators.Similarity.marginAlignIvf(
      emb, probeF, targetF, idx, marginMin = marginMin, nProbe = 16))
    println(s"[escdbg] wide nProbe=16: ${wide.size} emitted")

    val flaggedIds = base.filter(_._2._2 < marginMin + eps).keySet
    println(s"[escdbg] flagged at eps=$eps: ${flaggedIds.size} of ${base.size}")

    // the incremental candidate volume the escalated pass actually
    // sees: new-cells-only topK for the flagged probes
    val escProbes = emb.filter(probeF)
      .filter(col("vec_id").isin(flaggedIds.toSeq.map(Long.box): _*))
    val incr = graft.sources.IvfIndex.topK(spark, idx, escProbes,
      k = 32, nProbe = 16, excludeNProbe = 8)
    val incrN = incr.count()
    val incrProbes = incr.select("probe_id").distinct().count()
    println(s"[escdbg] incremental candidates: $incrN rows over" +
      s" $incrProbes of ${flaggedIds.size} flagged probes")

    val esc = verdicts(graft.operators.Similarity.marginAlignIvf(
      emb, probeF, targetF, idx, marginMin = marginMin, nProbe = 8,
      escalateNProbe = 16, escalateEps = eps))
    println(s"[escdbg] esc 8->16: ${esc.size} emitted")

    val flaggedKeptSame = flaggedIds.count(p =>
      esc.get(p).map(_._1) == base.get(p).map(_._1))
    val flaggedDropped = flaggedIds.count(p => !esc.contains(p))
    val flaggedWideAgree = flaggedIds.count(p =>
      esc.get(p).map(_._1) == wide.get(p).map(_._1))
    val flaggedInWide = flaggedIds.count(wide.contains)
    println(s"[escdbg] flagged: keptSameAsBase=$flaggedKeptSame" +
      s" dropped=$flaggedDropped agreeWithWide=$flaggedWideAgree" +
      s" presentInWide=$flaggedInWide")
    // margin movement on flagged emits that survived
    val moved = flaggedIds.toSeq.flatMap(p =>
      for { b <- base.get(p); e <- esc.get(p) } yield math.abs(b._2 - e._2))
    if (moved.nonEmpty)
      println(f"[escdbg] flagged margin |delta|: mean ${
        moved.sum / moved.size}%.6f max ${moved.max}%.6f")
    spark.stop()
  }
}
