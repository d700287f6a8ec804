package graft.tools

import org.apache.spark.sql.functions._

/** Row-level follow-up to [[EscDebug]]: for a handful of flagged
  * probes the wide pass DROPS but escalation keeps, dump the top-k
  * (neighbor, cos) lists of the base (nProbe=8), wide (nProbe=16) and
  * incremental (excludeNProbe=8) index scans — the three candidate
  * pools whose union/top-2 disagreement is under diagnosis.
  *
  * Usage: EscDebug2 <dir> <factor> <jitter> <probeReps> <indexDir>
  */
object EscDebug2 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val factor = args(1).toInt
    val jitter = args(2).toDouble
    val probeReps = args(3).toInt
    val idx = args(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.local(cpus, "graft-esc-debug2")
    spark.conf.set("spark.sql.shuffle.partitions", "64")

    val emb = PlantGeom.frame(
        graft.Tables(spark, dir).embeddings
          .select(col("vec_id"), col("embedding")),
        shift = 0.1, factor = factor, jitter = jitter, plant = true,
        probeReps = probeReps)
      .repartition(cpus * 4)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    emb.count()
    val probeF = PlantGeom.probeFilter
    val targetF = PlantGeom.targetFilter(plant = true)
    val marginMin = 1.02

    val base = graft.operators.Similarity.marginAlignIvf(
        emb, probeF, targetF, idx, marginMin = marginMin, nProbe = 8)
      .select("probe_id", "match_id", "margin").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val wide = graft.operators.Similarity.marginAlignIvf(
        emb, probeF, targetF, idx, marginMin = marginMin, nProbe = 16)
      .select("probe_id").collect().map(_.getLong(0)).toSet
    val sample = base.filter { case (p, (_, m)) =>
      m < marginMin + 0.01 && !wide.contains(p) }.keys.take(3).toSeq
    println(s"[escdbg2] sample flagged+wide-dropped probes: " +
      sample.mkString(","))

    val probes = emb.filter(probeF)
      .filter(col("vec_id").isin(sample.map(Long.box): _*))
    def dump(label: String, nProbe: Int, excl: Int): Unit = {
      val rows = graft.sources.IvfIndex.topK(spark, idx, probes,
          k = 32, nProbe = nProbe, excludeNProbe = excl)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3)))
      sample.foreach { p =>
        val mine = rows.filter(_._1 == p).sortBy(_._2).take(6)
          .map(t => s"${t._3}:${t._4}").mkString(" ")
        println(s"[escdbg2] $label probe $p: $mine")
      }
    }
    dump("base8 ", 8, 0)
    dump("wide16", 16, 0)
    dump("incr  ", 16, 8)
    sample.foreach(p => println(s"[escdbg2] verdict probe $p:" +
      s" base=${base.get(p)}"))
    spark.stop()
  }
}
