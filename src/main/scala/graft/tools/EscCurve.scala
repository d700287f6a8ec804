package graft.tools

import org.apache.spark.sql.functions._

/** Cost-vs-flag-fraction curve of the escalated margin miner at
  * blow-up scale — the measurement the §17.7 r11 correction calls
  * for: all-flagged escalation costs ≈ one wide pass plus the loop's
  * fixed jobs (measured 1.06× flat-wide at 2048×), so the op's payoff
  * must come from SPARSE flags, and `escalateEps` controls the flag
  * band directly. This drive times marginAlignIvf at nProbe=8 →
  * escalateNProbe=16 across a ladder of eps values (each run reports
  * its own flagged fraction) against the flat nProbe=16 miner and the
  * un-escalated nProbe=8 base on the same session index — the esc(f)
  * cost curve on the real operator, same corpus, same session.
  *
  * (Precision is NOT the subject here — on replica-family geometry
  * narrow flags don't recover wide precision; MarginDriftCheck owns
  * that axis. This measures what escalation COSTS as the flag rate
  * falls, which is what decides wide-vs-escalate for a deployment
  * whose low_headroom stats say flags are sparse.)
  *
  * `factor > 1` (3rd arg) runs the curve on PLANTED healthy-margin
  * geometry instead of the dir's own rows — PlantGeom's
  * distinctly-best-partner construction (the MarginDriftCheck plant
  * regime), where flags are sparse BY GEOMETRY rather than a replica
  * tie field: the cost curve on the corpus shape a deployment whose
  * low_headroom stats stay quiet actually has.
  *
  * `probeReps` (5th arg) scales the planted mode's probe VOLUME
  * (PlantGeom probe copies, each keeping its planted partner): the
  * construction otherwise pins probes to base/10 = 200, which leaves
  * every arm bound by the loop's per-job fixed cost rather than
  * kernel work — the regime the sf-floor story already covers.
  *
  * `partnerTighten` (6th arg, plant mode) divides the planted
  * partner's amplitude — required for HEALTHY margin geometry at big
  * factors (the r13 MarginDriftCheck pin: 2048× needs ≈2; raising
  * jitter instead is measured wrong — see PlantGeom.frame).
  *
  * Usage: EscCurve <dir> [eps,eps,...=0.05,0.01,0.002]
  *          [factor=1] [jitter=0.2] [probeReps=1] [partnerTighten=1]
  */
object EscCurve {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val epss = args.lift(1).getOrElse("0.05,0.01,0.002")
      .split(',').map(_.toDouble).toSeq
    val factor = args.lift(2).map(_.toInt).getOrElse(1)
    val jitter = args.lift(3).map(_.toDouble).getOrElse(0.2)
    val probeReps = args.lift(4).map(_.toInt).getOrElse(1)
    val partnerTighten = args.lift(5).map(_.toDouble).getOrElse(1.0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.local(cpus, "graft-esc-curve")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTITIONS",
      math.max(cpus, 512).toString)
    spark.conf.set("spark.sql.shuffle.partitions", parts)

    val plant = factor > 1
    // plant mode writes a factor×corpus parquet fixture — delete it on
    // the way out (the SpillCheck try/finally pattern; repeated curve
    // runs would otherwise accumulate GBs in /tmp)
    var plantDir: Option[java.nio.file.Path] = None
    try {
    val emb =
      if (!plant) graft.Tables(spark, dir).embeddings
      else {
        // planted healthy geometry at a blow octave (shift 0.1 = the
        // config MarginDriftCheck evidences as healthy: 64× plant
        // recall 0.9551, zero cross-family), written to PARQUET once
        // at setup: the arms clearCache() (no cross-arm flattery),
        // so an in-memory construction would re-run its 4.1M-row
        // crossJoin lineage at EVERY consumer — and the esc arm has
        // more consumers (targets ×2, probes ×2, pframe ×2) than the
        // wide arm, biasing the comparison. A file-backed corpus
        // re-scans cheaply and matches the replica-family curve's
        // conditions (measured: the fixture re-runs inflated esc
        // arms ~2× while wide moved little)
        val pdir = {
          val p = java.nio.file.Files.createTempDirectory("graft-esc-plant")
          plantDir = Some(p)
          p.toString
        }
        PlantGeom.frame(
            graft.Tables(spark, dir).embeddings
              .select(col("vec_id"), col("embedding")),
            shift = 0.1, factor = factor, jitter = jitter, plant = true,
            probeReps = probeReps, partnerTighten = partnerTighten)
          .repartition(cpus * 4)
          .write.mode("overwrite").parquet(s"$pdir/embeddings.parquet")
        val f = spark.read.parquet(s"$pdir/embeddings.parquet")
        println(s"[esccurve] planted geometry: ${f.count()} rows" +
          s" (factor=$factor jitter=$jitter probeReps=$probeReps" +
          s" partnerTighten=$partnerTighten, file-backed at $pdir)")
        f
      }
    val probeF =
      if (plant) PlantGeom.probeFilter else col("vec_id") % 10 === 0
    val targetF =
      if (plant) PlantGeom.targetFilter(plant = true)
      else col("vec_id") % 2 === 1
    // plant mode indexes the TARGETS only (the MarginDriftCheck
    // pattern): with probeReps the probe copies form a dense
    // cos≈0.997 cluster, and a full-frame index lets that cluster
    // eat every probe's nProbe cells AND its top-m candidate budget
    // before the target filter (measured: the wide pass's entire
    // top-32 was probe clones — wide emits starved to 134/40k and
    // escalation could never drop a pair). The registry's own _ivf
    // queries keep the full-emb index: their probes are corpus
    // members, not clones, and self-exclusion handles the identity
    // case.
    val idx =
      if (plant) graft.sources.AnnIndexCache.dirFor(emb.filter(targetF),
        s"$dir#embeddings#plant#f=$factor#j=$jitter#p=$probeReps" +
          s"#t=$partnerTighten#targets")
      else graft.sources.AnnIndexCache.dirFor(emb, s"$dir#embeddings")
    // ONE threshold for the timed arms AND the flagged-fraction probe
    // (ADVICE r11): hardcoding 1.02 in the probe while the arms ride
    // marginAlignIvf's default would silently diverge if the default
    // ever moves — pass it explicitly everywhere
    val marginMin = 1.02

    // df MUST be by-name: marginAlignIvf's construction runs the
    // eager index-probe kernel (IvfIndex.topK localCheckpoints), so a
    // strict parameter would evaluate the dominant cost OUTSIDE the
    // timer (the first cut of this tool did exactly that and timed
    // only the post-kernel tail — 21 s for a 200+ s arm)
    def time(label: String)(df: => org.apache.spark.sql.DataFrame)
        : (Double, Long) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val d = df
      d.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      val n = d.count()
      println(f"[esccurve] $label%-28s $s%8.1f s  ($n emitted)")
      Console.flush()
      (s, n)
    }

    // warm the session index once so every arm pays probe cost only
    graft.sources.IvfIndex.topK(spark, idx, emb.filter(probeF).limit(1),
      k = 1, nProbe = 1).count()

    val (wideS, wideN) = time("flat nProbe=16") {
      graft.operators.Similarity.marginAlignIvf(
        emb, probeF, targetF, idx, marginMin = marginMin, nProbe = 16)
    }
    val (baseS, _) = time("base nProbe=8 (no esc)") {
      graft.operators.Similarity.marginAlignIvf(
        emb, probeF, targetF, idx, marginMin = marginMin, nProbe = 8)
    }
    // flagged fraction per eps, off ONE base pass (each eps is just a
    // threshold over the same margins — re-deriving the base per arm
    // cost ~260 s of untimed kernel per eps at 2048×)
    val fracRow = graft.operators.Similarity.marginAlignIvf(
        emb, probeF, targetF, idx, marginMin = marginMin, nProbe = 8)
      .agg(count(lit(1)), epss.map(eps =>
        sum(when(col("margin") < lit(marginMin + eps), 1L).otherwise(0L))): _*)
      .head()
    val fracs = epss.indices.map { i =>
      if (fracRow.getLong(0) == 0) 0.0
      else fracRow.getLong(i + 1).toDouble / fracRow.getLong(0)
    }
    epss.zip(fracs).foreach { case (eps, frac) =>
      val (escS, escN) = time(f"esc 8->16 eps=$eps%.3f") {
        graft.operators.Similarity.marginAlignIvf(emb, probeF, targetF, idx,
          marginMin = marginMin, nProbe = 8, escalateNProbe = 16,
          escalateEps = eps)
      }
      println(f"[esccurve]   eps=$eps%.3f flagged=$frac%.3f" +
        f" esc/wide=${escS / wideS}%.2f base/wide=${baseS / wideS}%.2f" +
        f" emitted $escN vs wide $wideN")
      Console.flush()
    }
    } finally {
      spark.stop()
      plantDir.foreach { p =>
        java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(x => java.nio.file.Files.deleteIfExists(x))
      }
    }
  }
}
