package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared synthetic-geometry construction for the margin-family
  * drives (MarginDriftCheck, EscCurve): a structured replica blow-up
  * of a base embeddings table plus a drifted probe frame. Extracted
  * so the escalation cost curve can run on the SAME planted
  * healthy-margin geometry the drift drive evidences (§17.3/§17.7)
  * instead of duplicating the construction.
  *
  * Geometry knobs (full story in [[MarginDriftCheck]]'s scaladoc):
  * `jitter` is the cluster-separation amplitude; `plant=true` gives
  * every 10th base's rep-1 member a near-duplicate jitter — the
  * planted distinctly-best partner that produces real margin
  * headroom (the healthy deployment regime; any plain replica family
  * is a top-2 tie field by construction).
  */
object PlantGeom {

  /** Probe ids live ABOVE every possible replica id (vec_id +
    * rep·1e7): at 1e9 the encoding broke for factor > 100 — replicas
    * 100+ classified as probes (measured at 128×: the "exact" miner
    * saw 32,350 probes instead of 200) — so the base sits at 1e12
    * with the floor asserted in [[frame]].
    */
  val ProbeBase = 1000000000000L

  /** (replicated corpus ∪ shifted probes). Probes are rep-0 vectors
    * of every 10th base, shifted +`shift` on odd coordinates
    * (deterministic, norm-changing — probe geometry off the fitted
    * centroids), re-keyed at ProbeBase. Caller repartitions and
    * persists (the drive-fixture rule: the blow-up descends from a
    * broadcast crossJoin — ONE input split without it).
    *
    * `probeReps > 1` (plant mode only) replicates each probe with a
    * tiny deterministic jitter (the planted partner's own amplitude,
    * jitter/200) — every copy keeps the SAME distinctly-best partner,
    * so the geometry stays the evidenced plant regime while the probe
    * VOLUME scales to deployment shape (the construction pins probe
    * count to base/10 otherwise, which leaves a cost drive bound by
    * per-job fixed cost instead of kernel work). Copy ids stack at
    * ProbeBase + pr·1e9 + vec_id.
    *
    * `partnerTighten > 1` (plant mode only) divides the planted
    * partner's OWN amplitude (jitter/200 otherwise) — the factor-
    * scaling knob the r13 drives evidenced: margin headroom at big
    * factors compresses because the min-of-(factor−1) sibling
    * displacement falls (extreme-value), and the §12h hypothesis of
    * RAISING jitter with log(factor) is measured WRONG on unit-norm
    * embeddings (family noise norm ≈ 4.7·jitter: at jitter 0.37 the
    * corpus is noise-dominated and IVF's fitted cells lose the family
    * structure — 2048×: recall 0.75, 30 cross-family emits, vs 0.94 /
    * 1 at jitter 0.2). Tightening the PARTNER instead raises every
    * probe's true-best cosine without adding noise energy, restoring
    * headroom against the compressed sibling field. Default 1.0 keeps
    * the evidenced 64× construction bit-identical.
    */
  def frame(base: DataFrame, shift: Double, factor: Int,
      jitter: Double, plant: Boolean, probeReps: Int = 1,
      partnerTighten: Double = 1.0): DataFrame = {
    require(!plant || factor > 1, "plant mode needs a blow-up factor")
    require(probeReps == 1 || plant, "probeReps needs plant mode")
    require(partnerTighten == 1.0 || plant, "partnerTighten needs plant mode")
    require(partnerTighten >= 1.0, "partnerTighten only tightens")
    require(factor.toLong * 10000000L + 10000000L < ProbeBase,
      s"factor $factor overflows the replica id space under ProbeBase")
    require(probeReps.toLong * 1000000000L + 10000000L < ProbeBase,
      s"probeReps $probeReps overflows the probe-copy id space")
    val spark = base.sparkSession
    val emb =
      if (factor <= 1) base
      else {
        val reps = spark.range(0, factor.toLong).select(col("id").as("rep"))
        // plant mode: probe bases' rep-1 member keeps near-duplicate
        // jitter — the planted distinctly-best partner; everyone else
        // spreads at full jitter
        val amp =
          if (!plant) lit((jitter / 20.0).toFloat)
          else when(col("vec_id") % 10 === 0 && col("rep") === 1,
            lit((jitter / 200.0 / partnerTighten).toFloat))
            .otherwise(lit((jitter / 20.0).toFloat))
        base.crossJoin(reps).select(
          (col("vec_id") + col("rep") * 10000000L).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x + (pmod(hash(col("vec_id"), col("rep"), i), lit(41)) - lit(20))
              .cast("float") * amp).as("embedding"))
      }
    val probes0 = emb.filter(
        if (plant) col("vec_id") < 10000000L && col("vec_id") % 10 === 0
        else col("vec_id") % 10 === 0)
      .select((col("vec_id") + ProbeBase).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x + when(i % 2 === 1, lit(shift.toFloat)).otherwise(lit(0f)))
          .as("embedding"))
    val probes =
      if (probeReps <= 1) probes0
      else {
        val prs = spark.range(0, probeReps.toLong).select(col("id").as("pr"))
        probes0.crossJoin(prs).select(
          (col("vec_id") + col("pr") * 1000000000L).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x + (pmod(hash(col("vec_id"), col("pr"), i), lit(41)) - lit(20))
              .cast("float") * lit((jitter / 200.0).toFloat))
            .as("embedding"))
      }
    emb.unionAll(probes)
  }

  /** The probe/target filters matching [[frame]]'s id encoding. */
  def probeFilter = col("vec_id") >= ProbeBase
  def targetFilter(plant: Boolean) =
    if (plant) col("vec_id") < ProbeBase && col("vec_id") >= 10000000L
    else col("vec_id") < ProbeBase && col("vec_id") % 2 === 1
}
