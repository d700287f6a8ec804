package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {

  test("consistent sample is stable across partitionings and runs") {
    val docs = Tables(spark, sf).documents
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.consistentSample(df, Seq("lang"), "doc_id", 5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(docs)
    val b = ids(docs.repartition(13))
    val c = ids(docs.coalesce(1))
    assert(a == b && b == c)
    assert(a.size <= 5 * 5) // ≤ k per language
  }

  test("consistent sample membership is independent of the rest of the group") {
    // union-compatibility: a doc sampled from a SUBSET stays sampled
    // when the subset grows only if its hash still ranks in bottom-k —
    // but fraction-based membership never changes with group content
    val docs = Tables(spark, sf).documents
    val full = Sampling.consistentFraction(docs, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val half = Sampling.consistentFraction(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(half == full.filter(_ % 2 == 0))
    // fraction lands near the target on uniform hashes
    val frac = full.size.toDouble / docs.count()
    assert(frac > 0.2 && frac < 0.4, s"got $frac")
  }

  test("mix sample honors per-domain quota bounds and is partition-stable") {
    val docs = Tables(spark, sf).documents
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.mixSample(df, "source", "doc_id", totalTarget = 100,
          minQuota = 1, maxQuota = 25)
        .select("source", "doc_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    val a = run(docs)
    assert(a == run(docs.repartition(17)))
    // every domain respects [min, cap] and no domain exceeds its size
    val perDomain = a.groupBy(_._1).view.mapValues(_.size).toMap
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perDomain.foreach { case (d, k) =>
      assert(k >= 1 && k <= 25, s"$d quota $k")
      assert(k <= sizes(d), s"$d sampled $k of ${sizes(d)}")
    }
    // dominant domains are flattened by the cap: sampled share of the
    // biggest domain is below its population share when capped
    val (bigDom, bigN) = sizes.maxBy(_._2)
    if (100.0 * bigN / sizes.values.sum > 25)
      assert(perDomain(bigDom) == 25)
  }

  test("holdout split is stable under corpus rewrites and near target fractions") {
    import graft.operators.Sampling
    val docs = Tables(spark, sf).documents
    val full = Sampling.holdoutSplit(docs, "doc_id", 0.05, 0.05)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // a doc's split never depends on what else is in the corpus
    val half = Sampling.holdoutSplit(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", 0.05, 0.05)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    half.foreach { case (id, s) => assert(full(id) == s, s"doc $id flipped") }
    // fractions land near target (md5 is uniform; generous tolerance)
    val n = full.size.toDouble
    val shares = full.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(shares.getOrElse("val", 0.0) < 0.15 && shares.getOrElse("test", 0.0) < 0.15)
    assert(shares("train") > 0.75, s"shares $shares")
    // shuffle-free: the plan has no Exchange
    val plan = Sampling.holdoutSplit(docs, "doc_id").queryExecution
      .executedPlan.toString
    assert(!plan.contains("Exchange"), "holdout split must stay narrow")
  }

  test("holdout split handles boundary fractions and rejects invalid ones") {
    import graft.operators.Sampling
    val docs = Tables(spark, sf).documents
    // 0.5/0.5 exhausts the space: every row is val or test, none train
    val halves = Sampling.holdoutSplit(docs, "doc_id", 0.5, 0.5)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!halves.contains("train"), s"train rows at 0.5/0.5: $halves")
    val n = halves.values.sum.toDouble
    assert(halves("val") / n > 0.35 && halves("test") / n > 0.35, halves.toString)
    intercept[IllegalArgumentException] {
      Sampling.holdoutSplit(docs, "doc_id", 0.7, 0.7)
    }
    intercept[IllegalArgumentException] { Sampling.hexCut(1.2) }
  }
}
