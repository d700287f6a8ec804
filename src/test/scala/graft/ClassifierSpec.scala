package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier

class ClassifierSpec extends SparkSpec {

  private def docs = Tables(spark, sf).documents

  test("newton solver recovers a planted linearly separable rule") {
    import spark.implicits._
    // y = [a > 0.5] with a margin — 8 Newton steps must classify
    // every point (weights grow toward the separator; fixed iteration
    // count bounds them)
    val rows = (0 until 200).map { i =>
      val a = (i % 100) / 100.0
      val y = if (a > 0.5) 1 else 0
      (y, Seq(1.0, a))
    }
    val feat = rows.toDF("y", "x")
    val w = Classifier.trainLogistic(feat, dim = 2, iters = 8)
    val acc = rows.count { case (y, x) =>
      val pred = if (w(0) * x(0) + w(1) * x(1) > 0) 1 else 0
      pred == y
    } / 200.0
    assert(acc == 1.0, s"separable rule not recovered: w=${w.toSeq}, acc=$acc")
  }

  private def qLabel = operators.TextAnalysis.quality(col("text")).last >= 1.0

  test("training is bit-reproducible across runs and partitionings") {
    val feat = Classifier.featurize(docs, qLabel)
    val w1 = Classifier.trainLogistic(feat, Classifier.FeatureNames.size)
    val w2 = Classifier.trainLogistic(feat, Classifier.FeatureNames.size)
    assert(w1.toSeq == w2.toSeq, "same input must give identical weights")
    // NOTE deliberately NOT asserted: repartition-invariance. The
    // partition-ordered reduction makes a FIXED partitioning
    // reproducible; a different partitioning reorders the float sums
    // (inherent to IEEE addition, same as every engine's parallel
    // float aggregate).
  }

  test("classifier distills the quality-rule label above the majority baseline") {
    val out = Classifier.qualityClassifier(docs, qLabel)
      .agg(avg((col("pred") === col("y")).cast("double")).as("acc"),
        avg(col("y").cast("double")).as("pos"))
      .head()
    val acc = out.getDouble(0)
    val baseline = math.max(out.getDouble(1), 1.0 - out.getDouble(1))
    assert(acc > baseline,
      s"classifier acc $acc must beat majority baseline $baseline")
    assert(acc >= 0.9,
      s"the active rule (length) is linearly separable via sat_len: $acc")
  }

  test("predictions agree with MLlib LogisticRegression on the same features") {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    val feat = Classifier.featurize(docs, qLabel)
      .withColumn("features", array_to_vector(col("x")))
      .withColumn("label", col("y").cast("double"))
    val ml = new LogisticRegression()
      .setMaxIter(100).setRegParam(0.0).setFitIntercept(false)
      .fit(feat)
    val w = Classifier.trainLogistic(feat, Classifier.FeatureNames.size)
    val mlPred = ml.transform(feat).select("y", "prediction")
      .collect().map(r => (r.getInt(0), r.getDouble(1).toInt))
    val scored = Classifier.score(docs, w, qLabel)
      .select("y", "pred").collect().map(r => (r.getInt(0), r.getInt(1)))
    // collect order is not guaranteed across the two frames, so
    // compare aggregate behavior: both solvers optimize the same
    // convex loss, so accuracy and positive rate must match closely
    val n = scored.length
    val accOurs = scored.count(p => p._1 == p._2).toDouble / n
    val accMl = mlPred.count(p => p._1 == p._2).toDouble / n
    assert(math.abs(accOurs - accMl) <= 0.02,
      s"accuracy gap vs MLlib too wide: ours=$accOurs mllib=$accMl")
    val posOurs = scored.count(_._2 == 1).toDouble / n
    val posMl = mlPred.count(_._2 == 1).toDouble / n
    assert(math.abs(posOurs - posMl) <= 0.02,
      s"positive-rate gap vs MLlib too wide: ours=$posOurs mllib=$posMl")
  }

  test("scoring is a zero-shuffle narrow projection") {
    val w = Array(0.1, 0.2, 0.3, 0.4, 0.5, 0.6)
    val plan = Classifier.score(docs, w, col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }
}
