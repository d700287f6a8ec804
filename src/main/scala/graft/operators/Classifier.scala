package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Model-based quality filtering — the classifier stage of a
  * pretraining data pipeline (public precedent: GPT-3/LLaMA/CCNet
  * filter crawl text with a linear classifier trained to recognize a
  * reference corpus; fasttext-style linear-on-features is the
  * standard shape). Here: binary logistic regression over cheap text
  * statistics, trained distributed with exact deterministic
  * arithmetic, applied to the corpus as one narrow codegen'd
  * projection.
  *
  * Training is Newton/IRLS: per iteration ONE pass over the cached
  * feature frame computes per-partition (gradient, Hessian) partials
  * (d and d² doubles each — constant-size regardless of corpus
  * rows); the driver reduces partials IN PARTITION ORDER and solves
  * the d×d system. Float sums are order-dependent, so the usual
  * treeAggregate would make the learned weights nondeterministic
  * across runs — the partition-ordered driver reduction (partials are
  * tiny by construction) makes training bit-reproducible for a fixed
  * input partitioning, which is what lets the spec pin train-twice
  * equality and lets Verify stay stable run to run.
  *
  * Scale shape at 100 TB: the feature frame is one narrow row per doc
  * (d doubles + a label), cached once and scanned `iters` times;
  * nothing corpus-sized ever reaches the driver (partials are
  * #partitions × (d+d²) doubles); scoring broadcasts the d weights as
  * literals into a zero-shuffle projection. Real pipelines train on a
  * sample and score everything — the registered query trains on a
  * deterministic 1-in-5 id slice and scores the full corpus.
  */
object Classifier {

  /** Feature columns over raw text: intercept, stopword density,
    * punctuation density, digit density, mean token length (scaled),
    * saturating length. All single-pass native byte scans; each value
    * is one IEEE division of exact integer counts — deterministic
    * per row, no corpus state.
    */
  def featureCols(text: Column): Seq[Column] = {
    // floor-1 denominators: an empty doc yields 0 ratios, never a
    // NaN/Inf that would poison every gradient partial it touches
    val nChars = greatest(length(text), lit(1))
    val nTokens = greatest(TextFns.wordCount(text), lit(1))
    val stop = TextAnalysis.langScore(text, TextAnalysis.StopSet)
    val punct = graft.plans.native.byteClassCount(text,
      Seq(('!', '/'), (':', '@'), ('[', '`'), ('{', '~')))
    val digits = graft.plans.native.byteClassCount(text, Seq(('0', '9')))
    Seq(
      lit(1.0),
      stop.cast("double") / nTokens.cast("double"),
      punct.cast("double") / nChars.cast("double"),
      digits.cast("double") / nChars.cast("double"),
      ((length(text) - TextFns.wordCount(text) + 1).cast("double")
        / nTokens.cast("double")) / lit(10.0),
      least(nTokens, lit(256)).cast("double") / lit(256.0))
  }

  val FeatureNames: Seq[String] =
    Seq("intercept", "stop_ratio", "punct_ratio", "digit_ratio",
      "tok_len", "sat_len")

  /** Deterministic distributed Newton/IRLS. `feat` must have an
    * integer `y` (0/1) and a fixed-width array<double> `x`. Returns
    * the weight vector after exactly `iters` steps (fixed iteration
    * count, not a convergence test — determinism). `ridge` scales
    * with n so the Hessian stays invertible on separable data without
    * meaningfully shrinking large-corpus fits.
    */
  def trainLogistic(feat: DataFrame, dim: Int, iters: Int = 8,
      ridgePerRow: Double = 1e-6): Array[Double] = {
    val rows = feat.select(col("y").cast("int"), col("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = rows.count()
    require(n > 0, "empty training set")
    val w = new Array[Double](dim)
    var it = 0
    while (it < iters) {
      val bw = w.clone()
      // per-partition (grad, hessian) partials — constant-size; the
      // driver sums them in partition order so the reduction is
      // bit-reproducible (a treeAggregate would not be)
      val partials = rows.rdd.mapPartitionsWithIndex { (pid, rs) =>
        val g = new Array[Double](dim)
        val h = new Array[Double](dim * dim)
        rs.foreach { r =>
          val y = r.getInt(0)
          val x = r.getSeq[Double](1)
          var z = 0.0
          var i = 0
          while (i < dim) { z += bw(i) * x(i); i += 1 }
          val zc = math.max(-30.0, math.min(30.0, z))
          val p = 1.0 / (1.0 + math.exp(-zc))
          val resid = y - p
          val s = p * (1.0 - p)
          i = 0
          while (i < dim) {
            g(i) += resid * x(i)
            var j = 0
            while (j < dim) { h(i * dim + j) += s * x(i) * x(j); j += 1 }
            i += 1
          }
        }
        Iterator((pid, g, h))
      }.collect().sortBy(_._1)
      val g = new Array[Double](dim)
      val h = new Array[Double](dim * dim)
      partials.foreach { case (_, pg, ph) =>
        var i = 0
        while (i < dim) { g(i) += pg(i); i += 1 }
        i = 0
        while (i < dim * dim) { h(i) += ph(i); i += 1 }
      }
      val lambda = ridgePerRow * n
      var i = 0
      while (i < dim) { h(i * dim + i) += lambda; i += 1 }
      val dw = solve(h, g, dim)
      i = 0
      while (i < dim) { w(i) += dw(i); i += 1 }
      it += 1
    }
    rows.unpersist(false)
    w
  }

  /** In-place Gaussian elimination with partial pivoting (d×d, d tiny
    * — 6 here; deterministic pivot choice: largest |pivot|, first on
    * tie).
    */
  private def solve(hIn: Array[Double], gIn: Array[Double], d: Int): Array[Double] = {
    val a = hIn.clone(); val b = gIn.clone()
    var colI = 0
    while (colI < d) {
      var piv = colI; var best = math.abs(a(colI * d + colI))
      var r = colI + 1
      while (r < d) {
        val v = math.abs(a(r * d + colI))
        if (v > best) { best = v; piv = r }
        r += 1
      }
      if (piv != colI) {
        var j = 0
        while (j < d) {
          val t = a(colI * d + j); a(colI * d + j) = a(piv * d + j); a(piv * d + j) = t
          j += 1
        }
        val t = b(colI); b(colI) = b(piv); b(piv) = t
      }
      val pv = a(colI * d + colI)
      r = colI + 1
      while (r < d) {
        val f = a(r * d + colI) / pv
        var j = colI
        while (j < d) { a(r * d + j) -= f * a(colI * d + j); j += 1 }
        b(r) -= f * b(colI)
        r += 1
      }
      colI += 1
    }
    val x = new Array[Double](d)
    var r = d - 1
    while (r >= 0) {
      var acc = b(r)
      var j = r + 1
      while (j < d) { acc -= a(r * d + j) * x(j); j += 1 }
      x(r) = acc / a(r * d + r)
      r -= 1
    }
    x
  }

  /** Featurize docs for training: (y, x) with x a fixed-width
    * array<double>.
    */
  def featurize(docs: DataFrame, labelCol: Column,
      textCol: String = "text"): DataFrame =
    docs.select(labelCol.cast("int").as("y"),
      array(featureCols(col(textCol)): _*).as("x"))

  /** Score every doc with trained weights: the weights enter as
    * literals, so scoring is a zero-shuffle narrow projection
    * (logit = w·x unrolled into codegen'd column arithmetic — no
    * array materialization, no UDF).
    */
  def score(docs: DataFrame, weights: Array[Double],
      labelCol: Column, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val logit = weights.toSeq.zip(featureCols(col(textCol)))
      .map { case (wi, c) => lit(wi) * c }
      .reduceLeft(_ + _)
    docs.select(col(idCol).as("doc_id"),
      labelCol.cast("int").as("y"),
      round(logit, 4).as("logit"),
      (logit > 0).cast("int").as("pred"))
  }

  /** Train on a deterministic 1-in-5 id slice, score the full corpus
    * — the sample-train / corpus-score split a real pipeline runs.
    */
  def qualityClassifier(docs: DataFrame, labelCol: Column,
      iters: Int = 8, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val train = featurize(docs.filter(col(idCol) % 5 === 0), labelCol, textCol)
    val w = trainLogistic(train, dim = FeatureNames.size, iters = iters)
    score(docs, w, labelCol, textCol, idCol)
  }
}
