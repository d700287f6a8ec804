package graft

import org.apache.spark.sql.functions._
import graft.operators.Pca

class PcaSpec extends SparkSpec {

  private def emb = Tables(spark, sf).embeddings

  test("fit yields orthonormal loadings and a descending spectrum") {
    val m = Pca.fit(emb, nComponents = 8)
    for (r <- 0 until 8; s <- r until 8) {
      val dot = (0 until m.dim)
        .map(i => m.loadings(r * m.dim + i) * m.loadings(s * m.dim + i)).sum
      val expect = if (r == s) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"loadings($r)·loadings($s)=$dot")
    }
    val eig = m.eigenvalues
    assert(eig.zip(eig.tail).forall { case (a, b) => a >= b - 1e-12 },
      "eigenvalues must descend")
    assert(eig.forall(_ >= -1e-9), "covariance eigenvalues are nonnegative")
    assert(m.explained > 0.0 && m.explained <= 1.0 + 1e-12)
  }

  test("planted low-rank structure is recovered exactly") {
    import spark.implicits._
    // rank-2 data in 6D: strong direction u = e1, weak w = e3; no noise
    val rows = (0 until 120).map { i =>
      val a = math.sin(i * 0.7) * 3.0 // strong
      val b = math.cos(i * 1.3)      // weak
      (i.toLong, Seq(a.toFloat, 0f, b.toFloat, 0f, 0f, 0f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.fit(df, nComponents = 2)
    // top-2 eigenvalues carry ALL the variance, the rest are ~0
    assert(m.explained > 1.0 - 1e-9, s"rank-2 data: explained=${m.explained}")
    // components live exactly in the planted span(e1, e3) — the finite
    // sample gives the two signals a small cross-correlation, so the
    // axes may rotate WITHIN the plane, but never out of it
    val l1 = m.component(0); val l2 = m.component(1)
    Seq(1, 3, 4, 5).foreach { i =>
      assert(math.abs(l1(i)) < 1e-9 && math.abs(l2(i)) < 1e-9,
        s"components stay in span(e1,e3): ${l1.toSeq} / ${l2.toSeq}")
    }
    // the strong direction dominates pc1, the weak one pc2
    assert(math.abs(l1(0)) > 0.99, s"pc1 ~ e1: ${l1.toSeq}")
    assert(math.abs(l2(2)) > 0.99, s"pc2 ~ e3: ${l2.toSeq}")
    // sign convention: the dominant coordinate is positive
    assert(l1(0) > 0 && l2(2) > 0, "largest-|coordinate| made positive")
  }

  test("fit is bit-reproducible for a fixed input layout") {
    val m1 = Pca.fit(emb, nComponents = 4)
    val m2 = Pca.fit(emb, nComponents = 4)
    assert(m1.loadings.toSeq == m2.loadings.toSeq)
    assert(m1.eigenvalues.toSeq == m2.eigenvalues.toSeq)
    assert(m1.mean.toSeq == m2.mean.toSeq)
  }

  test("explained-variance proportions agree with MLlib PCA") {
    import org.apache.spark.ml.feature.{PCA => MlPca}
    import org.apache.spark.ml.functions.array_to_vector
    val m = Pca.fit(emb, nComponents = 8)
    val ml = new MlPca().setInputCol("features").setOutputCol("pca")
      .setK(8)
      .fit(emb.select(array_to_vector(
        transform(col("embedding"), _.cast("double"))).as("features")))
    val ours = m.eigenvalues.take(8).map(_ / m.trace)
    val theirs = ml.explainedVariance.toArray
    ours.zip(theirs).zipWithIndex.foreach { case ((a, b), i) =>
      assert(math.abs(a - b) < 1e-6,
        s"component $i proportion: ours=$a mllib=$b")
    }
  }

  test("projection matches a hand-computed centered dot and stays zero-shuffle") {
    val m = Pca.fit(emb, nComponents = 3)
    val first = emb.orderBy("vec_id").select("vec_id", "embedding")
      .head()
    val id = first.getLong(0)
    val x = first.getSeq[Float](1).map(_.toDouble)
    val expected = (0 until 3).map { r =>
      val raw = (0 until m.dim).map(i => m.loadings(r * m.dim + i) * x(i)).sum
      BigDecimal(raw - m.offsets(r))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val out = Pca.project(emb, m)
    val row = out.filter(col("vec_id") === id).head()
    (0 until 3).foreach { r =>
      assert(row.getDouble(r + 1) == expected(r),
        s"pc${r + 1}: got ${row.getDouble(r + 1)}, want ${expected(r)}")
    }
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
  }
}
