package graft

import graft.operators.Quantiles
import org.apache.spark.sql.functions._

/** Quantiles (histogram-routed constant-memory quantiles) vs Spark's
  * own exact `percentile` aggregate — the operators that moved off
  * the single-buffer aggregate must keep its semantics exactly.
  */
class QuantilesSpec extends SparkSpec {

  private def valuesDf(vs: Seq[Long]) = {
    import spark.implicits._
    vs.toDF("x")
  }

  test("interpolated equals Spark's exact percentile on random data") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      // heavy ties in some trials, mostly-distinct in others — both
      // histogram shapes
      val n = 1 + rnd.nextInt(400)
      val dom = if (trial % 2 == 0) 7 else 100000
      val vs = Seq.fill(n)(rnd.nextInt(dom).toLong)
      val ps = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
      val got = Quantiles.interpolated(valuesDf(vs), "x", ps,
        ps.indices.map(i => s"q$i")).head()
      val want = valuesDf(vs).agg(expr(
        s"percentile(x, array(${ps.mkString("D,")}D))")).head()
        .getSeq[Double](0)
      ps.indices.foreach { i =>
        assert(got.getDouble(i) == want(i),
          s"trial=$trial p=${ps(i)} got=${got.getDouble(i)} want=${want(i)}")
      }
    }
  }

  test("interpolated handles the single-value edge (p=1 upper bracket)") {
    val got = Quantiles.interpolated(valuesDf(Seq(7L)), "x",
      Seq(0.5, 1.0), Seq("a", "b")).head()
    assert(got.getDouble(0) == 7.0 && got.getDouble(1) == 7.0)
  }

  test("typeOneBoundaries is the smallest value with cum >= ceil(p*n)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 8) {
      val n = 1 + rnd.nextInt(200)
      val vs = Seq.fill(n)(rnd.nextInt(50).toLong)
      val fracs = Seq((1, 4), (1, 2), (3, 4))
      val got = Quantiles.typeOneBoundaries(valuesDf(vs), "x", fracs,
        Seq("b1", "b2", "b3")).head()
      val sorted = vs.sorted
      fracs.zipWithIndex.foreach { case ((num, den), i) =>
        val target = (num.toLong * n + den - 1) / den // ceil(num*n/den)
        val want = sorted(target.toInt - 1) // value at 1-based rank `target`
        assert(got.getLong(i) == want,
          s"n=$n frac=$num/$den got=${got.getLong(i)} want=$want")
      }
    }
  }
}
