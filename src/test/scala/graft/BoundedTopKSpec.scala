package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.BoundedTopK.boundedTopK

/** The bounded-heap top-k aggregate must agree EXACTLY with the rank
  * window it replaces — same kept set, same order, any partitioning.
  */
class BoundedTopKSpec extends SparkSpec {

  test("declared input types coerce mistyped callers at analysis time") {
    import spark.implicits._
    // an int score / int id used to reach update() untouched and die
    // per-row with an executor ClassCastException mid-job; the
    // ImplicitCastInputTypes declaration coerces both at plan time
    val df = Seq((10, 1), (5, 2), (7, 3)).toDF("score", "id")
    val out = df.agg(boundedTopK(col("score"), col("id"), 2).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.score"), col("e.id")).collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(out.toSeq == Seq((10.0, 1L), (7.0, 3L)), out.toSeq.toString)
  }

  test("heap aggregate equals the rank-window top-m on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // duplicate scores included: ties must break by id ascending
    val rows = (1 to 20000).map { i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(500) / 100.0, i.toLong)
    }
    val df = rows.toDF("grp", "score", "id").repartition(7) // arbitrary layout
    val m = 6
    val viaHeap = df.groupBy("grp")
      .agg(boundedTopK(col("score"), col("id"), m).as("tops"))
      .select(col("grp"), posexplode(col("tops")))
      .select(col("grp"), col("pos"), col("col.score"), col("col.id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= m)
      .select(col("grp"), (col("rn") - 1).as("pos"), col("score"), col("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(viaHeap.length == viaWindow.length)
    assert(viaHeap.sameElements(viaWindow),
      viaHeap.zip(viaWindow).find { case (a, b) => a != b }.toString)
  }

  test("heap aggregate is partitioning-invariant and handles small groups") {
    import spark.implicits._
    val df = Seq((1L, 0.5, 10L), (1L, 0.5, 9L), (2L, 1.0, 1L))
      .toDF("grp", "score", "id")
    def run(parts: Int) = df.repartition(parts).groupBy("grp")
      .agg(boundedTopK(col("score"), col("id"), 5).as("t"))
      .orderBy("grp").collect().map(_.toString).toSeq
    assert(run(1) == run(8))
    // group smaller than m returns all members, ties id-ascending
    val g1 = df.repartition(4).groupBy("grp")
      .agg(boundedTopK(col("score"), col("id"), 5).as("t"))
      .filter(col("grp") === 1)
      .select(explode(col("t.id"))).collect().map(_.getLong(0)).toSeq
    assert(g1 == Seq(9L, 10L))
  }
}
