package graft

import graft.operators.AsOfJoin

/** Property check: the single-shuffle as-of formulation equals the
  * naive quadratic definition (max right.ts <= left.ts per key) on
  * seeded random inputs, including ties and missing predecessors.
  */
class AsOfJoinPropertySpec extends SparkSpec {

  test("as-of equals naive quadratic definition on 30 random cases") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    (1 to 30).foreach { caseNo =>
      val nL = 1 + rnd.nextInt(25)
      val nR = rnd.nextInt(25)
      val ls = List.fill(nL)((1L + rnd.nextInt(5), rnd.nextInt(50).toLong))
      val rs = List.fill(nR)((1L + rnd.nextInt(5), rnd.nextInt(50).toLong))

      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, new java.sql.Timestamp(t * 60000)) }
        .toDF("event_id", "k", "ts")
      val right = rs.zipWithIndex
        .map { case ((k, t), i) => (k, new java.sql.Timestamp(t * 60000), i.toDouble) }
        .toDF("k", "ts", "v")

      val got = AsOfJoin.asOf(left, right, "k", "ts", Seq("ts", "v"))
        .select("event_id", "right_ts")
        .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap

      // naive oracle: max right ts <= left ts per key (ts only — with
      // duplicate right ts the carried payload is tie-ambiguous)
      val rByKey = rs.groupBy(_._1)
      val want = ls.zipWithIndex.map { case ((k, t), i) =>
        val preds = rByKey.getOrElse(k, Nil).map(_._2).filter(_ <= t)
        i.toLong -> (if (preds.isEmpty) None
                     else Some(new java.sql.Timestamp(preds.max * 60000)))
      }.toMap
      assert(got == want, s"case $caseNo: ls=$ls rs=$rs\n got=$got\nwant=$want")
    }
  }
}
