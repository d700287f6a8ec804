package graft.tools

import org.apache.spark.sql.SaveMode

/** One-off: run a registered query, then dump the FINAL adaptive
  * plan (post-execution) so runtime join strategies are visible.
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val q = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.local(cpus, "graft-plan-peek")
    sys.env.get("SPARK_GRAFT_PARTITIONS")
      .foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
    val df = graft.SparkEntry.queries(q)(spark, dir)
    df.write.format("noop").mode(SaveMode.Overwrite).save()
    println("==== FINAL PLAN ====")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
