package graft.tools

import java.nio.file.{Files, Paths}
import graft.{GraftSession, SparkEntry}

/** Dump `.explain("formatted")` of the FINAL adaptive plan for named
  * registered queries — the optimization-round audit artifact
  * (plans/r14/<query>_{before,after}.txt).
  *
  *   runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> [query ...]
  *
  * No query names = all registered queries. Each query is executed
  * (collect) first so AQE finalizes, then explainString(FormattedMode)
  * is written to <outDir>/<query><suffix>.txt.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    val suffix = args(2)
    val names =
      if (args.length > 3) args.drop(3).toSeq else SparkEntry.queries.keys.toSeq.sorted
    Files.createDirectories(outDir)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-explain")
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val df = fn(spark, sfDir)
      df.collect() // finalize AQE so the formatted plan is the executed one
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(outDir.resolve(s"$name$suffix.txt"), txt)
      spark.catalog.clearCache()
      println(s"[explaindump] $name -> ${outDir.resolve(name + suffix + ".txt")}")
    }
    spark.stop()
  }
}
