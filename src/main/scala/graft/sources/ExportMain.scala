package graft.sources

import java.nio.file.Paths

import org.apache.spark.sql.functions.col
import graft.{GraftSession, Tables}
import graft.functions.EthiopianCalendar

/** CLI twin of the reference tool's run flow (export.py:352-387):
  * the user picks an Ethiopian month + year, the tool derives the
  * Gregorian report window, runs every configured query against it,
  * and packages the CSVs.
  *
  *   runMain graft.sources.ExportMain <sfDir> <outDir> <ethMonth 1-13> <ethYear>
  */
object ExportMain {

  /** Ethiopian month names as in export.py:102-103. */
  val Months = Seq("Meskerem", "Tikimit", "Hidar", "Tahisas", "Tir", "Yekatit",
    "Megabit", "Miazia", "Ginbot", "Sene", "Hamle", "Nehassie", "Pagume")

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, mS, yS) = args.take(4)
    val (m, y) = (mS.toInt, yS.toInt)
    val (start, end) = EthiopianCalendar.reportWindow(m, y)
    println(s"[export] window ${Months(m - 1)} $y -> [$start, $end]")

    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt, "graft-export")
    val t = Tables(spark, sfDir)
    // report queries over the window — the line-list family, windowed on
    // the event timestamp like REPORT_START/END_DATE substitution
    val windowed = t.events.filter(
      col("ts") >= start.toString && col("ts") < end.plusDays(1).toString)
    val queries = Map(
      "Event_LineList" -> graft.operators.Relational.lineListEntry(spark, sfDir),
      "Event_Window" -> windowed)

    // constants come from the dim tables, first row — mirroring the
    // facility_details/hmiscode lookups in export.py:257-279
    val firstNation = t.nation.orderBy("n_nationkey").limit(1)
      .join(t.region, col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name").head()
    val (regionName, facilityName) = (firstNation.getString(0), firstNation.getString(1))
    val hmis = s"H${t.nation.orderBy("n_nationkey").limit(1).head().getInt(0)}23"
    val facilitySan = facilityName.replace(" ", "").replace("_", "")

    val tag = s"$facilitySan${hmis}_${Months(m - 1)}_$y"
    val res = ExportJob.run(spark, queries,
      constants = Seq("Region" -> regionName, "Woreda" -> s"${regionName}_W0",
        "Facility" -> facilityName, "HMISCode" -> hmis),
      outDir = Paths.get(outDir), tag = tag)
    println(s"[export] package=${res.packagePath} sha256=${res.checksum} files=${res.csvFiles.mkString(",")}")
    spark.stop()
  }
}
