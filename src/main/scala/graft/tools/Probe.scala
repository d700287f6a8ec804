package graft.tools

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Scratch profiling probe — not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.GraftSession.local(32, "probe")
    val docs = graft.Tables(spark, dir).documents

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode(SaveMode.Overwrite).save()

    // warm the cache/JIT
    noop(docs.select(col("doc_id")))

    time("scan+count")(noop(docs.select(col("doc_id"))))
    time("lower+pad x1")(noop(docs.select(
      length(concat(lit(" "), lower(col("text")), lit(" "))).as("l"))))
    time("literalCount x1")(noop(docs.select(
      graft.functions.TextFns.countOccurrences(
        concat(lit(" "), lower(col("text")), lit(" ")), " spark ").as("c"))))
    time("literalCount x3")(noop(docs.select(
      Seq(" spark ", " join ", " window ").zipWithIndex.map { case (t, i) =>
        graft.functions.TextFns.countOccurrences(
          concat(lit(" "), lower(col("text")), lit(" ")), t).as(s"c$i")
      }: _*)))
    time("bm25 full")(noop(
      graft.operators.Retrieval.bm25(docs, Seq("spark", "join", "window"))))

    // granular bm25 stages
    val dl = graft.plans.native.literalCount(col("text"), " ") + lit(1)
    val tfCols = Seq("spark", "join", "window").zipWithIndex.map { case (t, i) =>
      graft.functions.TextFns.countOccurrences(
        concat(lit(" "), lower(col("text")), lit(" ")), s" $t ").as(s"__tf_$i") }
    val mkBase = docs.select(col("doc_id") +: dl.as("__dl") +: tfCols: _*)
    time("bm25 base noop")(noop(mkBase))
    val cached = mkBase.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("bm25 base cache build")(cached.count())
    time("bm25 stats from cache")(noop(cached.agg(count(lit(1)), sum(col("__dl")),
      sum(when(col("__tf_0") > 0, 1L).otherwise(0L)))))
    time("bm25 rescan cache")(noop(cached))
    cached.unpersist()

    time("explode tokens")(noop(docs.select(
      explode(split(lower(col("text")), " ")).as("term"))))
    time("vocab count")(noop(docs.select(
      explode(split(lower(col("text")), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))))
    time("rarity full")(noop(graft.operators.Retrieval.rarity(docs)))
  }
}
