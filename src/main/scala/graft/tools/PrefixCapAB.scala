package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Same-session A/B for the prefix-jaccard maxBucket cap (the r13
  * VERDICT weak): the old count-over-window form buffers the fat
  * distinct-words arrays in exactly the hot-prefix partitions the cap
  * exists to defuse; the shipped count+semi form moves only narrow
  * (pre) rows through the extra exchange. This drive PLANTS the hot
  * prefix (a boilerplate family far over the cap), times both forms
  * by-name against the same parquet corpus, reports per-arm disk/mem
  * spill from a task-metrics listener, and asserts the pair sets are
  * bit-identical.
  *
  *   runMain graft.tools.PrefixCapAB <workDir> [nBackground] [famSize] [wordsPerDoc]
  *
  * Defaults: 400k background docs (unique prefixes + planted small
  * near-dup buckets), a 100k-doc hot-prefix family, ~120 distinct
  * words per doc (~1 KB ws array — the column the window form sorts).
  */
object PrefixCapAB {
  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse("/tmp/prefixab")
    val nBg = args.lift(1).map(_.toInt).getOrElse(400000)
    val fam = args.lift(2).map(_.toInt).getOrElse(100000)
    val wordsPerDoc = args.lift(3).map(_.toInt).getOrElse(120)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.local(cpus, "graft-prefixcap-ab")
    import spark.implicits._
    // data-scaled partitioning (the ScaleCheck rule)
    spark.conf.set("spark.sql.shuffle.partitions",
      math.max(cpus, (nBg + fam) / 50000).toString)

    // background: unique-prefix docs; every (2k, 2k+1) id pair of the
    // first 10% shares a prefix AND most words (true near-dup buckets,
    // so the survivors' pair set is non-trivial). family: one 40-char
    // boilerplate prefix, distinct tails.
    val bg = spark.range(0, nBg).select(col("id").as("doc_id"),
      concat(
        when(col("id") < nBg / 10,
          concat(lit("shared-prefix-block-"), expr("id div 2").cast("string"),
            lit("-pad-pad-pad-pad-pad ")))
          .otherwise(concat(lit("unique-prefix-"), col("id").cast("string"),
            lit("-pad-pad-pad-pad-pad-pad-pad-pad "))),
        concat_ws(" ", transform(sequence(lit(1), lit(wordsPerDoc)),
          j => concat(lit("w"), expr("id div 2").cast("string"), lit("_"), j))))
        .as("text"))
    val hot = spark.range(0, fam).select((col("id") + 10000000L).as("doc_id"),
      concat(lit("boilerplate-header-forty-characters-long "),
        concat_ws(" ", transform(sequence(lit(1), lit(wordsPerDoc)),
          j => concat(lit("h"), col("id").cast("string"), lit("_"), j))))
        .as("text"))
    bg.unionAll(hot).repartition(cpus * 4)
      .write.mode(SaveMode.Overwrite).parquet(s"$workDir/documents.parquet")
    val docs = spark.read.parquet(s"$workDir/documents.parquet")
    println(s"[prefixab] corpus: ${docs.count()} docs ($nBg bg + $fam hot-prefix family)")

    // r13 window form, inlined verbatim (Dedup.scala @ 68535ae)
    def windowForm(maxBucket: Int): DataFrame = {
      val d0 = docs.select(col("doc_id"),
        substring(col("text"), 1, 40).as("pre"),
        TextFns.distinctWords(col("text")).as("ws"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("pre")
      val d = d0.withColumn("__n", count(lit(1)).over(w))
        .filter(col("__n") <= maxBucket).drop("__n")
      val a = d.select(col("pre"), col("doc_id").as("doc_a"), col("ws").as("ws_a"))
      val b = d.select(col("pre"), col("doc_id").as("doc_b"), col("ws").as("ws_b"))
      a.join(b, Seq("pre"))
        .filter(col("doc_a") < col("doc_b"))
        .withColumn("jaccard", TextFns.jaccard(col("ws_a"), col("ws_b")))
        .filter(col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    }

    val spillDisk = new java.util.concurrent.atomic.AtomicLong
    val spillMem = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        Option(e.taskMetrics).foreach { m =>
          spillDisk.addAndGet(m.diskBytesSpilled)
          spillMem.addAndGet(m.memoryBytesSpilled)
        }
    })
    def time(label: String, df: => DataFrame): Unit = {
      spillDisk.set(0); spillMem.set(0)
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      df.write.format("noop").mode(SaveMode.Overwrite).save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[prefixab] $label%-18s $sec%8.2f s  spill disk=${spillDisk.get / (1 << 20)}%d MB mem=${spillMem.get / (1 << 20)}%d MB")
    }
    // alternate arms: round 1 absorbs JIT, later rounds are the read
    for (round <- 1 to 3) {
      time(s"window r$round", windowForm(32))
      time(s"countsemi r$round",
        graft.operators.Dedup.prefixJaccardPairs(docs, threshold = 0.5, maxBucket = 32))
    }
    // pair-set equivalence at drive scale
    val wRows = windowForm(32).select("doc_a", "doc_b", "jaccard")
    val cRows = graft.operators.Dedup
      .prefixJaccardPairs(docs, threshold = 0.5, maxBucket = 32)
      .select("doc_a", "doc_b", "jaccard")
    val diff = wRows.exceptAll(cRows).count() + cRows.exceptAll(wRows).count()
    val n = cRows.count()
    println(s"[prefixab] pair sets: countsemi=$n rows, symmetric diff=$diff " +
      (if (diff == 0) "IDENTICAL" else "MISMATCH"))
    spark.stop()
    if (diff != 0) sys.exit(1)
  }
}
