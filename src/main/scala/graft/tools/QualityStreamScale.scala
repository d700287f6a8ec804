package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Throughput drive of the streaming perplexity filter at blow-up
  * scale: fit the model OFFLINE on the reference corpus (the
  * deployment premise — the fit slice is a fixed artifact, not the
  * stream), then stream the blow-up corpus through bucketStream in
  * replica-sized micro-batches and report docs/s plus the bucket
  * distribution. Stateless by construction, so the number to watch
  * is flat per-batch wall — there is no state to grow.
  *
  * Fitting on the streamed corpus itself (the default) makes the
  * output distribution a built-in sanity check — per-language
  * terciles, so ~1/3 per bucket. A fitDir that differs from the
  * stream (e.g. fit sf0.1, stream a blow-up whose replicas carry
  * injected tag tokens) legitimately routes out-of-distribution
  * docs to tail — that's the filter working, not a bug (measured:
  * all 320k tagged replicas tail under an sf0.1 model).
  *
  * Usage: QualityStreamScale <blowUpDir> [fitDir=<blowUpDir>] [batches=16]
  */
object QualityStreamScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val fitDir = args.lift(1).getOrElse(dir)
    val nBatches = args.lift(2).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.local(cpus, "graft-quality-stream-scale")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val tFit0 = System.nanoTime()
    val model = graft.streaming.StreamingQuality.fit(
      graft.Tables(spark, fitDir).documents)
    println(f"[qstream] fit on $fitDir: vocab=${model.bi.size}," +
      f" langs=${model.bounds.size}, ${(System.nanoTime() - tFit0) / 1e9}%.1f s")

    val docs = graft.Tables(spark, dir).documents
      .select(col("doc_id"), col("lang"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count()
    println(s"[qstream] streaming $nDocs docs in $nBatches micro-batches")

    val source = MemoryStream[(Long, String, String)]
    val query = graft.streaming.StreamingQuality.bucketStream(
        source.toDF().toDF("doc_id", "lang", "text"), model)
      .writeStream.format("memory").queryName("qstream_out")
      .outputMode("append").start()

    val t0 = System.nanoTime()
    (0 until nBatches).foreach { b =>
      val tb = System.nanoTime()
      val batch = docs.filter(pmod(col("doc_id"), lit(nBatches)) === b)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      source.addData(batch.toSeq: _*)
      query.processAllAvailable()
      if ((b + 1) % 4 == 0)
        println(f"[qstream] batch ${b + 1}%3d: ${batch.length} docs," +
          f" ${(System.nanoTime() - tb) / 1e9}%.2f s")
      Console.flush()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val out = spark.table("qstream_out")
    val total = out.count()
    val dist = out.groupBy("bucket").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
    query.stop()
    println(f"[qstream] $total docs bucketed in $secs%.1f s" +
      f" (${total / secs}%.0f docs/s/8-core): $dist")
  }
}
