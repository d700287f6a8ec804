package graft.tools

import org.apache.spark.sql.functions._

/** Build-once / probe-many amortization evidence for the persisted
  * IVF index (round 6): time the self-contained ivfTopK (fit + assign
  * + code + scan, every call) against one IvfIndex.build plus
  * repeated probe batches on the same corpus.
  *
  * Usage: IvfScale <blowUpDir>
  */
object IvfScale {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IvfScale <blowUpDir>")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.local(cpus, "graft-ivf-scale")
    sys.env.get("SPARK_GRAFT_PARTITIONS")
      .foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
    val emb = graft.Tables(spark, args(0)).embeddings

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivf] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      Console.flush()
      r
    }

    time("ivfTopK (self-contained, per call)") {
      graft.operators.Similarity.ivfTopK(emb, col("vec_id") % 50 === 0, k = 5)
        .write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-scale").toString
    time("IvfIndex.build (once)") {
      graft.sources.IvfIndex.build(emb, dir)
    }
    // three distinct probe batches against the same build — the
    // amortized steady state a serving/repeated-curation pipeline runs
    (0 until 3).foreach { i =>
      time(s"IvfIndex.topK (probe batch $i)") {
        graft.sources.IvfIndex.topK(spark, dir,
            emb.filter(col("vec_id") % 50 === i), k = 5)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
