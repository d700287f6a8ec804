package graft.tools

import org.apache.spark.sql.functions._

/** Stage-by-stage wall profile of the d_ann_topk recipe against an
  * existing (blown-up) table directory — pinpoints which stage owns
  * the 64× wall instead of guessing from the end-to-end number.
  *
  * Usage: AnnProfile <tableDir>
  */
object AnnProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.local(cpus, "graft-ann-profile")
    import org.apache.spark.ml.functions.array_to_vector

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      Console.flush()
      r
    }

    val emb = graft.Tables(spark, dir).embeddings
    val base = emb.select(col("vec_id"), col("embedding"),
      graft.functions.VectorFns.norm(col("embedding")).as("nrm"))
      .withColumn("features", array_to_vector(col("embedding")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = time("base count+persist")(base.count())
    val cells = math.min(1024L, math.max(16L, n / 500)).toInt
    val model = time(s"kmeans fit (k=$cells)") {
      import org.apache.spark.ml.clustering.KMeans
      val train = base.orderBy("vec_id").limit(math.max(2000, 10 * cells))
        .repartition(cpus)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try new KMeans().setK(cells).setSeed(42).setMaxIter(5)
        .setFeaturesCol("features").fit(train)
      finally train.unpersist()
    }
    val assigned = model.transform(base)
      .withColumnRenamed("prediction", "cell").drop("features")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("assign count+persist")(assigned.count())

    val centroids = spark.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (c, i) =>
        (i, c.toArray.map(_.toFloat)) }.toSeq).toDF("cell", "centroid")
    val probes = assigned.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("emb_p"),
        col("nrm").as("nrm_p"))
    val probeCells = probes.crossJoin(broadcast(centroids))
      .withColumn("dist2",
        graft.functions.VectorFns.dot(col("emb_p"), col("emb_p"))
          - lit(2.0) * graft.functions.VectorFns.dot(col("emb_p"), col("centroid"))
          + graft.functions.VectorFns.dot(col("centroid"), col("centroid")))
      .withColumn("crank", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("probe_id")
          .orderBy(col("dist2"), col("cell"))))
      .filter(col("crank") <= 4)
      .select(col("probe_id"),
        graft.plans.native.sq8Code(col("emb_p")).as("code_p"),
        graft.plans.native.sq8Scale(col("emb_p")).as("qs_p"),
        col("nrm_p"), col("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("probe-cells count+persist")(probeCells.count())

    val codes = assigned.select(col("vec_id"), col("cell"),
      graft.plans.native.sq8Code(col("embedding")).as("code"),
      graft.plans.native.sq8Scale(col("embedding")).as("qs"), col("nrm"))
    val survivors = probeCells.join(codes, Seq("cell"))
      .filter(col("probe_id") =!= col("vec_id"))
      .withColumn("qcos",
        col("qs_p") * col("qs")
          * graft.plans.native.byteDot(col("code_p"), col("code")).cast("double")
          / (col("nrm_p") * col("nrm")))
      .groupBy("probe_id")
      .agg(graft.plans.BoundedTopK.boundedTopK(col("qcos"), col("vec_id"), 21).as("tops"))
      .select(col("probe_id"), explode(col("tops.id")).as("vec_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("code scan + heap topk")(survivors.count())

    val cands = survivors.join(probes, Seq("probe_id"))
      .join(base.select(col("vec_id"), col("embedding"), col("nrm")), Seq("vec_id"))
      .withColumn("cos",
        graft.functions.VectorFns.dot(col("emb_p"), col("embedding"))
          / (col("nrm_p") * col("nrm")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("probe_id")
      .orderBy(floor(col("cos") * lit(1000000.0) + lit(0.5)).desc, col("vec_id"))
    val out = cands.withColumn("rank", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rank") <= 5)
    time("float re-rank")(out.write.format("noop").mode("overwrite").save())

    // steady-JIT, cold-cache e2e with per-stage attribution
    val stages = new scala.collection.mutable.ArrayBuffer[(String, Double)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val info = sc.stageInfo
          val secs = (for {
            s <- info.submissionTime; c <- info.completionTime
          } yield (c - s) / 1e3).getOrElse(0.0)
          stages.synchronized {
            stages += ((s"stage ${info.stageId} ${info.name.takeWhile(_ != '(')} tasks=${info.numTasks}", secs))
          }
        }
      })
    (1 to 3).foreach { i =>
      spark.catalog.clearCache()
      stages.synchronized(stages.clear())
      time(s"full ivfTopK e2e (run $i)") {
        graft.operators.Similarity.ivfTopK(emb, col("vec_id") % 50 === 0, k = 5)
          .write.format("noop").mode("overwrite").save()
      }
      stages.synchronized {
        stages.filter(_._2 > 0.4).sortBy(-_._2).take(12).foreach { case (n, s) =>
          println(f"[prof]     $s%7.2f s  $n")
        }
      }
    }
    spark.stop()
  }
}
