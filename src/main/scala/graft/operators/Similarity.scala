package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2.3 #27).
  *
  * Baseline: brute-force cosine top-k — probes broadcast against the
  * corpus (BroadcastNestedLoopJoin), exact. Scale path: LSH-bucketed
  * — random-hyperplane signatures turn the cross product into an
  * equi-join on (bucket), trading recall for O(n·buckets) work; at
  * 100 TB the corpus side stays partitioned, never replicated.
  */
object Similarity {

  /** Exact top-k neighbors for each probe row. Ranking uses cosine
    * rounded to 1e-6 with vec_id as tiebreak so ordering is stable
    * across engines and float summation orders.
    */
  def bruteForceTopK(emb: DataFrame, probeFilter: Column, k: Int): DataFrame = {
    val base = emb.select(col("vec_id"), col("embedding"),
      VectorFns.norm(col("embedding")).as("nrm"))
    val probes = base.filter(probeFilter)
      .select(col("vec_id").as("probe_id"), col("embedding").as("emb_p"), col("nrm").as("nrm_p"))
    val pairs = broadcast(probes)
      .join(base, col("probe_id") =!= col("vec_id"))
      .withColumn("cos",
        VectorFns.dot(col("emb_p"), col("embedding")) / (col("nrm_p") * col("nrm")))
    val w = Window.partitionBy("probe_id")
      .orderBy(round(col("cos"), 6).desc, col("vec_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cos_r"))
  }

  /** LSH-bucketed ANN: candidates share a hyperplane-signature bucket;
    * exact cosine + top-k within candidates. Recall < 1, cost
    * O(candidates); multi-probe (nTables signatures) recovers recall.
    */
  def lshTopK(emb: DataFrame, probeFilter: Column, k: Int,
      bits: Int = 12, nTables: Int = 4): DataFrame = {
    val base = emb.select(col("vec_id"), col("embedding"),
      VectorFns.norm(col("embedding")).as("nrm"))
    // nTables signatures per vector: table t uses planes [t*bits, (t+1)*bits)
    val bucketed = base.select(col("vec_id"), col("embedding"), col("nrm"),
      explode(array((0 until nTables).map { tbl =>
        struct(lit(tbl).as("tbl"), signatureForTable(col("embedding"), bits, tbl).as("sig"))
      }: _*)).as("b"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("b.tbl"), col("b.sig"))
    val probes = bucketed.filter(probeFilter)
      .select(col("tbl"), col("sig"), col("vec_id").as("probe_id"),
        col("embedding").as("emb_p"), col("nrm").as("nrm_p"))
    val cands = probes.join(bucketed, Seq("tbl", "sig"))
      .filter(col("probe_id") =!= col("vec_id"))
      .dropDuplicates("probe_id", "vec_id")
      .withColumn("cos",
        VectorFns.dot(col("emb_p"), col("embedding")) / (col("nrm_p") * col("nrm")))
    val w = Window.partitionBy("probe_id")
      .orderBy(round(col("cos"), 6).desc, col("vec_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cos_r"))
  }

  /** IVF (inverted-file) ANN: partition the corpus into k Voronoi
    * cells via KMeans centroids trained on a sample; each probe scans
    * only its nProbe nearest cells. The classic trade: train once,
    * then candidate generation is an equi-join on cell id — corpus
    * stays partitioned by cell, probes replicate nProbe× (tiny side).
    */
  def ivfTopK(emb: DataFrame, probeFilter: Column, k: Int,
      nCells: Int = 16, nProbe: Int = 4, trainSample: Int = 2000): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = emb.sparkSession

    val base = emb.select(col("vec_id"), col("embedding"),
      graft.functions.VectorFns.norm(col("embedding")).as("nrm"))
      .withColumn("features", array_to_vector(col("embedding")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // orderBy before limit => TakeOrderedAndProject: the training
    // sample (and thus the centroids) is deterministic across runs
    // and partitionings.
    val model = new KMeans().setK(nCells).setSeed(42)
      .setMaxIter(10).setFeaturesCol("features")
      .fit(base.orderBy("vec_id").limit(trainSample))
    val assigned = model.transform(base)
      .withColumnRenamed("prediction", "cell")
      .drop("features")

    // probe → its nProbe nearest cells, by exact distance to the
    // (broadcast) centroid table
    val centroids = spark.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (c, i) =>
        (i, c.toArray.map(_.toFloat)) }.toSeq)
      .toDF("cell", "centroid")
    val probes = assigned.filter(probeFilter)
      .select(col("vec_id").as("probe_id"), col("embedding").as("emb_p"),
        col("nrm").as("nrm_p"))
    val probeCells = probes.crossJoin(broadcast(centroids))
      .withColumn("dist2",
        graft.functions.VectorFns.dot(col("emb_p"), col("emb_p"))
          - lit(2.0) * graft.functions.VectorFns.dot(col("emb_p"), col("centroid"))
          + graft.functions.VectorFns.dot(col("centroid"), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("dist2"), col("cell"))))
      .filter(col("crank") <= nProbe)
      .select("probe_id", "emb_p", "nrm_p", "cell")

    val cands = probeCells.join(assigned, Seq("cell"))
      .filter(col("probe_id") =!= col("vec_id"))
      .withColumn("cos",
        graft.functions.VectorFns.dot(col("emb_p"), col("embedding"))
          / (col("nrm_p") * col("nrm")))
    val w = Window.partitionBy("probe_id")
      .orderBy(round(col("cos"), 6).desc, col("vec_id"))
    val out = cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cos_r"))
    out
  }

  /** Hyperplane signature whose planes are offset per table (plane
    * index j + tbl·bits), so tables are independent.
    */
  private def signatureForTable(a: Column, bits: Int, tbl: Int): Column =
    graft.functions.VectorFns.hyperplaneSignature(a, bits, planeOffset = tbl * bits)
}
