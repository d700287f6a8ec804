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

  /** Hyperplane signature whose planes are offset per table (plane
    * index j + tbl·bits), so tables are independent.
    */
  private def signatureForTable(a: Column, bits: Int, tbl: Int): Column =
    graft.functions.VectorFns.hyperplaneSignature(a, bits, planeOffset = tbl * bits)
}
