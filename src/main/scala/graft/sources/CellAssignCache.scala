package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Session-scoped KMeans cell-assignment cache — [[AnnIndexCache]]'s
  * lifecycle for the cell-BLOCKED embedding ops (semanticDedup,
  * knnGraph, clusterTopics). Those three each ran their own fit +
  * assignment per call while the ANN family shared one persisted
  * index per corpus per process; the fit+assignment is a pure
  * function of (corpus, cells, trainSample), so one process builds
  * it once and every consumer reads the assignment back
  * ("assign every vector to a cell once, reuse everywhere" — the
  * production shape for a curation pass that runs semdedup, a knn
  * graph and a topic report over the same corpus snapshot).
  *
  * The stored artifact is one parquet of
  * `(vec_id, cell, code, qs, nrm, embedding)` — the IvfIndex codes
  * row WITHOUT the partitionBy(cell) hive layout: these consumers
  * scan EVERY cell (no probe-side pruning to exploit), so one flat
  * dataset avoids the cells-many small-file directories and the ops
  * re-shuffle by cell themselves. SQ8 codes ride along because the
  * knnGraph scan wants them and they are narrow deterministic
  * per-row expressions; float embeddings round-trip parquet exactly,
  * so a cached read reproduces the direct fit bit-for-bit
  * (CellAssignSpec pins direct == cached per op).
  *
  * Naming, eviction, and build concurrency delegate to [[DirCache]]
  * (SHA-256 names, generation-unique build paths, deferred deletion,
  * per-key build latches); keys name an immutable corpus snapshot +
  * the fit params, and in-process corpus rewrites need [[reset]].
  * MaxLive is 8, not 4: each corpus holds up to three entries (one
  * per op's cell sizing), and the SoakCheck A→B→A drive keeps two
  * corpora live.
  */
object CellAssignCache {

  private[graft] val MaxLive = 8

  private val cache = new DirCache("cell-asn", MaxLive)

  /** The assignment directory for (key, cells, trainSample), building
    * from `emb` on first use. First builds for different keys run
    * concurrently; concurrent calls for the same key build once.
    */
  def dirFor(emb: DataFrame, key: String, cells: Int,
      trainSample: Int): String =
    cache.dirFor(s"$key#c=$cells#t=$trainSample") { dir =>
      buildTo(emb, dir, cells, trainSample)
    }

  /** The same seeded k-means|| fit the direct ops run (the shared
    * [[graft.operators.Similarity]] fit: deterministic orderBy-limit
    * training sample), then one narrow coded projection written out.
    */
  private def buildTo(emb: DataFrame, dir: String, cells: Int,
      trainSample: Int): Unit = {
    import org.apache.spark.ml.functions.array_to_vector
    val base = emb.select(col("vec_id"), col("embedding"),
      graft.functions.VectorFns.norm(col("embedding")).as("nrm"))
      .withColumn("features", array_to_vector(col("embedding")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // unpersist in finally: a failed fit/write otherwise leaks this
    // corpus-sized cached frame for the process lifetime, and DirCache
    // retries would pin another copy per attempt
    try {
      base.count()
      val model =
        graft.operators.Similarity.fitKMeansShared(base, cells, trainSample)
      model.transform(base)
        .withColumnRenamed("prediction", "cell")
        .select(col("vec_id"), col("cell"),
          graft.plans.native.sq8Code(col("embedding")).as("code"),
          graft.plans.native.sq8Scale(col("embedding")).as("qs"),
          col("nrm"), col("embedding"))
        .write.mode("overwrite").parquet(dir)
    } finally base.unpersist()
  }

  private[graft] def liveCount: Int = cache.liveCount

  /** Forget every cached assignment (in-process corpus rewrite,
    * tests).
    */
  private[graft] def reset(): Unit = cache.reset()
}
