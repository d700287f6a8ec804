package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.CellAssignCache

/** The session cell-assignment cache (CellAssignCache): a cached
  * assignment must reproduce the direct in-query fit bit-for-bit for
  * every consumer op — the cache changes WHERE the fit runs, never
  * what any query returns.
  */
class CellAssignSpec extends SparkSpec {

  private def emb = Tables(spark, sf).embeddings
  private def key = s"$sf#embeddings"

  test("semanticDedup: cached == direct, row for row") {
    val direct = Similarity.semanticDedup(emb, tau = 0.4)
      .orderBy("vec_id").collect().toSeq
    val cached = Similarity.semanticDedup(emb, tau = 0.4,
      cacheKey = Some(key)).orderBy("vec_id").collect().toSeq
    assert(direct == cached)
  }

  test("knnGraph: cached == direct, edge for edge") {
    val direct = Similarity.knnGraph(emb, k = 4)
      .orderBy("vec_a", "vec_b").collect().toSeq
    val cached = Similarity.knnGraph(emb, k = 4, cacheKey = Some(key))
      .orderBy("vec_a", "vec_b").collect().toSeq
    assert(direct == cached)
  }

  test("clusterTopics: cached == direct, term for term") {
    val docs = Tables(spark, sf).documents
    val direct = Similarity.clusterTopics(emb, docs, nClusters = 8)
      .orderBy("cell", "rank").collect().toSeq
    val cached = Similarity.clusterTopics(emb, docs, nClusters = 8,
      cacheKey = Some(key)).orderBy("cell", "rank").collect().toSeq
    assert(direct == cached)
  }

  test("repeated calls reuse one build; reset forgets") {
    val d1 = CellAssignCache.dirFor(emb, key, cells = 16, trainSample = 2000)
    val d2 = CellAssignCache.dirFor(emb, key, cells = 16, trainSample = 2000)
    assert(d1 == d2)
    // distinct params → distinct artifact (different fit)
    val d3 = CellAssignCache.dirFor(emb, key, cells = 17, trainSample = 2000)
    assert(d3 != d1)
    CellAssignCache.reset()
    val d4 = CellAssignCache.dirFor(emb, key, cells = 16, trainSample = 2000)
    // reset forgets: the rebuild lands at a FRESH generation path (a
    // retired dir is never a live build target) and reads cleanly
    assert(d4 != d1)
    assert(spark.read.parquet(d4).count() == emb.count())
  }

  test("LRU eviction retires the least-recently-used dir; next build reclaims it") {
    CellAssignCache.reset()
    import spark.implicits._
    val tiny = (0L until 24L)
      .map(i => (i, Array.tabulate(4)(d => (i % 5 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val dirs = (0 until CellAssignCache.MaxLive + 1).map { i =>
      CellAssignCache.dirFor(tiny, s"tiny#$i", cells = 2, trainSample = 24)
    }
    assert(CellAssignCache.liveCount == CellAssignCache.MaxLive)
    // deletion is deferred: the evicted dir survives until the next
    // build starts (grace window for live lazy frames)
    assert(new java.io.File(dirs.head).exists(),
      "evicted dir deleted eagerly — must survive until the next build")
    assert(new java.io.File(dirs.last).exists())
    CellAssignCache.dirFor(tiny, "tiny#reclaim", cells = 2, trainSample = 24)
    assert(!new java.io.File(dirs.head).exists(),
      "retired dir must be reclaimed at the next build")
    CellAssignCache.reset()
  }
}
