package graft.sources

import org.apache.spark.sql.DataFrame

/** Session-scoped [[IvfIndex]] cache — the lifecycle that lets the
  * REGISTERED ANN queries stop re-fitting KMeans per call (the
  * repeated-probing access pattern a production ANN deployment runs:
  * the fit+assignment build is the expensive stage and is a pure
  * function of the corpus, so one process builds it once).
  *
  *  - Indexes live under one per-JVM temp root: every fresh process
  *    (each `graft.Verify` / `graft.Bench` run — sbt forks a JVM per
  *    runMain) starts empty and rebuilds lazily on first probe, so
  *    verification runs stay deterministic and self-contained while
  *    repeated probes within a process (Bench's warm-up + min-of-2,
  *    a long-lived driver's query stream) pay only probe-batch cost.
  *  - The KEY identifies an immutable corpus snapshot (callers use
  *    the table directory). If the underlying data is rewritten
  *    in-process, call [[reset]] — the cache cannot see the rewrite.
  *  - The build is the same seeded fit as `Similarity.ivfTopK`, so a
  *    cached-index probe returns ivfTopK's rows bit-for-bit
  *    (IvfIndexSpec pins the registry path).
  */
object AnnIndexCache {

  private lazy val root =
    java.nio.file.Files.createTempDirectory("graft-ann-index").toString

  /** Most-recently-used bound on live index dirs: a many-corpus
    * driver (one process probing N table snapshots) otherwise grows
    * one persisted index per corpus for the process lifetime — disk,
    * not heap, but unbounded. 4 covers every in-repo access pattern
    * (Verify/Bench touch one corpus; tests a handful) while an
    * evicted corpus transparently rebuilds on its next probe.
    */
  private[graft] val MaxLive = 4

  // access-ordered: iteration starts at the least-recently-used key
  private val built = new java.util.LinkedHashMap[String, String](16, 0.75f, true)

  /** The index directory for `key`, building from `emb` on first use.
    * Lookups and builds serialize on the cache lock (builds are rare
    * — once per corpus per process — and concurrent first probes for
    * the same key must not build twice). Past [[MaxLive]] corpora the
    * least-recently-probed index is DELETED from disk; any lazy frame
    * still pointing at an evicted dir must re-probe, same as after
    * [[reset]].
    */
  def dirFor(emb: DataFrame, key: String, nCells: Int = 0,
      trainSample: Int = 2000): String = built.synchronized {
    val have = built.get(key)
    if (have != null) have
    else {
      val d = s"$root/idx-${java.lang.Integer.toHexString(key.hashCode)}"
      IvfIndex.build(emb, d, nCells, trainSample)
      built.put(key, d)
      while (built.size > MaxLive) {
        val it = built.entrySet().iterator()
        val evict = it.next(); it.remove()
        deleteRecursively(new java.io.File(evict.getValue))
      }
      d
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Forget every cached index (in-process corpus rewrite, tests).
    * Files stay on disk under the temp root; forgotten keys rebuild
    * under a distinct path only if the root changes — same path +
    * rebuild is safe because IvfIndex.build refreshes file listings.
    */
  private[graft] def reset(): Unit = built.synchronized(built.clear())
}
