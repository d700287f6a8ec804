package graft.sources

import java.util.concurrent.ConcurrentHashMap
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

  private val built = new ConcurrentHashMap[String, String]()

  /** The index directory for `key`, building from `emb` on first use.
    * Concurrent first probes for the same key serialize on the build
    * (computeIfAbsent), so the index is never built twice.
    */
  def dirFor(emb: DataFrame, key: String, nCells: Int = 0,
      trainSample: Int = 2000): String =
    built.computeIfAbsent(key, _ => {
      val d = s"$root/idx-${java.lang.Integer.toHexString(key.hashCode)}"
      IvfIndex.build(emb, d, nCells, trainSample)
      d
    })

  /** Forget every cached index (in-process corpus rewrite, tests).
    * Files stay on disk under the temp root; forgotten keys rebuild
    * under a distinct path only if the root changes — same path +
    * rebuild is safe because IvfIndex.build refreshes file listings.
    */
  private[graft] def reset(): Unit = built.clear()
}
