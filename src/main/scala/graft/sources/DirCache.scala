package graft.sources

/** Shared lifecycle for the session-scoped on-disk artifact caches
  * ([[AnnIndexCache]] index dirs, [[CellAssignCache]] assignment
  * parquets): one per-JVM temp root, LRU of at most `maxLive` live
  * directories, lazy rebuild after eviction.
  *
  * Three rules hardened in round 9 (ADVICE r8):
  *
  *  - '''Collision-resistant names.''' Directories are named by the
  *    SHA-256 of the FULL key (truncated to 128 bits), not the 32-bit
  *    `hashCode` — a `hashCode` collision mapped two distinct
  *    (corpus, params) keys onto one directory and the second build
  *    silently overwrote the first while its map entry still pointed
  *    there.
  *  - '''Deferred deletion.''' Eviction does NOT delete immediately:
  *    results returned by consumers are LAZY frames that scan the
  *    directory at collect time, so an eager delete under a live
  *    reader fails with FAILED_READ_FILE. Evicted dirs park on a
  *    retire list and are deleted at the START of the next build —
  *    the liveMinhashCaches retirement pattern, giving outstanding
  *    frames a full build-to-build grace window (callers that hold
  *    results across many further builds must materialize them, which
  *    every in-repo consumer does).
  *  - '''Per-key builds.''' First builds for DIFFERENT keys run
  *    concurrently (a multi-corpus driver fits two corpora in
  *    parallel); concurrent calls for the SAME key build once — the
  *    second caller parks on the key's latch and reads the winner's
  *    directory. The old form serialized every build on one lock.
  */
private[sources] final class DirCache(prefix: String, maxLive: Int) {

  private lazy val root =
    java.nio.file.Files.createTempDirectory(s"graft-$prefix").toString

  // access-ordered: iteration starts at the least-recently-used key
  private val built = new java.util.LinkedHashMap[String, String](16, 0.75f, true)
  private val building =
    new java.util.HashMap[String, java.util.concurrent.CountDownLatch]
  // evicted dirs pending delete (freed at the next build's start)
  private val retired = new java.util.ArrayDeque[String]

  private def sha(key: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.take(16).map(b => f"$b%02x").mkString
  }

  /** The directory for `key`, running `build(dir)` on first use.
    * `build` must leave the directory readable on success and may
    * throw — a failed build releases the key so the next caller
    * retries.
    */
  def dirFor(key: String)(build: String => Unit): String = {
    while (true) {
      var latch: java.util.concurrent.CountDownLatch = null
      var mine: java.util.concurrent.CountDownLatch = null
      val have = built.synchronized {
        val d = built.get(key)
        if (d != null) d
        else {
          latch = building.get(key)
          if (latch == null) {
            mine = new java.util.concurrent.CountDownLatch(1)
            building.put(key, mine)
          }
          null
        }
      }
      if (have != null) return have
      if (latch != null) { latch.await(); /* winner done (or failed) */ }
      else {
        val dir = s"$root/$prefix-${sha(key)}"
        val doomed = built.synchronized {
          val ds = new java.util.ArrayList[String](retired)
          retired.clear(); ds
        }
        doomed.forEach(d => deleteRecursively(new java.io.File(d)))
        try {
          build(dir)
          built.synchronized {
            built.put(key, dir)
            while (built.size > maxLive) {
              val it = built.entrySet().iterator()
              val evict = it.next(); it.remove()
              retired.add(evict.getValue): Unit
            }
            building.remove(key): Unit
          }
          mine.countDown()
          return dir
        } catch {
          case t: Throwable =>
            built.synchronized { building.remove(key): Unit }
            mine.countDown()
            throw t
        }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Forget every cached entry (in-process corpus rewrite, tests).
    * Files stay on disk under the temp root; same key + rebuild under
    * the same path is safe because every builder refreshes file
    * listings after its overwrite (the IvfIndex lesson).
    */
  def reset(): Unit = built.synchronized { built.clear(); retired.clear() }

  private[sources] def liveCount: Int = built.synchronized(built.size)

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
