package graft

import org.apache.spark.sql.DataFrame

/** Cross-family session-cache ledger — ONE view of the storage
  * budget for every long-lived derived-artifact cache in the process
  * (minhash/substr pinned frames, ComponentsCache, RarityCache,
  * LearnCache). Each family already gates or bounds ITSELF, but the
  * gates were independent: five families each sized against the same
  * aggregate-storage/4 budget can together pin 5× it, and the §15.18
  * measurement showed exactly that (d_compress_ratio 12.1 s fresh vs
  * 27 s after family_keep's caches stayed pinned at blow-up scale).
  * The ledger caps the SUM: families register live entries with a
  * release callback; when the registered total crosses the shared
  * budget (Dedup.cacheBudgetBytes — aggregate executor heap / 4),
  * the least-recently-used entries across ALL families are released
  * until the total fits. Eviction is always safe — every registered
  * artifact rebuilds or recomputes on next use (the unpersist(false)
  * / LRU-rebuild contract each family already has).
  *
  * Entry bytes come from the cache manager's MEASURED InMemoryRelation
  * stats for persisted frames (accurate after the family's own eager
  * count) and from count × schema width for checkpoint-barrier frames
  * — see [[bytesOf]] for why propagated stats are unusable there.
  *
  * Locking: the ledger lock is held only for map bookkeeping. Release
  * callbacks run AFTER it is dropped, and families must call
  * [[register]] OUTSIDE their own cache locks — a release callback
  * re-enters the owning family's lock, so running one under a ledger
  * call made from inside another family's lock would be the classic
  * ABBA deadlock.
  */
object SessionCaches {

  private final case class Entry(bytes: Long, release: () => Unit)

  // access-ordered: iteration starts at the least-recently-used key
  private val live = new java.util.LinkedHashMap[String, Entry](32, 0.75f, true)

  private def fk(family: String, key: String) = s"$family\u0000$key"

  /** Test hook: a fixed budget in bytes (sys-prop
    * graft.cacheLedger.budget) so the eviction path is exercisable at
    * spec scale; production uses the shared cluster-storage budget.
    */
  private def budgetFor(df: DataFrame): Long =
    sys.props.get("graft.cacheLedger.budget").map(_.toLong)
      .getOrElse(graft.operators.Dedup.cacheBudgetBytes(df))

  /** Estimated live bytes of one registered artifact: measured cache
    * stats when persisted; count × schema width for checkpoint-barrier
    * frames. Propagated plan stats are NOT usable for the barrier
    * class — checkpoint preserves the ORIGIN plan's stats, and those
    * inflate through the build's joins (measured: the CC label frame
    * reported 523 TB, the BPE word frame 46 PB — registering either
    * at face value evicted every other family on the spot). The
    * count is a cheap cached-block scan: every registered frame is
    * materialized by its family's own eager build contract.
    */
  private[graft] def bytesOf(frames: Seq[DataFrame]): Long =
    frames.map { f =>
      org.apache.spark.sql.graftshim.GraftShim.cachedPlanBytes(f) match {
        case Some(sz) =>
          if (sz.isValidLong) sz.toLong else Long.MaxValue / 256
        case None =>
          val width = f.schema.fields.map(_.dataType.defaultSize).sum + 16L
          f.count() * width
      }
    }.foldLeft(0L)((a, b) => if (a + b < 0) Long.MaxValue else a + b)

  /** Register (or replace) a family's live entry and enforce the
    * shared budget. `release` must be idempotent and must both free
    * the storage AND forget the entry in the family's own
    * bookkeeping, so the artifact rebuilds on next use. The entry
    * being registered is never evicted by its own registration.
    */
  def register(family: String, key: String, frames: Seq[DataFrame])(
      release: () => Unit): Unit = {
    if (frames.isEmpty) return
    val k = fk(family, key)
    val bytes = bytesOf(frames)
    val budget = budgetFor(frames.head)
    val victims = live.synchronized {
      live.remove(k)
      live.put(k, Entry(bytes, release))
      var total = 0L
      live.values().forEach(e => total =
        if (total + e.bytes < 0) Long.MaxValue else total + e.bytes)
      val out = scala.collection.mutable.ArrayBuffer[(String, Entry)]()
      val it = live.entrySet().iterator()
      while (total > budget && live.size > 1 && it.hasNext) {
        val e = it.next()
        if (e.getKey != k) { // never evict the entry just registered
          out += ((e.getKey, e.getValue)); it.remove()
          total -= e.getValue.bytes
        }
      }
      out.toSeq
    }
    // eviction is rare and operationally significant — say so (the
    // StageProfile/ScaleCheck drives read this to attribute rebuilds)
    victims.foreach { case (vk, e) =>
      System.err.println(s"[cache-ledger] evict ${vk.replace('\u0000', ':')}" +
        s" (${e.bytes / 1048576} MB) for $family:$key")
      e.release()
    }
  }

  /** Mark a family's entry recently used (cache hit). */
  def touch(family: String, key: String): Unit =
    live.synchronized { live.get(fk(family, key)): Unit }

  /** Forget an entry WITHOUT releasing — the family already evicted
    * and freed it through its own LRU.
    */
  def drop(family: String, key: String): Unit =
    live.synchronized { live.remove(fk(family, key)): Unit }

  private[graft] def liveCount: Int = live.synchronized(live.size)

  /** Release and forget everything (tests, in-process corpus
    * rewrites). Runs releases outside the lock, same as register.
    */
  private[graft] def reset(): Unit = {
    val victims = live.synchronized {
      val vs = scala.collection.mutable.ArrayBuffer[Entry]()
      live.values().forEach(e => vs += e)
      live.clear()
      vs.toSeq
    }
    victims.foreach(_.release())
  }
}
