package graft

import org.apache.spark.sql.DataFrame

/** The cross-family session-cache ledger: one shared budget, LRU
  * eviction ACROSS families (the §15.18 fix — five families each
  * gating on their own view of the same budget could pin 5× it).
  */
class SessionCachesSpec extends SparkSpec {

  private def mk(k: Int): DataFrame = {
    // distinct row counts → distinct canonicalized plans (identical
    // plans would share one CacheManager entry and alias the frames)
    val df = spark.range(k * 1000L).toDF(s"id$k")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.count()
    df
  }

  test("evicts least-recently-used across families once the sum crosses the budget") {
    SessionCaches.reset()
    var released = List[String]()
    // d aliases a's cache entry (same canonical plan) — only its
    // SIZE matters to the ledger, and eviction math needs it small
    val a = mk(1); val b = mk(2); val c = mk(3); val d = mk(1)
    val unit = SessionCaches.bytesOf(Seq(a))
    assert(unit > 0, "persisted frame must report measured cache bytes")
    val u2 = SessionCaches.bytesOf(Seq(b))
    val u3 = SessionCaches.bytesOf(Seq(c))
    // budget admits a+b+c minus a sliver: the third registration must
    // evict exactly the LRU entry (a), from a DIFFERENT family
    sys.props("graft.cacheLedger.budget") = (unit + u2 + u3 - 1).toString
    try {
      SessionCaches.register("famA", "k", Seq(a))(() => released ::= "a")
      SessionCaches.register("famB", "k", Seq(b))(() => released ::= "b")
      assert(released.isEmpty)
      SessionCaches.register("famC", "k", Seq(c))(() => released ::= "c")
      assert(released == List("a"), "cross-family LRU evicts the oldest")
      // a hit re-orders: famB becomes most-recent, so the next
      // over-budget registration evicts famC, not famB
      SessionCaches.touch("famB", "k")
      SessionCaches.register("famD", "k", Seq(d))(() => released ::= "d")
      assert(released.contains("c") && !released.contains("b"))
      // re-registering a family+key replaces, never double-counts
      SessionCaches.register("famB", "k", Seq(b))(() => released ::= "b2")
      assert(SessionCaches.liveCount <= 3)
    } finally {
      sys.props.remove("graft.cacheLedger.budget")
      SessionCaches.reset()
      Seq(a, b, c, d).foreach(_.unpersist(false))
    }
  }

  test("family wiring: a released entry rebuilds on next use") {
    SessionCaches.reset()
    val docs = Tables(spark, sf).documents
    val s1 = graft.operators.Retrieval.RarityCache.statsFor(docs, "soak-test")
    val s2 = graft.operators.Retrieval.RarityCache.statsFor(docs, "soak-test")
    assert(s1 eq s2, "second call is a cache hit")
    assert(SessionCaches.liveCount >= 1)
    SessionCaches.reset() // global release path → family forgets too
    val s3 = graft.operators.Retrieval.RarityCache.statsFor(docs, "soak-test")
    assert(!(s1 eq s3), "released entry must rebuild, not dangle")
    // and the rebuilt stats are identical rows
    assert(s1.orderBy("doc_id").collect().toSeq ==
      s3.orderBy("doc_id").collect().toSeq)
    SessionCaches.reset()
  }
}
