package graft

import java.io.File
import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DirCache

/** The shared on-disk artifact-cache lifecycle (DirCache) behind
  * AnnIndexCache and CellAssignCache: collision-resistant names,
  * generation-unique build paths, deferred deletion, per-key build
  * latches, reset epochs. Pure-JVM — no Spark session needed.
  */
class DirCacheSpec extends AnyFunSuite {

  private def write(dir: String, content: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "data"), content.getBytes("UTF-8")): Unit
  }

  private def readBack(dir: String): String =
    new String(Files.readAllBytes(Paths.get(dir, "data")), "UTF-8")

  test("hashCode-colliding keys get distinct directories") {
    val cache = new DirCache("spec-sha", maxLive = 8)
    // classic 32-bit collision pair — the old hashCode naming mapped
    // these onto ONE directory (silent wrong-corpus results)
    assert("Aa".hashCode == "BB".hashCode)
    val d1 = cache.dirFor("Aa")(write(_, "corpus-Aa"))
    val d2 = cache.dirFor("BB")(write(_, "corpus-BB"))
    assert(d1 != d2)
    assert(readBack(d1) == "corpus-Aa" && readBack(d2) == "corpus-BB")
  }

  test("concurrent same-key calls build exactly once") {
    val cache = new DirCache("spec-once", maxLive = 8)
    val builds = new AtomicInteger(0)
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val threads = (1 to 4).map { _ =>
      new Thread(() => {
        results.add(cache.dirFor("k") { dir =>
          builds.incrementAndGet()
          entered.countDown()
          assert(release.await(20, TimeUnit.SECONDS))
          write(dir, "built")
        }): Unit
      })
    }
    threads.foreach(_.start())
    // one thread is inside the builder; the rest must park on its
    // latch, not start their own builds
    assert(entered.await(20, TimeUnit.SECONDS))
    Thread.sleep(100)
    assert(builds.get == 1)
    release.countDown()
    threads.foreach(_.join(20000))
    assert(builds.get == 1)
    assert(results.size == 4 && results.stream().distinct().count() == 1)
  }

  test("builds for different keys run concurrently") {
    val cache = new DirCache("spec-par", maxLive = 8)
    // each builder waits for the OTHER to have started: passes only
    // if the two builds genuinely overlap (the old single-lock form
    // deadlocks here, caught by the await timeout)
    val aIn = new CountDownLatch(1)
    val bIn = new CountDownLatch(1)
    var ok = true
    val ta = new Thread(() => {
      cache.dirFor("a") { dir =>
        aIn.countDown()
        if (!bIn.await(20, TimeUnit.SECONDS)) ok = false
        write(dir, "a")
      }: Unit
    })
    val tb = new Thread(() => {
      cache.dirFor("b") { dir =>
        bIn.countDown()
        if (!aIn.await(20, TimeUnit.SECONDS)) ok = false
        write(dir, "b")
      }: Unit
    })
    ta.start(); tb.start()
    ta.join(30000); tb.join(30000)
    assert(ok, "different-key builds did not overlap")
    assert(cache.liveCount == 2)
  }

  test("eviction defers deletion to the next build; rebuild lands on a fresh path") {
    val cache = new DirCache("spec-evict", maxLive = 1)
    val d1 = cache.dirFor("k1")(write(_, "one"))
    val d2 = cache.dirFor("k2")(write(_, "two"))
    // k1 evicted but NOT deleted — grace window for live lazy readers
    assert(cache.liveCount == 1 && cache.retiredCount == 1)
    assert(new File(d1).exists() && readBack(d1) == "one")
    // the next build drains the retire list
    val d3 = cache.dirFor("k3")(write(_, "three"))
    assert(!new File(d1).exists(), "retired dir must be deleted at next build")
    // k2 now retired-but-present; its rebuild goes to a FRESH
    // generation path, never back into the dir pending deletion
    assert(new File(d2).exists())
    val d2b = cache.dirFor("k2")(write(_, "two-rebuilt"))
    assert(d2b != d2)
    assert(!new File(d2).exists(), "k2's retired dir reclaimed by its rebuild")
    assert(readBack(d2b) == "two-rebuilt")
    // d3 was evicted by k2's rebuild: retired but still readable
    assert(new File(d3).exists() && cache.retiredCount == 1)
  }

  test("failed build retires its partial dir and the next call retries") {
    val cache = new DirCache("spec-fail", maxLive = 8)
    val boom = intercept[RuntimeException] {
      cache.dirFor("k") { dir =>
        write(dir, "partial")
        throw new RuntimeException("builder failure")
      }
    }
    assert(boom.getMessage == "builder failure")
    assert(cache.liveCount == 0 && cache.retiredCount == 1)
    // retry succeeds on a fresh path; the partial dir is reclaimed at
    // this build's start
    val d = cache.dirFor("k")(write(_, "good"))
    assert(readBack(d) == "good")
    assert(cache.retiredCount == 0)
  }

  test("reset during an in-flight build discards the stale result and rebuilds") {
    val cache = new DirCache("spec-epoch", maxLive = 8)
    val builds = new AtomicInteger(0)
    val firstIn = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    @volatile var got: String = null
    val t = new Thread(() => {
      got = cache.dirFor("k") { dir =>
        val n = builds.incrementAndGet()
        if (n == 1) { firstIn.countDown(); assert(release.await(20, TimeUnit.SECONDS)) }
        write(dir, s"build-$n")
      }
    })
    t.start()
    assert(firstIn.await(20, TimeUnit.SECONDS))
    // corpus rewritten while build 1 is in flight: its result is
    // pre-rewrite and must not be served
    cache.reset()
    release.countDown()
    t.join(30000)
    assert(builds.get == 2, "stale-epoch result was not rebuilt")
    assert(readBack(got) == "build-2")
    // and a later caller sees the post-reset build, not the stale one
    assert(cache.dirFor("k")(_ => fail("should be cached")) == got)
  }

  test("reset retires live dirs for deferred reclamation") {
    val cache = new DirCache("spec-reset", maxLive = 8)
    val d1 = cache.dirFor("k1")(write(_, "one"))
    cache.reset()
    assert(cache.liveCount == 0)
    // still readable until the next build (grace window)...
    assert(new File(d1).exists())
    val d2 = cache.dirFor("k1")(write(_, "one-v2"))
    // ...then reclaimed; rebuild is a fresh path with fresh content
    assert(!new File(d1).exists())
    assert(d2 != d1 && readBack(d2) == "one-v2")
  }
}
