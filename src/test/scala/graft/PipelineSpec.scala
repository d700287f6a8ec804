package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, DedupPipeline, Similarity, SkewJoin}

class PipelineSpec extends SparkSpec {

  test("deduped corpus removes exactly the duplicate-component extras") {
    val docs = Tables(spark, sf).documents
    val total = docs.count()
    val edges = DedupPipeline.duplicateEdges(docs, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // expected component structure via union-find on the driver (test
    // oracle only — the operator itself is fully distributed)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val docsInComponents = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val nComponents = docsInComponents.map(find).distinct.length
    val expectedKept = total - docsInComponents.length + nComponents

    val kept = DedupPipeline.dedupedCorpus(docs, threshold = 0.8)
    assert(kept.count() == expectedKept)
    // representatives are component minima
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    docsInComponents.groupBy(find).foreach { case (_, members) =>
      val m = members.min
      assert(keptIds.contains(m))
      members.filter(_ != m).foreach(x => assert(!keptIds.contains(x)))
    }
  }

  test("salted join equals plain join") {
    val t = Tables(spark, sf)
    val orders = t.orders
    val customer = t.customer
    val plain = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"))
      .select("o_orderkey", "c_name")
      .collect().map(_.toString).sorted
    val salted = SkewJoin.saltedJoin(t.orders, t.customer,
        "o_custkey", "c_custkey", nSalts = 8)
      .select("o_orderkey", "c_name")
      .collect().map(_.toString).sorted
    assert(plain.sameElements(salted))
  }

  test("ivf ann overlaps brute-force top-k with bounded candidate work") {
    val emb = Tables(spark, sf).embeddings
    val brute = Similarity.bruteForceTopK(emb, col("vec_id") % 50 === 0, k = 5)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, col("vec_id") % 50 === 0, k = 5,
      nCells = 8, nProbe = 4)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall > 0.3, s"ivf recall $recall")
  }
}
