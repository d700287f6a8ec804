package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingQuality

class StreamingQualitySpec extends SparkSpec {

  test("streamed perplexity buckets match the batch op row-for-row") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = Tables(spark, sf).documents
    val model = StreamingQuality.fit(docs)
    val batch = graft.operators.Retrieval.perplexityBucket(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))).toSet

    val rows = docs.select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect()
    val mem = MemoryStream[(Long, String, String)]
    // two micro-batches: parity must not depend on arrival batching
    val (a, b) = rows.splitAt(rows.length / 2)
    mem.addData(a.toSeq: _*)
    val q = StreamingQuality.bucketStream(
        mem.toDF().toDF("doc_id", "lang", "text"), model)
      .writeStream.format("memory").queryName("ppl_stream")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    mem.addData(b.toSeq: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("ppl_stream")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("model refresh: a restarted stream under a refit model matches that model's batch twin") {
    // the deployment lifecycle: the filter runs under model A, a
    // refit produces model B, the (stateless) query restarts under B
    // — each phase must match ITS OWN model's batch assignment, and
    // the swap must actually change assignments where the models
    // disagree
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val corpusA = Tables(spark, sf).documents
    // model B trains on the clean half only — different LM + bounds
    val corpusB = corpusA.filter(
      org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
    val mA = StreamingQuality.fit(corpusA)
    val mB = StreamingQuality.fit(corpusB)
    val rows = corpusA.select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect()

    def streamUnder(m: StreamingQuality.PerplexityModel, name: String) = {
      val mem = MemoryStream[(Long, String, String)]
      mem.addData(rows.toSeq: _*)
      val q = StreamingQuality.bucketStream(
          mem.toDF().toDF("doc_id", "lang", "text"), m)
        .writeStream.format("memory").queryName(name)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
      q.processAllAvailable(); q.stop()
      spark.table(name).collect()
        .map(r => r.getLong(0) -> r.getString(5)).toMap
    }
    val underA = streamUnder(mA, "swap_a")
    val underB = streamUnder(mB, "swap_b")
    val batchB = graft.operators.Retrieval.perplexityBucket(corpusB)
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    // phase B matches model B's batch twin on B's own docs
    batchB.foreach { case (id, b) => assert(underB(id) == b, s"doc $id") }
    assert(underA != underB, "refit must change some assignments")
  }

  test("fit refuses a vocab over the deployable-artifact cap") {
    val docs = Tables(spark, sf).documents
    val e = intercept[IllegalArgumentException] {
      StreamingQuality.fit(docs, maxVocab = 10)
    }
    assert(e.getMessage.contains("vocab"))
  }

  test("unknown language and empty text are dropped, not mis-bucketed") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = Tables(spark, sf).documents
    val model = StreamingQuality.fit(docs)
    val mem = MemoryStream[(Long, String, String)]
    mem.addData((1L, "xx_unknown", "some words here to score"),
      (2L, "en", ""), (3L, "en", "one"))
    val q = StreamingQuality.bucketStream(
        mem.toDF().toDF("doc_id", "lang", "text"), model)
      .writeStream.format("memory").queryName("ppl_edge")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    // "xx_unknown" has no boundaries; "" and "one" have no bigrams —
    // the same rows the batch explode / inner boundary join drop
    assert(spark.table("ppl_edge").count() == 0)
  }
}
