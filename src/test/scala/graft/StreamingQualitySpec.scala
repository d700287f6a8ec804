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
