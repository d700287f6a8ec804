package graft

import graft.operators.MediaOps

class MediaOpsSpec extends SparkSpec {

  test("feature extraction is partition-parallel, deterministic, 8-dim") {
    val media = MediaOps.syntheticMedia(spark, 40).repartition(4)
    val feats = MediaOps.extractFeatures(media)
    assert(feats.schema == MediaOps.featureSchema)
    val rows = feats.collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      val f = r.getSeq[Float](3)
      assert(f.length == 8)
      assert(math.abs(f.sum - 1.0f) < 1e-3, "byte-bucket histogram sums to 1")
    }
    // determinism across runs
    val again = MediaOps.extractFeatures(media).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("resize rewrites metadata and shrinks payload") {
    val media = MediaOps.syntheticMedia(spark, 10)
    val out = MediaOps.resize(media, 32, 24).collect()
    out.foreach { r =>
      assert(r.getAs[Int]("width") == 32 && r.getAs[Int]("height") == 24)
      assert(r.getAs[Array[Byte]]("payload").nonEmpty)
    }
  }

  test("frame sampling explodes to n rows per media") {
    val media = MediaOps.syntheticMedia(spark, 6)
    val frames = MediaOps.sampleFrames(media, 4)
    assert(frames.count() == 24)
    assert(frames.columns.contains("frame_idx") && frames.columns.contains("frame"))
  }
}
