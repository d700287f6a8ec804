package graft

import graft.functions.MediaCodecs
import graft.operators.MediaOps

class MediaOpsSpec extends SparkSpec {

  test("header parse recovers exactly what the builders wrote (property)") {
    val rnd = new scala.util.Random(7)
    (1 to 60).foreach { k =>
      val w = 1 + rnd.nextInt(300)
      val h = 1 + rnd.nextInt(200)
      val colorType = Array(0, 2, 6)(rnd.nextInt(3))
      val png = MediaCodecs.parsePng(MediaCodecs.buildPng(w, h, colorType, k)).get
      assert(png.fmt == "png" && png.width.contains(w) && png.height.contains(h)
        && png.bitDepth.contains(8)
        && png.channels.contains(Map(0 -> 1, 2 -> 3, 6 -> 4)(colorType)), s"png $w x $h")

      val nc = if (rnd.nextBoolean()) 1 else 3
      val jw = 1 + rnd.nextInt(65535); val jh = 1 + rnd.nextInt(65535)
      val jpg = MediaCodecs.parseJpeg(MediaCodecs.buildJpeg(jw, jh, nc, k)).get
      assert(jpg.fmt == "jpeg" && jpg.width.contains(jw) && jpg.height.contains(jh)
        && jpg.bitDepth.contains(8) && jpg.channels.contains(nc), s"jpeg $jw x $jh")

      val rate = 4000 + rnd.nextInt(44100); val ch = 1 + rnd.nextInt(2)
      val wav = MediaCodecs.parseWav(
        MediaCodecs.buildWav(rate, ch, rnd.nextInt(500), k)).get
      assert(wav.fmt == "wav" && wav.sampleRate.contains(rate)
        && wav.channels.contains(ch) && wav.bitDepth.contains(16), s"wav $rate/$ch")
    }
  }

  test("parse rejects corrupt and foreign bytes instead of misreading") {
    assert(MediaCodecs.parse(Array.emptyByteArray).isEmpty)
    assert(MediaCodecs.parse(Array.fill(64)(0x41.toByte)).isEmpty)
    val png = MediaCodecs.buildPng(10, 10, 2, 1)
    png(14) = 'X'.toByte // break the IHDR tag
    assert(MediaCodecs.parsePng(png).isEmpty)
    val jpg = MediaCodecs.buildJpeg(10, 10, 3, 1)
    // truncate before SOF0: walker must give up, not read junk
    assert(MediaCodecs.parseJpeg(java.util.Arrays.copyOf(jpg, 8)).isEmpty)
  }

  test("feature extraction decodes real header values, distributed") {
    val media = MediaOps.syntheticMedia(spark, 40).repartition(4)
    val feats = MediaOps.extractFeatures(media)
    assert(feats.schema == MediaOps.featureSchema)
    val rows = feats.collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      val f = r.getSeq[Float](r.fieldIndex("feature"))
      assert(f.length == 8)
      assert(math.abs(f.sum - 1.0f) < 1e-3, "byte-bucket histogram sums to 1")
      // every payload must parse — the synthetic files are valid
      assert(r.getString(r.fieldIndex("fmt")) != null, s"unparsed: $r")
    }
    // decoded dimensions come from the BYTES and must equal the
    // metadata columns the builder recorded
    val joined = feats.as("f")
      .join(media.select("media_id", "width", "height").as("m"), "media_id")
    val mismatched = joined.filter(
      "(m.width IS DISTINCT FROM f.width) OR (m.height IS DISTINCT FROM f.height)")
    assert(mismatched.count() == 0, mismatched.collect().mkString("\n"))
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
