package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.3 #32): image/audio/video
  * as opaque binary columns + typed metadata, with partition-aware
  * batched "decode" — the Spark-side shape (schema, partitioning,
  * batch iteration) is real and tested; the actual codec call is a
  * clearly-marked deterministic STUB because no media libraries ship
  * in this environment.
  *
  * Scale: decode runs via mapPartitions so a real codec would be
  * initialized once per partition (not per row) and rows stream
  * through in batches; media bytes never hit the driver.
  */
object MediaOps {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("payload", BinaryType, nullable = false)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** STUB decode: a real implementation would hand `payload` to a
    * codec (JPEG/PNG/ffmpeg) here. The stub derives a deterministic
    * 8-dim "feature" from byte statistics so tests are reproducible
    * and the dataflow is identical to the real thing.
    */
  private[operators] def stubDecode(payload: Array[Byte]): Array[Float] = {
    // ??? <- real codec call goes here; deterministic fake below
    val buckets = new Array[Long](8)
    var i = 0
    while (i < payload.length) {
      buckets((payload(i) & 0xFF) >>> 5) += 1
      i += 1
    }
    val n = math.max(payload.length, 1).toFloat
    buckets.map(_ / n)
  }

  /** Batched feature extraction over the binary column. One codec
    * init per partition; constant memory per row.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "mime", "payload").mapPartitions { rows =>
      // (real codec would be initialized HERE, once per partition)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        Row(r.getLong(0), r.getString(1), payload.length,
          stubDecode(payload))
      }
    }(enc)
  }

  /** STUB resize: a real implementation transforms pixels; the stub
    * truncates/pads the payload deterministically, keeping the
    * metadata arithmetic (aspect-correct target size) real. Batched
    * via mapPartitions like extractFeatures — a real resampler would
    * be initialized once per partition, never per row.
    */
  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    media.select("media_id", "mime", "width", "height", "payload")
      .mapPartitions { rows =>
        // (real pixel resampler initialized HERE, once per partition)
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val w = if (r.isNullAt(2)) 1 else math.max(r.getInt(2), 1)
          val h = if (r.isNullAt(3)) 1 else math.max(r.getInt(3), 1)
          // ??? <- real pixel resample goes here
          val outLen = math.max(1, payload.length.toLong * (targetW.toLong * targetH)
            / (w.toLong * h)).toInt
          Row(r.getLong(0), r.getString(1), targetW, targetH,
            java.util.Arrays.copyOf(payload, math.min(outLen, payload.length)))
        }
      }(enc)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** Frame sampling for video-like payloads: split the payload into
    * `nFrames` evenly spaced chunks (stub for keyframe extraction),
    * one output row per frame. The explosion happens INSIDE
    * mapPartitions — one decoder pass per source row emits all its
    * frames, the shape a real video pipeline has (vs. per-(row,frame)
    * re-decode that an explode + UDF would do).
    */
  def sampleFrames(media: DataFrame, nFrames: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(frameSchema)
    media.select("media_id", "mime", "payload")
      .mapPartitions { rows =>
        // (real demuxer/decoder initialized HERE, once per partition)
        rows.flatMap { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          // ??? <- real keyframe decode goes here
          val chunk = math.max(1, payload.length / nFrames)
          (0 until nFrames).iterator.map { idx =>
            val from = math.min(idx * chunk, math.max(payload.length - 1, 0))
            Row(r.getLong(0), r.getString(1), idx,
              java.util.Arrays.copyOfRange(payload, from,
                math.min(from + chunk, payload.length)))
          }
        }
      }(enc)
  }

  /** Deterministic synthetic media table for tests/demo. */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val rnd = new scala.util.Random(i)
      val len = 256 + rnd.nextInt(768)
      val payload = Array.fill(len)(rnd.nextInt(256).toByte)
      (i.toLong, if (i % 2 == 0) "image/png" else "audio/wav",
        Some(64 + i % 32), Some(48 + i % 24), payload)
    }.toDF("media_id", "mime", "width", "height", "payload")
  }
}
