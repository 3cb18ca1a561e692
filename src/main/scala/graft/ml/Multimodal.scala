package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: images/audio/video ride through the engine
  * as opaque `binary` columns plus a typed metadata struct; decode /
  * feature-extraction runs batched per partition so a real decoder (JNI,
  * native lib) amortizes its init per task, not per row.
  *
  * The decode kernels themselves are STUBBED deterministically — the
  * image/audio libraries are not in this container — but the Spark-side
  * contract is the real one: schema, batch shape (mapPartitions with an
  * iterator), partition sizing, and the metadata struct a downstream
  * training pipeline keys on.
  */
object Multimodal {

  /** Attach a media envelope: payload bytes + metadata struct
    * (media_type, byte length, sha256 content address).
    */
  def withMediaEnvelope(df: DataFrame, payload: Column, mediaType: String): DataFrame =
    df.withColumn("media", struct(
      payload.as("bytes"),
      lit(mediaType).as("media_type"),
      length(payload).as("n_bytes"),
      sha2(payload, 256).as("content_id")))

  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("mean_luma", DoubleType)))

  /** STUB image decode: deterministic pseudo-dimensions from the byte
    * length (a real build replaces `decodeOne` with e.g. an ImageIO /
    * ffmpeg call — same signature, same batching).
    */
  private def decodeOne(bytes: Array[Byte]): Row = {
    if (bytes == null) Row(null, null, null, null)
    else {
      val n = bytes.length
      val w = 16 + (n % 256)
      val h = 16 + ((n / 256) % 256)
      val luma = math.round(((n % 1000) / 1000.0) * 1e6) / 1e6
      Row(w, h, 1, luma)
    }
  }

  /** Batched decode via mapPartitions: one decoder instance per partition,
    * rows streamed through it. Output = input columns + feature struct.
    */
  def decodeImages(df: DataFrame, bytesCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("image_features", imageFeatureSchema))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      // real impl: open decoder/native context HERE, once per task
      it.map { row =>
        val bytes = row.get(idx) match {
          case b: Array[Byte] => b
          case _ => null
        }
        Row.fromSeq(row.toSeq :+ decodeOne(bytes))
      }
    }(enc)
  }

  /** Frame sampling plumbing for video: every `stride`-th frame index up to
    * `maxFrames` — pure expression; the decode of each sampled frame would
    * go through the same mapPartitions kernel.
    */
  def sampleFrameIndices(nFrames: Column, stride: Int, maxFrames: Int): Column =
    slice(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride)),
      1, maxFrames)
}
