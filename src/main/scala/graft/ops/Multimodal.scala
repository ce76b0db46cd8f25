package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (extension mandate, SURVEY §2.3): image /
  * audio / video payloads as opaque `binary` columns beside a typed metadata
  * struct, with decode / feature-extraction / resize / frame-sampling
  * operators shaped for distributed batch execution.
  *
  * The actual codec work is STUBBED (this container carries no image/audio
  * libraries): `decodeStub` derives deterministic fake pixels/features from
  * the bytes. Everything around the stub — schema, batch iteration shape
  * (mapPartitions, one buffer reuse per partition, no per-row driver work),
  * partitioning, and the metadata contract — is real and tested; swapping the
  * stub for a JNI/javacv decoder changes one function.
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)
  ))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaType)
  ))

  /** Demo media table derived from any (id, text) table: payload = utf-8
    * bytes, metadata derived deterministically. Stands in for a real
    * `binaryFile` scan of an object store.
    */
  def demoMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("fake/raw").as("format"),
        (pmod(crc32(encode(col(textCol), "UTF-8")), lit(512)) + 16).cast("int").as("width"),
        (pmod(crc32(reverse(col(textCol)).cast("binary")), lit(512)) + 16).cast("int").as("height"),
        (pmod(length(col(textCol)), lit(64)) + 1).cast("int").as("n_frames")
      ).as("meta"))

  /** ======= STUB ======= deterministic fake "decode": bytes → k floats in
    * [0,1) (rolling sum over the byte stream). Replace with a real codec for
    * production; the call shape (whole payload in, fixed-size feature vector
    * out) is what a real decoder needs.
    */
  private[ops] def decodeStub(payload: Array[Byte], k: Int): Array[Float] = {
    val out = new Array[Float](k)
    if (payload == null || payload.isEmpty) return out
    var acc = 7L
    var i = 0
    while (i < payload.length) {
      acc = (acc * 31 + (payload(i) & 0xff)) % 1000003L
      out(i % k) = ((out(i % k) + acc.toFloat / 1000003f) % 1f)
      i += 1
    }
    out
  }

  /** Feature extraction over the payload column via mapPartitions: the
    * executor-side batch loop a real decoder would use (per-partition codec
    * init amortized across rows — the pattern that matters at scale; a UDF
    * would re-enter the codec per row).
    */
  def withFeatures(spark: SparkSession, media: DataFrame, k: Int = 8): DataFrame = {
    val outSchema = StructType(media.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (once, not per row)
      rows.map { r =>
        val feats = decodeStub(r.getAs[Array[Byte]](payloadIdx), k)
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** Frame sampling (video-shaped): split the payload into `meta.n_frames`
    * chunks, emit every `stride`-th chunk as (media_id, frame_no, frame_md5).
    * Pure column expressions — the explode keeps frames distributed without
    * materializing per-frame blobs on the driver.
    */
  def sampleFrames(media: DataFrame, stride: Int = 2): DataFrame = {
    val n = col("meta.n_frames")
    val frameLen = greatest(ceil(length(col("payload")) / n).cast("int"), lit(1))
    media
      .select(col("media_id"), col("payload"), n.as("n_frames"), frameLen.as("flen"))
      .select(col("media_id"),
        posexplode(transform(
          filter(sequence(lit(0), col("n_frames") - 1), f => f % stride === 0),
          f => md5(substring_binary(col("payload"), f * col("flen") + 1, col("flen"))))
        ).as(Seq("frame_no", "frame_md5")))
  }

  // substring over binary with column args: route through base64 stability —
  // Spark's substring(Column, Int, Int) doesn't take columns, so use expr.
  private def substring_binary(payload: org.apache.spark.sql.Column,
                               pos: org.apache.spark.sql.Column,
                               len: org.apache.spark.sql.Column) = {
    // substr(Column, Column) is available on Column
    payload.substr(pos, len)
  }

  /** "Resize" stub for images: truncate/pad payload to width*height bytes —
    * placeholder with the right data movement (map-only, no shuffle).
    */
  def resizeStub(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("payload",
      col("payload").substr(lit(1), lit(w * h)))
      .withColumn("meta", struct(
        col("meta.format").as("format"), lit(w).as("width"),
        lit(h).as("height"), col("meta.n_frames").as("n_frames")))
}
