package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema shape, deterministic stub features, frame
  * sampling stride semantics. The decode itself is a labeled stub (no codec
  * libraries in this environment) — these tests pin the Spark-side contract.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.demoMediaTable(
    Seq((1L, "some text payload for media"), (2L, "x")).toDF("id", "text"), "id", "text")

  test("demo media table shape: media_id, payload binary, meta struct") {
    val df = media
    assert(df.columns.contains("media_id") && df.columns.contains("payload"))
    val meta = df.select("meta.*").columns.toSet
    assert(Set("width", "height", "n_frames").subsetOf(meta))
  }

  test("withFeatures returns fixed-length float features, deterministic") {
    val f1 = Multimodal.withFeatures(spark, media)
      .select(col("media_id"), col("features")).orderBy("media_id").collect()
    val f2 = Multimodal.withFeatures(spark, media)
      .select(col("media_id"), col("features")).orderBy("media_id").collect()
    assert(f1.map(_.getSeq[Float](1).toSeq).toSeq == f2.map(_.getSeq[Float](1).toSeq).toSeq)
    assert(f1.forall(_.getSeq[Float](1).nonEmpty))
  }

  test("resizeStub truncates the payload and rewrites meta dims") {
    val out = Multimodal.resizeStub(media, 4, 3)
    val r = out.select(col("meta.width"), col("meta.height"), length(col("payload")))
      .orderBy(col("media_id")).collect()
    assert(r.forall(_.getInt(0) == 4))
    assert(r.forall(_.getInt(1) == 3))
    assert(r.forall(_.getInt(2) <= 12))
  }

  test("sampleFrames keeps every stride-th frame, renumbered densely") {
    val frames = Multimodal.sampleFrames(media, stride = 2)
      .filter(col("media_id") === 1).orderBy("frame_no").collect()
    val nos = frames.map(_.getAs[Int]("frame_no")).toSeq
    assert(nos == nos.indices.toSeq, "frame_no must be dense 0..k")
  }
}
