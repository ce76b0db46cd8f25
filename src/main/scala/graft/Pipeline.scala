package graft

import graft.model.JsonSchema
import graft.ops.{Corpus, Evolution, Extract, InferSchema, Validate}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's main entry point, end to end (`app.py:296-366`, SURVEY
  * §3.1): ingest → extract patterns → infer schema → evolve version →
  * validate → stamp metadata → append to corpus.
  *
  * Spark shape: one map-only codegen'd chain over the batch plus exactly one
  * tiny aggregation (schema inference, whose shuffle key cardinality is the
  * number of distinct field names) and one driver-side control-plane step
  * (the version state machine — same single-writer semantics as the
  * reference). Nothing per-record ever reaches the driver; the chain scales
  * linearly with executors.
  */
object Pipeline {

  final case class IngestResult(
      version: Int,
      schema: JsonSchema,
      recordCount: Long,
      cleanCount: Long,
      flaggedCount: Long)

  /** Run the full ingest pipeline for one batch of records.
    *
    * @param batch records as a DataFrame (any reader output); a `content`
    *              column, if present, feeds pattern extraction like the
    *              reference's `content` field.
    */
  def ingest(spark: SparkSession, batch: DataFrame, corpusDir: String): IngestResult = {
    // F2 — extract patterns from content (empty struct when none)
    val withPatterns = Extract.withExtractedPatterns(batch)

    // Render each record as canonical JSON once; everything downstream
    // (inference, validation, storage) is schema-on-read over this blob,
    // exactly like the reference's dict -> json.dumps record model.
    val payloadCols = withPatterns.columns
    val asJson = withPatterns
      .withColumn("data", to_json(struct(payloadCols.map(col).toSeq: _*)))

    // A1 — whole-batch schema inference (strict-parity string mode)
    val schema = InferSchema.infer(asJson, "data")
      .getOrElse(return IngestResult(new Evolution(spark, corpusDir).latestVersion, JsonSchema(Map.empty, Nil), 0, 0, 0))

    // A2/W2 — version state machine (driver-side control plane)
    val evo = new Evolution(spark, corpusDir)
    val version = evo.evolve(schema, schema.fieldNames)

    // V1 — per-record quality issues against the (just-stored) schema
    val validated = Validate.withQualityIssues(asJson, schema, "data")

    // M1 + W1 — stamp metadata, serialize, append (single vectorized write)
    val stamped = Corpus.stampAndSerialize(validated.drop("data"), version)
    Corpus.append(stamped, corpusDir)

    val stored = Corpus.records(spark, corpusDir)
      .filter(col("schema_version") === version)
    val (clean, flagged) = Validate.qualityCounts(
      stored.withColumn("_quality_issues",
        coalesce(col("quality_issues"), array().cast("array<string>"))))
    IngestResult(version, schema, stored.count(), clean, flagged)
  }
}
