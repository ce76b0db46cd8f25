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
    * @param idCol natural unique key to use as the record id (deterministic,
    *              oracle-checkable); default = corpus-seeded ascending ids
    *              (AUTOINCREMENT parity, `app.py:169-173`).
    */
  def ingest(spark: SparkSession, batch: DataFrame, corpusDir: String,
             idCol: Option[String] = None): IngestResult = {
    // F2 — extract patterns from content (empty struct when none)
    val withPatterns = Extract.withExtractedPatterns(batch)

    // Render each record as canonical JSON once; everything downstream
    // (inference, validation, storage) is schema-on-read over this blob,
    // exactly like the reference's dict -> json.dumps record model. Null
    // fields stay present (the reference's dicts always carry the key; its
    // stringification maps None -> "" only inside inference, app.py:253-261).
    val payloadCols = withPatterns.columns
    // The batch feeds four separate jobs (inference count + presence agg,
    // the store write, the counter agg) — persist it across them instead of
    // re-running the source read + extraction chain per job. A batch is
    // bounded (it is one upload / micro-batch, never the corpus), so
    // MEMORY_AND_DISK is safe at scale; released before returning.
    val asJson = withPatterns
      .withColumn("data", to_json(struct(payloadCols.map(col).toSeq: _*),
        Map("ignoreNullFields" -> "false")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try ingestPersisted(spark, asJson, corpusDir, idCol)
    finally asJson.unpersist(blocking = false)
  }

  private def ingestPersisted(spark: SparkSession, asJson: DataFrame,
                              corpusDir: String, idCol: Option[String]): IngestResult = {
    // A1 — whole-batch schema inference (strict-parity string mode)
    val schema = InferSchema.infer(asJson, "data")
      .getOrElse(return IngestResult(new Evolution(spark, corpusDir).latestVersion, JsonSchema(Map.empty, Nil), 0, 0, 0))

    // A2/W2 — version state machine (driver-side control plane)
    val evo = new Evolution(spark, corpusDir)
    val version = evo.evolve(schema, schema.fieldNames)

    // V1 — per-record quality issues against the (just-stored) schema
    val validated = Validate.withQualityIssues(asJson, schema, "data")

    // M1 + W1 — stamp metadata, serialize, append (single vectorized write).
    // idBase seeds above the corpus max so ids stay unique and ascending
    // across batches (the reference's AUTOINCREMENT contract that Q4's
    // "latest N by id desc" depends on).
    // V2 counters ride the SAME job via observe() — no second pass over the
    // batch re-evaluating the validation expressions (reference
    // app.py:352-366 counts in its ingest loop for the same reason).
    val idBase = if (idCol.isDefined) 0L else Corpus.maxId(spark, corpusDir) + 1L
    val obs = new org.apache.spark.sql.Observation()
    val observed = validated.observe(obs,
      count(lit(1)).as("n"),
      count(when(size(col("_quality_issues")) === 0, 1)).as("clean"),
      count(when(size(col("_quality_issues")) > 0, 1)).as("flagged"))
    val stamped = Corpus.stampAndSerialize(observed.drop("data"), version,
      idBase = idBase, idCol = idCol)
    Corpus.append(stamped, corpusDir)

    val m = obs.get // collected during the write job
    IngestResult(version, schema,
      m("n").asInstanceOf[Long], m("clean").asInstanceOf[Long],
      m("flagged").asInstanceOf[Long])
  }
}
