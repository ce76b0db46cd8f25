package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** W1/M1/Q1-Q4 — the corpus sink and its browse queries (reference
  * `app.py:133-173`).
  *
  * The reference inserts one row per SQLite connection+commit (~1k rec/s, its
  * measured bottleneck — BASELINE.md). Here the sink is a single vectorized
  * parquet append: the whole ingest chain (extract → validate → stamp →
  * to_json → write) is one map-only codegen'd stage, no shuffle, scaling
  * linearly with executors.
  *
  * `id` assignment: the reference relies on SQLite AUTOINCREMENT. A global
  * sequential id is an anti-pattern at 100 TB (it serializes the write), so we
  * assign `id = idBase + monotonically_increasing_id()`-free contiguous ids
  * only OFF the hot path: the default id is `(batch_id << 40) | row_in_batch`
  * via `monotonically_increasing_id`, unique and ascending-per-batch, which is
  * what Q4's "latest N" ordering actually needs.
  */
object Corpus {

  /** M1 + W1 prep — stamp system metadata and render the canonical JSON blob.
    * `dataCols` are the record's payload columns (everything that belongs in
    * the `data` blob, including `_extracted_patterns` and `_quality_issues`
    * to match the reference, which json.dumps the whole dict `app.py:364`).
    */
  def stampAndSerialize(records: DataFrame, schemaVersion: Int,
                        idBase: Long = 0L): DataFrame = {
    val payloadCols = records.columns.filterNot(Set("_schema_version", "_ingested_at"))
    val data = to_json(struct(payloadCols.map(col).toSeq: _*))
    records
      .withColumn("id", lit(idBase) + monotonically_increasing_id())
      .withColumn("schema_version", lit(schemaVersion))
      .withColumn("ingested_at", current_timestamp())
      .withColumn("ingested_at_iso",
        date_format(col("ingested_at"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
      .withColumn("data", data)
      .withColumn("quality_issues",
        when(size(coalesce(col("_quality_issues"), array())) === 0, lit(null))
          .otherwise(col("_quality_issues")).cast("array<string>"))
      .select("id", "data", "schema_version", "ingested_at", "ingested_at_iso", "quality_issues")
  }

  /** W1 — append a stamped batch to the corpus (reference `store_record`,
    * `app.py:133-141`, minus the per-row commit pathology).
    */
  def append(stamped: DataFrame, corpusDir: String): Unit =
    stamped.write.mode(SaveMode.Append).parquet(s"$corpusDir/records")

  def records(spark: SparkSession, corpusDir: String): DataFrame =
    spark.read.parquet(s"$corpusDir/records")

  /** Q4 — latest-N records (reference `app.py:169-173`). Catalyst plans this
    * as TakeOrderedAndProject: per-partition top-K + driver merge, no full
    * sort — the right plan at any scale.
    */
  def latestRecords(spark: SparkSession, corpusDir: String, n: Int = 50): DataFrame =
    records(spark, corpusDir).orderBy(desc("id")).limit(n)

  /** Q2 — full schema history ascending (reference `app.py:155-159`). */
  def schemaHistory(spark: SparkSession, corpusDir: String): DataFrame =
    new Evolution(spark, corpusDir).schemaHistory.orderBy(asc("version"))

  /** Q3 — change log, newest first (reference `app.py:162-166`). */
  def schemaChanges(spark: SparkSession, corpusDir: String): DataFrame =
    new Evolution(spark, corpusDir).schemaChanges
      .orderBy(desc("created_at"), desc("id"))
}
