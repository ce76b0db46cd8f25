package graft.ops

import graft.model.{CorpusModel, JsonSchema}
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

/** A2/W2 — the schema-version state machine (reference `app.py:96-130`,
  * driven by `app.py:335-350`).
  *
  * Semantics: a new schema version is created iff the *field-name set*
  * changed vs the latest stored version (type changes are invisible —
  * `app.py:339-342`); the first-ever batch always creates v1; a change-log
  * row (added/removed field names) is written only for v>1 transitions with
  * a non-empty diff.
  *
  * Scale note: this is control-plane state — two tiny dimension tables and a
  * single-writer read-modify-write, exactly like the reference. We keep it
  * driver-side on purpose (SURVEY §7.4): the data plane (the 100 TB record
  * scan) never touches it except to read the broadcast schema of the current
  * version. Concurrency limit (one writer) is documented, not hidden.
  */
class Evolution(spark: SparkSession, corpusDir: String) {
  import Evolution._

  private val historyPath = s"$corpusDir/schema_history"
  private val changesPath = s"$corpusDir/schema_changes"

  private def readOrEmpty(path: String, schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  def schemaHistory: DataFrame = readOrEmpty(historyPath, CorpusModel.schemaHistorySchema)
  def schemaChanges: DataFrame = readOrEmpty(changesPath, CorpusModel.schemaChangesSchema)

  /** Q1 — latest (version, schema) or None (reference `app.py:144-152`). */
  def latest: Option[(Int, String)] =
    schemaHistory.orderBy(org.apache.spark.sql.functions.desc("version")).limit(1)
      .collect().headOption.map(r => (r.getInt(0), r.getString(1)))

  def latestVersion: Int = latest.map(_._1).getOrElse(0)

  /** Store a newly inferred schema if the field-name set changed; returns the
    * current version number either way (reference `store_schema`,
    * `app.py:96-130` + trigger `app.py:335-350`).
    */
  def evolve(newSchema: JsonSchema, newFieldNames: Set[String],
             now: Instant = Instant.now()): Int = {
    val ts = isoMicros(now)
    val current = latest
    val currentVersion = current.map(_._1).getOrElse(0)
    val oldNames: Set[String] = current
      .map(c => fieldNamesOfStoredSchema(c._2)).getOrElse(Set.empty)

    if (current.isDefined && oldNames == newFieldNames) return currentVersion

    val newVersion = currentVersion + 1
    val historyRow = spark.createDataFrame(
      java.util.List.of(Row(newVersion, newSchema.toJson, ts)),
      CorpusModel.schemaHistorySchema)
    historyRow.write.mode(SaveMode.Append).parquet(historyPath)

    if (currentVersion > 0) {
      val added = (newFieldNames -- oldNames).toSeq.sorted
      val removed = (oldNames -- newFieldNames).toSeq.sorted
      if (added.nonEmpty || removed.nonEmpty) {
        val nextId = schemaChanges.count() + 1
        val changeRow = spark.createDataFrame(
          java.util.List.of(Row(nextId, currentVersion, newVersion, added, removed, ts)),
          CorpusModel.schemaChangesSchema)
        changeRow.write.mode(SaveMode.Append).parquet(changesPath)
      }
    }
    newVersion
  }
}

object Evolution {
  private val isoFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS").withZone(ZoneOffset.UTC)

  /** Reference timestamp format: ISO-8601 UTC with microseconds (`app.py:97`). */
  def isoMicros(i: Instant): String = isoFmt.format(i)

  /** Extract the property-name set from a stored JSON-schema blob — the only
    * part of the stored schema the evolution trigger reads (`app.py:339-342`).
    * Minimal JSON walk, no external parser deps.
    */
  def fieldNamesOfStoredSchema(schemaJson: String): Set[String] = {
    val propsIdx = schemaJson.indexOf("\"properties\"")
    if (propsIdx < 0) return Set.empty
    val start = schemaJson.indexOf('{', propsIdx)
    if (start < 0) return Set.empty
    // walk the properties object, collecting top-level keys
    var i = start + 1
    var depth = 1
    val keys = Set.newBuilder[String]
    var expectKey = true
    while (i < schemaJson.length && depth > 0) {
      schemaJson.charAt(i) match {
        case '"' =>
          val sb = new StringBuilder
          i += 1
          while (i < schemaJson.length && schemaJson.charAt(i) != '"') {
            if (schemaJson.charAt(i) == '\\' && i + 1 < schemaJson.length) {
              sb.append(schemaJson.charAt(i + 1)); i += 2
            } else { sb.append(schemaJson.charAt(i)); i += 1 }
          }
          if (depth == 1 && expectKey) { keys += sb.toString; expectKey = false }
          i += 1
        case '{' => depth += 1; i += 1
        case '}' => depth -= 1; i += 1
        case ',' => if (depth == 1) expectKey = true; i += 1
        case _ => i += 1
      }
    }
    keys.result()
  }
}
