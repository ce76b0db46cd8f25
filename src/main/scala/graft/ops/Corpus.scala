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

  /** F3 blob parity: re-render the canonical JSON exactly as CPython
    * json.dumps does (", "/": " separators, ensure_ascii, Python float repr)
    * so stored blobs replay byte-identically against the reference's
    * etl_data.db format. One map-only string pass at store time.
    */
  private val pyDumps = udf(graft.functions.PyJson.dumps _)

  /** M1 + W1 prep — stamp system metadata and render the canonical JSON blob.
    *
    * Blob parity (reference `app.py:355-364`): the reference mutates the
    * record dict in place — payload keys first (including
    * `_extracted_patterns`), then `_schema_version`, `_ingested_at`,
    * `_quality_issues` — and `json.dumps` the whole thing, null fields
    * included. We render the same key order and keep nulls
    * (`ignoreNullFields=false`).
    *
    * Id assignment: `idCol` (a natural key the caller trusts to be unique,
    * e.g. a source primary key) wins when given — deterministic and
    * oracle-checkable. Otherwise `idBase + monotonically_increasing_id()`:
    * callers MUST pass an `idBase` above every previously issued id (Pipeline
    * derives it from the corpus max — `app.py:169-173` AUTOINCREMENT
    * semantics) so Q4's "latest N by id desc" orders batches correctly.
    */
  /** With `native=true` (requires [[graft.GraftExtensions]]) the whole blob —
    * payload and stamped fields — renders in ONE codegen'd `graft_pyjson`
    * pass over the final struct: no `to_json`, no re-render, no splice copy.
    * This is the structured-ingest hot path.
    */
  def stampAndSerialize(records: DataFrame, schemaVersion: Int,
                        idBase: Long = 0L, idCol: Option[String] = None,
                        native: Boolean = false): DataFrame = {
    val payloadCols = records.columns
      .filterNot(Set("_schema_version", "_ingested_at", "_quality_issues"))
    val blobCols =
      payloadCols.map(col) ++ Seq(
        col("_schema_version"), col("_ingested_at_iso").as("_ingested_at"),
        col("_quality_issues"))
    val id = idCol.map(c => col(c).cast("long"))
      .getOrElse(lit(idBase) + monotonically_increasing_id())
    val blob =
      if (native) call_function("graft_pyjson", struct(blobCols: _*))
      else pyDumps(to_json(struct(blobCols: _*), Map("ignoreNullFields" -> "false")))
    records
      .withColumn("_schema_version", lit(schemaVersion))
      .withColumn("ingested_at", current_timestamp())
      .withColumn("_ingested_at_iso",
        date_format(col("ingested_at"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
      .withColumn("id", id)
      .withColumn("schema_version", lit(schemaVersion))
      .withColumn("data", blob)
      .withColumn("ingested_at_iso", col("_ingested_at_iso"))
      .withColumn("quality_issues",
        when(size(coalesce(col("_quality_issues"), array())) === 0, lit(null))
          .otherwise(col("_quality_issues")).cast("array<string>"))
      .select("id", "data", "schema_version", "ingested_at", "ingested_at_iso", "quality_issues")
  }

  /** `stampAndSerialize` for records that already carry their canonical
    * JSON in a `data` column (the schema-on-read ingest path): the stamped
    * fields are SPLICED into the existing blob with string expressions —
    * codegen'd concat, no re-parse and no second struct render — then the
    * whole blob gets one json.dumps-parity pass. Non-object records (the
    * reference would crash on them, `app.py:320`) keep their blob unspliced;
    * validation has already flagged them.
    */
  def stampAndSerializeJson(records: DataFrame, schemaVersion: Int,
                            idBase: Long = 0L, idCol: Option[String] = None): DataFrame = {
    val id = idCol.map(c => col(c).cast("long"))
      .getOrElse(lit(idBase) + monotonically_increasing_id())
    val isObject = col("data").startsWith("{") && col("data").endsWith("}")
    val spliced = concat(
      expr("substring(data, 1, length(data) - 1)"),
      when(length(trim(col("data"))) > 2, lit(",")).otherwise(lit("")),
      lit("\"_schema_version\":"), col("_schema_version").cast("string"),
      lit(",\"_ingested_at\":\""), col("_ingested_at_iso"), lit("\""),
      lit(",\"_quality_issues\":"),
      to_json(coalesce(col("_quality_issues"), array().cast("array<string>"))),
      lit("}"))
    records
      .withColumn("_schema_version", lit(schemaVersion))
      .withColumn("ingested_at", current_timestamp())
      .withColumn("_ingested_at_iso",
        date_format(col("ingested_at"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
      .withColumn("id", id)
      .withColumn("schema_version", lit(schemaVersion))
      .withColumn("data", pyDumps(when(isObject, spliced).otherwise(col("data"))))
      .withColumn("ingested_at_iso", col("_ingested_at_iso"))
      .withColumn("quality_issues",
        when(size(coalesce(col("_quality_issues"), array())) === 0, lit(null))
          .otherwise(col("_quality_issues")).cast("array<string>"))
      .select("id", "data", "schema_version", "ingested_at", "ingested_at_iso", "quality_issues")
  }

  /** `stampAndSerializeJson` for records whose `data` is ALREADY in
    * json.dumps parity format (rendered by the native `graft_pyjson`
    * expression): the stamped tail is spliced python-style and there is no
    * final re-render pass — the whole blob path is one codegen'd chain.
    * Requires [[graft.GraftExtensions]] (for the issues-array rendering).
    */
  def stampAndSerializeNative(records: DataFrame, schemaVersion: Int,
                              idBase: Long = 0L, idCol: Option[String] = None): DataFrame = {
    val id = idCol.map(c => col(c).cast("long"))
      .getOrElse(lit(idBase) + monotonically_increasing_id())
    val isObject = col("data").startsWith("{") && col("data").endsWith("}")
    val spliced = concat(
      expr("substring(data, 1, length(data) - 1)"),
      when(length(trim(col("data"))) > 2, lit(", ")).otherwise(lit("")),
      lit("\"_schema_version\": "), col("_schema_version").cast("string"),
      lit(", \"_ingested_at\": \""), col("_ingested_at_iso"), lit("\""),
      lit(", \"_quality_issues\": "),
      call_function("graft_pyjson",
        coalesce(col("_quality_issues"), array().cast("array<string>"))),
      lit("}"))
    records
      .withColumn("_schema_version", lit(schemaVersion))
      .withColumn("ingested_at", current_timestamp())
      .withColumn("_ingested_at_iso",
        date_format(col("ingested_at"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
      .withColumn("id", id)
      .withColumn("schema_version", lit(schemaVersion))
      .withColumn("data", when(isObject, spliced).otherwise(col("data")))
      .withColumn("ingested_at_iso", col("_ingested_at_iso"))
      .withColumn("quality_issues",
        when(size(coalesce(col("_quality_issues"), array())) === 0, lit(null))
          .otherwise(col("_quality_issues")).cast("array<string>"))
      .select("id", "data", "schema_version", "ingested_at", "ingested_at_iso", "quality_issues")
  }

  /** W1 — append a stamped batch to the corpus (reference `store_record`,
    * `app.py:133-141`, minus the per-row commit pathology).
    *
    * The corpus is PARTITIONED by `schema_version`: each ingest writes one
    * (or zero) new partition directories, and every version-scoped read —
    * validation recounts, the records↔schema join, evolution audits — prunes
    * to its partitions at the scan (`PartitionFilters`, pinned by PlanSpec)
    * instead of scanning an ever-growing corpus. Version count is small and
    * append-monotone, the ideal partition key cardinality.
    */
  def append(stamped: DataFrame, corpusDir: String): Unit = {
    val spark = stamped.sparkSession
    val fs = fsOf(spark, corpusDir)
    // The id high-water sidecar makes the next batch's idBase seed an O(1)
    // driver-side file read instead of a max-agg scan over an append-only
    // corpus that only grows. Crash-safe under the corpus's single-writer
    // discipline: the pending marker is up for the whole append, and maxId
    // falls back to the authoritative scan whenever it finds one — so a
    // crash anywhere in here can only cost readers a scan, never a
    // duplicate id. Repair is writer-only (maxId never mutates): the next
    // append through here publishes an accurate sidecar and clears any
    // stale marker along with its own.
    repairCompaction(fs, corpusDir) // never append beside an orphaned store
    fs.create(pendingPath(corpusDir), true).close()
    val obs = new org.apache.spark.sql.Observation()
    stamped.observe(obs, max(col("id")).as("max_id"))
      .write.mode(SaveMode.Append)
      .partitionBy("schema_version").parquet(s"$corpusDir/records")
    val mx = obs.get("max_id") match {
      case null => -1L
      case v => v.asInstanceOf[Long]
    }
    writeHighWater(spark, corpusDir, math.max(mx, readHighWater(spark, corpusDir)))
    fs.delete(pendingPath(corpusDir), false)
  }

  /** The record store, resolving an interrupted [[compact]] READ-ONLY: if
    * the live dir is missing, fall back to `_records_compacting` (complete
    * by invariant — it is only ever renamed after its write finished; while
    * a compact's write is in flight the live dir still exists, so a partial
    * tmp is never read) and then `_records_old`. Readers never mutate
    * (single-writer discipline, same reasoning as [[maxId]]); the next
    * writer through [[append]]/[[compact]] runs [[repairCompaction]].
    */
  /** Record-store dirs in PREFERENCE ORDER: live first, then the two
    * crash-recovery names (the complete compaction output, then the
    * moved-aside old store) — the one ordering [[records]],
    * [[repairCompaction]] and [[maxId]] must all agree on.
    */
  private def storeDirs(corpusDir: String): Seq[String] =
    Seq(s"$corpusDir/records", s"$corpusDir/_records_compacting",
      s"$corpusDir/_records_old")

  def records(spark: SparkSession, corpusDir: String): DataFrame = {
    val fs = fsOf(spark, corpusDir)
    val candidates = storeDirs(corpusDir)
    val dir = candidates.find(d =>
      fs.exists(new org.apache.hadoop.fs.Path(d))).getOrElse(candidates.head)
    spark.read.parquet(dir)
  }

  /** Writer-side repair of a [[compact]] interrupted between its two
    * renames (live dir missing, data intact under a recoverable name).
    * Without this, the next `append` would start a FRESH record store
    * beside the orphaned one — silent corpus truncation from every
    * reader's perspective. Preference order matches [[records]]: a
    * complete `_records_compacting` finishes the interrupted compaction,
    * else `_records_old` rolls it back.
    */
  private def repairCompaction(fs: org.apache.hadoop.fs.FileSystem,
                               corpusDir: String): Unit = {
    val Seq(live, tmp, old) =
      storeDirs(corpusDir).map(new org.apache.hadoop.fs.Path(_))
    if (fs.exists(live)) return
    if (fs.exists(tmp)) {
      if (!fs.rename(tmp, live))
        sys.error(s"repairCompaction: cannot publish $tmp")
      fs.delete(old, true)
    } else if (fs.exists(old)) {
      if (!fs.rename(old, live))
        sys.error(s"repairCompaction: cannot restore $old")
    }
  }

  /** Offline small-files compaction. Every micro-batch append adds files;
    * at warehouse scale an append-only corpus degrades into millions of
    * KB-sized files whose open/footer costs dominate scans. Rewrites the
    * record store with ~`rowsPerFile` rows per file (still partitioned by
    * `schema_version`), then atomically swaps directories — a maintenance
    * job to run between ingests (same single-writer discipline as the
    * schema state machine; not concurrent with an ingest).
    */
  def compact(spark: SparkSession, corpusDir: String,
              rowsPerFile: Long = 1000000L): Unit = {
    val fs = new org.apache.hadoop.fs.Path(corpusDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    repairCompaction(fs, corpusDir) // finish/roll back an interrupted run
    val live = new org.apache.hadoop.fs.Path(s"$corpusDir/records")
    if (!fs.exists(live)) return
    val tmp = new org.apache.hadoop.fs.Path(s"$corpusDir/_records_compacting")
    val old = new org.apache.hadoop.fs.Path(s"$corpusDir/_records_old")
    // live exists (authoritative), so leftovers under the working names are
    // debris from a completed or abandoned run — safe to clear
    fs.delete(tmp, true); fs.delete(old, true)
    val df = records(spark, corpusDir)
    val n = math.max(1L, df.count())
    val files = math.max(1, math.ceil(n.toDouble / rowsPerFile).toInt)
    df.repartition(files)
      .write.partitionBy("schema_version").parquet(tmp.toString)
    // two renames, not copies: the unsafe window is between them and a
    // crash leaves either the old or the new store intact under a
    // recoverable name
    if (!fs.rename(live, old)) sys.error(s"compact: cannot move $live aside")
    if (!fs.rename(tmp, live)) {
      fs.rename(old, live) // roll back
      sys.error(s"compact: cannot publish $tmp")
    }
    fs.delete(old, true)
  }

  private def fsOf(spark: SparkSession, corpusDir: String) =
    new org.apache.hadoop.fs.Path(corpusDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def highWaterPath(corpusDir: String) =
    new org.apache.hadoop.fs.Path(s"$corpusDir/_maxid")

  private def pendingPath(corpusDir: String) =
    new org.apache.hadoop.fs.Path(s"$corpusDir/_maxid_pending")

  /** Sidecar read: the persisted id high-water mark, or -1 when absent. */
  private[graft] def readHighWater(spark: SparkSession, corpusDir: String): Long = {
    val fs = fsOf(spark, corpusDir)
    val p = highWaterPath(corpusDir)
    if (!fs.exists(p)) return -1L
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
    finally in.close()
  }

  /** Sidecar write — tmp + rename, atomic on local FS and HDFS. */
  private[graft] def writeHighWater(spark: SparkSession, corpusDir: String,
                                    id: Long): Unit = {
    val fs = fsOf(spark, corpusDir)
    val tmp = new org.apache.hadoop.fs.Path(s"$corpusDir/_maxid_tmp")
    val out = fs.create(tmp, true)
    try out.write(id.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(highWaterPath(corpusDir), false)
    if (!fs.rename(tmp, highWaterPath(corpusDir)))
      sys.error(s"writeHighWater: cannot publish $tmp")
  }

  /** Highest issued id, or -1 for a missing/empty corpus — the driver-side
    * seed for the next batch's `idBase` (AUTOINCREMENT parity without
    * serializing the write path).
    *
    * Served from the high-water sidecar `append` maintains — an O(1) file
    * read, no job — so per-ingest id seeding stops scanning an append-only
    * corpus that only grows. Falls back to the authoritative max-agg scan
    * (parquet min/max footer stats make it cheap-ish) when the sidecar is
    * absent (pre-sidecar corpus) or a pending marker shows an append died
    * between its data commit and its sidecar update.
    *
    * SIDE-EFFECT FREE: a read API must not mutate shared corpus state — a
    * reader repairing the sidecar concurrently with an in-flight append
    * could scan a partially-committed corpus, overwrite the append's fresh
    * sidecar with a stale lower high-water, and clear its pending marker,
    * seeding duplicate ids on the next ingest. Repair belongs to the writer:
    * the next successful `append` publishes an accurate sidecar and clears
    * the marker under the corpus's single-writer discipline.
    */
  def maxId(spark: SparkSession, corpusDir: String): Long = {
    val fs = fsOf(spark, corpusDir)
    // Sidecar FIRST: the live records dir can be legitimately absent while
    // the corpus is not (a compact interrupted between its renames). An
    // early records-exists => -1 here seeded idBase at 0 in exactly that
    // state — duplicate ids, the one corruption the sidecar discipline
    // exists to prevent (pinned by PipelineSpec's compact-crash test).
    if (!fs.exists(pendingPath(corpusDir))) {
      val hw = readHighWater(spark, corpusDir)
      if (hw >= 0) return hw
    }
    val anyStore = storeDirs(corpusDir)
      .exists(d => fs.exists(new org.apache.hadoop.fs.Path(d)))
    if (!anyStore) return -1L
    // records() resolves the crash-recovery dirs read-only, so the
    // authoritative scan sees the surviving store too
    records(spark, corpusDir).agg(max(col("id"))).collect()(0) match {
      case r if r.isNullAt(0) => -1L
      case r => r.getLong(0)
    }
  }

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
