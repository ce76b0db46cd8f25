package graft

import graft.ops.Corpus
import org.apache.spark.sql.functions._

/** End-to-end pipeline semantics (reference `app.py:296-366`): cross-batch id
  * monotonicity (AUTOINCREMENT contract), Q4 latest-N ordering, blob key
  * parity, schema evolution across batches, per-batch counters.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("two-batch ingest: ids unique, Q4 returns the second batch first") {
    val dir = tmpDir("corpus_")
    val batch1 = Seq(("first-a", 1), ("first-b", 2)).toDF("content", "n")
    val batch2 = Seq(("second-a", 3), ("second-b", 4)).toDF("content", "n")
    val r1 = Pipeline.ingest(spark, batch1, dir)
    val r2 = Pipeline.ingest(spark, batch2, dir)
    assert(r1.recordCount == 2 && r2.recordCount == 2)

    val all = Corpus.records(spark, dir).select("id").collect().map(_.getLong(0))
    assert(all.distinct.length == 4, "ids must be unique across batches")

    val latest2 = Corpus.latestRecords(spark, dir, 2)
      .select(get_json_object(col("data"), "$.content").as("c"))
      .collect().map(_.getString(0)).toSet
    assert(latest2 == Set("second-a", "second-b"),
      "latest-N must be the most recent batch (reference AUTOINCREMENT ordering)")
  }

  test("stored blob carries _schema_version, _ingested_at, _quality_issues inside data") {
    val dir = tmpDir("corpus_")
    Pipeline.ingest(spark, Seq(("x", 1)).toDF("content", "n"), dir)
    val data = Corpus.records(spark, dir).select("data").collect()(0).getString(0)
    assert(get(data, "_schema_version").nonEmpty, s"blob missing _schema_version: $data")
    assert(get(data, "_ingested_at").nonEmpty, s"blob missing _ingested_at: $data")
    assert(data.contains("_quality_issues"), s"blob missing _quality_issues: $data")
    assert(data.contains("_extracted_patterns"), s"blob missing _extracted_patterns: $data")
  }

  private def get(json: String, key: String): Option[String] = {
    val df = Seq(json).toDF("j")
    Option(df.select(get_json_object(col("j"), s"$$.$key")).collect()(0).getString(0))
  }

  test("null payload fields stay present in the blob (ignoreNullFields=false)") {
    val dir = tmpDir("corpus_")
    Pipeline.ingest(spark, Seq((Some("x"), None: Option[String])).toDF("a", "b"), dir)
    val data = Corpus.records(spark, dir).select("data").collect()(0).getString(0)
    assert(data.contains("\"b\": null"), s"null field b dropped from blob: $data")
  }

  test("blob renders in CPython json.dumps format (separators, ascii escapes)") {
    val dir = tmpDir("corpus_")
    Pipeline.ingest(spark, Seq(("café", 1.5)).toDF("content", "v"), dir)
    val data = Corpus.records(spark, dir).select("data").collect()(0).getString(0)
    assert(data.contains("\"content\": \"caf\\u00e9\""), s"expected json.dumps string form: $data")
    assert(data.contains("\"v\": 1.5"), s"expected json.dumps number form: $data")
  }

  test("schema change across batches bumps version and logs the diff") {
    val dir = tmpDir("corpus_")
    val r1 = Pipeline.ingest(spark, Seq(("a-only", 1)).toDF("a", "n"), dir)
    val r2 = Pipeline.ingest(spark, Seq(("b-only", 2)).toDF("b", "n"), dir)
    assert(r1.version == 1 && r2.version == 2)
    val change = Corpus.schemaChanges(spark, dir).collect()(0)
    assert(change.getAs[scala.collection.Seq[String]]("added_fields").toSeq.contains("b"))
    assert(change.getAs[scala.collection.Seq[String]]("removed_fields").toSeq.contains("a"))
    val history = Corpus.schemaHistory(spark, dir).select("version")
      .collect().map(_.getInt(0)).toSeq
    assert(history == Seq(1, 2))
  }

  test("ingestJson: ragged records get real quality issues and spliced blobs") {
    val dir = tmpDir("corpus_")
    val recs = Seq("""{"a": 1, "b": 2}""", """{"a": 3}""", """{"a": 4, "z": 5}""").toDF("j")
    val r = Pipeline.ingestJson(spark, recs, "j", dir)
    assert(r.recordCount == 3)
    assert(r.schema.properties.keySet == Set("a", "b", "z"))
    assert(r.schema.required == Seq("a"))
    // validation iterates ALL schema properties (app.py:275) — every ragged
    // record misses some union field, so none is clean
    assert(r.cleanCount == 0 && r.flaggedCount == 3)
    val rows = Corpus.records(spark, dir)
      .select(get_json_object(col("data"), "$.a").as("a"),
        get_json_object(col("data"), "$._schema_version").as("v"),
        col("data"))
      .orderBy("a").collect()
    assert(rows.map(_.getString(1)).forall(_ == "1"), "blob missing spliced _schema_version")
    assert(rows(0).getString(2).contains("\"_quality_issues\": [\"Missing field:"),
      s"expected python-style issues in blob: ${rows(0).getString(2)}")
  }

  test("stampAndSerialize (struct variant) renders the same blob as the splice path") {
    import graft.ops.{Corpus => C, Validate}
    import graft.model.JsonSchema
    val batch = Seq(("hello", 42)).toDF("content", "n")
    val withPat = graft.ops.Extract.withExtractedPatterns(batch)
    val cols = withPat.columns
    val asJson = withPat.withColumn("data",
      to_json(struct(cols.map(col).toSeq: _*), Map("ignoreNullFields" -> "false")))
    val schema = JsonSchema(cols.map(_ -> "string").toMap, cols.sorted.toSeq)
    val validated = Validate.withQualityIssues(asJson, schema, "data")
    val a = C.stampAndSerialize(validated.drop("data"), 1, idCol = Some("n"))
      .select("data").collect()(0).getString(0)
    val b = C.stampAndSerializeJson(validated, 1, idCol = Some("n"))
      .select("data").collect()(0).getString(0)
    // strip the (time-dependent) _ingested_at values before comparing
    def scrub(s: String) = s.replaceAll(""""_ingested_at": "[^"]*"""", """"_ingested_at": "T"""")
    assert(scrub(a) == scrub(b), s"\nstruct: $a\nsplice: $b")
  }

  test("one-shot native stamp renders the same blob as the native splice path") {
    import graft.ops.{Corpus => C, Validate}
    import graft.model.JsonSchema
    val batch = Seq(("hello \"wörld\"", 42)).toDF("content", "n")
    val withPat = graft.ops.Extract.withExtractedPatterns(batch)
    val cols = withPat.columns
    val asJson = withPat.withColumn("data",
      call_function("graft_pyjson", struct(cols.map(col).toSeq: _*)))
    val schema = JsonSchema(cols.map(_ -> "string").toMap, cols.sorted.toSeq)
    val validated = Validate.withQualityIssues(asJson, schema, "data")
    val a = C.stampAndSerialize(validated.drop("data"), 1, idCol = Some("n"), native = true)
      .select("data").collect()(0).getString(0)
    val b = C.stampAndSerializeNative(validated, 1, idCol = Some("n"))
      .select("data").collect()(0).getString(0)
    def scrub(s: String) = s.replaceAll(""""_ingested_at": "[^"]*"""", """"_ingested_at": "T"""")
    assert(scrub(a) == scrub(b), s"\none-shot: $a\nsplice:   $b")
  }

  test("native graft_pyjson equals to_json + PyJson.dumps on a gnarly payload") {
    val df = Seq(
      ("café 你好", Some(1.5), Some(42L), Seq("a\"b", "c\\d"), java.sql.Date.valueOf("2024-02-29")),
      ("ctl\tchars\n", None, None, Seq.empty[String], java.sql.Date.valueOf("1999-12-31"))
    ).toDF("s", "d", "l", "arr", "dt")
    val payload = struct(col("s"), col("d"), col("l"), col("arr"), col("dt"))
    val pyDumpsUdf = udf(graft.functions.PyJson.dumps _)
    val rows = df.select(
      call_function("graft_pyjson", payload).as("native"),
      pyDumpsUdf(to_json(payload, java.util.Map.of("ignoreNullFields", "false"))).as("via_tojson"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"\nnative:    ${r.getString(0)}\nvia_tojson: ${r.getString(1)}")
    }
  }

  test("compact rewrites many small appends into few files, data intact") {
    val dir = tmpDir("corpus_")
    (1 to 5).foreach(i =>
      Pipeline.ingest(spark, Seq((s"doc$i", i)).toDF("content", "n"), dir))
    def parquetFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/records"))
        .filter(_.getName.endsWith(".parquet"))
    }
    val before = Corpus.records(spark, dir).orderBy("id")
      .select("id", "data").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(parquetFiles.size >= 5, s"expected >=5 small files, got ${parquetFiles.size}")
    Corpus.compact(spark, dir)
    assert(parquetFiles.size == 1, s"expected 1 file after compact, got ${parquetFiles.size}")
    val after = Corpus.records(spark, dir).orderBy("id")
      .select("id", "data").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(after.toSeq == before.toSeq, "compaction must not change the data")
  }

  test("compact crash between its two renames: readers fall back, writers repair") {
    // Simulate the unsafe window: live dir moved aside, new store complete
    // under the working name, crash before publish. Readers must see the
    // data READ-ONLY; the next writer (append or compact) must repair.
    val dir = tmpDir("corpus_")
    (1 to 3).foreach(i =>
      Pipeline.ingest(spark, Seq((s"doc$i", i)).toDF("content", "n"), dir))
    val before = Corpus.records(spark, dir).orderBy("id")
      .select("id", "data").collect().map(r => (r.getLong(0), r.getString(1)))

    def crashState(tmpComplete: Boolean): Unit = {
      val live = new java.io.File(s"$dir/records")
      val target = new java.io.File(
        if (tmpComplete) s"$dir/_records_compacting" else s"$dir/_records_old")
      assert(live.renameTo(target), s"fixture: cannot stage $target")
    }

    // state 1: crash AFTER rename1 with a complete tmp → repair publishes it
    crashState(tmpComplete = true)
    assert(Corpus.records(spark, dir).count() == before.length,
      "reader must fall back to the complete compacting dir")
    Pipeline.ingest(spark, Seq(("doc4", 4)).toDF("content", "n"), dir) // writer repairs
    assert(new java.io.File(s"$dir/records").isDirectory &&
      !new java.io.File(s"$dir/_records_compacting").exists(),
      "append must publish the interrupted compaction before writing")
    val after1 = Corpus.records(spark, dir).orderBy("id")
      .select("id", "data").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(after1.take(before.length).toSeq == before.toSeq && after1.length == before.length + 1,
      "no rows lost across the repair, new append lands after them")

    // state 2: crash where only the old store survives → compact restores it
    crashState(tmpComplete = false)
    Corpus.compact(spark, dir)
    assert(new java.io.File(s"$dir/records").isDirectory &&
      !new java.io.File(s"$dir/_records_old").exists(),
      "compact must restore the old store before compacting")
    val after2 = Corpus.records(spark, dir).orderBy("id")
      .select("id", "data").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(after2.toSeq == after1.toSeq, "rollback repair must not change the data")
  }

  test("id seeding reads the high-water sidecar, not the corpus") {
    val dir = tmpDir("corpus_")
    Pipeline.ingest(spark, Seq(("a", 1), ("b", 2)).toDF("content", "n"), dir)
    val hw = Corpus.readHighWater(spark, dir)
    val trueMax = Corpus.records(spark, dir).agg(max(col("id")))
      .collect()(0).getLong(0)
    assert(hw == trueMax, s"sidecar $hw != corpus max $trueMax")
    // poke a sentinel into the sidecar; maxId must serve it verbatim —
    // direct proof the corpus was NOT scanned
    Corpus.writeHighWater(spark, dir, hw + 1000000)
    assert(Corpus.maxId(spark, dir) == hw + 1000000)
    // and the next batch seeds ABOVE the sidecar: ids stay unique/ascending
    Pipeline.ingest(spark, Seq(("c", 3)).toDF("content", "n"), dir)
    val newIds = Corpus.records(spark, dir).filter(col("id") > hw)
      .select("id").collect().map(_.getLong(0))
    assert(newIds.nonEmpty && newIds.forall(_ > hw + 1000000),
      s"second batch must seed above the sidecar, got ${newIds.toSeq}")
  }

  test("a stale sidecar with a pending marker falls back to the corpus scan") {
    val dir = tmpDir("corpus_")
    Pipeline.ingest(spark, Seq(("a", 1), ("b", 2)).toDF("content", "n"), dir)
    val trueMax = Corpus.records(spark, dir).agg(max(col("id")))
      .collect()(0).getLong(0)
    // simulate a crash between the data commit and the sidecar update:
    // sidecar holds a stale LOW value, pending marker still present
    Corpus.writeHighWater(spark, dir, -1L)
    new java.io.File(s"$dir/_maxid_pending").createNewFile()
    assert(Corpus.maxId(spark, dir) == trueMax,
      "pending marker must force the authoritative scan")
    // maxId is a READ api: it must NOT have repaired the sidecar or cleared
    // the marker (a reader mutating shared state races an in-flight append)
    assert(Corpus.readHighWater(spark, dir) == -1L)
    assert(new java.io.File(s"$dir/_maxid_pending").exists())
    // repair belongs to the writer: the next append publishes an accurate
    // sidecar and clears the stale marker
    Pipeline.ingest(spark, Seq(("c", 3)).toDF("content", "n"), dir)
    val repairedMax = Corpus.records(spark, dir).agg(max(col("id")))
      .collect()(0).getLong(0)
    assert(repairedMax > trueMax, "new batch must seed above the scanned max")
    assert(Corpus.readHighWater(spark, dir) == repairedMax)
    assert(!new java.io.File(s"$dir/_maxid_pending").exists())
  }

  test("counters are per-batch, not cumulative") {
    val dir = tmpDir("corpus_")
    Pipeline.ingest(spark, Seq(("x", 1), ("y", 2)).toDF("content", "n"), dir)
    val r2 = Pipeline.ingest(spark, Seq(("z", 3)).toDF("content", "n"), dir)
    assert(r2.recordCount == 1, s"expected per-batch count 1, got ${r2.recordCount}")
  }
}
