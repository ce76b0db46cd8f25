package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.ops.Corpus
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Golden replay of the reference's recorded artifact (SURVEY §5.2).
  *
  * `/root/reference/etl_data.db` is the reference's only correctness
  * artifact: two real ingestion runs — 2,492 scraped-text TXT records at
  * schema v1 and 100 customer-CSV records at schema v2, two schema_history
  * rows, one schema_changes row (v1→v2: +12 customer fields, −content).
  * `tools/extract_golden.py` dumps those rows verbatim into
  * `src/test/resources/golden/`; this suite reconstructs the two input
  * batches from the stored blobs (payload fields only), replays them through
  * [[Pipeline.ingest]] in historical order, and asserts:
  *
  *   - the version sequence (v1 then v2) and per-batch counts/quality;
  *   - inferred property/required name sets against the recorded schemas;
  *   - the single change-log row (added/removed field sets);
  *   - the stored record blobs BYTE-IDENTICAL to the artifact, modulo the
  *     `_ingested_at` wall-clock value — which exercises the four extraction
  *     regexes (including the phone capture-group quirk), CPython repr
  *     stringification, key order, and ensure_ascii escaping against 2,592
  *     real noisy records.
  *
  * Type parity caveat (SURVEY §1.2): the artifact's v1 schema row types
  * `_extracted_patterns` as a real nested object — it was written by an
  * older app revision that inferred structure before stringification; the
  * current `app.py:253-261` stringifies, so only NAME sets are asserted for
  * v1. The v2 schema row (written by the current code) is all-"string" and
  * matches our parity inference exactly.
  */
class GoldenReplaySpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def goldenLines(name: String): Seq[String] = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    assert(in != null, s"missing golden resource $name — run tools/extract_golden.py")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().toList finally src.close()
  }

  private def goldenBlobs(name: String): Seq[String] =
    goldenLines(name).map(l => mapper.readTree(l).get("data").asText())

  private def goldenNode(name: String) =
    mapper.readTree(goldenLines(name).mkString("\n"))

  private def scrub(blob: String): String =
    blob.replaceAll("\"_ingested_at\": \"[^\"]*\"", "\"_ingested_at\": \"T\"")

  private def namesOf(it: java.util.Iterator[String]): Set[String] = {
    val b = Set.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }

  // The replay is ORDERED (v1 batch, then v2 into the same corpus); lazy vals
  // run it once, on first touch, in historical order.
  private lazy val dir = tmpDir("golden_")
  private lazy val v1Blobs = goldenBlobs("records_v1.jsonl")
  private lazy val v2Blobs = goldenBlobs("records_v2.jsonl")

  private lazy val r1 = {
    val batch = v1Blobs.toDF("raw")
      .select(from_json(col("raw"), StructType.fromDDL("content STRING")).as("r"))
      .select(col("r.content").as("content"))
    Pipeline.ingest(spark, batch, dir)
  }

  private val v2Cols = Seq("Index", "Customer Id", "First Name", "Last Name",
    "Company", "City", "Country", "Phone 1", "Phone 2", "Email",
    "Subscription Date", "Website")

  private lazy val r2 = {
    r1 // enforce historical order
    val ddl = v2Cols.map {
      case "Index" => "`Index` BIGINT" // pandas-inferred int (FIXTURES A2)
      case c => s"`$c` STRING"
    }.mkString(", ")
    val batch = v2Blobs.toDF("raw")
      .select(from_json(col("raw"), StructType.fromDDL(ddl)).as("r"))
      .select(col("r.*"))
    Pipeline.ingest(spark, batch, dir)
  }

  test("v1 batch replays: version 1, 2492 records, all clean") {
    assert(r1.version == 1)
    assert(r1.recordCount == 2492 && r1.cleanCount == 2492 && r1.flaggedCount == 0)
  }

  test("v1 inferred schema matches the recorded property/required name sets") {
    val golden = goldenNode("schema_history.json").get(0)
    assert(golden.get("version").asInt == 1)
    val schema = mapper.readTree(golden.get("schema").asText)
    assert(r1.schema.fieldNames == namesOf(schema.get("properties").fieldNames))
    val goldenRequired = (0 until schema.get("required").size())
      .map(schema.get("required").get(_).asText)
    assert(r1.schema.required.sorted == goldenRequired.sorted)
  }

  test("v2 batch bumps to version 2; recorded schema matches exactly (all string)") {
    assert(r2.version == 2)
    assert(r2.recordCount == 100 && r2.cleanCount == 100 && r2.flaggedCount == 0)
    val golden = goldenNode("schema_history.json").get(1)
    assert(golden.get("version").asInt == 2)
    val schema = mapper.readTree(golden.get("schema").asText)
    assert(r2.schema.fieldNames == namesOf(schema.get("properties").fieldNames))
    // v2 was written by the current reference code: every leaf is "string",
    // as in our parity inference — assert types too, not just names
    r2.schema.properties.foreach { case (name, tpe) =>
      assert(schema.get("properties").get(name).get("type").asText == tpe,
        s"type mismatch for $name")
    }
    val goldenRequired = (0 until schema.get("required").size())
      .map(schema.get("required").get(_).asText)
    assert(r2.schema.required.sorted == goldenRequired.sorted)
  }

  test("the single change-log row matches the recorded diff") {
    r2
    val changes = Corpus.schemaChanges(spark, dir).collect()
    assert(changes.length == 1)
    val c = changes(0)
    assert(c.getAs[Int]("old_version") == 1 && c.getAs[Int]("new_version") == 2)
    val golden = goldenNode("schema_changes.json").get(0)
    def textSet(field: String): Set[String] = {
      val n = mapper.readTree(golden.get(field).asText)
      (0 until n.size()).map(n.get(_).asText).toSet
    }
    // the artifact records the added list in Python set-iteration order —
    // compare as sets (the reference itself treats them as sets, app.py:112-116)
    assert(c.getAs[scala.collection.Seq[String]]("added_fields").toSet == textSet("added_fields"))
    assert(textSet("added_fields") == v2Cols.toSet) // the 12 CSV fields
    assert(c.getAs[scala.collection.Seq[String]]("removed_fields").toSeq == Seq("content"))
  }

  test("version history is [1, 2]") {
    r2
    val versions = Corpus.schemaHistory(spark, dir)
      .select("version").collect().map(_.getInt(0)).toSeq
    assert(versions == Seq(1, 2))
  }

  test("v1 record blobs replay byte-identically (modulo ingest timestamp)") {
    r1
    val ours = Corpus.records(spark, dir).filter(col("schema_version") === 1)
      .select("data").as[String].collect().map(scrub).sorted
    val golden = v1Blobs.map(scrub).sorted
    assert(ours.length == golden.length)
    ours.zip(golden).zipWithIndex.foreach { case ((o, g), i) =>
      assert(o == g, s"first divergent v1 blob (sorted position $i):\nours:   $o\ngolden: $g")
    }
  }

  test("v2 record blobs replay byte-identically (modulo ingest timestamp)") {
    r2
    val ours = Corpus.records(spark, dir).filter(col("schema_version") === 2)
      .select("data").as[String].collect().map(scrub).sorted
    val golden = v2Blobs.map(scrub).sorted
    assert(ours.length == golden.length)
    ours.zip(golden).zipWithIndex.foreach { case ((o, g), i) =>
      assert(o == g, s"first divergent v2 blob (sorted position $i):\nours:   $o\ngolden: $g")
    }
  }
}
