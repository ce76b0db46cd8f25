package graft

import graft.model.JsonSchema
import graft.ops.Validate
import org.apache.spark.sql.functions._

/** V1/V2 — issue strings must match the reference byte-for-byte
  * (`app.py:267-276`): extra key → "Field 'x' not in schema", absent schema
  * property → "Missing field: 'x'".
  */
class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private def issues(json: String, fields: Seq[String]): Seq[String] =
    Seq(json).toDF("data")
      .select(Validate.qualityIssues(col("data"), fields).as("q"))
      .collect()(0).getSeq[String](0).toSeq

  test("extra field message") {
    assert(issues("""{"a": 1, "zz": 2}""", Seq("a")) == Seq("Field 'zz' not in schema"))
  }

  test("missing field message") {
    assert(issues("""{"a": 1}""", Seq("a", "b")) == Seq("Missing field: 'b'"))
  }

  test("both kinds, record keys first (reference loop order)") {
    assert(issues("""{"x": 1}""", Seq("a")) ==
      Seq("Field 'x' not in schema", "Missing field: 'a'"))
  }

  test("clean record has no issues") {
    assert(issues("""{"a": 1, "b": 2}""", Seq("a", "b")).isEmpty)
  }

  test("non-object json is flagged, not fatal") {
    assert(issues("""[1,2]""", Seq("a")) == Seq("Invalid record: not a JSON object"))
  }

  test("qualityCounts splits clean vs flagged") {
    val df = Seq("""{"a": 1}""", """{"a": 1, "b": 2}""", """{"c": 3}""").toDF("data")
    val validated = Validate.withQualityIssues(df, JsonSchema(Map("a" -> "string"), Seq("a")), "data")
    val (clean, flagged) = Validate.qualityCounts(validated)
    assert((clean, flagged) == (1L, 2L))
  }
}
