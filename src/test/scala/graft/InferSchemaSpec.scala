package graft

import graft.ops.InferSchema

/** A1 inference laws (reference genson semantics, SURVEY §1.3):
  * properties = union of field names, required = fields present in EVERY
  * record, explicit JSON null still counts as present, order-insensitive.
  */
class InferSchemaSpec extends SparkSpec {
  import spark.implicits._

  test("properties=union, required=intersection") {
    val df = Seq("""{"a": 1, "b": 2}""", """{"a": 3, "c": 4}""").toDF("data")
    val s = InferSchema.infer(df, "data").get
    assert(s.properties.keySet == Set("a", "b", "c"))
    assert(s.required == Seq("a"))
  }

  test("explicit null counts as present (genson add_object behavior)") {
    val df = Seq("""{"a": null}""", """{"a": 1}""").toDF("data")
    val s = InferSchema.infer(df, "data").get
    assert(s.required == Seq("a"))
  }

  test("order-insensitive: shuffled record order gives identical schema") {
    val recs = Seq("""{"x": 1, "y": 2}""", """{"y": 3}""", """{"z": 4, "x": 5}""")
    val s1 = InferSchema.infer(recs.toDF("data"), "data").get
    val s2 = InferSchema.infer(recs.reverse.toDF("data"), "data").get
    assert(s1 == s2)
    assert(s1.toJson == s2.toJson)
  }

  test("strict-parity mode types every leaf as string") {
    val df = Seq("""{"n": 42, "s": "x", "b": true}""").toDF("data")
    val s = InferSchema.infer(df, "data").get
    assert(s.properties.values.toSet == Set("string"))
  }

  test("structured mode keeps json types; int+float widens to number") {
    val df = Seq("""{"n": 1, "f": 1.5, "s": "x"}""", """{"n": 2.5, "f": 2, "s": "y"}""")
      .toDF("data")
    val s = InferSchema.infer(df, "data", parityStringify = false).get
    assert(s.properties("n") == "number")
    assert(s.properties("f") == "number")
    assert(s.properties("s") == "string")
  }

  test("empty batch infers no schema") {
    val df = Seq.empty[String].toDF("data")
    assert(InferSchema.infer(df, "data").isEmpty)
  }

  test("typed mode via the native kernel keeps the Scala UDF's edge semantics") {
    // r21: the typed path moved from a ScalaUDF to the native
    // graft_json_types kernel — pin the UDF's documented corner behavior:
    // malformed / non-object records contribute no fields (but still count
    // toward the `required` denominator), a NULL record null-propagates,
    // explicit null types drop out, bool/array/object map by name.
    val df = Seq(
      """{"b": true, "arr": [1], "obj": {"x": 1}, "n": null}""",
      """not json at all""",
      """[1, 2, 3]""",
      null.asInstanceOf[String],
      """{"b": false, "arr": [], "obj": {}, "n": 7}""").toDF("data")
    val s = InferSchema.infer(df, "data", parityStringify = false).get
    assert(s.properties == Map(
      "b" -> "boolean", "arr" -> "array", "obj" -> "object", "n" -> "integer"))
    // 5 records total, fields present in only 2 → nothing is required
    assert(s.required.isEmpty)
  }
}
