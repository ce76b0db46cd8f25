package graft

import graft.model.JsonSchema
import graft.ops.Evolution

/** W2/A2 — the schema-version state machine (reference `app.py:96-130`):
  * first batch creates v1 with no change row; same field set is a no-op;
  * changed field set bumps the version and logs added/removed names.
  */
class EvolutionSpec extends SparkSpec {

  private def schema(fields: String*): JsonSchema =
    JsonSchema(fields.map(_ -> "string").toMap, fields.sorted)

  test("first batch creates v1, no change row") {
    val dir = tmpDir("evo_")
    val evo = new Evolution(spark, dir)
    assert(evo.latestVersion == 0)
    val v = evo.evolve(schema("a", "b"), Set("a", "b"))
    assert(v == 1)
    assert(evo.schemaHistory.count() == 1)
    assert(evo.schemaChanges.count() == 0)
  }

  test("identical field set is a version no-op") {
    val dir = tmpDir("evo_")
    val evo = new Evolution(spark, dir)
    evo.evolve(schema("a", "b"), Set("a", "b"))
    val v = evo.evolve(schema("b", "a"), Set("b", "a"))
    assert(v == 1)
    assert(evo.schemaHistory.count() == 1)
    assert(evo.schemaChanges.count() == 0)
  }

  test("changed field set bumps version and logs the diff") {
    val dir = tmpDir("evo_")
    val evo = new Evolution(spark, dir)
    evo.evolve(schema("a", "b"), Set("a", "b"))
    val v2 = evo.evolve(schema("a", "c", "d"), Set("a", "c", "d"))
    assert(v2 == 2)
    val change = evo.schemaChanges.collect()(0)
    assert(change.getAs[Int]("old_version") == 1)
    assert(change.getAs[Int]("new_version") == 2)
    assert(change.getAs[scala.collection.Seq[String]]("added_fields").toSeq == Seq("c", "d"))
    assert(change.getAs[scala.collection.Seq[String]]("removed_fields").toSeq == Seq("b"))
  }

  test("type-only changes are invisible (names drive evolution)") {
    val dir = tmpDir("evo_")
    val evo = new Evolution(spark, dir)
    evo.evolve(JsonSchema(Map("a" -> "string"), Seq("a")), Set("a"))
    val v = evo.evolve(JsonSchema(Map("a" -> "integer"), Seq("a")), Set("a"))
    assert(v == 1)
  }

  test("latest returns highest version's schema json") {
    val dir = tmpDir("evo_")
    val evo = new Evolution(spark, dir)
    evo.evolve(schema("a"), Set("a"))
    evo.evolve(schema("a", "b"), Set("a", "b"))
    val (v, json) = evo.latest.get
    assert(v == 2)
    assert(Evolution.fieldNamesOfStoredSchema(json) == Set("a", "b"))
  }

  test("fieldNamesOfStoredSchema parses the genson rendering incl. escapes") {
    val js = JsonSchema(Map("a\"b" -> "string", "plain" -> "string"), Nil).toJson
    assert(Evolution.fieldNamesOfStoredSchema(js) == Set("a\"b", "plain"))
  }
}
