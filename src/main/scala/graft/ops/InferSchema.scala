package graft.ops

import graft.model.JsonSchema
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A1 — dynamic schema inference over a batch of JSON records (reference
  * `app.py:250-263`, genson-based).
  *
  * Observable semantics (SURVEY §1.3, confirmed against the reference's stored
  * schemas): `properties` = union of field names across the batch; `required`
  * = field names present in every record; leaf types all `"string"` in
  * strict-parity mode (the reference stringifies every value first).
  *
  * Spark-first design: this is a single key-presence aggregation —
  * `explode(json_object_keys(data))` → `groupBy(key).count()` — one shuffle
  * whose key cardinality is the number of *distinct field names* (tiny), so
  * the map-side partial aggregation collapses ~all the data before the
  * shuffle. The collected state is a few KB of (field, count) pairs — the only
  * legitimately driver-side step, exactly like the reference's single-writer
  * schema control plane. Scales to 100 TB: the wide fact scan stays
  * distributed; nothing per-record ever reaches the driver.
  *
  * We use `json_object_keys` (not `from_json`) so an absent key and an
  * explicit JSON null stay distinguishable — genson treats `{"a": null}` as
  * field `a` present (SURVEY §7.4).
  */
object InferSchema {

  /** Per-field presence counts as a DataFrame — the distributed core of
    * inference; also exposed directly as an oracle-checked query.
    * Output: (field: string, n_present: long).
    */
  def fieldPresence(records: DataFrame, jsonCol: String): DataFrame =
    records
      .select(explode(json_object_keys(col(jsonCol))).as("field"))
      .groupBy("field").agg(count(lit(1)).as("n_present"))

  /** Typed variant for structured mode: per record, field -> JSON type
    * name, via the native `graft_json_types` kernel
    * ([[graft.functions.JsonFieldTypes]] — requires
    * [[graft.GraftExtensions]] on the session). Same shared-Jackson parse
    * as the Scala UDF it replaces (r21), but as a native expression there
    * is no ScalaUDF wrapper per row and no Catalyst↔Scala converter on the
    * (Map) output — the typed-inference scan stays inside whole-stage
    * codegen with one static call per record. Semantics are the UDF's,
    * row for row: malformed / non-object / null-parse records yield an
    * empty array (no rows after the explode), a NULL input column
    * null-propagates (the explode drops it identically), and duplicate
    * keys collapse inside Jackson's readTree either way.
    */
  private def fieldJsonTypes(c: Column): Column =
    call_function("graft_json_types", c)

  /** Full inference: one distributed aggregation, then a tiny driver-side
    * collect of (field, presence, type-votes).
    *
    * @param parityStringify strict-parity mode: every leaf type is "string"
    *        (reference `app.py:253-261`); structured mode keeps real types
    *        (the reference's own older v1 artifact behavior, SURVEY §1.2).
    */
  def infer(records: DataFrame, jsonCol: String = "data",
            parityStringify: Boolean = true): Option[JsonSchema] = {
    // The record total (the `required` denominator) rides the SAME job as
    // the presence aggregation via observe() — a records.count() here would
    // scan the batch twice (and in typed mode pay the Jackson parse twice).
    val obs = new org.apache.spark.sql.Observation()
    val observed = records.observe(obs, count(lit(1)).as("total"))

    val presence =
      if (parityStringify) {
        fieldPresence(observed, jsonCol)
          .withColumn("types", array(lit("string")))
      } else {
        observed
          .select(explode(fieldJsonTypes(col(jsonCol))).as("kv"))
          .select(col("kv.field").as("field"), col("kv.t").as("t"))
          .groupBy("field")
          .agg(count(lit(1)).as("n_present"), collect_set(col("t")).as("types"))
      }

    val rows = presence.collect() // tiny: one row per distinct field name
    // PropagateEmptyRelation can optimize the CollectMetrics node away
    // entirely (empty batch -> empty LocalRelation), leaving the observation
    // unfired; the count() fallback is free in exactly that case.
    val total = scala.util.Try(obs.get("total").asInstanceOf[Long])
      .getOrElse(records.count())
    if (total == 0) return None
    val props = rows.map { r =>
      // Spark returns array columns as mutable.ArraySeq on Scala 2.13 —
      // request the cross-package supertype, then normalize.
      val types = r.getAs[scala.collection.Seq[String]]("types")
        .toSeq.filterNot(_ == "null")
      val t = types match {
        case Seq(single) => single
        case ts if ts.toSet == Set("integer", "number") => "number"
        case Seq() => "null"
        case _ => "string"
      }
      r.getAs[String]("field") -> t
    }.toMap
    val required = rows.filter(_.getAs[Long]("n_present") == total)
      .map(_.getAs[String]("field")).toSeq.sorted
    Some(JsonSchema(props, required))
  }

  /** Inference over an already-structured DataFrame (e.g. a fresh CSV read):
    * field presence = non-null count per column in parity with the reference,
    * where a parsed record simply lacks absent keys. Columns are the union by
    * construction; required = columns with zero nulls.
    */
  def inferStructured(df: DataFrame): Option[JsonSchema] = {
    // total and per-column non-null counts in ONE aggregation job
    val counts = df.select(
      (count(lit(1)).as("__total") +:
        df.columns.map(c => count(col(c)).as(c))).toSeq: _*).collect()(0)
    val total = counts.getLong(0)
    if (total == 0) return None
    val props = df.schema.fields.map { f => f.name -> "string" }.toMap
    val required = df.columns.zipWithIndex
      .filter { case (_, i) => counts.getLong(i + 1) == total }
      .map(_._1).toSeq.sorted
    Some(JsonSchema(props, required))
  }
}
