package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-maintenance operators (extension mandate, SURVEY §2.3): the
  * two table-evolution primitives every production corpus store needs on
  * top of append-only ingest — slowly-changing-dimension type-2 history
  * builds and CDC latest-wins merge/upsert.
  *
  * Both are single-shuffle shapes: SCD2 is one window partitioned by the
  * business key; merge is one union + one window on the key. At 100 TB the
  * shuffle is on the merge key — bucket both sides on that key
  * ([[Bucketing]]) and the exchange disappears; there is no driver-side
  * state and no iteration.
  */
object Warehouse {

  /** Type-2 history of `attrCol` per `keyCol`, ordered by (`tsCol`,
    * `tieCol`): consecutive runs of the same attribute value collapse to
    * one row with a validity interval.
    *
    * @param tieCol unique tiebreaker (e.g. an event id) so equal
    *               timestamps order deterministically in every engine.
    * @return (`keyCol`, attr, valid_from, valid_to, version, is_current);
    *         `valid_to` is null on the current row, `version` is the
    *         1-based change index per key.
    */
  def scd2(df: DataFrame, keyCol: String, attrCol: String,
           tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    // Null attributes are ordinary values: wrap the lag in a struct so a
    // null __prev means "no previous row" (not "previous attr was null"),
    // and compare null-safely — a→null IS a change, null→null is NOT.
    val changes = df
      .withColumn("__prev",
        lag(struct(col(attrCol).as("a")), 1).over(w))
      .filter(col("__prev").isNull ||
        !(col("__prev.a") <=> col(attrCol)))
    // The second window runs over the change rows only (far smaller than
    // the input); same partitioning key, so AQE coalesces the two shuffles
    // into one stage boundary on `keyCol`.
    val w2 = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    changes
      .select(col(keyCol), col(attrCol).as("attr"),
        col(tsCol).as("valid_from"),
        lead(col(tsCol), 1).over(w2).as("valid_to"),
        row_number().over(w2).cast("long").as("version"))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Incremental aggregate maintenance: merge a `delta` batch's partial
    * aggregates into a `base` aggregate table without rescanning base —
    * the materialized-view update pattern. Works for any
    * commutative-monoid aggregates (counts and sums here): union the two
    * partial tables and re-reduce on the key. One shuffle over
    * |base|+|delta| AGGREGATE rows (≪ raw facts); bucket both sides on
    * the key and the exchange disappears.
    */
  def mergeAggregates(base: DataFrame, delta: DataFrame, keyCols: Seq[String],
                      sumCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "mergeAggregates: need at least one key column")
    require(sumCols.nonEmpty, "mergeAggregates: need at least one sum column")
    base.unionByName(delta)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(sumCols.head).as(sumCols.head),
        sumCols.tail.map(c => sum(c).as(c)): _*)
  }

  /** Anti-entropy reconciliation of two datasets by `keyCol`: keys present
    * on exactly one side, tagged `a_only` / `b_only` — two anti-joins and
    * a union, nothing quadratic. Run it between corpus replicas (or a
    * corpus and its index) to find drift.
    */
  def reconcile(a: DataFrame, b: DataFrame, keyCol: String): DataFrame = {
    val ka = a.select(col(keyCol)).distinct()
    val kb = b.select(col(keyCol)).distinct()
    ka.join(kb, Seq(keyCol), "left_anti").withColumn("side", lit("a_only"))
      .unionByName(
        kb.join(ka, Seq(keyCol), "left_anti").withColumn("side", lit("b_only")))
  }

  /** CDC latest-wins merge: apply `updates` over `base` by `keyCols`,
    * keeping for each key the row with the highest `versionCol`; at equal
    * versions an update beats a base row. Keys present only in `updates`
    * are inserts; `base` and `updates` must share a schema.
    *
    * One union (no shuffle) + one window shuffle on the key. The window
    * ranks only within a key's handful of versions, so partitions stay
    * balanced at any corpus size unless a single key receives millions of
    * updates — at which point pre-compact `updates` with the same window
    * before the merge.
    */
  def mergeLatest(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
                  versionCol: String): DataFrame = {
    require(keyCols.nonEmpty, "mergeLatest: need at least one key column")
    require(base.columns.sorted.sameElements(updates.columns.sorted),
      s"mergeLatest: schema mismatch base=${base.columns.sorted.mkString(",")}" +
        s" updates=${updates.columns.sorted.mkString(",")}")
    val tagged = base.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col("__src").desc)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
  }

  /** Full CDC apply — [[mergeLatest]] plus DELETES: `changes` rows carry an
    * op column (`'U'` upsert / `'D'` delete); for each key the
    * highest-version change wins (change beats base at equal versions),
    * and a winning delete removes the key entirely — the Delta/Iceberg
    * `MERGE ... WHEN MATCHED AND op='D' THEN DELETE` semantics as one
    * union + one key-window + one filter. `base` columns must equal
    * `changes` minus the op column.
    */
  def applyCdc(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
               versionCol: String, opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "applyCdc: need at least one key column")
    require(changes.columns.contains(opCol), s"applyCdc: changes lack '$opCol'")
    require(base.columns.sorted.sameElements(
      changes.columns.filterNot(_ == opCol).sorted),
      s"applyCdc: schema mismatch base=${base.columns.sorted.mkString(",")}" +
        s" changes-op=${changes.columns.filterNot(_ == opCol).sorted.mkString(",")}")
    val tagged = base
      .withColumn("__op", lit("U")).withColumn("__src", lit(0))
      .unionByName(changes
        .withColumnRenamed(opCol, "__op").withColumn("__src", lit(1)))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col("__src").desc)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("__op") =!= "D")
      .drop("__rn", "__src", "__op")
  }
}
