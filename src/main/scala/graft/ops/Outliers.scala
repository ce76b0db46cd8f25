package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group IQR outlier detection (extension mandate, SURVEY §2.3) — the
  * standard distribution-free data-quality gate: a value is an outlier in
  * its group iff it falls outside `[q1 − k·IQR, q3 + k·IQR]`.
  *
  * Shape: one grouped percentile aggregation over the fact table (hash-agg
  * with map-side partials), then a broadcast join of the tiny per-group
  * bounds table back onto the facts — the fact side is never shuffled, so
  * the gate is effectively map-side at any scale. The interpolated
  * `percentile` arithmetic is engine-portable (pinned by `q_percentile`),
  * which keeps the flag replayable in SQL.
  */
object Outliers {

  /** `df` plus boolean `is_outlier` (and the group's `lo`/`hi` bounds) by
    * the k·IQR fence of `valueCol` within `groupCol`. */
  def flagIqr(df: DataFrame, groupCol: String, valueCol: String,
              k: Double = 1.5): DataFrame = {
    val bounds = df.groupBy(groupCol).agg(
      expr(s"percentile($valueCol, 0.25)").as("__q1"),
      expr(s"percentile($valueCol, 0.75)").as("__q3"))
      .select(col(groupCol).as("__g"),
        (col("__q1") - (col("__q3") - col("__q1")) * k).as("lo"),
        (col("__q3") + (col("__q3") - col("__q1")) * k).as("hi"))
    // null-safe join: groupBy emits a bounds row for the null group, and a
    // plain equi-join would silently DROP those input rows — exactly the
    // rows a data-quality gate must keep
    df.join(broadcast(bounds), col(groupCol) <=> col("__g"), "left")
      .drop("__g")
      .withColumn("is_outlier", coalesce(
        col(valueCol) < col("lo") || col(valueCol) > col("hi"), lit(false)))
  }
}
