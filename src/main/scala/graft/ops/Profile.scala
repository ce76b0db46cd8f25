package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling (extension mandate, SURVEY §2.3): the one-glance data
  * summary every ingest pipeline runs first — per column: row count, null
  * count, exact distinct count, min/max. One aggregation job per column
  * over a shared scan (Spark unions the per-column plans; each is a
  * hash-agg with map-side partials), results stacked into a tidy
  * (col_name, …) table.
  *
  * `n_distinct` is exact (`countDistinct` — one shuffle per column); at
  * corpus scale swap `approx_count_distinct` in via `exact = false`, the
  * same dial the distinct-estimation queries expose.
  */
object Profile {

  /** Per-column stats of `cols`; min/max are aggregated in the column's
    * native type, then rendered as strings so the profile stacks. */
  def profile(df: DataFrame, cols: Seq[String],
              exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    cols.map { c =>
      val distinctAgg =
        if (exact) countDistinct(col(c))
        else approx_count_distinct(col(c))
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
        distinctAgg.as("n_distinct"),
        min(col(c)).cast("string").as("min_value"),
        max(col(c)).cast("string").as("max_value"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_value"), col("max_value"))
    }.reduce(_ unionByName _)
  }
}
