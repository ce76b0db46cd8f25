package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto a
  * fixed period grid and forward-fill the gaps — the staple preprocessing
  * step for state-like series (sensor readings, account balances, feature
  * snapshots) before windowed modeling.
  *
  * Scale shape: one hash-agg on (key, period) for the per-period
  * observation, one tiny per-key min/max agg, a `sequence`-explode for the
  * grid (rows = total periods, never a cross join), and one per-key window
  * for the fill — linear, spillable, AQE-splittable on skewed keys.
  */
object TimeSeries {

  /** One row per (key, period) from each key's first to last observed
    * period (`tsCol` div `periodUs`): `value` = the period's LAST
    * observation of `valueCol` (ties on the timestamp broken by the larger
    * value — deterministic, engine-neutral), forward-filled across gap
    * periods; `observed` marks real periods. Leading periods are always
    * observed by construction (the grid starts at the key's first
    * observation), so `value` is never null.
    */
  def gapFill(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
              periodUs: Long): DataFrame = {
    val base = df.select(col(keyCol).as("key"), col(tsCol).cast("long").as("__ts"),
        col(valueCol).cast("double").as("__v"))
      .withColumn("per", expr(s"__ts div $periodUs"))
    val observed = base.groupBy("key", "per")
      .agg(max(struct(col("__ts"), col("__v"))).getField("__v").as("obs_v"))
    val grid = base.groupBy("key")
      .agg(min(col("per")).as("p0"), max(col("per")).as("p1"))
      .select(col("key"), explode(sequence(col("p0"), col("p1"))).as("per"))
    val w = Window.partitionBy("key").orderBy("per")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(observed, Seq("key", "per"), "left")
      .select(col("key"), col("per"),
        last(col("obs_v"), ignoreNulls = true).over(w).as("value"),
        col("obs_v").isNotNull.as("observed"))
  }
}
