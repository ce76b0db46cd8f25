package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling (extension mandate, SURVEY §2.3): the one-glance data
  * summary every ingest pipeline runs first — per column: row count, null
  * count, exact distinct count, min/max.
  *
  * ONE scan: all columns' aggregates run in a single aggregation job (the
  * multiple DISTINCT aggregates plan as one pass with an Expand — same IO,
  * ×cols CPU on the expanded rows, the standard profiling trade). The
  * single result row is control-plane and is stacked driver-side into the
  * tidy (col_name, …) table — guaranteeing the input really is read once,
  * which a union of per-column aggregate plans would not.
  *
  * `n_distinct` is exact by default; at corpus scale flip `exact = false`
  * for HLL (`approx_count_distinct`), the same dial the
  * distinct-estimation queries expose.
  */
object Profile {

  /** Per-column stats of `cols`; min/max are aggregated in the column's
    * native type, then rendered as strings so the profile stacks. Null
    * counts are `count(when(isNull))` — 0 on empty input, never null. */
  def profile(df: DataFrame, cols: Seq[String],
              exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = cols.flatMap { c =>
      val distinctAgg =
        if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
      Seq(
        count(when(col(c).isNull, 1)).as(s"__nn_$c"),
        distinctAgg.as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val r = df.agg(count(lit(1)).as("__n"), aggs: _*).collect()(0)
    cols.map { c =>
      (c, r.getAs[Long]("__n"), r.getAs[Long](s"__nn_$c"),
        r.getAs[Long](s"__nd_$c"),
        r.getAs[String](s"__mn_$c"), r.getAs[String](s"__mx_$c"))
    }.toDF("col_name", "n_rows", "n_nulls", "n_distinct",
      "min_value", "max_value")
  }

  /** Equi-depth histogram of a numeric column — the optimizer-stats sibling
    * of the fixed-width binning query: `buckets` bins holding ~equal row
    * counts. Scale-safe two-pass shape (NOT a global ntile window, which
    * would sort everything into one task): pass 1 computes the interior
    * bucket edges with the exact interpolated `percentile` aggregate (a
    * `buckets-1`-element control-plane array); pass 2 bins every row by
    * counting edges strictly below its value (codegen'd literal-array
    * filter, map-side) and aggregates per bin. Values equal to an edge go
    * LEFT (bucket = #edges < value). Deterministic: both passes are exact
    * arithmetic, and DuckDB's `quantile_cont` interpolates identically.
    *
    * @return (bucket, n, lo, hi) — bucket 0-based; empty input → no rows.
    */
  def equiDepthHistogram(df: DataFrame, valueCol: String,
                         buckets: Int): DataFrame = {
    require(buckets >= 2, s"equiDepthHistogram: need >= 2 buckets, got $buckets")
    val probs = (1 until buckets).map(i => i.toDouble / buckets)
    val edgeRow = df
      .agg(expr(s"percentile($valueCol, array(${probs.mkString(", ")}))"))
      .collect()(0)
    if (edgeRow.isNullAt(0)) return df.sparkSession.emptyDataFrame
      .select(lit(0).as("bucket"), lit(0L).as("n"),
        lit(0.0).as("lo"), lit(0.0).as("hi"))
    val edges = edgeRow.getAs[scala.collection.Seq[Double]](0).toSeq
    val edgeArr = array(edges.map(lit(_)): _*)
    df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("__v"))
      .withColumn("bucket",
        size(filter(edgeArr, e => e < col("__v"))))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min(col("__v")).as("lo"), max(col("__v")).as("hi"))
  }

  /** Pairwise Pearson correlation of numeric columns — the profiling
    * companion every feature audit runs: one aggregation job computes all
    * C(n,2) pairs (Spark plans the `corr` aggregates into a single pass),
    * then a `stack` unpivots the single row into the tidy
    * (col_a, col_b, corr) table — fully LAZY, unlike [[profile]]'s
    * driver-side stacking, so plans compose and nothing runs until acted
    * on. Degenerate pairs (zero variance) come out NULL (Spark's NaN is
    * normalized to match SQL `corr`). Values ride the 1e-6 rounding grid:
    * `corr` sums products of doubles, whose parallel-vs-sequential
    * accumulation order differs across engines by ulps.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.length >= 2, "corrMatrix: need at least two columns")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs = pairs.zipWithIndex.map { case ((a, b), i) =>
      val c = corr(col(a), col(b))
      Nums.round6(when(isnan(c), lit(null)).otherwise(c)).as(s"__c$i")
    }
    def q(name: String) = "'" + name.replace("'", "''") + "'" // SQL-escape
    val stackArgs = pairs.zipWithIndex
      .map { case ((a, b), i) => s"${q(a)}, ${q(b)}, __c$i" }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${pairs.length}, $stackArgs) AS (col_a, col_b, corr)"))
  }
}
