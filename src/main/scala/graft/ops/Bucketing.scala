package graft.ops

import org.apache.spark.sql.DataFrame

/** Bucketed-table co-location: pre-shuffle a table ONCE at write time so
  * every later equi-join or aggregation on the bucket key runs shuffle-free.
  *
  * At 100 TB this is the difference between re-shuffling the fact table on
  * every query and paying the exchange exactly once: two tables bucketed by
  * the same key into the same bucket count sort-merge-join with NO Exchange
  * on either side (PlanSpec pins this), and a `groupBy(bucketKey)` reuses
  * the bucketing as its partitioning. The trade: bucketed tables are
  * catalog-managed (bucket metadata lives in the table definition, not the
  * parquet files), and the bucket count is fixed at write time — size it to
  * the target parallelism (shuffle-partition count, or files-per-executor at
  * the expected cluster size).
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed (and sorted) by `key`.
    * The sort makes each bucket file range-readable and lets the join skip
    * its per-task sort when Spark can prove ordering.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
}
