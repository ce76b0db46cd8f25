package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Deterministic training-shard assignment: `shard(key) = first 15 hex
    * digits of md5(key) mod nShards`. The property a training pipeline
    * needs — and `hash()`/`spark_partition_id()` do NOT give — is
    * *engine- and run-independence*: the same record lands in the same
    * shard on every rerun, on any cluster size, and in any engine that can
    * compute md5, so incremental corpus additions never reshuffle existing
    * shards and an eval harness can locate a document's shard without
    * Spark. 15 hex digits = 60 bits, so the mod is unbiased to ~2^-60 for
    * any realistic shard count.
    *
    * Map-only expression (no UDF). Feed the result to
    * `df.repartition(nShards, col("shard")).write.partitionBy("shard")`
    * (or [[writeBucketed]]) for the physical layout.
    */
  def shardOf(key: Column, nShards: Int): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(nShards.toLong))

  /** `df` plus a `shard` column — see [[shardOf]]. */
  def assignShards(df: DataFrame, keyCol: String, nShards: Int): DataFrame =
    df.withColumn("shard", shardOf(col(keyCol), nShards))

  /** Per-shard manifest (count + id-sum/min/max checksums) — the artifact a
    * pipeline stores next to the shards to verify balance and detect drift
    * between runs. One hash-aggregate.
    */
  def shardSummary(df: DataFrame, keyCol: String, nShards: Int): DataFrame =
    assignShards(df, keyCol, nShards)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col(keyCol)).as("id_sum"),
        min(col(keyCol)).as("id_min"),
        max(col(keyCol)).as("id_max"))
}
