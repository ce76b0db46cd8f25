package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed equi-joins.
  *
  * AQE's skew-join split (on by default) rebalances most skew at runtime by
  * splitting oversized sort-merge partitions, so it is the FIRST tool. Explicit
  * salting remains the scale path for the cases AQE cannot split: a broadcast
  * disabled by size with one key holding a double-digit share of the fact
  * side, or a skewed aggregation-input join feeding a shuffle whose hot key
  * would serialize one reducer. Salting trades `salts`× replication of the
  * build side for `salts`-way parallelism of every hot key.
  *
  * Result set is IDENTICAL to `facts.join(dims, keys)` — the salt is an
  * internal join-key extension, dropped before returning.
  */
object SkewJoin {

  /** Inner equi-join of a skewed `facts` side against a smaller `dims` side.
    *
    * The fact side gets a deterministic salt in `[0, salts)` (hash of the
    * whole row — any distribution works, determinism keeps replays stable);
    * the dim side is replicated once per salt with `explode(sequence(...))`.
    * Join key becomes (key..., salt): a key with N fact rows fans out across
    * `salts` reducers instead of one.
    *
    * The join is PINNED to shuffle-hash with the replicated dims as the
    * build side. Catalyst cannot see the `salts`× explode in its size
    * estimate, so left to itself it broadcast the replicated side at
    * mid scale (measured on the ×10 rehearsal: a 12 M-row HashedRelation
    * build, slower than the ×30 corpus's shuffle plan — inverse scaling
    * from a threshold flip; the same corpus-proportional-broadcast flaw
    * the minhash/simhash chains pin away). A salted join's dim side is
    * meaningfully sized BY PREMISE — if dims are broadcast-small, skip the
    * salt and let a plain join broadcast them — so the shuffled plan is
    * also the only one that survives 100 TB. Per-partition build =
    * dims × salts / shuffle.partitions, bounded by sizing `salts` against
    * the partition count; no sort, unlike the merge join AQE picks above
    * its broadcast threshold.
    */
  def saltedJoin(facts: DataFrame, dims: DataFrame, keys: Seq[String],
                 salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val factCols = facts.columns
    val salted = facts.withColumn("__salt",
      pmod(hash(factCols.map(col).toSeq: _*), lit(salts)))
    val replicated = dims.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated.hint("shuffle_hash"), keys :+ "__salt").drop("__salt")
  }
}
