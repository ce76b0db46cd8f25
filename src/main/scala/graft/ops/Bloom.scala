package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual runtime-filter / semi-join pushdown (extension mandate, SURVEY
  * §2.3): build a Bloom filter over the small (dimension) side's join keys
  * and pre-filter the fact side BEFORE its shuffle — the pattern Spark's
  * own runtime row-group filtering uses, exposed as an operator so a
  * pipeline can prune a 100 TB fact scan down to the ~matching rows while
  * the data is still map-side.
  *
  * Scale shape: the bit array is control-plane (`m/8` bytes, default 8 KiB,
  * collected once from a one-job distinct over the dim keys) and ships in
  * the plan as ONE literal array-of-longs — O(1) plan size, the same
  * typedLit-kernel discipline as `graft_argmax_cos`. The probe is pure
  * codegen'd arithmetic (xxhash64 + shift + mask), no UDF. False positives
  * are removed by the exact join that follows; false negatives are
  * impossible by construction, so the composite result is EXACTLY the
  * semi-join — the Bloom stage only changes how many fact rows reach the
  * shuffle.
  */
object Bloom {

  /** A built filter: `m` bits in packed little-endian longs, `k` probes. */
  final case class BloomBits(m: Int, k: Int, words: Array[Long]) {
    require(words.length == (m + 63) / 64, s"need ${(m + 63) / 64} words")
  }

  /** Probe positions: k independent hashes via seed-salted xxhash64 —
    * identical expression on build and probe so the two always agree. */
  private def positions(key: Column, m: Int, k: Int): Seq[Column] =
    (0 until k).map(i => pmod(xxhash64(lit(i), key), lit(m.toLong)))

  /** Build the filter from `df`'s `keyCol`. Hashing runs in the executors
    * (one distinct-positions job); only the ≤ m distinct bit positions
    * cross to the driver — control-plane, like k-means centroids. */
  def build(df: DataFrame, keyCol: String, m: Int = 1 << 16,
            k: Int = 3): BloomBits = {
    require(m > 0, s"Bloom.build: m must be > 0, got $m")
    require(k > 0, s"Bloom.build: k must be > 0, got $k")
    val pos = df.select(explode(array(positions(col(keyCol), m, k): _*)).as("p"))
      .distinct().collect().map(_.getLong(0))
    val words = new Array[Long]((m + 63) / 64)
    pos.foreach { p => words((p >>> 6).toInt) |= 1L << (p & 63).toInt }
    BloomBits(m, k, words)
  }

  /** `true` iff `key` may be in the set (never false for a present key).
    * One `graft_bloom` kernel call: the packed words ride the plan as a
    * single reference object (O(1) plan size in m and k) and the probe
    * stays inside whole-stage codegen — PlanSpec-pinned. */
  def mightContain(bits: BloomBits, key: Column): Column =
    call_function("graft_bloom",
      typedLit(bits.words.toSeq) +: positions(key, bits.m, bits.k): _*)

  /** `fact` rows whose `factKey` appears in `dim`.`dimKey` — exactly the
    * left-semi join, computed as Bloom pre-filter (map-side, prunes the
    * fact shuffle) followed by the exact semi-join (removes the Bloom's
    * false positives). */
  def semiJoinPrefiltered(fact: DataFrame, factKey: String,
                          dim: DataFrame, dimKey: String,
                          m: Int = 1 << 16, k: Int = 3): DataFrame = {
    val bits = build(dim, dimKey, m, k)
    fact.filter(mightContain(bits, col(factKey)))
      .join(dim.select(col(dimKey)).distinct(),
        col(factKey) === col(dimKey), "left_semi")
  }

  /** `batch` rows whose `batchKey` does NOT appear in `seen`.`seenKey` —
    * exactly the left-anti join, computed the incremental-ingest way: a
    * Bloom-negative row is DEFINITELY new (no false negatives) and passes
    * map-side with no join at all; only Bloom-positive rows — the true
    * duplicates plus the filter's ~fp-rate — are verified by the exact
    * anti-join. Deduping a daily batch against a corpus-scale key set thus
    * shuffles a few percent of the batch instead of all of it; the `seen`
    * side ships as `m/8` control-plane bytes however big the corpus is
    * (size m to the corpus key count for the fp-rate you want).
    */
  def antiJoinPrefiltered(batch: DataFrame, batchKey: String,
                          seen: DataFrame, seenKey: String,
                          m: Int = 1 << 16, k: Int = 3): DataFrame = {
    val bits = build(seen, seenKey, m, k)
    val probe = mightContain(bits, col(batchKey))
    val definitelyNew = batch.filter(!probe)
    val verified = batch.filter(probe)
      .join(seen.select(col(seenKey)).distinct(),
        col(batchKey) === col(seenKey), "left_anti")
    definitelyNew.unionByName(verified)
  }
}
