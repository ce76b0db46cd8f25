package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy matching (extension mandate, SURVEY §2.3) — the
  * entity-resolution self-join: pairs of records whose string key is
  * within `maxDist` Levenshtein edits.
  *
  * Candidates come from SOUND length-band blocking: `maxDist` edits change
  * a string's length by at most `maxDist`, so with bands of width
  * `maxDist+1` (each string emitting its band and band+1) every true pair
  * meets in at least one block — the blocking is COMPLETE, the result is
  * exactly the all-pairs answer, and the oracle can replay it as the naive
  * quadratic join. Exact `levenshtein` (codegen'd builtin, same DP
  * definition in DuckDB) verifies candidates.
  *
  * Scale: shuffle volume is 2 rows per input; the quadratic term is
  * per-block. Length banding alone is weak when lengths concentrate (the
  * worst case is one hot band); for corpus-scale entity resolution compose
  * it with a content block (e.g. a shared-token or PassJoin-segment key)
  * the same way [[Dedup]] stacks MinHash bands — the verify step and
  * contract stay identical.
  */
object FuzzyJoin {

  /** Salt fan-out of the block self-join (r21): length bands are
    * LOW-cardinality when lengths concentrate (the documented worst case —
    * fixed-format keys put the whole corpus in two bands), and a
    * low-cardinality shuffle key collapses the join onto as many tasks as
    * there are distinct bands, leaving the rest of the cluster idle while
    * two tasks grind the quadratic per-block work (guide §2.5's synthetic-
    * key skew). Salting splits each block's quadratic work `Salts` ways:
    * the probe side carries one deterministic salt (pure function of the
    * id — retried tasks reproduce it, the SPARK-38388 rule), the build
    * side replicates `Salts`×, so every true pair still meets exactly
    * once per shared block. The build side's extra replication is a
    * constant factor on (id, string) rows — linear, and the price of
    * making per-block parallelism scale with executors instead of with
    * the data's length histogram.
    */
  private val Salts = 8

  /** Matching pairs (`id_a` < `id_b`, `dist` ≤ maxDist) among `df`'s
    * `strCol`, deduplicated across blocks. */
  def selfJoin(df: DataFrame, idCol: String, strCol: String,
               maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val bandW = maxDist + 1
    def bandOf(s: Column) = floor(length(s) / bandW)
    val band = bandOf(col("__s"))
    val keyed = df.select(col(idCol).as("__id"), col(strCol).as("__s"))
      .withColumn("__b", explode(array(band, band + 1)))
    val a = keyed.select(col("__b"), col("__id").as("id_a"), col("__s").as("s_a"))
      .withColumn("__salt", pmod(xxhash64(col("id_a")), lit(Salts.toLong)))
    val b = keyed.select(col("__b"), col("__id").as("id_b"), col("__s").as("s_b"))
      .withColumn("__salt", explode(array((0 until Salts).map(s => lit(s.toLong)): _*)))
    // Pinned shuffle-hash: both sides are the corpus ×2 (the band explode),
    // and Catalyst cannot see the fan-out in its size estimate — the same
    // mid-scale broadcast flip measured and pinned away in
    // [[SkewJoin.saltedJoin]]; an entity-resolution corpus is never
    // broadcast-sized by premise.
    a.join(b.hint("shuffle_hash"), Seq("__b", "__salt"))
      .filter(col("id_a") < col("id_b"))
      // adjacent-band pairs can be up to 2·maxDist+1 apart in length —
      // length-prefilter BEFORE the O(len·maxDist) levenshtein
      .filter(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      // Block-ownership dedup (r21, replaces a `.distinct()` over the
      // (ids, strings) 4-tuple — a full exchange of every candidate pair
      // with its two payload strings): a pair meets in blocks
      // {β_a, β_a+1} ∩ {β_b, β_b+1} — two blocks when β_a = β_b, one when
      // the bands are adjacent — and in every case greatest(β_a, β_b) is
      // a member, so keeping a pair only in THAT block emits it exactly
      // once. Pure codegen filter; no exchange, no pair materialization.
      .filter(col("__b") === greatest(bandOf(col("s_a")), bandOf(col("s_b"))))
      // Bounded-DP levenshtein (r21): the 3-arg form abandons a pair the
      // moment its distance provably exceeds maxDist (banded O(len·maxDist)
      // DP instead of O(len²)), returning -1 — for kept pairs (dist ≥ 0,
      // i.e. ≤ maxDist) the value is the exact distance, so output rows
      // are identical to the unbounded form's.
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
  }
}
