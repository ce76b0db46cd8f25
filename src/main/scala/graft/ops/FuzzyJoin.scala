package graft.ops

import org.apache.spark.sql.DataFrame
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

  /** Matching pairs (`id_a` < `id_b`, `dist` ≤ maxDist) among `df`'s
    * `strCol`, deduplicated across blocks. */
  def selfJoin(df: DataFrame, idCol: String, strCol: String,
               maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val bandW = maxDist + 1
    val band = floor(length(col("__s")) / bandW)
    val keyed = df.select(col(idCol).as("__id"), col(strCol).as("__s"))
      .withColumn("__b", explode(array(band, band + 1)))
    val a = keyed.select(col("__b"), col("__id").as("id_a"), col("__s").as("s_a"))
    val b = keyed.select(col("__b"), col("__id").as("id_b"), col("__s").as("s_b"))
    // Pinned shuffle-hash: both sides are the corpus ×2 (the band explode),
    // and Catalyst cannot see the fan-out in its size estimate — the same
    // mid-scale broadcast flip measured and pinned away in
    // [[SkewJoin.saltedJoin]]; an entity-resolution corpus is never
    // broadcast-sized by premise.
    a.join(b.hint("shuffle_hash"), "__b")
      .filter(col("id_a") < col("id_b"))
      // same-band pairs meet in TWO blocks (both emit b and b+1), and
      // adjacent-band pairs can be up to 2·maxDist+1 apart in length —
      // dedup and length-prefilter BEFORE the O(len²) levenshtein so each
      // surviving pair pays the DP exactly once
      .filter(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      .select("id_a", "id_b", "s_a", "s_b").distinct()
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b")).as("dist"))
      .filter(col("dist") <= maxDist)
  }
}
