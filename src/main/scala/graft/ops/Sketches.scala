package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch aggregation (extension mandate, SURVEY §2.3) — the
  * fixed-size frequency summary for streaming/mergeable heavy-hitter
  * detection, rounding out the sketch set (HLL distinct counts, quantile
  * sketches, Bloom membership are already in the battery).
  *
  * Hashing is polynomial (`((key+1)·A_s) mod P mod width`, fixed odd
  * multipliers, Mersenne-prime P) rather than an engine-specific hash, so
  * every cell — and therefore every estimate — is exact integer arithmetic
  * that replays bit-identically in SQL: the WHOLE sketch sits under the
  * cross-engine hash check, not just a tolerance bound.
  *
  * Scale shape: building is one explode(depth) + hash-agg with map-side
  * combine — shuffle volume ≤ depth×width rows however big the input —
  * and the sketch table is depth×width cells (control-plane size).
  * Estimates join candidates against the sketch per row of depth, then
  * take the min — all broadcast-sized joins.
  */
object Sketches {

  /** Mersenne prime 2⁶¹−1, the modulus of the polynomial hash. Keys are
    * pre-folded to [0, 2³¹) inside [[pos]], so `(folded+1)·A` tops out at
    * 2³¹·A < 2⁶³ for every multiplier below 2³² — the product can never
    * overflow a Long, for ANY long key (negative included, via pmod). */
  private val P = 2305843009213693951L

  /** Fold width 2³¹: keys are reduced `pmod(key, 2³¹)` before hashing. */
  private val KeyFold = 2147483648L

  /** Deterministic odd multipliers per depth row (same construction idea as
    * the MinHash coefficient table: fixed, engine-neutral). Oddness is
    * load-bearing: an even multiplier shares a power-of-two factor with the
    * usual power-of-two widths and strands whole residue classes of cells
    * (`| 1L` exactly as the MinHash coeffs do). Depth is capped so every
    * multiplier stays below 2³², keeping the [[pos]] product within Long. */
  private[graft] def multipliers(depth: Int): Seq[Long] = {
    require(depth <= 20000, s"CMS depth $depth would push multipliers past 2^32")
    (0 until depth).map(s => (2654435761L + 2L * s * 40503L) | 1L)
  }

  /** The CMS cell coordinates of `key` (long column) for row `s`. The key is
    * folded mod 2³¹ first so the product with any multiplier (< 2³²) stays
    * within Long — no silent wraparound anywhere in the 64-bit key domain,
    * and the identical expression replays exactly in the DuckDB oracle. */
  private def pos(key: Column, a: Long, width: Int): Column =
    pmod(pmod((pmod(key, lit(KeyFold)) + 1L) * a, lit(P)), lit(width.toLong))

  /** Build the sketch: (`row`, `pos`, `cnt`) cells — at most depth×width
    * rows, zero cells omitted. `weightCol` optionally adds per-row weights
    * (defaults to 1 per row). */
  def countMin(df: DataFrame, keyCol: String, depth: Int, width: Int,
               weightCol: Option[String] = None): DataFrame = {
    require(depth > 0 && width > 0, s"bad CMS shape $depth x $width")
    val as = multipliers(depth)
    val w = weightCol.map(col(_).cast("long")).getOrElse(lit(1L))
    val cells = as.zipWithIndex.map { case (a, s) =>
      struct(lit(s).cast("long").as("row"),
        pos(col(keyCol).cast("long"), a, width).as("pos"), w.as("w"))
    }
    df.select(explode(array(cells: _*)).as("c"))
      .groupBy(col("c.row").as("row"), col("c.pos").as("pos"))
      .agg(sum(col("c.w")).as("cnt"))
  }

  /** Point-estimate the frequency of every key in `candidates`: the min
    * over depth rows of that key's cell — the classic CMS upper bound
    * (never under-estimates; over-estimates by collision mass only). */
  def estimate(sketch: DataFrame, candidates: DataFrame, keyCol: String,
               depth: Int, width: Int): DataFrame = {
    val as = multipliers(depth)
    val k = candidates.select(col(keyCol)).distinct()
    val probes = as.zipWithIndex.map { case (a, s) =>
      k.select(col(keyCol), lit(s).cast("long").as("row"),
        pos(col(keyCol).cast("long"), a, width).as("pos"))
    }.reduce(_ unionByName _)
    probes.join(sketch, Seq("row", "pos"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  // -------------------------------------------------------- HyperLogLog

  /** Engine-exact HyperLogLog registers (Flajolet et al. 2007): the
    * registers — not just a tolerance bound like `q_approx_distinct`'s —
    * replay bit-identically in SQL. The hash is the repo's md5-fraction
    * idiom (15 hex digits = 60 uniform bits; the CMS-style polynomial is
    * fine for bucket INDICES but its high bits are lattice-structured,
    * which biases leading-zero statistics — measured +40% on dense keys):
    * bucket = h mod 2ᵖ, w = the next 32 hash bits, register = max over the
    * bucket of rho(w) = 33 − bitlength(w). `(bucket, rho)` rows are the
    * sketch: MERGEABLE by `groupBy(bucket).max(rho)` across shards /
    * batches / days — the 100 TB count-distinct shape (union = max-merge,
    * never a re-scan). Bitlength is a PROGRESSIVE bit-smear (each shift
    * applies to the accumulated value) + popcount — pure integer ops,
    * identical in DuckDB.
    */
  def hllSketch(df: DataFrame, keyCol: String, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"HLL precision $p outside [4,16]")
    val m = (1L << p).toString
    val h = conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    df.select(h.as("h"))
      .select(expr(s"h % $m").as("bucket"),
        expr(s"(h div $m) % 4294967296").as("w"))
      .withColumn("s", expr("w | shiftright(w, 1)"))
      .withColumn("s", expr("s | shiftright(s, 2)"))
      .withColumn("s", expr("s | shiftright(s, 4)"))
      .withColumn("s", expr("s | shiftright(s, 8)"))
      .withColumn("s", expr("s | shiftright(s, 16)"))
      .select(col("bucket"), (lit(33) - bit_count(col("s"))).as("rho"))
      .groupBy("bucket").agg(max(col("rho")).as("rho"))
  }

  /** The HLL cardinality estimate from a register table: exact-integer
    * register sum (Σ 2^(33−rho) over a common 2³³ denominator — never
    * overflows: ≤ 2⁴⁸ at p=16), ONE double division, the standard bias
    * correction alpha and the small-range linear-counting branch. The only
    * cross-libm float ops are that division and the linear-counting `ln`,
    * both absorbed by the 1e-6 rounding grid.
    */
  def hllEstimate(sketch: DataFrame, p: Int): DataFrame = {
    val m = 1L << p
    val alpha =
      if (p == 4) 0.673 else if (p == 5) 0.697 else if (p == 6) 0.709
      else 0.7213 / (1.0 + 1.079 / m)
    sketch
      .agg(coalesce(sum(expr("shiftleft(cast(1 as bigint), 33 - rho)")),
        lit(0L)).as("s"), count(lit(1)).as("nz"))
      // empty sketch: s=0, nz=0 → raw = alpha·m ≤ 2.5m and v=m → linear
      // counting m·ln(1) = 0, the right answer for an empty input
      .select(col("s"), col("nz"), (lit(m) - col("nz")).as("v"),
        (lit(alpha * m.toDouble * m) * lit(8589934592.0) /* 2^33 */ /
          (col("s") + (lit(m) - col("nz")) * lit(8589934592L))).as("raw"))
      .select(
        Nums.round6(when(col("v") > 0 && col("raw") <= lit(2.5 * m),
          lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
          .otherwise(col("raw"))).as("estimate"),
        col("nz").as("registers_used"))
  }
}
