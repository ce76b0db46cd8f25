package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for large-scale training-data pipelines (extension
  * mandate, SURVEY §2.3). Designed scale-first:
  *
  *  - exact dedup is a single hash-aggregate (map-side partial combine does
  *    the heavy lifting; the shuffle carries one row per distinct key);
  *  - near-dup goes through MinHash+LSH banding so candidate generation is a
  *    *band-bucket equi-join*, never an O(n²) cross join — the only all-pairs
  *    work happens inside buckets, whose size LSH keeps small;
  *  - all hashing is md5-based and engine-portable, so every stage is
  *    verifiable against a DuckDB oracle running the same logical SQL.
  */
object Dedup {

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** k-token shingles, space-joined. Documents shorter than k tokens yield
    * their single full-token shingle (slice is clamped), matching the usual
    * MinHash convention of never producing an empty set.
    */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    when(size(toks) <= k, array(array_join(toks, " ")))
      .otherwise(transform(
        sequence(lit(1), size(toks) - lit(k - 1)),
        i => array_join(slice(toks, i, lit(k)), " ")))
  }

  /** MinHash signature: H independent permutations simulated by salted md5;
    * h_j = min over shingles of md5(j || ':' || shingle). String-min over hex
    * md5 is deterministic, uniform enough for LSH, and identical in DuckDB.
    * Map-only: no shuffle, fuses into the scan.
    */
  def minhashSignature(text: Column, numHashes: Int, shingleSize: Int): Column = {
    val sh = shingles(text, shingleSize)
    array((0 until numHashes).map { j =>
      array_min(transform(sh, s => md5(concat(lit(s"$j:"), s))))
    }: _*)
  }

  /** LSH band keys: split the signature into `bands` bands of H/bands rows;
    * band key = md5 of the concatenated band slice. Two docs collide on a
    * band iff that band of their signatures is identical.
    */
  def lshBands(signature: Column, numHashes: Int, bands: Int): Column = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    array((0 until bands).map { b =>
      md5(concat(lit(s"$b:"), array_join(slice(signature, b * rows + 1, rows), "|")))
    }: _*)
  }

  /** Candidate near-duplicate pairs via MinHash LSH.
    * Plan shape: map (signature) → explode bands → *self equi-join* on the
    * (band, bucket-key) pair with `id_a < id_b` → distinct. The shuffle key is
    * the md5 band key (uniform space — no planned skew), and a degenerate
    * bucket (e.g. millions of empty/boilerplate docs sharing a signature)
    * stays a join-skew problem AQE splits across tasks — never an unbounded
    * `collect_set` array on one executor.
    */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                            numHashes: Int = 16, bands: Int = 4,
                            shingleSize: Int = 5): DataFrame = {
    val sig = minhashSignature(col(textCol), numHashes, shingleSize)
    val banded = df
      .select(col(idCol).as("id"), lshBands(sig, numHashes, bands).as("bands"))
      .select(col("id"), posexplode(col("bands")).as(Seq("band", "bkey")))
    banded.select(col("band"), col("bkey"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("bkey"), col("id").as("id_b")),
        Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Candidate pairs + exact shingle-set Jaccard, filtered at `threshold`.
    * The verify join re-reads only candidate ids — two hash joins against the
    * (id, shingle-set) projection, not the full corpus.
    */
  def minhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                            threshold: Double, numHashes: Int = 16,
                            bands: Int = 4, shingleSize: Int = 5): DataFrame = {
    val pairs = minhashCandidatePairs(df, idCol, textCol, numHashes, bands, shingleSize)
    val sets = df.select(col(idCol).as("id"),
      array_distinct(shingles(col(textCol), shingleSize)).as("sh"))
    pairs
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), Nums.round6(col("jaccard")).as("jaccard"))
  }

  /** SimHash fingerprint as a `bits`-char '0'/'1' string. Per token, bit j
    * votes +1 if the (j+1)-th hex digit of md5(token) has its high bit set
    * (8-f), else -1; fingerprint bit = majority sign. A pure array fold —
    * map-only, no shuffle — and md5-portable to the DuckDB oracle.
    * `bits` <= 32 (md5 has 32 hex digits).
    */
  def simhash(text: Column, bits: Int = 16): Column = {
    require(bits <= 32)
    val toks = tokens(text)
    val votes = aggregate(
      toks,
      array_repeat(lit(0), bits),
      (acc, t) => {
        val h = md5(t)
        zip_with(acc, transform(sequence(lit(1), lit(bits)), j =>
          when(substring(h, 1, 32).substr(j, lit(1)).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1)
            .otherwise(-1)),
          (a, b) => a + b)
      })
    array_join(transform(votes, v => when(v > 0, "1").otherwise("0")), "")
  }

  /** Hamming distance between two equal-length bit strings. */
  def hammingDistance(a: Column, b: Column): Column =
    size(filter(sequence(lit(1), length(a)),
      i => a.substr(i, lit(1)) =!= b.substr(i, lit(1))))

  /** SimHash near-dup pairs — EXACT under pigeonhole multi-blocking: the
    * fingerprint is cut into `maxDistance + 1` segments; two fingerprints
    * within Hamming distance `maxDistance` must agree on at least one whole
    * segment, so the union of per-segment equi-joins has perfect recall (no
    * prefix-only recall gap, and no O(n²/2^prefix) disguised cross join).
    * Plan: explode segments (maxDistance+1 rows/doc) → self equi-join on
    * (segment-index, segment-value) → distinct pairs → exact Hamming filter.
    * Segment values carry ~bits/(d+1) bits of entropy each, so bucket sizes
    * stay ~n/2^(bits/(d+1)); residual hot buckets are AQE skew-join work,
    * never a single-task array.
    */
  def simhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                            bits: Int = 16, maxDistance: Int = 3): DataFrame = {
    val nSeg = maxDistance + 1
    val segLen = math.ceil(bits.toDouble / nSeg).toInt
    val withSig = df.select(col(idCol).as("id"), simhash(col(textCol), bits).as("sig"))
    val segmented = withSig.select(col("id"), col("sig"),
      posexplode(array((0 until nSeg).map(s =>
        substring(col("sig"), s * segLen + 1, segLen)): _*)).as(Seq("seg", "segval")))
    val candidates = segmented
      .select(col("seg"), col("segval"), col("id").as("id_a"), col("sig").as("sig_a"))
      .join(segmented.select(col("seg"), col("segval"),
        col("id").as("id_b"), col("sig").as("sig_b")), Seq("seg", "segval"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b")
      .distinct()
    candidates
      .withColumn("distance", hammingDistance(col("sig_a"), col("sig_b")))
      .filter(col("distance") <= maxDistance)
      .select("id_a", "id_b", "distance")
  }

  /** Exact dedup: canonical representative (min id) per duplicate group.
    * One hash aggregate; partial map-side combine means the shuffle moves one
    * row per distinct key, not per input row.
    */
  def exactDuplicateGroups(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact dedup keeping the min-id row per key — deterministic, unlike
    * dropDuplicates (which keeps an arbitrary row). Window + filter:
    * one shuffle on the key, streaming rank within partitions.
    */
  def dedupKeepFirst(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** N-gram (token shingle) Jaccard similarity for explicit pairs of rows —
    * the exact-verify primitive behind `minhashNearDuplicates`, exposed
    * standalone for pair-scoring use.
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   pairs: DataFrame, n: Int = 3): DataFrame = {
    val sets = df.select(col(idCol).as("id"), array_distinct(shingles(col(textCol), n)).as("sh"))
    pairs
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        Nums.round6(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
  }
}
