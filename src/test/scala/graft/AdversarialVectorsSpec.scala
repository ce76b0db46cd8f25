package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Vector-side twin of [[AdversarialCorpusSpec]]: a real embedding table
  * contains null vectors (failed encoder calls), zero vectors (padding),
  * and truncated rows (schema drift). Under ANSI one unguarded division on
  * any of them fails the distributed job; `graft_dot` clamps to the
  * shorter length and is null-safe, and every cosine has the explicit
  * zero-denominator branch — this pins those contracts end to end.
  */
class AdversarialVectorsSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private def unitish(seed: Int): Seq[Double] =
    (0 until dim).map(i => ((seed * 31 + i * 7) % 13 - 6).toDouble / 7.0)
  private val nasty = Seq[(Long, Seq[Double])](
    (1L, null),
    (2L, Seq.empty[Double]),
    (3L, Seq.fill(dim)(0.0)),          // zero vector: norm 0
    (4L, unitish(1).take(3)),          // truncated row
    (5L, unitish(2)),
    (6L, unitish(3)),
    (7L, unitish(2)))                  // exact duplicate of 5
  private def corpus = nasty.toDF("id", "vec")

  test("cosine kernel: null/empty/zero/truncated vectors score without throwing") {
    val out = corpus.crossJoin(corpus.select(col("id").as("id2"), col("vec").as("vec2")))
      .select(col("id"), col("id2"),
        Similarity.cosine(
          col("vec").cast("array<double>"),
          col("vec2").cast("array<double>")).as("sim"))
      .collect()
    assert(out.length == nasty.length * nasty.length)
    out.foreach { r =>
      val sim = r.getAs[Any]("sim")
      sim match {
        case d: java.lang.Double =>
          assert(d >= -1.0 - 1e-9 && d <= 1.0 + 1e-9, s"cosine $d out of [-1,1]")
        case null => // null vec propagates null, never a throw
        case other => fail(s"unexpected sim $other")
      }
    }
    // zero/empty vectors take the guarded branch: sim 0.0, not a throw
    val z = out.filter(r => r.getLong(0) == 3L && r.getLong(1) == 3L).head
    assert(z.getDouble(2) == 0.0)
    val e = out.filter(r => r.getLong(0) == 2L && r.getLong(1) == 5L).head
    assert(e.getDouble(2) == 0.0)
  }

  test("brute-force top-k completes over the nasty corpus and ranks the duplicate first") {
    val queries = Seq((5L, unitish(2))).toDF("qid", "qvec")
    val top = Similarity.bruteForceTopK(queries, corpus, k = 3).collect()
    assert(top.nonEmpty)
    // doc 7 is an exact copy of the query vector (doc 5 itself is excluded
    // or tied) — a perfect-similarity row must lead
    val best = top.minBy(_.getAs[Int]("rank"))
    assert(math.abs(best.getAs[Double]("sim") - 1.0) < 1e-9,
      s"expected a sim=1.0 leader, got $best")
  }

  test("embedding near-dup + survivor dedup complete with degenerate rows present") {
    val pairs = Similarity.embeddingNearDuplicates(
      corpus, threshold = 0.95, numPlanes = 4, dim = dim).collect()
    assert(pairs.exists(r => r.getLong(0) == 5L && r.getLong(1) == 7L),
      s"exact-duplicate embedding pair (5,7) not found: ${pairs.mkString(",")}")
    val ids = Similarity.embeddingDedupIds(
      corpus, threshold = 0.95, numPlanes = 4, dim = dim).collect()
    assert(ids.exists(r => r.getLong(0) == 5L && r.getLong(1) == 7L))
    spark.catalog.clearCache()
  }

  test("graft_vec_bytes: canonical image matches Catalyst grouping equality") {
    // The content-address key must equate exactly what groupBy(vec)
    // equates (NormalizeFloatingNumbers): -0.0 ≡ 0.0, every NaN bit
    // pattern ≡ the canonical NaN — while a null ELEMENT stays distinct
    // from NaN, a null VECTOR hashes to null, and different lengths never
    // collide (fixed 9-byte stride).
    val qNaN = java.lang.Double.longBitsToDouble(0x7ff8000000000001L) // non-canonical
    val rows = Seq[(Long, Seq[java.lang.Double])](
      (1L, Seq[java.lang.Double](0.0, 1.0)),
      (2L, Seq[java.lang.Double](-0.0, 1.0)),          // ≡ 1 under grouping
      (3L, Seq[java.lang.Double](Double.NaN, 2.0)),
      (4L, Seq[java.lang.Double](qNaN, 2.0)),          // ≡ 3 under grouping
      (5L, Seq[java.lang.Double](null, 2.0)),          // null elem ≠ NaN
      (6L, Seq[java.lang.Double](0.0)),                // prefix of 1, shorter
      (7L, null)                                       // null vector
    ).toDF("id", "vec")
      .withColumn("h", Similarity.vecKey(col("vec").cast("array<double>")))
    val h = rows.select("id", "h").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(h(1L) == h(2L), "-0.0 must fold to 0.0")
    assert(h(3L) == h(4L), "all NaN bit patterns must fold to one")
    assert(h(3L) != h(5L), "null element must not conflate with NaN")
    assert(h(1L) != h(6L), "different lengths must never collide")
    assert(h(7L) == null, "null vector hashes to null (never equi-matches)")
    // and the distinct-hash count equals Spark's own distinct-vec count
    val byHash = rows.filter(col("vec").isNotNull)
      .select("h").distinct().count()
    val byVec = rows.filter(col("vec").isNotNull)
      .select(col("vec").cast("array<double>")).distinct().count()
    assert(byHash == byVec,
      s"hash grouping ($byHash) diverges from Catalyst grouping ($byVec)")
  }
}
