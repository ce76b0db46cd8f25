package graft

import graft.ops.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private val names = Seq(
    (1L, "smith"), (2L, "smyth"), // dist 1
    (3L, "smithe"), // dist 1 of smith (insert), 2 of smyth
    (4L, "jones"), // unrelated, same length as smith
    (5L, "jo"), // far shorter — different band, never a candidate
    (6L, "smith") // exact dup of 1
  ).toDF("id", "name")

  test("selfJoin finds exactly the pairs within maxDist, across bands") {
    val out = FuzzyJoin.selfJoin(names, "id", "name", maxDist = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(out == Map((1L, 2L) -> 1, (1L, 3L) -> 1, (1L, 6L) -> 0,
      (2L, 6L) -> 1, (3L, 6L) -> 1), s"got $out")
  }

  test("selfJoin equals the naive all-pairs answer (blocking is complete)") {
    for (d <- 1 to 3) {
      val blocked = FuzzyJoin.selfJoin(names, "id", "name", d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val rows = names.collect().map(r => (r.getLong(0), r.getString(1)))
      val naive = (for {
        (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
        lev = levenshteinRef(sa, sb) if lev <= d
      } yield (ia, ib, lev)).toSet
      assert(blocked == naive, s"maxDist=$d: $blocked vs $naive")
    }
  }

  /** Reference DP edit distance for the completeness check. */
  private def levenshteinRef(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }
}
