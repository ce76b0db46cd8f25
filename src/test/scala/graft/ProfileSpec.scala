package graft

import graft.ops.Profile
import org.apache.spark.sql.functions.col

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some("a")), (Some(2L), None),
    (Some(2L), Some("b")), (None, Some("a"))
  ).toDF("num", "str")

  test("profile: rows, nulls, distinct, min/max per column") {
    val out = Profile.profile(df, Seq("num", "str"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(out(0) == ("num", 4L, 1L, 2L, "1", "2"))
    assert(out(1) == ("str", 4L, 1L, 2L, "a", "b"))
  }

  test("profile of an empty frame: zeros, not nulls, null min/max") {
    val out = Profile.profile(df.filter(col("num") > 100), Seq("num"))
      .collect()(0)
    assert(out.getLong(1) == 0L && out.getLong(2) == 0L && out.getLong(3) == 0L)
    assert(out.isNullAt(4) && out.isNullAt(5))
  }

  test("profile approx mode stays within HLL tolerance") {
    val big = (1L to 5000L).map(i => (i, s"v$i")).toDF("num", "str")
    val n = Profile.profile(big, Seq("num"), exact = false)
      .collect()(0).getLong(3)
    assert(math.abs(n - 5000L) < 500L, s"approx distinct $n too far from 5000")
  }

  test("equiDepthHistogram: uniform input splits into equal quarters") {
    val vals = (1 to 100).map(_.toDouble).toDF("v")
    val out = Profile.equiDepthHistogram(vals, "v", buckets = 4)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq == Seq(0, 1, 2, 3))
    assert(out.map(_._2).toSeq == Seq(25L, 25L, 25L, 25L), s"got ${out.toSeq}")
    assert(out(0)._3 == 1.0 && out(3)._4 == 100.0)
    // bin ranges tile without overlap
    out.sliding(2).foreach { case Array(a, b) => assert(a._4 < b._3) }
  }

  test("equiDepthHistogram: skewed input still balances counts by depth") {
    // heavy repetition at one value: equal-count property degrades exactly
    // where ties straddle an edge, but no bucket exceeds ties+share
    val vals = (Seq.fill(50)(7.0) ++ (1 to 50).map(_ + 100.0)).toDF("v")
    val out = Profile.equiDepthHistogram(vals, "v", buckets = 4)
      .orderBy("bucket").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(out.map(_._2).sum == 100L)
    // the tied mass lands in one bucket; remaining buckets split the rest
    assert(out.head._2 == 50L, s"tied value must stay in one bin: ${out.toSeq}")
  }
}
