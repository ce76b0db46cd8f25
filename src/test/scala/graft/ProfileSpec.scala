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
}
