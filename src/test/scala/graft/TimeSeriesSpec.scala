package graft

import graft.ops.{Profile, TimeSeries}

/** Gap-fill semantics on hand-built series + the correlation matrix. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("gapFill: grid spans first..last, forward-fills, flags observed") {
    // period 10: key 1 observes periods 0 and 3 (gap at 1, 2); the
    // period-0 winner is the LATER event (ts 7 beats ts 2)
    val events = Seq(
      (1L, 2L, 5.0), (1L, 7L, 6.0), (1L, 35L, 9.0),
      (2L, 11L, 1.0)
    ).toDF("k", "ts", "v")
    val out = TimeSeries.gapFill(events, "k", "ts", "v", periodUs = 10L)
      .orderBy("key", "per").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, 6.0, true),  // later observation wins the period
      (1L, 1L, 6.0, false), // filled
      (1L, 2L, 6.0, false), // filled
      (1L, 3L, 9.0, true),
      (2L, 1L, 1.0, true)   // single-period key: grid of one
    ))
  }

  test("gapFill: same-ts tie within a period breaks to the larger value") {
    val out = TimeSeries.gapFill(
      Seq((1L, 5L, 2.0), (1L, 5L, 8.0)).toDF("k", "ts", "v"),
      "k", "ts", "v", periodUs = 10L).collect()
    assert(out.length == 1 && out(0).getDouble(2) == 8.0)
  }

  test("corrMatrix: perfect correlation 1, anti-correlation -1, all pairs") {
    val df = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0))
      .toDF("a", "b", "c")
    val out = Profile.corrMatrix(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out.size == 3)
    assert(out(("a", "b")) == 1.0 && out(("a", "c")) == -1.0 &&
      out(("b", "c")) == -1.0)
  }
}
