package graft

import graft.ops.Sessionize

/** Earliest-anchor funnel semantics on hand-built event streams. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long)], window: Long = 100L) =
    Sessionize.funnel(rows.toDF("user_id", "event_type", "ts"),
      "user_id", "event_type", "ts", Seq("view", "click", "buy"), window)
      .collect()(0)

  test("complete funnel counts every stage; order and window enforced") {
    val r = run(Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "buy", 30L),   // completes
      (2L, "view", 10L), (2L, "click", 40L),                     // stops at click
      (3L, "click", 5L), (3L, "view", 10L),                      // click BEFORE view: no step 2
      (4L, "view", 10L), (4L, "click", 20L), (4L, "buy", 200L),  // buy outside window
      (5L, "buy", 10L)                                           // never entered
    ))
    // n1: users 1-4 viewed; n2: users 1, 2, 4 clicked after viewing;
    // n3: only user 1 bought inside the window
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 3L, 1L)))
  }

  test("anchor is the FIRST step-1 event (greedy semantics, documented)") {
    // first view at t=0 anchors; click at 50 and buy at 90 fit the window
    // measured from t=0, not from the second view at t=60
    val r = run(Seq((1L, "view", 0L), (1L, "view", 60L),
      (1L, "click", 50L), (1L, "buy", 90L)))
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 1L, 1L)))
    // but a click that only follows the SECOND view is still counted iff
    // it is after t1 and inside the window — greedy means anchor fixed,
    // not that later step-1 events consume events
    val r2 = run(Seq((2L, "view", 0L), (2L, "view", 60L), (2L, "click", 70L)))
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2)) == ((1L, 1L, 0L)))
  }

  test("same-timestamp events do not satisfy the strictly-after rule") {
    val r = run(Seq((1L, "view", 10L), (1L, "click", 10L)))
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 0L, 0L)))
  }

  test("transitions: per-user adjacency, ppm rows sum to ~1e6 per from-state") {
    val events = Seq(
      (1L, "a", 1L, 1L), (1L, "b", 2L, 2L), (1L, "a", 3L, 3L), (1L, "c", 4L, 4L),
      (2L, "a", 1L, 5L), (2L, "b", 2L, 6L),
      (3L, "b", 1L, 7L) // single event: no pair
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = Sessionize.transitions(events, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // a→b twice (u1, u2), b→a once, a→c once
    assert(out(("a", "b")) == ((2L, 666666L)))
    assert(out(("a", "c")) == ((1L, 333333L)))
    assert(out(("b", "a")) == ((1L, 1000000L)))
    assert(out.size == 3)
    // pairs never cross users: user 2's trailing 'b' and user 3's 'b' pair nothing
  }

  test("modeByKey: most frequent value per key, ties to the smallest value") {
    val events = Seq(
      (1L, "b"), (1L, "b"), (1L, "a"),          // clear winner b
      (2L, "z"), (2L, "a"),                     // tie → a (smallest)
      (3L, "x")                                 // singleton
    ).toDF("user_id", "event_type")
    val out = Sessionize.modeByKey(events, "user_id", "event_type")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out == Map(1L -> (("b", 2L)), 2L -> (("a", 1L)), 3L -> (("x", 1L))))
  }

  test("retention: cohort by first activity, distinct users per offset") {
    // period 10: u1 first in period 0, active 0 and 2; u2 first in 0,
    // active 0 only (two events, one period); u3 first in 1, active 1 and 2
    val events = Seq(
      (1L, 5L), (1L, 25L),
      (2L, 7L), (2L, 8L),
      (3L, 12L), (3L, 27L)
    ).toDF("user_id", "ts")
    val out = Sessionize.retention(events, "user_id", "ts", periodUs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((0L, 0L) -> 2L, (0L, 2L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }
}
