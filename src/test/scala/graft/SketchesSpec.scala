package graft

import graft.ops.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("CMS never underestimates; exact when width dwarfs the key set") {
    // 3 keys with known frequencies, width 1024 → no collisions in practice
    val rows = (Seq.fill(50)(1L) ++ Seq.fill(30)(2L) ++ Seq.fill(5)(3L))
      .toDF("k")
    val sk = Sketches.countMin(rows, "k", depth = 3, width = 1024)
    val est = Sketches.estimate(sk, rows, "k", depth = 3, width = 1024)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est == Map(1L -> 50L, 2L -> 30L, 3L -> 5L), s"got $est")
  }

  test("CMS estimates upper-bound exact counts under forced collisions") {
    // width 4 forces heavy collisions among 64 keys; the CMS guarantee
    // (est >= exact, always) must still hold for every key
    val rows = (1L to 64L).flatMap(k => Seq.fill((k % 7 + 1).toInt)(k)).toDF("k")
    val exact = rows.groupBy("k").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sk = Sketches.countMin(rows, "k", depth = 3, width = 4)
    val est = Sketches.estimate(sk, rows, "k", depth = 3, width = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"CMS underestimated key $k: ${est(k)} < $c")
    }
  }

  test("CMS sketch size is bounded by depth x width regardless of input") {
    val rows = (1L to 10000L).toDF("k")
    val cells = Sketches.countMin(rows, "k", depth = 3, width = 64).count()
    assert(cells <= 3L * 64L, s"sketch must stay bounded, got $cells cells")
  }

  test("CMS is safe across the full Long key domain (no product overflow)") {
    // Keys straddling the old silent-wrap boundary (~3.47e9, where
    // key * multiplier exceeded Long.MaxValue before the mod-2^31 fold),
    // plus Long extremes and negatives: the guarantee (est >= exact, and
    // exact here since width dwarfs the key count) must hold everywhere.
    val keys = Seq(3470000000L, 4294967295L, 4294967296L, 1L << 40,
      Long.MaxValue, Long.MinValue, -17L, 0L)
    val rows = keys.flatMap(k => Seq.fill(3)(k)).toDF("k")
    val sk = Sketches.countMin(rows, "k", depth = 3, width = 4096)
    val est = Sketches.estimate(sk, rows, "k", depth = 3, width = 4096)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    keys.foreach { k =>
      assert(est(k) >= 3L, s"CMS underestimated key $k: ${est(k)}")
    }
  }

  test("weighted CMS sums weights, not rows") {
    val rows = Seq((1L, 10L), (1L, 5L), (2L, 7L)).toDF("k", "w")
    val sk = Sketches.countMin(rows, "k", depth = 3, width = 1024,
      weightCol = Some("w"))
    val est = Sketches.estimate(sk, rows, "k", depth = 3, width = 1024)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est == Map(1L -> 15L, 2L -> 7L), s"got $est")
  }

  test("HLL estimate lands within 10% on a 20k-key set (p=10)") {
    val keys = (1L to 20000L).toDF("k")
    val sk = Sketches.hllSketch(keys, "k", p = 10)
    val est = Sketches.hllEstimate(sk, p = 10).collect()(0).getDouble(0)
    assert(math.abs(est - 20000.0) / 20000.0 <= 0.10, s"estimate $est")
  }

  test("HLL small-range: linear counting kicks in and is near-exact") {
    val keys = (1L to 50L).toDF("k")
    val est = Sketches.hllEstimate(Sketches.hllSketch(keys, "k", p = 10), p = 10)
      .collect()(0).getDouble(0)
    assert(math.abs(est - 50.0) <= 5.0, s"estimate $est")
  }

  test("HLL of an empty input estimates 0, not NULL") {
    val none = spark.emptyDataFrame.selectExpr("cast(1 as bigint) as k").limit(0)
    val r = Sketches.hllEstimate(Sketches.hllSketch(none, "k", p = 10), p = 10)
      .collect()(0)
    assert(!r.isNullAt(0) && r.getDouble(0) == 0.0 && r.getLong(1) == 0L)
  }

  test("HLL registers are mergeable: sketch(A ∪ B) == max-merge of shards") {
    val a = (1L to 5000L).toDF("k")
    val b = (3000L to 9000L).toDF("k") // overlapping
    val whole = Sketches.hllSketch(a.union(b), "k", p = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val merged = Sketches.hllSketch(a, "k", p = 8)
      .union(Sketches.hllSketch(b, "k", p = 8))
      .groupBy("bucket").agg(max(col("rho")).as("rho"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(whole == merged)
  }
}
