package graft

import graft.ops.{Bloom, Chunking, Warehouse}
import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- chunking

  test("chunkDocuments: window/stride layout, clipped tail, verbatim text") {
    val df = Seq((1L, "a b c d e f g h i j")).toDF("id", "text")
    val rows = Chunking.chunkDocuments(df, "id", "text", window = 4, stride = 3)
      .orderBy("chunk_id").collect()
    // starts 0,3,6,9 over 10 tokens
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(rows.map(_.getLong(2)).toSeq == Seq(4L, 4L, 4L, 1L))
    assert(rows.map(_.getString(3)).toSeq ==
      Seq("a b c d", "d e f g", "g h i j", "j"))
  }

  test("chunkDocuments: every token covered; empty/whitespace docs vanish") {
    val df = Seq((1L, "x y z"), (2L, ""), (3L, "   ")).toDF("id", "text")
    val out = Chunking.chunkDocuments(df, "id", "text", window = 2, stride = 2)
    assert(out.select("id").distinct().collect().map(_.getLong(0)).toSeq == Seq(1L))
    val joined = out.orderBy("chunk_id").collect().map(_.getString(3)).mkString(" ")
    assert(joined == "x y z")
  }

  test("chunkDocuments rejects non-positive window/stride") {
    val df = Seq((1L, "a")).toDF("id", "text")
    intercept[IllegalArgumentException](
      Chunking.chunkDocuments(df, "id", "text", 0, 1))
    intercept[IllegalArgumentException](
      Chunking.chunkDocuments(df, "id", "text", 1, 0))
  }

  // ----------------------------------------------------------------- scd2

  private val hist = Seq(
    // key, attr, ts, tie
    (1L, "bronze", 10L, 1L),
    (1L, "bronze", 20L, 2L), // same value → collapses into run 1
    (1L, "silver", 30L, 3L),
    (1L, "gold", 40L, 4L),
    (2L, "bronze", 15L, 5L)
  ).toDF("k", "a", "ts", "tie")

  test("scd2 collapses runs into validity intervals with one current row") {
    val out = Warehouse.scd2(hist, "k", "a", "ts", "tie")
      .orderBy("k", "version").collect()
    assert(out.length == 4)
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getString(1)).toSeq == Seq("bronze", "silver", "gold"))
    assert(k1.map(_.getLong(2)).toSeq == Seq(10L, 30L, 40L)) // valid_from
    assert(k1.map(r => if (r.isNullAt(3)) -1L else r.getLong(3)).toSeq ==
      Seq(30L, 40L, -1L)) // valid_to chains, open-ended current
    assert(k1.map(_.getBoolean(5)).toSeq == Seq(false, false, true))
    assert(out.filter(_.getBoolean(5)).length == 2) // one current per key
  }

  test("scd2 treats null attrs as values: a→null is a change, nulls collapse") {
    val rows = Seq(
      (1L, Some("a"), 10L, 1L),
      (1L, None, 20L, 2L), // change to null
      (1L, None, 30L, 3L), // same (null) → collapses
      (1L, Some("b"), 40L, 4L)
    ).toDF("k", "a", "ts", "tie")
    val out = Warehouse.scd2(rows, "k", "a", "ts", "tie")
      .orderBy("version").collect()
    assert(out.length == 3, s"expected a→null→b, got ${out.length} versions")
    assert(out.map(r => Option(r.getString(1))).toSeq ==
      Seq(Some("a"), None, Some("b")))
    assert(out.map(_.getLong(2)).toSeq == Seq(10L, 20L, 40L)) // valid_from
    assert(out.filter(_.getBoolean(5)).map(_.getString(1)).toSeq == Seq("b"))
  }

  test("scd2 orders equal timestamps by the tiebreaker deterministically") {
    val tie = Seq((1L, "x", 10L, 2L), (1L, "y", 10L, 1L)).toDF("k", "a", "ts", "tie")
    val out = Warehouse.scd2(tie, "k", "a", "ts", "tie").orderBy("version").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("y", "x"))
  }

  // ---------------------------------------------------------------- merge

  test("mergeLatest: update wins, insert lands, untouched rows survive") {
    val base = Seq((1L, "a", 0L), (2L, "b", 0L)).toDF("k", "v", "ver")
    val upd = Seq((2L, "b2", 1L), (3L, "c", 1L)).toDF("k", "v", "ver")
    val out = Warehouse.mergeLatest(base, upd, Seq("k"), "ver")
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b2"), (3L, "c")))
  }

  test("mergeLatest: at equal versions the update beats the base row") {
    val base = Seq((1L, "old", 5L)).toDF("k", "v", "ver")
    val upd = Seq((1L, "new", 5L)).toDF("k", "v", "ver")
    val out = Warehouse.mergeLatest(base, upd, Seq("k"), "ver").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("new"))
  }

  test("applyCdc: delete removes, upsert applies, later version wins over delete") {
    val base = Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 0L)).toDF("k", "v", "ver")
    val chg = Seq(
      (2L, "b2", 1L, "U"),  // plain update
      (3L, "c", 1L, "D"),   // delete key 3
      (4L, "d", 1L, "U"),   // insert
      (5L, "x", 9L, "D"),   // delete of a key that never existed: no-op
      (1L, "a", 1L, "D"),   // delete key 1...
      (1L, "a2", 2L, "U")   // ...then re-insert at a HIGHER version: survives
    ).toDF("k", "v", "ver", "op")
    val out = Warehouse.applyCdc(base, chg, Seq("k"), "ver")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "a2"), (2L, "b2"), (4L, "d")), s"got $out")
  }

  test("applyCdc rejects a changes table without the op column") {
    val base = Seq((1L, "a", 0L)).toDF("k", "v", "ver")
    intercept[IllegalArgumentException](
      Warehouse.applyCdc(base, base, Seq("k"), "ver"))
  }

  test("mergeLatest rejects mismatched schemas and empty keys") {
    val base = Seq((1L, "a", 0L)).toDF("k", "v", "ver")
    val bad = Seq((1L, 0L)).toDF("k", "ver")
    intercept[IllegalArgumentException](
      Warehouse.mergeLatest(base, bad, Seq("k"), "ver"))
    intercept[IllegalArgumentException](
      Warehouse.mergeLatest(base, base, Seq.empty, "ver"))
  }

  test("mergeAggregates: base + delta partials equal the full aggregate") {
    val facts = (1L to 100L).map(i => (i % 7, i)).toDF("k", "v")
    def partial(f: org.apache.spark.sql.DataFrame) =
      f.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val merged = Warehouse.mergeAggregates(
      partial(facts.filter(col("v") <= 60)),
      partial(facts.filter(col("v") > 60)),
      Seq("k"), Seq("n", "s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = partial(facts)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == full)
  }

  test("reconcile tags one-sided keys and ignores the intersection") {
    val a = Seq(1L, 2L, 3L).toDF("k")
    val b = Seq(2L, 3L, 4L, 4L).toDF("k") // dup key must not double-report
    val out = Warehouse.reconcile(a, b, "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "a_only"), (4L, "b_only")))
  }

  // ---------------------------------------------------------------- bloom

  test("bloom: no false negatives ever; filter + exact join = semi join") {
    val dim = (1L to 50L).filter(_ % 3 == 0).toDF("dk")
    val fact = (1L to 200L).toDF("fk")
    val bits = Bloom.build(dim, "dk", m = 256, k = 3)
    val members = fact.filter(col("fk") % 3 === 0 && col("fk") <= 50)
    assert(members.filter(!Bloom.mightContain(bits, col("fk"))).count() == 0)
    val out = Bloom.semiJoinPrefiltered(fact, "fk", dim, "dk", m = 256, k = 3)
      .orderBy("fk").collect().map(_.getLong(0))
    assert(out.toSeq == (3L to 50L by 3L).toSeq)
  }

  test("antiJoinPrefiltered = exact anti join (bloom-negatives skip the join)") {
    val seen = (1L to 100L).filter(_ % 2 == 0).toDF("sk")
    val batch = (50L to 150L).toDF("bk")
    val out = Bloom.antiJoinPrefiltered(batch, "bk", seen, "sk",
      m = 512, k = 3).collect().map(_.getLong(0)).sorted.toSeq
    // expected: odds in 50..100 plus everything above 100
    val expected = ((50L to 100L).filter(_ % 2 == 1) ++ (101L to 150L)).sorted
    assert(out == expected, s"got $out")
  }

  test("bloom probe prunes most non-members at sane sizing") {
    val dim = (1L to 100L).toDF("dk")
    val bits = Bloom.build(dim, "dk", m = 1 << 12, k = 3)
    val nonMembers = (1000L to 2999L).toDF("fk")
    val fp = nonMembers.filter(Bloom.mightContain(bits, col("fk"))).count()
    assert(fp < 100, s"false-positive count $fp out of 2000 is too high")
  }
}
