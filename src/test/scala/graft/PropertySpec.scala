package graft

import graft.model.JsonSchema
import graft.ops.InferSchema
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property suites (SURVEY §5.2): inference laws over generated ragged
  * record batches, schema diff algebra, PyJson float invariants. Raw
  * ScalaCheck generators driven from a fixed seed (the scalatest-scalacheck
  * bridge is not in the offline dependency cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val fieldGen = Gen.oneOf("a", "b", "c", "d", "e")
  private val recordGen: Gen[Map[String, Int]] =
    Gen.someOf(Seq("a", "b", "c", "d", "e")).suchThat(_.nonEmpty)
      .map(keys => keys.map(k => k -> k.hashCode).toMap)

  private def toJsonStr(m: Map[String, Int]): String =
    m.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")

  test("inference: properties=union, required=intersection, order-insensitive") {
    samples(Gen.nonEmptyListOf(recordGen), 12).foreach { batch =>
      val df = batch.map(toJsonStr).toDF("data")
      val s = InferSchema.infer(df, "data").get
      val union = batch.flatMap(_.keys).toSet
      val inter = batch.map(_.keySet).reduce(_ intersect _)
      assert(s.properties.keySet == union, s"batch $batch")
      assert(s.required.toSet == inter, s"batch $batch")
      val shuffled = InferSchema.infer(
        new scala.util.Random(7).shuffle(batch).map(toJsonStr).toDF("data"), "data").get
      assert(shuffled == s, s"order-sensitivity on $batch")
    }
  }

  test("schema diff: added/removed partition the symmetric difference") {
    samples(Gen.zip(Gen.listOf(fieldGen), Gen.listOf(fieldGen)), 200).foreach {
      case (oldF, newF) =>
        val o = JsonSchema(oldF.map(_ -> "string").toMap, Nil)
        val n = JsonSchema(newF.map(_ -> "string").toMap, Nil)
        val (added, removed) = JsonSchema.diff(o, n)
        assert(added.toSet == (n.fieldNames -- o.fieldNames))
        assert(removed.toSet == (o.fieldNames -- n.fieldNames))
        assert((added.toSet & removed.toSet).isEmpty)
        assert(added == added.sorted && removed == removed.sorted)
    }
  }

  test("PyJson float repr round-trips through Java parsing") {
    samples(Gen.chooseNum(Long.MinValue, Long.MaxValue), 2000).foreach { bits =>
      val v = java.lang.Double.longBitsToDouble(bits)
      if (!v.isNaN && !v.isInfinite) {
        val repr = graft.functions.PyJson.dumps(java.lang.Double.toString(v))
        assert(java.lang.Double.parseDouble(repr) == v, s"repr $repr of $v")
      }
    }
  }

  test("minhash signature is permutation-invariant under token-preserving shuffles of shingle order") {
    // signatures depend on the shingle SET (min over multiset) — reversing a
    // doc's sentence order changes shingles, but duplicating text does not
    val texts = Seq("one two three four five six seven eight nine ten")
    val doubled = texts.map(t => t + " " + t)
    val df = (texts ++ doubled).zipWithIndex.map(_.swap).toDF("id", "text")
    val sigs = df.orderBy("id")
      .select(graft.ops.Dedup.minhashSignature(col("text"), 16, 3))
      .collect().map(_.getSeq[Long](0).toSeq)
    // doubling "abc" adds shingles spanning the seam but keeps all originals:
    // every signature element can only decrease or stay
    sigs(0).zip(sigs(1)).foreach { case (orig, dup) => assert(dup <= orig) }
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
