package graft

import graft.ops.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the plain equi-join rows on a skewed key") {
    val facts = (Seq.fill(500)(("hot", 1)) ++ Seq(("a", 2), ("b", 3), ("nodim", 9)))
      .toDF("k", "v")
    val dims = Seq(("hot", "H"), ("a", "A"), ("b", "B"), ("unused", "U"))
      .toDF("k", "name")
    def summarize(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("s"))
        .orderBy("k").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val plain = summarize(facts.join(dims, Seq("k")))
    val salted = summarize(SkewJoin.saltedJoin(facts, dims, Seq("k"), salts = 4))
    assert(salted == plain, s"\nsalted: $salted\nplain:  $plain")
    assert(plain.exists(_._1 == "hot") && !plain.exists(_._1 == "nodim"))
  }

  test("the hot key actually spreads across salts") {
    val facts = spark.range(1000).select(lit("hot").as("k"), col("id").as("v"))
    val salted = facts.withColumn("__salt",
      pmod(hash(col("k"), col("v")), lit(8)))
    val n = salted.select("__salt").distinct().count()
    assert(n > 4, s"expected the hot key to hit most of 8 salts, got $n")
  }
}
