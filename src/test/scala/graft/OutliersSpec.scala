package graft

import graft.ops.Outliers
import org.apache.spark.sql.functions._

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  test("flagIqr flags exactly the out-of-fence values per group") {
    // group a: 1..9 plus a wild 100 → q1=3.25, q3=7.75, IQR=4.5,
    // 1.5-fence = [-3.5, 14.5] → only 100 flagged
    // group b: constant → IQR 0 → fence collapses to the value itself
    val rows = ((1 to 9).map(v => ("a", v.toDouble)) :+ ("a", 100.0)) ++
      Seq(("b", 5.0), ("b", 5.0), ("b", 5.0))
    val out = Outliers.flagIqr(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(4)))
    assert(out.count(_._3) == 1)
    assert(out.find(_._3).get._2 == 100.0)
    assert(out.filter(_._1 == "b").forall(!_._3), "constants are never outliers")
  }

  test("flagIqr keeps every input row and exposes the bounds") {
    val rows = Seq(("x", 1.0), ("x", 2.0), ("y", 3.0)).toDF("g", "v")
    val out = Outliers.flagIqr(rows, "g", "v")
    assert(out.count() == 3)
    assert(out.columns.toSeq == Seq("g", "v", "lo", "hi", "is_outlier"))
  }

  test("flagIqr keeps null-group rows and flags within the null group") {
    val rows = (Seq.fill(9)(1.0).zipWithIndex.map { case (v, i) =>
      (None: Option[String], v + i)
    } :+ (None -> 100.0)) ++ Seq(Some("x") -> 5.0)
    val df = rows.map { case (g, v) => (g.orNull, v) }.toDF("g", "v")
    val out = Outliers.flagIqr(df, "g", "v").collect()
    assert(out.length == 11, "null-group rows must survive the bounds join")
    val nullRows = out.filter(_.isNullAt(0))
    assert(nullRows.length == 10)
    assert(nullRows.count(_.getBoolean(4)) == 1, "the 100.0 must flag")
  }
}
