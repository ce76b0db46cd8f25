package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRankInt: hand-computed fixed-point ranks on a 3-vertex graph") {
    // 1→2, 1→3, 2→3; scale 1e6, damping 85/100, base = 150000
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    // iter 1: r(1)=150000; r(2)=150000+floor(1e6*85/200)=575000;
    //         r(3)=150000+425000+floor(1e6*85/100)=1425000
    // iter 2: r(2)=150000+floor(150000*85/200)=213750;
    //         r(3)=150000+63750+floor(575000*85/100)=702500
    val r = Graph.pageRankInt(edges, iters = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 150000L, 2L -> 213750L, 3L -> 702500L), s"got $r")
    // multi-edges collapse before degree counting
    val dup = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val rd = Graph.pageRankInt(dup, iters = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(rd == r, s"multi-edge dedup broken: $rd vs $r")
  }

  test("triangleCount: K4 has 4 triangles; orientation/duplicates don't matter") {
    // complete graph on 4 vertices = C(4,3) = 4 triangles
    val k4 = (for {
      a <- 1L to 4L; b <- 1L to 4L if a != b
    } yield (a, b)).toDF("src", "dst") // both directions + no self-loops
    assert(Graph.triangleCount(k4).collect()(0).getLong(0) == 4L)
    // a 4-cycle has none; adding one chord makes exactly one
    val c4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    assert(Graph.triangleCount(c4).collect()(0).getLong(0) == 0L)
    val chord = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      ++ Seq((3L, 1L), (1L, 1L))).toDF("src", "dst") // + reverse dup + loop
    assert(Graph.triangleCount(chord).collect()(0).getLong(0) == 2L)
  }

  test("triangleCount: skewed star + clique counts only the clique") {
    // hub 0 connects to 50 leaves (no leaf-leaf edges) → star has no
    // triangles; a disjoint K5 contributes C(5,3) = 10
    val star = (1L to 50L).map(i => (0L, i))
    val k5 = for { a <- 100L to 104L; b <- 100L to 104L if a < b } yield (a, b)
    val n = Graph.triangleCount((star ++ k5).toDF("src", "dst"))
      .collect()(0).getLong(0)
    assert(n == 10L, s"expected 10 triangles, got $n")
  }

  test("pageRankInt: rank mass flows toward sink vertices") {
    val edges = (1L to 20L).map(i => (i, 100L)).toDF("src", "dst")
    val r = Graph.pageRankInt(edges, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(100L) > r(1L) * 10, s"sink should dominate: $r")
    assert((1L to 20L).forall(i => r(i) == r(1L)), "symmetric sources rank equally")
  }
}
