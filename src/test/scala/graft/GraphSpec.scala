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

  test("pageRankInt: rank mass flows toward sink vertices") {
    val edges = (1L to 20L).map(i => (i, 100L)).toDF("src", "dst")
    val r = Graph.pageRankInt(edges, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(100L) > r(1L) * 10, s"sink should dominate: $r")
    assert((1L to 20L).forall(i => r(i) == r(1L)), "symmetric sources rank equally")
  }
}
