package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: exchange count of ONE pageRankInt iteration — proves the
  * loop-invariant pre-partitioning removed the per-round edge shuffle
  * (localCheckpoint preserves outputPartitioning, so hashpartitioning(src)
  * on `edged` must satisfy the contribution join's requirement with NO
  * Exchange above the checkpointed scan).
  */
object ProbePageRank {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val edges = events.selectExpr("user_id AS src", "(user_id % 97) AS dst")
    // replicate pageRankInt's setup verbatim
    val e = edges.select(col("src"), col("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("od"))
    val edged = e.join(deg, "src").repartition(col("src")).localCheckpoint()
    val verts = edged.select(col("src").as("id"))
      .union(edged.select(col("dst").as("id")))
      .distinct()
      .repartition(col("id"))
      .localCheckpoint()
    val ranks = verts.withColumn("rank", lit(1000000L))
    val contribs = edged.join(ranks, edged("src") === ranks("id"))
      .select(edged("dst").as("id"),
        expr("CAST((rank * 85) DIV (100 * od) AS BIGINT)").as("c"))
      .groupBy("id").agg(sum("c").as("c"))
    val next = verts.join(contribs, Seq("id"), "left")
      .select(col("id"), (lit(150000L) + coalesce(col("c"), lit(0L))).as("rank"))
    val plan = next.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    println(s"[probe] one-iteration exchanges: $exchanges")
    println(plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    spark.stop()
  }
}
