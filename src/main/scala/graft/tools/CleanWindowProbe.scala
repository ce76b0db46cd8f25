package graft.tools

import org.apache.spark.sql.SparkSession

/** Machine-weather probe (BENCH_NOTES rounds 10-11): the bench VM has
  * multi-minute host-level slow windows invisible to guest GC/steal/iowait.
  * Before keeping a bench artifact, run this — it times one mid-weight
  * query (default q_curate; clean ≈4.4-4.8 s at sf0.1 / 32 cpus) four
  * times in a fresh JVM. Inflated or erratic numbers = wait and re-probe;
  * only then run the battery.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.tools.CleanWindowProbe [queryName]"
  */
object CleanWindowProbe {
  def main(args: Array[String]): Unit = {
    val query = args.headOption.getOrElse("q_curate")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id * 2)").collect()
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(query)(spark, sfDir).count()
      println(f"[probe] $query run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
