package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: print the formatted plan of ONE named query over
  * `SPARK_GRAFT_SF_DIR` (Plans.scala dumps the fixed headline list over a
  * given dir; this dumps exactly one query — for plan work at rehearsal
  * scales where constructing every headline query is too heavy).
  * Optional second arg "run" also executes `.count()` and prints the
  * AQE-final plan — the one the executors actually ran.
  */
object ProbeExplain {
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
    val name = args(0)
    val df = graft.Queries.queries(name)(spark, sfDir)
    println(s"=== $name initial plan ===")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    if (args.length > 1 && args(1) == "run") {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"=== $name ran: rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s ===")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
