package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off sizing + standalone reading of the SUSTAINED-throughput canary
  * (r17): a fixed all-core md5 kernel long enough (~2 s clean) to sense
  * host turbo/bandwidth budgets the 0.5 s short canary misses — the r17
  * finding was a ~35 % sustained-throughput degradation across rounds
  * with IDENTICAL short-canary readings. Prints three timed runs of the
  * exact kernel `Bench.canarySus` times, after one untimed JIT warm.
  */
object SusCanaryProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rows = args.headOption.map(_.toLong).getOrElse(60000000L)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def kernel(): Double = {
      val t0 = System.nanoTime()
      spark.range(rows)
        .selectExpr("sum(length(md5(cast(id as string))))").collect()
      (System.nanoTime() - t0) / 1e9
    }
    kernel() // untimed JIT warm
    (1 to 3).foreach(i => println(f"[suscanary] rows=$rows run $i: ${kernel()}%.2f s"))
    spark.stop()
  }
}
