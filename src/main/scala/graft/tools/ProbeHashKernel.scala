package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: prices the md5 → sha2-256 switch in the content-addressed
  * collapse (r18 — md5 is chosen-prefix-broken, so hash equality is not a
  * safe stand-in for text equality on untrusted corpora). Times the bare
  * full-corpus hash kernels over SPARK_GRAFT_SF_DIR's documents so a
  * dedup-row delta can be attributed: if (sha2 − md5) here ≈ the row
  * delta, the regression is the priced security trade, not a plan change.
  */
object ProbeHashKernel {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").persist()
    println(s"[hashprobe] docs=${docs.count()}")
    def time(expr: String): Double = {
      val t0 = System.nanoTime()
      docs.selectExpr(s"sum(length($expr))").collect()
      (System.nanoTime() - t0) / 1e9
    }
    time("md5(text)") // JIT warm
    (1 to 3).foreach { i =>
      println(f"[hashprobe] run $i: md5 ${time("md5(text)")}%.2f s, " +
        f"sha2 ${time("sha2(text, 256)")}%.2f s")
    }
    docs.unpersist()
    spark.stop()
  }
}
