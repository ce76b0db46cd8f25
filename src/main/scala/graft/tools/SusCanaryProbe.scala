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
    // Standalone reading of Bench's sustained-WRITE canary kernel (r19):
    // ~770 MB of incompressible parquet per run — the host signal the CPU
    // kernels can't sense (four same-code sf10 batteries drifted 246→309 s
    // with flat CPU canaries while this workload class sagged ~2x).
    // ONE parent for all runs, deferred once after the loop — a per-call
    // createTempDirectory deferred only via its child leaked one empty
    // graft_wrc_* parent per invocation (r20 ADVICE). Scratch.writeScratchDir
    // honors SPARK_GRAFT_SCRATCH and warns on tmpfs, same as Bench.canaryWr.
    val wrParent = graft.Scratch.writeScratchDir("graft_wrc_")
    def wrKernel(i: Int): Double = {
      import scala.jdk.CollectionConverters._
      val dst = wrParent.resolve(i.toString)
      val t0 = System.nanoTime()
      spark.range(6000000L)
        .selectExpr("id", "sha2(cast(id as string), 512) as pad")
        .write.mode("overwrite").parquet(dst.toString)
      // force() inside the timing — see Bench.canaryWr: without it the
      // burst lands in the page cache and reads memory, not the device.
      val walk = java.nio.file.Files.walk(dst)
      try walk.iterator().asScala
        .filter(_.toString.endsWith(".parquet")).foreach { p =>
          val ch = java.nio.channels.FileChannel.open(
            p, java.nio.file.StandardOpenOption.WRITE)
          try ch.force(true) finally ch.close()
        }
      finally walk.close()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.Scratch.defer(dst.toString); graft.Scratch.drain()
      dt
    }
    wrKernel(0) // untimed warm
    (1 to 3).foreach(i => println(f"[suscanary] write run $i: ${wrKernel(i)}%.2f s"))
    graft.Scratch.defer(wrParent.toString); graft.Scratch.drain()
    spark.stop()
  }
}
