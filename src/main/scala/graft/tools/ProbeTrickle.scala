package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.StreamingDedup

/** Dev probe (VERDICT r11 #3): TRICKLE-size admission — 10/50/100-doc
  * batches against a standing 50 k-doc dedup index — in three index
  * layouts: live-only (uncompacted bid-partitioned tail), compacted with
  * `pruneBuckets = 64` (bp-partition pruning active), and compacted with
  * `pruneBuckets = 1` (same compacted layout, pruning degenerate = full
  * scan). The r11 compaction probe used 1 k-doc batches whose ~4 k band
  * keys touch all 64 partitions ("a wash at that batch size"); the bp
  * bucketing exists FOR small batches, and this measures whether it pays
  * there. Findings → BENCH_NOTES.md.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt -batch "runMain graft.tools.ProbeTrickle"
  */
object ProbeTrickle {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("trickle_").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    val nDocs = docs.count()
    println(s"[trickle] corpus $nDocs docs; index root $root")

    // seed the live index: 5 corpus slices as micro-batches
    val live = s"$root/live"
    (0L until 5L).foreach { b =>
      val t0 = System.nanoTime()
      StreamingDedup.admitBatch(spark, docs.filter(col("id") % 5 === b),
        "id", "text", live, threshold = 0.5, batchId = Some(b)).count()
      println(f"[trickle] seed batch $b ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    // two compacted copies of the same index, pruning active vs degenerate
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val conf = spark.sparkContext.hadoopConfiguration
    def copy(src: String, dst: String): Unit =
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(src), fs,
        new org.apache.hadoop.fs.Path(dst), false, conf)
    val c64 = s"$root/c64"; val c1 = s"$root/c1"
    copy(live, c64); copy(live, c1)
    StreamingDedup.compactIndex(spark, c64, pruneBuckets = 64)
    StreamingDedup.compactIndex(spark, c1, pruneBuckets = 1)

    // novel trickle batches, prebuilt driver-side so the timed region is
    // admission only; every (config, size, rep) batch gets fresh ids+text
    val seedTexts = docs.orderBy("id").limit(100)
      .as[(Long, String)].collect()
    var serial = 0
    def novelBatch(size: Int) = {
      serial += 1
      val off = 1000000L * serial
      spark.createDataFrame(seedTexts.take(size).toSeq.map { case (id, t) =>
        (id + off, s"$t zq$serial novel trickle probe token")
      }).toDF("id", "text")
    }

    val reps = 3
    println(f"[trickle] ${"layout"}%-10s ${"batch"}%5s   t1    t2    t3  (s)")
    Seq("live" -> live, "c64" -> c64, "c1" -> c1).foreach { case (tag, dir) =>
      Seq(10, 50, 100).foreach { size =>
        val ts = (1 to reps).map { r =>
          val b = novelBatch(size)
          val t0 = System.nanoTime()
          StreamingDedup.admitBatch(spark, b, "id", "text", dir,
            threshold = 0.5, batchId = Some(100L + serial)).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[trickle] $tag%-10s $size%5d " +
          ts.map(t => f"$t%5.2f").mkString(" "))
      }
    }
    spark.stop()
  }
}
