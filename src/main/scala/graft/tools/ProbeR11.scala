package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 sf1 evidence probe, two questions the verdict left open:
  *
  *  1. CC rounds at sf1 (VERDICT r9 #4): how many label-propagation rounds
  *     does the near-dup component loop take on the ×10 similarity graph?
  *     (>6 would justify two-phase large-star/small-star; clique-ish
  *     near-dup graphs predict 3-4.) Run with the graft logger at INFO so
  *     `connectedComponents: N rounds` emits per call.
  *
  *  2. Streaming-dedup admission latency vs index size + compaction
  *     (VERDICT r9 #3): index the sf1 documents corpus in chunks through
  *     admitBatch, timing each admission as the standing index grows; then
  *     compactIndex and re-time a small probe admission against the same
  *     corpus-scale index, with before/after file counts.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_CPUS=32 \
  *          sbt "runMain graft.tools.ProbeR11"
  */
object ProbeR11 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // surface Dedup's per-round CC instrumentation
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft.ops", org.apache.logging.log4j.Level.INFO)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    println(s"[probe-r11] sf1 documents: $nDocs")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe-r11] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // ---- 1. CC rounds on the sf1 near-dup graph (watch the INFO lines:
    //         "connectedComponents: N directed edges, R rounds")
    time("cc: minhashClusters(all sf1)") {
      graft.ops.Dedup.minhashClusters(docs, "doc_id", "text", 0.8).count()
    }
    spark.catalog.clearCache()
    // the adaptive path may route the sf1 graph to the driver union-find;
    // FORCE the distributed loop too so the rounds count (the large-star/
    // small-star decision input) is measured either way
    val sf1Pairs = graft.ops.Dedup.minhashNearDuplicates(
      docs, "doc_id", "text", 0.8).select("id_a", "id_b").localCheckpoint(true)
    println(s"[probe-r11] sf1 verified near-dup pairs: ${sf1Pairs.count()}")
    time("cc loop FORCED (driverCutoff=0)") {
      graft.ops.Dedup.connectedComponents(sf1Pairs, driverCutoff = 0L).count()
    }
    spark.catalog.clearCache()

    // ---- 2. streaming index: admission latency vs index size
    val indexDir = java.nio.file.Files.createTempDirectory("sf1idx_").toString
    val chunks = 5
    val withChunk = docs.withColumn("__chunk",
      pmod(col("doc_id"), lit(chunks.toLong)))
    (0 until chunks).foreach { c =>
      val b = withChunk.filter(col("__chunk") === c).drop("__chunk")
        .localCheckpoint(true)
      val n = b.count()
      time(f"admitBatch chunk $c ($n%,d docs, index=${c.toLong * nDocs / chunks}%,d)") {
        graft.streaming.StreamingDedup.admitBatch(spark, b, "doc_id", "text",
          indexDir, 0.8, batchId = Some(c.toLong)).count()
      }
      spark.catalog.clearCache()
    }
    def fileCount(dir: String): Int = {
      val p = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.exists(p)) 0
      else {
        val s = java.nio.file.Files.walk(p)
        try s.filter(f => java.nio.file.Files.isRegularFile(f) &&
          !f.getFileName.toString.startsWith("_") &&
          !f.getFileName.toString.startsWith(".")).count().toInt
        finally s.close()
      }
    }
    val probeBatch = docs.orderBy("doc_id").limit(1000)
      .withColumn("doc_id", col("doc_id") + 10000000L)
      .withColumn("text", concat(col("text"), lit(" sf1 probe suffix tokens")))
      .localCheckpoint(true)
    println(s"[probe-r11] index files pre-compaction: " +
      Seq("fp", "buckets", "sig").map(t => s"$t=${fileCount(s"$indexDir/$t")}").mkString(" "))
    time("admit 1k probe batch (pre-compaction)") {
      graft.streaming.StreamingDedup.admitBatch(spark, probeBatch, "doc_id", "text",
        indexDir, 0.8, batchId = Some(100L)).count()
    }
    time("compactIndex (full corpus index)") {
      graft.streaming.StreamingDedup.compactIndex(spark, indexDir)
    }
    println(s"[probe-r11] index files post-compaction: " +
      Seq("fp", "buckets", "sig").map(t =>
        s"${t}_c=${fileCount(s"$indexDir/${t}_c")}").mkString(" "))
    val probe2 = probeBatch.withColumn("doc_id", col("doc_id") + 10000000L)
      .localCheckpoint(true)
    time("admit 1k probe batch (post-compaction)") {
      graft.streaming.StreamingDedup.admitBatch(spark, probe2, "doc_id", "text",
        indexDir, 0.8, batchId = Some(101L)).count()
    }
    spark.stop()
  }
}
