package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-stage wall time of the q_curate chain at sf0.1. */
object ProbeCurate {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // warm
    docs.count()
    time("1 gate (quality+filter) count") {
      graft.ops.TextAnalysis.withQualityFeatures(docs, "text")
        .filter(col("quality_score") >= 0.65).count()
    }
    val gated = graft.ops.TextAnalysis.withQualityFeatures(docs, "text")
      .filter(col("quality_score") >= 0.65)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("2 gate materialize (persist+count)") { gated.count() }
    val pairs = time("3 minhash verified pairs count") {
      val p = graft.ops.Dedup.minhashNearDuplicates(gated, "doc_id", "text", 0.9)
        .select("id_a", "id_b")
      p.count()
      p
    }
    time("4 connectedComponents") {
      graft.ops.Dedup.connectedComponents(pairs).count()
    }
    spark.catalog.clearCache()
    time("5 dropNearDuplicates (cold) count") {
      graft.ops.Dedup.dropNearDuplicates(docs, "doc_id", "text", 0.9).count()
    }
    spark.catalog.clearCache()
    time("6 full curate+summary (cold)") {
      graft.ops.Curate.curationSummary(
        graft.ops.Curate.curateCorpus(docs, "doc_id", "text", "lang",
          0.65, 0.9, 1500L), "lang").count()
    }
    spark.stop()
  }
}
