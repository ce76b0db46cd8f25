package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: chain-vs-clustering split of q_dedup_clusters. */
object ProbeCC {
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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    for (round <- 1 to 2) {
      println(s"== round $round ==")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val pairs = t("minhash pairs (chain)") {
        val p = Dedup.minhashNearDuplicates(docs, "doc_id", "text", 0.9)
          .select("id_a", "id_b").localCheckpoint()
        println(s"[probe]   -> ${p.count()} pairs")
        p
      }
      t("connectedComponents")(
        println(s"[probe]   -> ${Dedup.connectedComponents(pairs).count()} labeled"))
      t("full minhashClusters")(
        Dedup.minhashClusters(docs, "doc_id", "text", 0.9).count())

      println("-- curate breakdown --")
      val gated = graft.ops.TextAnalysis.withQualityFeatures(docs, "text")
        .filter(col("quality_score") >= 0.65)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("gated materialize")(println(s"[probe]   -> ${gated.count()} gated"))
      val dedupPairs = t("chain over gated") {
        val p = Dedup.minhashNearDuplicates(gated, "doc_id", "text", 0.9)
          .select("id_a", "id_b").localCheckpoint()
        println(s"[probe]   -> ${p.count()} pairs"); p
      }
      val losers = t("cc + losers") {
        val l = Dedup.connectedComponents(dedupPairs)
          .filter(col("id") =!= col("component")).localCheckpoint()
        println(s"[probe]   -> ${l.count()} losers"); l
      }
      t("anti-join + window + summary") {
        import org.apache.spark.sql.expressions.Window
        val kept = gated.join(losers.select(col("id").as("doc_id")), Seq("doc_id"), "left_anti")
        val w = Window.partitionBy(col("lang"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        kept.withColumn("__cum", sum(col("q_n_tokens").cast("long")).over(w))
          .filter(col("__cum") <= 1500L)
          .groupBy("lang").agg(count(lit(1))).collect()
      }
      gated.unpersist(blocking = false)
      t("full curate query") {
        graft.ops.Curate.curationSummary(
          graft.ops.Curate.curateCorpus(docs, "doc_id", "text", "lang",
            0.65, 0.9, 1500L), "lang").orderBy("lang").count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
