package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-4 throwaway probe: ivfAssign codegen/timing at realistic k, and a
  * step-level breakdown of the q_schema_evolution double-ingest.
  */
object ProbeR4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    // ---- ivfAssign codegen + isolated timing at k = 4 / 16 / 32 / 64
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    emb.count() // warm reader
    for (k <- Seq(4, 16, 32, 64)) {
      val cents = graft.ops.Similarity.seedCentroids(emb, k)
      val assigned = graft.ops.Similarity.ivfAssign(emb, cents)
      val plan = assigned.queryExecution.executedPlan.toString
      val fused = plan.linesIterator.exists(l =>
        l.contains("Project") && l.trim.startsWith("*"))
      println(s"[probe] ivfAssign k=$k codegen-fused-project=$fused " +
        s"planlen=${plan.length}")
      time(s"ivfAssign k=$k warm1")(assigned.count())
      time(s"ivfAssign k=$k warm2")(assigned.count())
    }
    // the full q_ann_ivf twice
    time("q_ann_ivf run1")(graft.Queries.queries("q_ann_ivf")(spark, sfDir).count())
    time("q_ann_ivf run2")(graft.Queries.queries("q_ann_ivf")(spark, sfDir).count())

    // ---- q_schema_evolution step breakdown (after a warm bulk ingest)
    import java.nio.file.Files
    time("warm pipeline (documents full)") {
      val dir = Files.createTempDirectory("probe_warm_").toString
      graft.Pipeline.ingest(spark, spark.read.parquet(s"$sfDir/documents.parquet"),
        dir, idCol = Some("doc_id"))
    }
    for (round <- 1 to 3) {
      val corpusDir = Files.createTempDirectory("probe_evo_").toString
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") < 2000)
      val events = spark.read.parquet(s"$sfDir/events.parquet")
        .filter(col("event_id") < 2000)
      time(s"evo[$round] ingest docs")(
        graft.Pipeline.ingest(spark, docs, corpusDir, idCol = Some("doc_id")))
      time(s"evo[$round] ingest events")(
        graft.Pipeline.ingest(spark, events, corpusDir, idCol = Some("event_id")))
      time(s"evo[$round] schemaChanges read")(
        graft.ops.Corpus.schemaChanges(spark, corpusDir)
          .select(col("old_version"), col("new_version"),
            array_join(col("added_fields"), "|").as("added"),
            array_join(col("removed_fields"), "|").as("removed"))
          .orderBy("new_version").count())
    }
    spark.stop()
  }
}
