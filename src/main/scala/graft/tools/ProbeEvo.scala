package graft.tools

import graft.ops.{Corpus, Evolution, Extract}
import graft.model.JsonSchema
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Dev probe: per-phase timing of q_schema_evolution's two ingests —
  * isolates driver-side FS/state-machine cost from the write job.
  */
object ProbeEvo {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def ingestTimed(spark: SparkSession, batch: DataFrame, corpusDir: String,
                  idCol: Option[String]): Unit = {
    val evo = new Evolution(spark, corpusDir)
    if (t("  isEmpty")(batch.isEmpty)) return
    val par = spark.sparkContext.defaultParallelism
    val spread = t("  numPartitions") {
      if (batch.rdd.getNumPartitions * 4 <= par) batch.repartition(par) else batch
    }
    val withPatterns = Extract.withExtractedPatterns(spread)
    val payloadCols = withPatterns.columns
    val schema = JsonSchema(
      payloadCols.map(_ -> "string").toMap, payloadCols.sorted.toSeq)
    val version = t("  evolve")(evo.evolve(schema, schema.fieldNames))
    val validated = withPatterns
      .withColumn("_quality_issues", array().cast("array<string>"))
    val nativeRender =
      try spark.catalog.functionExists("graft_pyjson") catch { case _: Exception => false }
    val idBase = t("  maxId")(if (idCol.isDefined) 0L else Corpus.maxId(spark, corpusDir) + 1L)
    val obs = new org.apache.spark.sql.Observation()
    val observed = validated.observe(obs,
      count(lit(1)).as("n"),
      count(when(size(col("_quality_issues")) === 0, 1)).as("clean"),
      count(when(size(col("_quality_issues")) > 0, 1)).as("flagged"))
    val stamped = t("  stamp plan")(Corpus.stampAndSerialize(observed, version,
      idBase = idBase, idCol = idCol, native = nativeRender))
    t("  append (write job)")(Corpus.append(stamped, corpusDir))
    t("  obs.get")(obs.get)
  }

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

    for (round <- 1 to 2) {
      println(s"== round $round ==")
      val corpusDir = Files.createTempDirectory("graft_corpus_").toString
      t("ingest 1 (documents)") {
        ingestTimed(spark,
          spark.read.parquet(s"$sfDir/documents.parquet").filter(col("doc_id") < 2000),
          corpusDir, Some("doc_id"))
      }
      t("ingest 2 (events)") {
        ingestTimed(spark,
          spark.read.parquet(s"$sfDir/events.parquet").filter(col("event_id") < 2000),
          corpusDir, Some("event_id"))
      }
      t("schemaChanges read") {
        Corpus.schemaChanges(spark, corpusDir)
          .select(col("old_version"), col("new_version"),
            array_join(col("added_fields"), "|").as("added"),
            array_join(col("removed_fields"), "|").as("removed"))
          .orderBy("new_version").count()
      }
    }
    spark.stop()
  }
}
