package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev perf probe: isolates where minhash time goes (signature vs join). */
object Perf {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[perf] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    time("warmup count")(docs.count())
    time("shingles only") {
      docs.select(size(Dedup.shingles(col("text"), 5)).as("n"))
        .agg(sum("n")).collect()
    }
    time("signature (16 hashes)") {
      docs.select(Dedup.minhashSignature(col("text"), 16, 5).as("sig"))
        .select(size(col("sig")).as("n")).agg(sum("n")).collect()
    }
    time("bands + explode") {
      val sig = Dedup.minhashSignature(col("text"), 16, 5)
      docs.select(col("doc_id"), Dedup.lshBands(sig, 16, 4).as("bands"))
        .select(posexplode(col("bands"))).count()
    }
    time("candidate pairs")(Dedup.minhashCandidatePairs(docs, "doc_id", "text").count())
    time("full nearDuplicates")(
      Dedup.minhashNearDuplicates(docs, "doc_id", "text", 0.9).count())

    time("simhash neardup")(
      Dedup.simhashNearDuplicates(docs, "doc_id", "text", 16, 3).count())

    if (args.length > 1 && args(1) == "pipeline") {
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val withPat = graft.ops.Extract.withExtractedPatterns(li)
      val asJson = withPat.withColumn("data",
        to_json(struct(withPat.columns.map(col).toSeq: _*), Map("ignoreNullFields" -> "false")))
      time("to_json scan")(asJson.agg(sum(length(col("data")))).collect())
      time("persist materialize") {
        asJson.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        asJson.count()
      }
      time("infer (count+presence)")(graft.ops.InferSchema.infer(asJson, "data"))
      val schema = graft.ops.InferSchema.infer(asJson, "data").get
      time("json_object_keys only")(
        asJson.agg(sum(size(json_object_keys(col("data"))))).collect())
      val fields = schema.properties.keys.toSeq.sorted
      time("array_except extra only")(
        asJson.agg(sum(size(org.apache.spark.sql.functions.array_except(
          json_object_keys(col("data")),
          array(fields.map(lit): _*).cast("array<string>"))))).collect())
      val validated = graft.ops.Validate.withQualityIssues(asJson, schema, "data")
      time("validate agg")(validated.agg(count(when(size(col("_quality_issues")) === 0, 1)))
        .collect())
      val stamped = graft.ops.Corpus.stampAndSerialize(validated.drop("data"), 1)
      time("stamp+pydumps+write") {
        stamped.write.mode("overwrite").parquet("/tmp/perf_corpus/records")
      }
      time("full Pipeline.ingest") {
        graft.Pipeline.ingest(spark, li, java.nio.file.Files.createTempDirectory("perfc_").toString)
      }
      spark.stop(); return
    }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    time("embed neardup (brute)")(
      graft.ops.Similarity.bruteForceNearDuplicates(emb, 0.45).count())
    val q = emb.filter(col("id") < 10).select(col("id").as("qid"), col("vec").as("qvec"))
    time("ann topk (brute)")(
      graft.ops.Similarity.bruteForceTopK(q, emb, 5).count())
    spark.stop()
  }
}
