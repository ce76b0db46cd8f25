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
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
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
