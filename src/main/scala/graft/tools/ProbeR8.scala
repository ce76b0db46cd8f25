package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r8): the round's new operators run UNBOUNDED over the sf1
  * (×10) rehearsal set — the oracle queries bound their fixtures to a few
  * hundred docs for DuckDB practicality, so this is where the scale shape
  * actually gets exercised (50 k docs / 6 M lineitem at sf1).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1 runMain graft.tools.ProbeR8
  */
object ProbeR8 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm readers

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe-r8] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s   ($n rows)")
      spark.catalog.clearCache()
    }

    time("dup_spans(all)") {
      graft.ops.SubstringDedup.duplicatedSpans(docs, "doc_id", "text", k = 8).count()
    }
    time("dedup_substring(all)") {
      // force the clean_text computation: a bare count() lets Catalyst
      // eliminate the whole left join (spans side is unique per key)
      graft.ops.SubstringDedup.removeDuplicatedSpans(docs, "doc_id", "text", k = 8)
        .agg(sum(length(col("clean_text")))).head().getLong(0)
    }
    time("lm_score(all)") {
      graft.ops.TextAnalysis.bigramLmScore(docs, "doc_id", "text").count()
    }
    time("inverted_index(all)") {
      graft.ops.TextAnalysis.invertedIndex(docs, "doc_id", "text").count()
    }
    time("bpe_learn(all,6)") {
      graft.ops.Bpe.learnMerges(docs, "text", steps = 6).count()
    }
    time("url_normalize(synth)") {
      val raw = docs.select(
        concat(lit("HTTP://Example.COM:80/p/"), (col("doc_id") % 997).cast("string"),
          lit("?b="), (col("doc_id") % 13).cast("string"), lit("&a=1#f")).as("url"))
      graft.ops.Urls.dedupByUrl(raw, "url").count()
    }
    time("mulaw_energy(all)") {
      graft.ops.Multimodal.windowEnergy16(spark,
        graft.ops.Multimodal.demoMulawTable(docs, "doc_id", "text"), k = 4).count()
    }
    time("collocations(all)") {
      graft.ops.TextAnalysis.collocations(docs, "text", minCount = 5L, topK = 50).count()
    }
    time("eqdepth_hist(lineitem)") {
      graft.ops.Profile.equiDepthHistogram(
        spark.read.parquet(s"$sfDir/lineitem.parquet"), "l_extendedprice", 16).count()
    }
    time("novelty(all)") {
      graft.ops.TextAnalysis.noveltyScore(docs, "doc_id", "text", k = 3).count()
    }
    time("vocab_coverage(all)") {
      graft.ops.TextAnalysis.vocabCoverage(docs, "text").count()
    }
    time("anchor_index(synth)") {
      // 3 anchors per doc on a 10k-target graph — markup synthesized on the
      // fly so the probe measures extraction + agg, not fixture IO
      val pages = docs.select(col("doc_id"), concat(
        lit("""<a href="/t/"""), (col("doc_id") * 7 % 10000).cast("string"),
        lit("""">home</a><p>x</p><a href="/t/"""),
        (col("doc_id") * 13 % 10000).cast("string"),
        lit("""">next</a><a href="/t/"""),
        (col("doc_id") * 31 % 10000).cast("string"),
        lit("""">more</a>""")).as("html"))
      graft.ops.Urls.anchorTextIndex(pages, "html").count()
    }
    time("shard_summary(all)") {
      graft.ops.Bucketing.shardSummary(docs, "doc_id", 1024).count()
    }
    spark.stop()
  }
}
