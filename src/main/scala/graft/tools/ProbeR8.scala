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
    // ---- late-r8 tranche: the new shuffle-bearing operators, unbounded
    time("dedup_paragraphs(all)") {
      graft.ops.Dedup.dedupParagraphs(docs, "doc_id", "text").count()
    }
    time("robots_verdict(synth)") {
      import spark.implicits._
      val robots = (0 until 200).map(i =>
        (s"h$i.example.com", "User-agent: *\nDisallow: /p/1\nAllow: /p/12"))
        .toDF("host", "body")
      val urls = docs.select(concat(lit("https://h"),
        (col("doc_id") % 500).cast("string"), lit(".example.com/p/"),
        (col("doc_id") % 97).cast("string")).as("url"))
      graft.ops.Urls.robotsVerdict(urls, "url", robots, "host", "body", "bot").count()
    }
    time("hll_sketch(lineitem)") {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      graft.ops.Sketches.hllEstimate(
        graft.ops.Sketches.hllSketch(li, "l_partkey", p = 12), p = 12).count()
    }
    time("retention(events)") {
      val ev = graft.Queries.events(spark, sfDir)
        .select(col("user_id"), col("ts_us"))
      graft.ops.Sessionize.retention(ev, "user_id", "ts_us", 86400000000L).count()
    }
    time("funnel(events)") {
      val ev = graft.Queries.events(spark, sfDir)
        .select(col("user_id"), col("event_type"), col("ts_us"))
      graft.ops.Sessionize.funnel(ev, "user_id", "event_type", "ts_us",
        Seq("view", "click", "purchase"), 259200000000L).count()
    }
    time("sample_weighted(all)") {
      val d = docs.select(col("doc_id"), (col("doc_id") % 10 + 1).cast("double").as("w"))
      graft.ops.TextAnalysis.sampleWeighted(d, "doc_id", "w", k = 1000).count()
    }
    time("image_dhash(all)") {
      // 50k synthesized BMPs: encode + decode + hash, end to end
      graft.ops.Multimodal.imageDHash(
        graft.ops.Multimodal.demoBmpTable(docs, "doc_id", cycle = 5000)).count()
    }
    time("image_neardup(all)") {
      val media = graft.ops.Multimodal.demoBmpTable(docs, "doc_id", cycle = 5000)
      graft.ops.Multimodal.imageNearDuplicates(
        graft.ops.Multimodal.imageDHash(media), maxDistance = 3).count()
    }
    time("transitions(events)") {
      val ev = graft.Queries.events(spark, sfDir)
        .select(col("user_id"), col("event_type"),
          col("ts_us"), col("event_id"))
      graft.ops.Sessionize.transitions(ev, "user_id", "event_type",
        "ts_us", "event_id").count()
    }
    time("gapfill(events)") {
      val ev = graft.Queries.events(spark, sfDir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), col("value"))
      graft.ops.TimeSeries.gapFill(ev, "user_id", "ts_us", "value",
        86400000000L).count()
    }
    spark.stop()
  }
}
