package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: which quality feature costs what (sf0.1 documents). */
object ProbeGate {
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    def time(label: String)(c: org.apache.spark.sql.Column): Unit = {
      // run twice, report the warm pass
      docs.select(sum(c.cast("double"))).collect()
      val t0 = System.nanoTime()
      docs.select(sum(c.cast("double"))).collect()
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val t = col("text")
    val toks = split(trim(lower(t)), "\\s+")
    time("n_tokens (split+size)")(size(toks))
    time("mean_tok_len (aggregate HOF)")(
      when(size(toks) === 0, 0.0).otherwise(
        aggregate(toks, lit(0.0), (acc, x) => acc + length(x)) / size(toks)))
    time("mean_tok_len (regex form)")(
      when(size(toks) === 0, 0.0).otherwise(
        length(regexp_replace(trim(lower(t)), "\\s+", "")).cast("double") / size(toks)))
    time("punct_ratio (regex)")(
      length(regexp_replace(t, "[^\\p{Punct}]", "")).cast("double"))
    time("digit_ratio (regex)")(
      length(regexp_replace(t, "[^0-9]", "")).cast("double"))
    val wordArr = array(graft.ops.TextAnalysis.stopwords("en").map(lit): _*)
    time("stopword (filter HOF)")(
      size(filter(toks, x => array_contains(wordArr, x))))
    time("stopword (regexp_count)")(
      regexp_count(concat(lit(" "), array_join(toks, " "), lit(" ")),
        lit("( )(the|a|of|and|to|in|is|it|that|for)(?=( |$))")))
    spark.stop()
  }
}
