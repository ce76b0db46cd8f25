package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring deduplication at token-window granularity — the
  * ExactSubstr discipline of Lee et al., "Deduplicating Training Data Makes
  * Language Models Better" (ACL 2022), re-expressed for Spark: instead of a
  * corpus-wide suffix array (whose construction is a sequential bottleneck),
  * every k-token window is hashed and grouped, windows whose content occurs
  * MORE THAN ONCE anywhere in the corpus mark their token range, and per
  * document the overlapping ranges merge into maximal duplicated spans
  * (gaps-and-islands). Resolution is k tokens rather than 50 bytes, but the
  * semantics match: any duplicated run of ≥ k tokens is found, wherever it
  * sits inside a document — the within-document granularity that whole-doc
  * (exact/MinHash) dedup cannot see.
  *
  * Scale shape: one explode (≤ n_tokens windows per doc — linear, never
  * quadratic), one hash-aggregate over window content with map-side combine,
  * one semi-join back (both shuffles on the window hash — skew-free: a
  * window string's frequency is bounded by corpus duplication, and only the
  * GROUP/JOIN key is the window text), then a per-document window function
  * (shuffle on doc id). No driver-side state, no all-pairs anything; 100 TB
  * is more partitions, not a different plan.
  */
object SubstringDedup {

  /** Token array of `textCol` (whitespace tokens of the trimmed text, the
    * [[TextAnalysis]] convention; empty text → empty array). */
  private def toks(textCol: Column): Column =
    when(length(trim(textCol)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(textCol), "\\s+"))

  /** Every doc's k-token windows: (id, pos, gram). */
  private def windows(docs: DataFrame, idCol: String, textCol: String,
                      k: Int): DataFrame =
    docs.select(col(idCol), toks(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), size(col("toks")) - k),
        i => array_join(slice(col("toks"), i + 1, lit(k)), " "))).as(Seq("pos", "gram")))

  /** Maximal duplicated spans per document: every k-token window whose
    * content appears more than once in the corpus (any document, including
    * a second time in its own) marks tokens [pos, pos+k); overlapping and
    * touching marks merge. Returns (id, span_start, span_end, n_windows)
    * with end exclusive, token-indexed from 0.
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 8): DataFrame = {
    require(k >= 1, s"window size must be >= 1, got $k")
    val w = windows(docs, idCol, textCol, k)
    val dup = w.groupBy("gram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1).select("gram")
    val marks = w.join(dup, Seq("gram"), "left_semi")
    // gaps-and-islands: ranges all have length k, so a new island starts
    // when this window no longer overlaps/touches the previous one
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    marks
      .withColumn("brk",
        when(col("pos") > coalesce(lag(col("pos"), 1).over(byDoc),
          lit(Int.MinValue)) + k, 1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + k).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .drop("island")
  }

  /** Documents with their duplicated spans REMOVED (tokens covered by any
    * [[duplicatedSpans]] range dropped, survivors re-joined with single
    * spaces). Documents with no duplicated span pass through verbatim.
    */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                            k: Int = 8): DataFrame = {
    val spans = duplicatedSpans(docs, idCol, textCol, k)
      .groupBy(idCol)
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("spans"))
    docs.join(spans, Seq(idCol), "left")
      .select(col(idCol),
        when(col("spans").isNull, col(textCol)).otherwise(
          // keep token i unless some span covers it (index-aware filter)
          array_join(
            filter(toks(col(textCol)), (t, i) => !exists(col("spans"),
              s => i.cast("long") >= s("span_start") &&
                i.cast("long") < s("span_end"))),
            " ")).as("clean_text"))
  }
}
