package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (extension mandate, SURVEY
  * §2.3): language ID, quality scoring, token counting, fingerprinting.
  * Everything here is a map-only column expression (codegen'd, shuffle-free)
  * except the corpus-level term-frequency aggregation.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alpha runs, digit runs, and single other symbols
    * — a deterministic proxy for tokenizer cost accounting.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Tiny built-in stopword sets (top function words; enough signal for an
    * n-gram-heuristic language vote — not a linguistic claim).
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "que"),
    "de" -> Seq("der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich")
  )

  /** Fraction of tokens found in `words` (duplicates count — it is a ratio
    * over tokens, not a set overlap).
    */
  def stopwordRatio(text: Column, words: Seq[String]): Column = {
    val toks = tokens(text)
    val wordArr = array(words.map(lit): _*)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => array_contains(wordArr, t))).cast("double") / size(toks))
  }

  /** Language-ID heuristic: argmax of per-language stopword ratios; "und"
    * (undetermined) when every ratio is zero. CJK short-circuit: any Han
    * character votes "zh" (stopword lists don't apply to unsegmented text).
    */
  def langId(text: Column): Column = {
    val scores = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(stopwordRatio(text, words).as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scores: _*)
    when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .when(best.getField("score") === 0.0, lit("und"))
      .otherwise(best.getField("lang"))
  }

  /** Quality features + a composite score in [0,1] — the usual cheap
    * pre-filter signals: document length, mean token length, punctuation
    * density, digit density, stopword density.
    */
  def withQualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nChars = length(t).cast("double")
    val en = stopwordRatio(t, stopwords("en"))
    df
      .withColumn("q_n_tokens", size(toks))
      .withColumn("q_mean_token_len",
        when(size(toks) === 0, 0.0).otherwise(
          aggregate(toks, lit(0.0), (acc, x) => acc + length(x)) / size(toks)))
      .withColumn("q_punct_ratio",
        when(nChars === 0, 0.0)
          .otherwise(length(regexp_replace(t, "[^\\p{Punct}]", "")).cast("double") / nChars))
      .withColumn("q_digit_ratio",
        when(nChars === 0, 0.0)
          .otherwise(length(regexp_replace(t, "[^0-9]", "")).cast("double") / nChars))
      .withColumn("q_stopword_ratio", en)
      .withColumn("quality_score",
        Nums.round6(greatest(lit(0.0), least(lit(1.0),
          lit(0.30) * least(col("q_n_tokens").cast("double") / 64.0, lit(1.0))
            + lit(0.25) * least(col("q_mean_token_len") / 6.0, lit(1.0))
            + lit(0.25) * (lit(1.0) - least(col("q_punct_ratio") * 4.0, lit(1.0)))
            + lit(0.20) * least(col("q_stopword_ratio") * 3.0, lit(1.0))))))
  }

  /** Corpus term frequencies: explode + hash aggregate (map-side combine
    * collapses per-partition counts before the shuffle).
    */
  def termFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))

  /** Per-document term weights: tf × idf over the corpus, top-k terms per
    * document. Plan: one (doc, token) hash aggregate for term frequencies,
    * one token aggregate for document frequencies (vocabulary-sized —
    * broadcast back), then a per-doc top-k window over doc-local rows.
    *
    * @param linearIcf true → weight = tf * (N / df): a single IEEE division,
    *        bit-identical across engines (oracle-checkable). false → classic
    *        tf * ln(N / df), which ranks slightly differently and whose
    *        `ln` can differ by an ulp between libm implementations.
    */
  def tfIdf(df: DataFrame, idCol: String, textCol: String, topK: Int,
            linearIcf: Boolean = false): DataFrame = {
    val n = df.count() // driver-side scalar: total docs, broadcast as literal
    val terms = df
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("token"))
      .groupBy("id", "token").agg(count(lit(1)).as("tf"))
    val docFreq = terms.groupBy("token")
      .agg(count(lit(1)).as("df"))
    val weight =
      if (linearIcf) col("tf") * (lit(n.toDouble) / col("df"))
      else col("tf") * log(lit(n.toDouble) / col("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(desc("weight"), asc("token"))
    terms.join(broadcast(docFreq), "token")
      .withColumn("weight", weight)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("id"), col("rank"), col("token"),
        col("tf"), col("df"), Nums.round6(col("weight")).as("weight"))
  }

  /** Content fingerprint: md5 over whitespace-normalized lowercase text —
    * byte-stable across engines (oracle-checkable exact-dup key).
    */
  def fingerprintMd5(text: Column): Column =
    md5(array_join(tokens(text), " "))

  /** Rolling polynomial fingerprint over tokens (order-sensitive, unlike a
    * bag-of-words hash): fold acc = (acc * 31 + tokenHash) mod 1e9+7, where
    * tokenHash folds character codes the same way. Pure built-in fold —
    * codegen'd, portable (same arithmetic is expressible in ANSI SQL).
    */
  def fingerprintRolling(text: Column): Column = {
    val mod = lit(1000000007L)
    val tokHash = (t: Column) =>
      aggregate(split(t, ""), lit(7L), (acc, ch) => (acc * 31L + ascii(ch)) % mod)
    aggregate(tokens(text), lit(7L), (acc, t) => (acc * 131L + tokHash(t)) % mod)
  }
}
