package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F1/F2 — regex pattern extraction (reference `app.py:227-246`, applied at
  * `app.py:317-322`).
  *
  * All four extractions are pure `regexp_extract_all` column expressions —
  * whole-stage-codegen friendly, no UDFs, so at 100 TB this is a map-only
  * stage fused into the scan.
  *
  * Phone quirk (parity-critical, verified against the reference in SURVEY §2.1):
  * the reference's `re.findall` on a pattern with two capture groups returns
  * only the groups, and the code joins them — so `"(555) 123-4567"` extracts as
  * `"(555) "` (the uncaptured trailing `\d{3}[-.\s]?\d{4}` is dropped). We
  * reproduce this by extracting group 1 and group 2 separately and zipping
  * them with concat; Spark returns "" for a non-participating optional group,
  * matching Python's `''.join` over empty-string groups.
  */
object Extract {

  val emailPattern = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  // Java regex understands \b; DuckDB/RE2 does too, but we drop the \b pair
  // for the oracle-portable form below (the char classes already bound it for
  // all realistic inputs; reference keeps \b at app.py:236).
  val emailPatternWordBound = """\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b"""
  val phonePattern = """(\+?\d{1,3}[-.\s]?)?(\(?\d{3}\)?[-.\s]?)\d{3}[-.\s]?\d{4}"""
  val datePattern = """\d{1,2}[-/]\d{1,2}[-/]\d{2,4}"""
  val numberPattern = """-?\d+\.?\d*"""

  def emails(content: Column): Column =
    regexp_extract_all(content, lit(emailPatternWordBound), lit(0))

  /** Faithful reproduction of the reference's group-join quirk. */
  def phones(content: Column): Column = {
    val g1 = regexp_extract_all(content, lit(phonePattern), lit(1))
    val g2 = regexp_extract_all(content, lit(phonePattern), lit(2))
    zip_with(g1, g2, (a, b) => concat(coalesce(a, lit("")), coalesce(b, lit(""))))
  }

  def dates(content: Column): Column =
    regexp_extract_all(content, lit(datePattern), lit(0))

  def numbers(content: Column): Column =
    regexp_extract_all(content, lit(numberPattern), lit(0))

  /** PII scrubbing for training corpora: full email and phone matches are
    * replaced with placeholder tags (the whole match, not the reference's
    * group-join quirk — redaction must remove the complete PII span). Two
    * codegen'd regexp_replace passes, map-only.
    */
  def redactPii(content: Column): Column =
    regexp_replace(
      regexp_replace(content, emailPattern, "[EMAIL]"),
      phonePattern, "[PHONE]")

  /** Stopword removal: drop `words` tokens (case-insensitive), rejoin with
    * single spaces. Pure array expressions.
    */
  def removeStopwords(text: Column, words: Seq[String]): Column = {
    val stop = array(words.map(w => lit(w.toLowerCase)): _*)
    array_join(
      filter(split(trim(text), "\\s+"),
        t => !array_contains(stop, lower(t))), " ")
  }

  /** The `_extracted_patterns` struct for a content column. */
  def patternsStruct(content: Column): Column = struct(
    emails(content).as("emails"),
    phones(content).as("phones"),
    dates(content).as("dates"),
    numbers(content).as("numbers")
  )

  private def emptyArr: Column = array().cast("array<string>")

  /** Empty-pattern struct — the reference emits empty lists when content is
    * missing/empty/non-string (`app.py:229-233`, `app.py:318-322`).
    */
  def emptyPatternsStruct: Column = struct(
    emptyArr.as("emails"), emptyArr.as("phones"),
    emptyArr.as("dates"), emptyArr.as("numbers")
  )

  /** F2 — add `_extracted_patterns` to every record; empty struct when there
    * is no usable `content` (reference `app.py:317-322`).
    */
  def withExtractedPatterns(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val c = if (df.columns.contains(contentCol)) col(contentCol).cast("string") else lit(null).cast("string")
    df.withColumn(
      "_extracted_patterns",
      when(length(coalesce(c, lit(""))) > 0, patternsStruct(coalesce(c, lit(""))))
        .otherwise(emptyPatternsStruct)
    )
  }
}
