package graft

import graft.ops.Extract
import org.apache.spark.sql.functions._

/** F1 extraction vs recorded CPython ground truth (reference `app.py:227-246`;
  * expected values captured by running the reference regexes under Python
  * `re.findall` — including the two-capture-group phone join quirk).
  */
class ExtractSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String): (Seq[String], Seq[String], Seq[String], Seq[String]) = {
    val r = Seq(text).toDF("content")
      .select(
        Extract.emails(col("content")).as("e"),
        Extract.phones(col("content")).as("p"),
        Extract.dates(col("content")).as("d"),
        Extract.numbers(col("content")).as("n"))
      .collect()(0)
    def seq(i: Int) = r.getSeq[String](i).toSeq
    (seq(0), seq(1), seq(2), seq(3))
  }

  test("phone group-join quirk: parenthesized area code loses the tail") {
    val (_, phones, _, _) = run("Call (555) 123-4567 now")
    assert(phones == Seq("(555) "))
  }

  test("phone quirk: international prefix keeps groups 1+2 only") {
    val (_, phones, _, _) = run("+1-555-123-4567")
    assert(phones == Seq("+1-555-"))
  }

  test("phone quirk: dotted and bare 10-digit forms") {
    val (_, phones, _, _) = run("555.123.4567 or 5551234567")
    assert(phones == Seq("555.", "555"))
  }

  test("dates and the number tokenization around them") {
    val (_, _, dates, numbers) = run("on 3/14/2024 and 12-31-99")
    assert(dates == Seq("3/14/2024", "12-31-99"))
    assert(numbers == Seq("3", "14", "2024", "12", "-31", "-99"))
  }

  test("numbers: decimals, negatives, integers") {
    val (_, _, _, numbers) = run("pi 3.14 neg -42 int 7")
    assert(numbers == Seq("3.14", "-42", "7"))
  }

  test("emails incl. underscore/hyphen domains") {
    val (emails, _, _, numbers) = run("a@b.co x_1@y-z.org")
    assert(emails == Seq("a@b.co", "x_1@y-z.org"))
    assert(numbers == Seq("1"))
  }

  test("redactPii replaces whole email/phone spans; stopwords drop case-insensitively") {
    val out = Seq("mail a@b.co or (555) 123-4567 now").toDF("content")
      .select(Extract.redactPii($"content")).collect()(0).getString(0)
    assert(out == "mail [EMAIL] or [PHONE] now", s"got: $out")
    val cleaned = Seq("The cat AND the dog").toDF("t")
      .select(Extract.removeStopwords($"t", Seq("the", "and"))).collect()(0).getString(0)
    assert(cleaned == "cat dog", s"got: $cleaned")
  }

  test("withExtractedPatterns: empty struct when content column is absent or empty") {
    val noContent = Seq((1, "x")).toDF("id", "other")
    val r1 = Extract.withExtractedPatterns(noContent)
      .select(size($"_extracted_patterns.emails")).collect()(0).getInt(0)
    assert(r1 == 0)
    val emptyContent = Seq("").toDF("content")
    val r2 = Extract.withExtractedPatterns(emptyContent)
      .select(size($"_extracted_patterns.numbers")).collect()(0).getInt(0)
    assert(r2 == 0)
  }
}
