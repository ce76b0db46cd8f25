package graft

import graft.ops.Curate
import org.apache.spark.sql.functions._

class CurateSpec extends SparkSpec {
  import spark.implicits._

  // long-ish English docs score well on the quality formula; 1 and 2 are
  // exact duplicates; 9 is junk (low quality)
  private val good = "the data of the table is it that for a scan and the " +
    "merge of the batch is it that for a join and the filter of the query"
  private val docs = Seq(
    (1L, good + " alpha", "en"),
    (2L, good + " alpha", "en"), // exact dup of 1 → dropped by dedup
    (3L, good + " bravo extra words here make this one different enough", "en"),
    // enough distinct trailing words that the shingle jaccard vs doc 1
    // stays well under 0.9 (the repetitive base text overlaps heavily)
    (4L, good + " charlie delta echo foxtrot golf hotel india juliet kilo", "fr"),
    (9L, "!!! ??? !!!", "en") // punctuation junk → dropped by quality gate
  ).toDF("doc_id", "text", "lang")

  test("curateCorpus: quality gate, dedup, and budget compose") {
    val out = Curate.curateCorpus(docs, "doc_id", "text", "lang",
      minQuality = 0.5, dupThreshold = 0.9, tokenBudget = 1000L)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(9L), "junk doc must fail the quality gate")
    assert(!ids.contains(2L), "non-canonical duplicate must be dropped")
    assert(ids.contains(1L) && ids.contains(3L) && ids.contains(4L), s"got $ids")
    // summary adds up
    val sum = Curate.curationSummary(out, "lang").orderBy("lang")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sum == Seq(("en", 2L), ("fr", 1L)), s"got $sum")
  }

  test("curateCorpus: token budget caps each language independently") {
    // budget below a single doc's token count → everything capped out
    val none = Curate.curateCorpus(docs, "doc_id", "text", "lang",
      minQuality = 0.5, dupThreshold = 0.9, tokenBudget = 3L)
    assert(none.count() == 0)
    // budget fitting exactly one doc per lang (en docs: 30/38 tokens, so a
    // second one always overflows; fr doc: 39 tokens)
    val one = Curate.curateCorpus(docs, "doc_id", "text", "lang",
      minQuality = 0.5, dupThreshold = 0.9, tokenBudget = 40L)
    val byLang = one.groupBy("lang").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byLang.getOrElse("fr", 0L) == 1L, s"got $byLang")
    assert(byLang.getOrElse("en", 0L) == 1L, s"got $byLang")
  }
}
