package graft

import graft.ops.SubstringDedup

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private val shared = "the quick brown fox jumps over the lazy dog" // 9 tokens

  test("duplicatedSpans finds cross-document duplicated runs, merged maximally") {
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta epsilon zeta eta theta"),
      (2L, s"one two three $shared four five six seven eight"),
      (3L, "totally unique words nothing here repeats anywhere in corpus ever")
    ).toDF("id", "text")
    val spans = SubstringDedup.duplicatedSpans(docs, "id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: shared run at tokens [2, 11); windows at pos 2 and 3 both dup
    // -> one merged span 2..11 with 2 windows. doc 2: tokens [3, 12).
    assert(spans.toSet == Set((1L, 2L, 11L, 2L), (2L, 3L, 12L, 2L)),
      s"got ${spans.toSeq}")
  }

  test("within-document repetition counts as duplication") {
    val run = "a b c d e f g h" // 8 tokens, k = 8 -> exactly one window
    val docs = Seq((1L, s"$run x $run"), (2L, "no dups here at all in this doc"))
      .toDF("id", "text")
    val spans = SubstringDedup.duplicatedSpans(docs, "id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the 8-token run occurs at pos 0 and pos 9 of doc 1 (non-overlapping:
    // gap token 'x' at index 8) -> two separate spans
    assert(spans.toSet == Set((1L, 0L, 8L), (1L, 9L, 17L)), s"got ${spans.toSeq}")
  }

  test("docs shorter than k and empty docs produce no spans and pass through") {
    val docs = Seq((1L, "short doc"), (2L, "short doc"), (3L, ""), (4L, "   "))
      .toDF("id", "text")
    assert(SubstringDedup.duplicatedSpans(docs, "id", "text", k = 8).count() == 0)
    val out = SubstringDedup.removeDuplicatedSpans(docs, "id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "short doc", 2L -> "short doc", 3L -> "", 4L -> "   "))
  }

  test("removeDuplicatedSpans drops covered tokens, keeps the rest in order") {
    val docs = Seq(
      (1L, s"alpha beta $shared gamma"),
      (2L, s"$shared tail1 tail2")
    ).toDF("id", "text")
    val out = SubstringDedup.removeDuplicatedSpans(docs, "id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 tokens: alpha beta [shared 9] gamma -> spans cover [2, 11)
    assert(out(1L) == "alpha beta gamma", s"got ${out(1L)}")
    assert(out(2L) == "tail1 tail2", s"got ${out(2L)}")
  }

  test("a doc whose every token is covered comes out empty, not null") {
    val docs = Seq((1L, shared), (2L, shared)).toDF("id", "text")
    val out = SubstringDedup.removeDuplicatedSpans(docs, "id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "", 2L -> ""))
  }
}
