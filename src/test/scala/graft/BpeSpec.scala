package graft

import graft.ops.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges reproduces the classic low/lower/newest BPE run") {
    // hand-derived (no end-of-word marker):
    //   vocab low:3 lower:2 newest:1
    //   step1: (l,o)=5 ties (o,w)=5 -> lexicographic 'l' < 'o' -> lo
    //   step2: (lo,w)=5 -> low
    //   step3: (low,e)=2 ties (e,r)=2 -> 'e' < 'low' -> er
    //   step4: (low,er)=2 -> lower
    val docs = Seq((1L, "low low low lower lower newest")).toDF("id", "text")
    val merges = Bpe.learnMerges(docs, "text", steps = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq(
      (1, "l", "o", 5L), (2, "lo", "w", 5L), (3, "e", "r", 2L),
      (4, "low", "er", 2L)), s"got ${merges.toSeq}")
  }

  test("greedy left-to-right merging: runs of the same symbol pair once per pair") {
    // 'aaa' has TWO overlapping (a,a) stat pairs (standard BPE counting)
    // but merges greedily only once -> [aa, a]; next round pairs (aa, a)
    val docs = Seq((1L, "aaa aaa")).toDF("id", "text")
    val merges = Bpe.learnMerges(docs, "text", steps = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq((1, "a", "a", 4L), (2, "aa", "a", 2L)),
      s"got ${merges.toSeq}")
  }

  test("adjacent pair occurrences all merge in one step (abab -> [ab, ab])") {
    // the single-space encoding regression case: a match that consumed the
    // next occurrence's leading delimiter would leave [ab, a, b] and
    // re-learn (a, b) as step 2. Sennrich greedy merges BOTH: step 2 must
    // see [ab, ab] and learn (ab, ab).
    val docs = Seq((1L, "abab")).toDF("id", "text")
    val merges = Bpe.learnMerges(docs, "text", steps = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq((1, "a", "b", 2L), (2, "ab", "ab", 1L)),
      s"got ${merges.toSeq}")
  }

  test("banana with (a,n) merges both occurrences: [b, an, an, a]") {
    // pairs: (b,a)=1 (a,n)=2 (n,a)=2 -> (a,n) wins the tie ('a' < 'n');
    // greedy application must hit both occurrences -> [b, an, an, a],
    // so step 2's argmax over {(b,an),(an,an),(an,a)} at n=1 is (an,a)
    val docs = Seq((1L, "banana")).toDF("id", "text")
    val merges = Bpe.learnMerges(docs, "text", steps = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq((1, "a", "n", 2L), (2, "an", "a", 1L)),
      s"got ${merges.toSeq}")
    // fertility after just (a,n): banana -> [b, an, an, a]
    val out = Bpe.applyMerges(docs, "id", "text", Seq(("a", "n"))).collect()(0)
    assert(out.getLong(2) == 4L, s"n_subwords ${out.getLong(2)}")
  }

  test("odd run of five: aaaaa with (a,a) -> [aa, aa, a], left-biased") {
    // Sennrich's lookaround pass merges left-to-right without consuming
    // delimiters: [aa, aa, a] — NOT [aa, a, aa]. Step 2's pair set is then
    // {(aa,aa),(aa,a)} and the n=1 tie-break picks (aa, a) ('a' < 'aa').
    val docs = Seq((1L, "aaaaa")).toDF("id", "text")
    val merges = Bpe.learnMerges(docs, "text", steps = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq((1, "a", "a", 4L), (2, "aa", "a", 1L)),
      s"got ${merges.toSeq}")
  }

  test("learning stops when no pairs remain, short of the requested steps") {
    val docs = Seq((1L, "ab ab ab")).toDF("id", "text")
    val merges = Bpe.learnMerges(docs, "text", steps = 5).collect()
    assert(merges.length == 1)
    assert(merges(0).getString(1) == "a" && merges(0).getString(2) == "b")
  }

  test("applyMerges: fertility stats reflect the learned merges") {
    val docs = Seq((1L, "low low low lower lower newest")).toDF("id", "text")
    val merges = Bpe.learnMerges(docs, "text", steps = 4)
      .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val out = Bpe.applyMerges(docs, "id", "text", merges).collect()(0)
    // after merges lo/low/er/lower: low -> [low] (1), lower -> [lower] (1),
    // newest -> [n e w e s t] (6); words 3+2+1, subwords 3*1 + 2*1 + 6
    assert(out.getLong(1) == 6L, s"n_words ${out.getLong(1)}")
    assert(out.getLong(2) == 11L, s"n_subwords ${out.getLong(2)}")
    assert(out.getLong(3) == 3 * 3 + 5 * 2 + 6L, s"n_chars ${out.getLong(3)}")
    // empty doc yields a zero row, not a missing one
    val empty = Bpe.applyMerges(Seq((9L, "")).toDF("id", "text"),
      "id", "text", merges).collect()(0)
    assert(empty.getLong(1) == 0L && empty.getLong(2) == 0L && empty.getLong(3) == 0L)
  }

  test("counts are vocabulary-frequency-weighted, not per-document") {
    // same word repeated in one doc and spread across docs weighs the same
    val a = Seq((1L, "xy xy xy")).toDF("id", "text")
    val b = Seq((1L, "xy"), (2L, "xy"), (3L, "xy")).toDF("id", "text")
    val ma = Bpe.learnMerges(a, "text", 1).collect()(0).getLong(3)
    val mb = Bpe.learnMerges(b, "text", 1).collect()(0).getLong(3)
    assert(ma == 3L && mb == 3L)
  }
}
