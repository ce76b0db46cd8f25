package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount and subwordCount") {
    val r = Seq("Hello world, it's 2024!").toDF("t")
      .select(TextAnalysis.tokenCount(col("t")).as("n"),
        TextAnalysis.subwordCount(col("t")).as("s"))
      .collect()(0)
    assert(r.getInt(0) == 4)
    // Hello | world | , | it | ' | s | 2024 | !
    assert(r.getInt(1) == 8)
  }

  test("langId votes by stopword ratio; Han short-circuits to zh; no signal → und") {
    val r = Seq(
      "the cat sat on the mat and it was good for a while",
      "el perro y la casa de un señor que no es grande",
      "xyzzy plugh qwerty",
      "你好世界"
    ).toDF("t").select(TextAnalysis.langId(col("t"))).collect().map(_.getString(0))
    assert(r.toSeq == Seq("en", "es", "und", "zh"))
  }

  test("quality features: empty text scores zeros, richer text scores higher") {
    val r = TextAnalysis.withQualityFeatures(
      Seq("", "the sensible document of reasonable length and it is that for good").toDF("t"), "t")
      .select("q_n_tokens", "quality_score").orderBy("q_n_tokens").collect()
    // "" tokenizes to [""], one zero-length token
    assert(r(0).getDouble(1) < r(1).getDouble(1))
  }

  test("fingerprints: whitespace/case-normalized md5; rolling is order-sensitive") {
    val fp = Seq("Hello  World", "hello world", "world hello").toDF("t")
      .select(TextAnalysis.fingerprintMd5(col("t")).as("m"),
        TextAnalysis.fingerprintRolling(col("t")).as("r"))
      .collect()
    assert(fp(0).getString(0) == fp(1).getString(0)) // case+ws insensitive
    assert(fp(1).getString(0) != fp(2).getString(0)) // different tokens
    assert(fp(1).getLong(1) != fp(2).getLong(1))     // order-sensitive
  }

  test("tfIdf: corpus-wide terms weigh less than doc-specific terms") {
    val docs = Seq(
      (1L, "common rare1 common common"),
      (2L, "common rare2"),
      (3L, "common other")
    ).toDF("doc_id", "t")
    val out = TextAnalysis.tfIdf(docs, "doc_id", "t", topK = 2)
      .filter(col("id") === 2).orderBy("rank").collect()
    // rare2 appears in 1/3 docs, common in 3/3 -> rare2 ranks first
    assert(out(0).getAs[String]("token") == "rare2")
    assert(out(1).getAs[String]("token") == "common")
    assert(out(0).getAs[Double]("weight") > out(1).getAs[Double]("weight"))
    assert(out(0).getAs[Long]("df") == 1 && out(1).getAs[Long]("df") == 3)
  }

  test("termFrequencies counts duplicated tokens") {
    val tf = TextAnalysis.termFrequencies(Seq("a b a", "b a").toDF("t"), "t")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tf == Map("a" -> 3L, "b" -> 2L))
  }

  test("repetitionSignals: duplicate lines/tokens and the top-bigram share") {
    val docs = Seq(
      (1L, "x y\nx y\nz"),        // 3 lines, 1 dup; tokens x y x y z
      (2L, "a b a b a b"),        // bigrams: "a b"×3, "b a"×2 -> top 3/5
      (3L, "solo"),               // single token: no bigrams
      (4L, "")                    // empty text
    ).toDF("doc_id", "t")
    val out = TextAnalysis.repetitionSignals(docs, "doc_id", "t")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    // fractions come back round6-ed (floor(x*1e6+0.5)/1e6)
    assert(out(0) == ((1L, 0.333333, 0.4, 0.5)),
      s"doc1: ${out(0)}") // bigrams: "x y","y x","x y","y z" -> top 2/4
    assert(out(1)._1 == 2L && out(1)._2 == 0.0)
    assert(out(1)._3 == 0.666667 && out(1)._4 == 0.6, s"doc2: ${out(1)}")
    assert(out(2) == ((3L, 0.0, 0.0, 0.0)))
    assert(out(3) == ((4L, 0.0, 0.0, 0.0)))
  }

  test("bm25: doc with more query-term hits and shorter length ranks first") {
    val docs = Seq(
      (1L, "spark query spark join fast"),         // 3 query-term hits, short
      (2L, "spark table table table table table"), // 1 hit, diluted
      (3L, "row scan filter hash merge batch"),    // 0 hits
      (4L, "query join")                           // 2 hits, shortest
    ).toDF("id", "text")
    val out = TextAnalysis.bm25(docs, "id", "text",
      Seq("spark", "query", "join"), topK = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    // doc 3 never appears (no matched term)
    assert(out.map(_._2).toSet == Set(1L, 2L, 4L))
    assert(out.map(_._1).toSeq == Seq(1, 2, 3), "ranks dense from 1")
    // scores strictly ordered; 1 and 4 (multi-hit) beat the diluted doc 2
    val byId = out.map(t => t._2 -> t._3).toMap
    assert(byId(1L) > byId(2L) && byId(4L) > byId(2L), s"scores $byId")
  }

  test("sampleStratified: exactly min(n, perStratum) per stratum, deterministic") {
    val rows = (0L until 20L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "s")
    val once = TextAnalysis.sampleStratified(rows, "id", "s", 4)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val twice = TextAnalysis.sampleStratified(rows, "id", "s", 4)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(once == twice, "sample must be reproducible")
    assert(once.count(_._2 == "a") == 4 && once.count(_._2 == "b") == 4)
    // a stratum smaller than perStratum survives whole
    val tiny = TextAnalysis.sampleStratified(rows.filter(col("id") < 2), "id", "s", 4)
    assert(tiny.count() == 2)
  }

  test("withCorpusFrequency: common-vocab docs outscore rare-vocab docs") {
    val docs = Seq(
      (1L, "common common common"),
      (2L, "common rare"),
      (3L, "unique1 unique2")
    ).toDF("doc_id", "t")
    val rows = TextAnalysis.withCorpusFrequency(docs, "doc_id", "t")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // 'common' freq 4, 'rare'/'unique*' freq 1
    assert(rows(1L) == ((12L, 3L)), s"got ${rows(1L)}") // 3 tokens x freq 4
    assert(rows(2L) == ((5L, 2L)), s"got ${rows(2L)}")  // 4 + 1
    assert(rows(3L) == ((2L, 2L)), s"got ${rows(3L)}")  // 1 + 1
    // mean frequency orders docs by commonness
    def mean(p: (Long, Long)) = p._1.toDouble / p._2
    assert(mean(rows(1L)) > mean(rows(2L)) && mean(rows(2L)) > mean(rows(3L)))
  }

  test("sampleMixture: weight 1 keeps all, absent source keeps none, samples nest") {
    val rows = (0L until 200L).map(i => (i, s"src${i % 4}")).toDF("id", "src")
    val all = TextAnalysis.sampleMixture(rows, "id", "src", Map("src0" -> 1.0))
      .collect().map(_.getLong(0)).toSet
    assert(all == (0L until 200L by 4).toSet, "weight 1.0 keeps the whole source")
    assert(!all.exists(_ % 4 != 0), "unweighted sources keep nothing")
    val half = TextAnalysis.sampleMixture(rows, "id", "src", Map("src1" -> 0.5))
      .collect().map(_.getLong(0)).toSet
    val quarter = TextAnalysis.sampleMixture(rows, "id", "src", Map("src1" -> 0.25))
      .collect().map(_.getLong(0)).toSet
    assert(quarter.subsetOf(half), "raising a weight must strictly grow the sample")
    assert(half.nonEmpty && half.size < 50, s"~half of 50 expected, got ${half.size}")
    // reproducible
    val again = TextAnalysis.sampleMixture(rows, "id", "src", Map("src1" -> 0.5))
      .collect().map(_.getLong(0)).toSet
    assert(again == half)
  }

  test("sampleWeighted: k rows, deterministic, heavy weights overrepresented") {
    val rows = (0L until 2000L).map(i => (i, if (i < 1000) 1.0 else 10.0))
      .toDF("id", "w")
    val s1 = TextAnalysis.sampleWeighted(rows, "id", "w", k = 200)
      .collect().map(_.getLong(0)).toSeq
    assert(s1.length == 200 && s1.distinct.length == 200)
    // weight-10 ids (1000+) should dominate the sample decisively
    val heavy = s1.count(_ >= 1000L)
    assert(heavy > 150, s"expected weight-10 dominance, got $heavy/200")
    // reproducible, order included
    val s2 = TextAnalysis.sampleWeighted(rows, "id", "w", k = 200)
      .collect().map(_.getLong(0)).toSeq
    assert(s2 == s1)
    // non-positive weights are ineligible, never top-ranked
    val poisoned = rows.withColumn("w",
      when(col("id") < 10, -1.0).when(col("id") < 20, 0.0).otherwise(col("w")))
    val s3 = TextAnalysis.sampleWeighted(poisoned, "id", "w", k = 200)
      .collect().map(_.getLong(0)).toSeq
    assert(!s3.exists(_ < 20L), "non-positive-weight rows must be excluded")
  }

  test("sentences: splits on terminal runs, protects abbreviations, keeps fragments") {
    val out = TextAnalysis.sentences(
      Seq((1L, "Dr. Smith arrived. It was late!? e.g. very late. A fragment"))
        .toDF("id", "t"), "id", "t")
      .collect().map(r => (r.getInt(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (0, "Dr. Smith arrived."),
      (1, "It was late!?"),
      (2, "e.g. very late."),
      (3, "A fragment")))
    // no text → no rows; punctuation-only text trims away entirely
    assert(TextAnalysis.sentences(Seq((2L, "...")).toDF("id", "t"), "id", "t")
      .count() == 0)
  }

  test("normalizeText: NFC composes, casefolds, collapses whitespace") {
    val rows = Seq(
      (1L, "Café  du\tMonde"), // e + combining acute, run + tab
      (2L, "Ångström"), // A + ring, o + diaeresis
      (3L, "  plain ascii  "),
      (4L, "")).toDF("id", "text")
    val out = rows.select(col("id"),
      TextAnalysis.normalizeText(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "café du monde", s"got '${out(1L)}'")
    assert(out(2L) == "ångström", s"got '${out(2L)}'")
    assert(out(3L) == "plain ascii")
    assert(out(4L) == "")
    // two byte-different spellings of the same text now fingerprint equal
    val fp = Seq((1L, "Café"), (2L, "Café")).toDF("id", "text")
      .select(TextAnalysis.fingerprintMd5(
        TextAnalysis.normalizeText(col("text"))).as("f"))
      .collect().map(_.getString(0)).distinct
    assert(fp.length == 1, "NFC-normalized spellings must collapse")
    // case preserved when casefold off
    val keep = rows.filter(col("id") === 1)
      .select(TextAnalysis.normalizeText(col("text"), casefold = false))
      .collect()(0).getString(0)
    assert(keep == "Café du Monde", s"got '$keep'")
  }

  test("noveltyScore: first doc fully novel, clone scores 0, overlap is fractional") {
    val docs = Seq(
      (1L, "a b c d"),        // shingles (k=3): "a b c", "b c d" — both first here
      (2L, "a b c d"),        // exact clone: 0 novel
      (3L, "b c d e f"),      // "b c d" seen; "c d e", "d e f" novel → 2/3
      (4L, "x y")             // short text → single whole-text shingle, novel
    ).toDF("doc_id", "text")
    val out = TextAnalysis.noveltyScore(docs, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((2L, 2L, 1000000L)))
    assert(out(2L) == ((2L, 0L, 0L)))
    assert(out(3L) == ((3L, 2L, 666666L)))
    assert(out(4L) == ((1L, 1L, 1000000L)))
  }

  test("vocabCoverage: empty corpus yields an empty curve, not a crash") {
    // the pre-r14 implementation ran head() on an empty aggregate (NPE
    // territory); the histogram form degrades to zero rows
    import spark.implicits._
    val out = graft.ops.TextAnalysis.vocabCoverage(
      Seq.empty[String].toDF("text"), "text")
    assert(out.collect().isEmpty)
  }

  test("vocabCoverage: exact integer thresholds over the frequency curve") {
    // a×6, b×3, c×1 → total 10; cum: a=6, ab=9, abc=10
    val docs = Seq((1L, "a a a b"), (2L, "a a a b b c")).toDF("id", "text")
    val out = TextAnalysis.vocabCoverage(docs, "text")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(50) == ((1L, 10L)))  // 6/10 ≥ 50%
    assert(out(90) == ((2L, 10L)))  // 9/10 ≥ 90% exactly
    assert(out(95) == ((3L, 10L)))
    assert(out(99) == ((3L, 10L)))
  }

  test("shard assignment is deterministic, total, and balanced-ish") {
    import graft.ops.Bucketing
    val ids = (0L until 1000L).toDF("doc_id")
    val a = Bucketing.assignShards(ids, "doc_id", 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Bucketing.assignShards(ids, "doc_id", 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "same keys must land in the same shards on rerun")
    assert(a.values.forall(s => s >= 0 && s < 16))
    val counts = a.values.groupBy(identity).view.mapValues(_.size)
    assert(counts.size == 16, "all 16 shards populated at n=1000")
    // md5 is uniform: no shard should be pathologically over/under-loaded
    assert(counts.values.forall(c => c > 20 && c < 130), s"skewed: $counts")
  }

  test("fused graft_text_stats is bit-identical to the unfused r18 quality expressions") {
    // The r19 fused kernel (one scan) vs the exact expression forms it
    // replaced: split(trim(lower))/aggregate/regexp_count/filter. Pinned
    // on the adversarial edges of Pattern.split(-1) semantics — empty
    // string → one empty token, leading/trailing \t (trim strips only
    // 0x20), multi-byte lowercase expansion (İ → i + U+0307), CJK (no
    // separators), emoji (4-byte sequences), mixed-case stopwords.
    val fixtures = Seq(
      "",
      " ",
      "\t",
      "\tfoo\tbar\t",
      "   spaced   out   ",
      "the quick brown fox, it is THAT good: 100% of 2024!",
      "The THE tHe a A of OF to in is it that for and",
      "İstanbul DİYARBAKIR Straße ĄĘŁÓ",
      "日本語のテキスト、句読点。test 123",
      "a😀b c😀😀d  vertical\ftab\rcr\nnl",
      "¡¿Ñoño?! «quoted» — em-dash … ellipsis",
      "x" * 5000 + " " + "y" * 3
    )
    val df = fixtures.toDF("t")
    def canon(out: org.apache.spark.sql.DataFrame) =
      out.select("t", "q_n_tokens", "q_mean_token_len", "q_punct_ratio",
        "q_digit_ratio", "q_stopword_ratio", "quality_score")
        .collect().map(r => (r.getString(0).take(20), r.getInt(1),
          r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))).sortBy(_._1).toSeq
    val fused = canon(TextAnalysis.withQualityFeatures(df, "t"))
    // the unfused construction, verbatim from the r18 implementation
    val t = col("t")
    val toks = split(trim(lower(t)), "\\s+")
    val nChars = length(t).cast("double")
    val unfused = canon(df
      .withColumn("q_n_tokens", size(toks))
      .withColumn("q_mean_token_len",
        when(size(toks) === 0, 0.0).otherwise(
          aggregate(toks, lit(0.0), (acc, x) => acc + length(x)) / size(toks)))
      .withColumn("q_punct_ratio",
        when(nChars === 0, 0.0)
          .otherwise(regexp_count(t, lit("[\\p{Punct}]")).cast("double") / nChars))
      .withColumn("q_digit_ratio",
        when(nChars === 0, 0.0)
          .otherwise(regexp_count(t, lit("[0-9]")).cast("double") / nChars))
      .withColumn("q_stopword_ratio",
        TextAnalysis.stopwordRatio(t, TextAnalysis.stopwords("en")))
      .withColumn("quality_score",
        graft.ops.Nums.round6(greatest(lit(0.0), least(lit(1.0),
          lit(0.30) * least(col("q_n_tokens").cast("double") / 64.0, lit(1.0))
            + lit(0.25) * least(col("q_mean_token_len") / 6.0, lit(1.0))
            + lit(0.25) * (lit(1.0) - least(col("q_punct_ratio") * 4.0, lit(1.0)))
            + lit(0.20) * least(col("q_stopword_ratio") * 3.0, lit(1.0)))))))
    assert(fused == unfused, s"fused/unfused diverge:\n$fused\nvs\n$unfused")
  }
}
