package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, struct}

/** Gopher/C4 quality rules — each rule isolated by a crafted document. */
class TextQualitySpec extends SparkTestBase {
  import spark.implicits._

  private def rules(text: String): Row =
    TextAnalysis.gopherRules(Seq((1L, text)).toDF("doc_id", "text"), "text")
      .select("rule_word_count", "rule_mean_word_len", "rule_symbol_ratio",
        "rule_alpha_words", "rule_stopwords", "passes")
      .head()

  private val goodWords =
    (0 until 60).map(i => s"word$i").mkString(" ") + " the of and is"

  test("a normal document passes every rule") {
    val r = rules(goodWords)
    assert((0 until 6).forall(r.getBoolean), s"expected all-pass, got $r")
  }

  test("each rule fails in isolation on its pathological document") {
    // too short (10 words), everything else healthy
    assert(!rules("the of and is a word here to read now").getBoolean(0))
    // mean word length > 10
    val longWords = (0 until 60).map(i => s"pneumonoultramicroscopic$i")
      .mkString(" ") + " the of and is"
    val rLong = rules(longWords)
    assert(rLong.getBoolean(0) && !rLong.getBoolean(1))
    // symbol-heavy: > 0.1 '#' per word
    val symbolic = goodWords + " " + ("#### ### ##" * 3)
    assert(!rules(symbolic).getBoolean(2))
    // mostly numeric words → alpha fraction < 0.8
    val numeric = (0 until 60).map(i => s"$i$i$i").mkString(" ") + " the of and is"
    assert(!rules(numeric).getBoolean(3))
    // no English stopwords at all
    val noStop = (0 until 64).map(i => s"w$i").mkString(" ")
    val rNs = rules(noStop)
    assert(!rNs.getBoolean(4) && !rNs.getBoolean(5))
  }

  test("repetition filter: chorus-heavy doc fails, varied doc passes") {
    val varied = (0 until 60).map(i => s"w$i").mkString(" ")
    val chorus = (0 until 20).map(_ => "la la la hey").mkString(" ")
    val df = Seq((1L, varied), (2L, chorus)).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(df, "text", "doc_id")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getBoolean(3), "unique bigrams must pass")
    assert(!r(2L).getBoolean(3), "repeated chorus must fail")
    assert(r(2L).getDouble(2) > 0.9)
    // gram count = words - 1 for multi-word docs
    assert(r(1L).getLong(1) == 59)
  }

  test("native TextLangTokensExpr matches an independent reference over random text") {
    import graft.functions.TextLangTokens
    val rnd = new scala.util.Random(7)
    val langs = TextLangTokens.langs
    val allStops = langs.zip(TextLangTokens.stopwordSets).toMap
    val junk = Vector("zzz", "Qw", "abcdefghij", "k", "", "é-word", "数据", "x9",
      "LOUD", "MiXeD")
    val vocab = allStops.values.flatten.toVector ++ junk
    val ws = Vector(" ", "  ", "\t", "\n", " \t ")
    val docs = (0 until 200).map { i =>
      val n = rnd.nextInt(40)
      val body = (0 until n).map { _ =>
        val w = vocab(rnd.nextInt(vocab.size))
        if (rnd.nextBoolean()) w.toUpperCase(java.util.Locale.ROOT) else w
      }.mkString(ws(rnd.nextInt(ws.size)))
      (i.toLong, if (rnd.nextInt(10) == 0) "" else
        ws(rnd.nextInt(ws.size)) + body + ws(rnd.nextInt(ws.size)))
    }
    // independent reference: plain-Scala normText (incl. the CJK
    // codepoint segmentation) + per-word fold
    def ref(text: String): (Map[String, Int], String, Long) = {
      val norm = text.toLowerCase(java.util.Locale.ROOT)
        .replaceAll("([\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}])", " $1 ")
        .replaceAll("\\s+", " ").trim
      val words = norm.split(" ", -1).toSeq
      val hits = langs.map(l =>
        l -> words.count(allStops(l).contains)).toMap
      val best = langs.filter(l => hits(l) > 0)
        .sortBy(l => (hits(l), l)).lastOption.getOrElse("und")
      val tokens = words.map(w =>
        (w.codePointCount(0, w.length) + 3) / 4).map(_.toLong).sum
      (hits, best, tokens)
    }
    val got = docs.toDF("id", "text").select(
      col("id"),
      struct(langs.map(l =>
        TextAnalysis.stopwordHits(col("text"), l).as(l)): _*).as("hits"),
      TextAnalysis.languageId(col("text")).as("lang"),
      TextAnalysis.approxTokenCount(col("text")).as("tokens"))
      .collect().map(r => r.getLong(0) ->
        ((r.getStruct(1), r.getString(2), r.getLong(3)))).toMap
    docs.foreach { case (id, text) =>
      val (hits, lang, tokens) = ref(text)
      val (gh, gl, gt) = got(id)
      langs.zipWithIndex.foreach { case (l, i) =>
        assert(gh.getInt(i) == hits(l), s"doc $id ${l}_hits: '$text'")
      }
      assert(gl == lang, s"doc $id lang: got $gl want $lang for '$text'")
      assert(gt == tokens, s"doc $id tokens: got $gt want $tokens for '$text'")
    }
  }

  test("CJK: unsegmented zh text is language-identified, token-counted, and winnowable") {
    import graft.operators.Dedup
    // unsegmented: no spaces anywhere in the zh run
    val zh = "我的书是好的了在我有和不是了的好书"
    val en = "the cat sat of the mat and the dog is that"
    val mixed = s"intro $zh outro"
    val df = Seq((1L, zh), (2L, en), (3L, mixed)).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextAnalysis.languageId(col("text")).as("lang"),
        TextAnalysis.approxTokenCount(col("text")).as("tokens"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L)._1 == "zh", s"unsegmented zh must identify as zh: ${got(1L)}")
    assert(got(2L)._1 == "en")
    // every CJK char is ~1 token: 17 chars → 17 tokens
    assert(got(1L)._2 == zh.length.toLong, s"1 token/char for CJK: ${got(1L)}")
    // normText segments each codepoint, ASCII untouched
    val nt = df.where(col("doc_id") === 3L)
      .select(Dedup.normText(col("text"))).head().getString(0)
    assert(nt == "intro " + zh.map(c => s"$c").mkString(" ") + " outro", nt)
    // winnow catches a zh quote: 8 shared chars = w + k - 1 words
    val corpus = Seq((1L, s"prefix words here $zh"), (2L, zh.take(8)))
      .toDF("doc_id", "text")
    val pairs = TextAnalysis.sharedChunkPairs(corpus, "text", "doc_id")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)), s"zh quote must share a fingerprint: ${pairs.toSeq}")
  }

  test("diagnostics are exact on a constructed document") {
    // 50 words of length 4 + 'the the' → 52 words
    val doc = (0 until 50).map(_ => "abcd").mkString(" ") + " the the"
    val r = TextAnalysis.gopherRules(Seq((1L, doc)).toDF("doc_id", "text"), "text")
      .select("n_words", "mean_word_len", "stopword_hits", "passes").head()
    assert(r.getInt(0) == 52)
    assert(math.abs(r.getDouble(1) - (50 * 4 + 2 * 3) / 52.0) < 5e-5)
    assert(r.getInt(2) == 2)
    assert(r.getBoolean(3))
  }

  test("buildVocab: per-doc dedup, minDf, deterministic tie cutoff") {
    val docs = Seq(
      (1L, "apple apple banana cherry"), // apple counts once here
      (2L, "apple banana date"),
      (3L, "apple cherry date"),
      (4L, "elderberry")
    ).toDF("doc_id", "text")
    val v = TextAnalysis.buildVocab(docs, "text", "doc_id", minDf = 2, topK = 3)
      .as[(String, Long)].collect()
    // df: apple 3; banana/cherry/date 2 (tie) -> term-asc cutoff keeps
    // banana, cherry; elderberry (df 1) excluded by minDf
    assert(v.toSeq == Seq(("apple", 3L), ("banana", 2L), ("cherry", 2L)),
      s"got ${v.toSeq}")
  }

  test("scoreLinear: tf weighting, bias, vocab misses score bias, empty text drops") {
    val docs = Seq(
      (1L, "good good bad"),     // 2*0.5 - 0.3 = 0.7
      (2L, "unknown words only"), // all miss -> bias
      (3L, "good"),               // 0.5
      (4L, "")                    // no tokens -> dropped
    ).toDF("doc_id", "text")
    val weights = Seq(("good", 0.5), ("bad", -0.3)).toDF("term", "weight")
    val out = TextAnalysis.scoreLinear(docs, "text", "doc_id", weights,
        bias = 0.1)
      .as[(Long, Double)].collect().toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(math.abs(out(1L) - 0.8) < 1e-9, s"tf-weighted: ${out(1L)}")
    assert(math.abs(out(2L) - 0.1) < 1e-9, s"all-miss scores bias: ${out(2L)}")
    assert(math.abs(out(3L) - 0.6) < 1e-9)
  }

  test("domain blocklist: exact match, dot-suffix match, multi-URL counts") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "read https://bad.example.com/page now"),          // exact
      (2L, "assets at http://cdn7.assets.net/x plus https://ok.org/y"), // suffix + clean
      (3L, "see https://notbad.example.com.evil.io/q"),       // suffix of neither
      (4L, "no urls here at all"),
      (5L, "https://bad.example.com/a and https://bad.example.com/b")
    ).toDF("doc_id", "text")
    val bl = Seq("bad.example.com", "assets.net").toDF("domain")
    val stats = TextAnalysis.domainBlocklistStats(docs, "text", "doc_id", bl)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(stats(1L) == ((1L, 1L)))
    assert(stats(2L) == ((2L, 1L)), s"suffix match: ${stats(2L)}")
    assert(stats(3L) == ((1L, 0L)), "evil.io host must NOT match a mid-domain")
    assert(stats(4L) == ((0L, 0L)), "URL-free doc survives with zeros")
    assert(stats(5L) == ((2L, 2L)), "every instance counted")
    val kept = TextAnalysis.dropBlockedDomains(docs, "text", "doc_id", bl)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L), s"kept: $kept")
  }

  test("corpusReport: integer dataset-card totals per group") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "en", "web", "alpha beta gamma"),
      (2L, "en", "web", "alpha beta gamma"),   // exact dup of 1
      (3L, "en", "web", ""),                   // empty
      (4L, "zh", "web", "delta epsilon")
    ).toDF("doc_id", "lang", "source", "text")
    val rep = TextAnalysis.corpusReport(docs, "text", Seq("lang", "source"))
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    // en/web: 3 docs; tokens: alpha(2)+beta(1)+gamma(2)=5 per doc ×2 + 0;
    // chars 16+16+0; 1 dup (two identical fps + the empty fp distinct)
    assert(rep(("en", "web")) == ((3L, 10L, 32L, 1L, 1L)), rep(("en", "web")).toString)
    assert(rep(("zh", "web")) == ((1L, 4L, 13L, 0L, 0L)), rep(("zh", "web")).toString)
  }

  test("lmCoverage: exact integer stats on a constructed corpus") {
    import org.apache.spark.sql.functions.col
    // reference: "a b" ×3 (docs 1,2 + doc 1 again), "b c" ×2 → LM keeps both
    // at minCount=2; "c d" appears once → dropped
    val ref = Seq(
      (1L, "a b c d"),     // grams: a b, b c, c d
      (2L, "a b a b"),     // grams: a b, b a, a b
      (3L, "b c x y")      // grams: b c, c x, x y
    ).toDF("doc_id", "text")
    val lm = TextAnalysis.buildNgramLm(ref, "text", n = 2, minCount = 2)
    val lmMap = lm.as[(String, Long)].collect().toMap
    assert(lmMap == Map("a b" -> 3L, "b c" -> 2L), s"lm: $lmMap")

    val score = Seq(
      (10L, "a b c"),      // grams: "a b"(hit 3), "b c"(hit 2)
      (11L, "q r s"),      // 2 grams, 0 matched
      (12L, "a")           // 0 grams
    ).toDF("doc_id", "text")
    val cov = TextAnalysis.lmCoverage(score, "text", "doc_id", lm)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(cov(10L) == ((2L, 2L, 5L)), s"doc 10: ${cov(10L)}")
    assert(cov(11L) == ((2L, 0L, 0L)), s"doc 11: ${cov(11L)}")
    assert(cov(12L) == ((0L, 0L, 0L)), s"doc 12: ${cov(12L)}")

    // threshold: need ≥ 1/2 of grams matched; zero-gram doc kept by default
    val kept = TextAnalysis.filterByLmCoverage(
        score, "text", "doc_id", lm, minNum = 1, minDen = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(10L, 12L), s"kept: $kept")
    val keptStrict = TextAnalysis.filterByLmCoverage(
        score, "text", "doc_id", lm, minNum = 1, minDen = 2, keepEmpty = false)
      .select("doc_id").as[Long].collect().toSet
    assert(keptStrict == Set(10L), s"keptStrict: $keptStrict")
  }

  test("lmCoverage: occurrence weighting counts repeated grams per occurrence") {
    import org.apache.spark.sql.functions.col
    val ref = Seq((1L, "x y x y"), (2L, "x y z")).toDF("doc_id", "text")
    val lm = TextAnalysis.buildNgramLm(ref, "text", n = 2, minCount = 2)
    // "x y" count 3 (twice in doc 1, once in doc 2); others < 2 dropped
    val cov = TextAnalysis.lmCoverage(
        Seq((5L, "x y x y x")).toDF("doc_id", "text"), "text", "doc_id", lm)
      .as[(Long, Long, Long, Long)].collect().head
    // grams: "x y","y x","x y","y x" → 4 total, "x y" matched twice, 3+3 hits
    assert(cov == ((5L, 4L, 2L, 6L)), s"cov: $cov")
  }

  test("chunkDocuments: coverage, overlap, tail rule, empty docs") {
    import org.apache.spark.sql.functions.col
    val toks = (1 to 25).map(i => s"t$i")
    val docs = Seq((1L, toks.mkString(" ")), (2L, "a b"), (3L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(docs, "text", "doc_id",
        chunkTokens = 10, overlapTokens = 3)
      .as[(Long, Int, String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

    // doc 1: starts 0,7,14,21 (21 < 25-3) → 4 chunks; last has 4 tokens
    val c1 = got(1L)
    assert(c1.map(_._2).toSeq == Seq(0, 1, 2, 3))
    assert(c1.map(_._4).toSeq == Seq(10, 10, 10, 4))
    // consecutive chunks share exactly `overlap` tokens (except tail len)
    val w0 = c1(0)._3.split(" "); val w1 = c1(1)._3.split(" ")
    assert(w0.takeRight(3).sameElements(w1.take(3)))
    // full coverage in order: stitching non-overlap suffixes rebuilds the doc
    val rebuilt = c1(0)._3.split(" ") ++
      c1.drop(1).flatMap(_._3.split(" ").drop(3))
    assert(rebuilt.toSeq == toks)
    // short doc: single chunk, whole text
    assert(got(2L).toSeq == Seq((2L, 0, "a b", 2)))
    // empty doc: no chunks
    assert(!got.contains(3L))
  }
}
