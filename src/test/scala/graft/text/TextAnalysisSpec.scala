package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("token counts: whitespace vs regex tokens") {
    val df = Seq((1L, "Hello, world! x2 42abc")).toDF("id", "text")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")).as("ws"),
      TextAnalysis.regexTokenCount(col("text")).as("re")).collect()(0)
    assert(r.getAs[Int]("ws") == 4)
    // Hello , world ! x 2 42 abc → 8
    assert(r.getAs[Int]("re") == 8)
  }

  test("langId picks the marker-dominant language; unknown when none") {
    val df = Seq(
      (1L, "the cat is on a mat and the dog is in the house"),
      (2L, "der hund ist ein tier und die katze"),
      (3L, "qwerty zxcvb asdfgh")).toDF("id", "text")
    val got = df.select(col("id"),
        TextAnalysis.langId(TextAnalysis.wsTokens(col("text"))).as("lang"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "unknown")
  }

  test("fingerprint is whitespace/case-canonical; rolling hash is order-sensitive") {
    val df = Seq(
      (1L, "Alpha  Beta\tGamma"),
      (2L, "alpha beta gamma"),
      (3L, "gamma beta alpha")).toDF("id", "text")
    val fps = df.select(col("id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .as[(Long, String)].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(2L) != fps(3L))
    val rhs = df.select(col("id"),
        TextAnalysis.rollingHash(TextAnalysis.wsTokens(col("text"))).as("rh"))
      .as[(Long, Long)].collect().toMap
    assert(rhs(1L) == rhs(2L))
    assert(rhs(2L) != rhs(3L), "reordered tokens must change the rolling hash")
  }

  test("ngrams: in-order, non-distinct, empty for short docs") {
    val df = Seq((1L, "a b a b c"), (2L, "one two")).toDF("id", "text")
    val got = df.select(col("id"),
        TextAnalysis.ngrams(TextAnalysis.wsTokens(col("text")), 3).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq("a b a", "b a b", "a b c"))
    assert(got(2L).isEmpty, "docs shorter than n yield NO grams (not a descending sequence)")
  }

  test("scrub masks emails/urls/phones and counts them") {
    val df = Seq(
      (1L, "reach me at jane.doe+spam@mail.example.org or bob@x.io thanks"),
      (2L, "docs at https://example.com/a/b_c and http://foo.org/x"),
      (3L, "call +1-555-0199 or +44-555-0200"),
      (4L, "clean text with no contact info at all")).toDF("id", "text")
    val got = df.select(col("id"),
        Scrub.count(col("text"), Scrub.EmailRe).as("ne"),
        Scrub.count(col("text"), Scrub.UrlRe).as("nu"),
        Scrub.count(col("text"), Scrub.PhoneRe).as("np"),
        Scrub.scrub(col("text")).as("s"))
      .as[(Long, Int, Int, Int, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 2 && got(1L)._5 ==
      "reach me at <EMAIL> or <EMAIL> thanks")
    assert(got(2L)._3 == 2 && got(2L)._5 == "docs at <URL> and <URL>")
    assert(got(3L)._4 == 2 && got(3L)._5 == "call <PHONE> or <PHONE>")
    assert(got(4L) == ((4L, 0, 0, 0, "clean text with no contact info at all")))
  }

  test("quality score is bounded and favors clean stopword-rich text") {
    val df = Seq(
      (1L, "the quick brown fox is in the garden and it is a fine day today"),
      (2L, "@@## !! ~~ ^^ && || %%")).toDF("id", "text")
    val q = df.select(col("id"),
        TextAnalysis.qualityScore(col("text")).as("q"))
      .as[(Long, Double)].collect().toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(1L) > q(2L))
  }

  test("unigram LM nll: exact on a hand-computed corpus, rare tokens score worse") {
    // corpus = all docs: tokens a,a,a,b,a,b ⇒ N=6, c(a)=4, c(b)=2
    val df = Seq((1L, "a a a"), (2L, "b"), (3L, "a b"), (4L, "  ")).toDF("id", "text")
    val got = UnigramLM.scoreNll(df, "id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    val ln6 = math.log(6.0); val ln4 = math.log(4.0); val ln2 = math.log(2.0)
    assert(got(1L) == ((1L, 3L, r6(ln6 - ln4))))             // all common tokens
    assert(got(2L) == ((2L, 1L, r6(ln6 - ln2))))             // rarest-only doc
    assert(got(3L) == ((3L, 2L, r6(ln6 - (ln4 + ln2) / 2)))) // mixed
    assert(!got.contains(4L))                                // empty doc absent
    assert(got(2L)._3 > got(3L)._3 && got(3L)._3 > got(1L)._3)
  }

  test("bigram LM nll: exact hand-computed add-1 smoothing, order sensitivity") {
    // corpus bigrams: doc1 "a b a b" → (a,b),(b,a),(a,b); doc2 "b a" →
    // (b,a); doc3 "a" → none (excluded). V = {a,b} = 2.
    // c2(a,b)=2, c2(b,a)=2; c1(a)=2, c1(b)=2 ⇒ every p̂ = (2+1)/(2+2)
    val df = Seq((1L, "a b a b"), (2L, "b a"), (3L, "a")).toDF("id", "text")
    val got = BigramLM.scoreNll(df, "id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    val nll = r6(-math.log(3.0 / 4.0))
    assert(got(1L) == ((1L, 3L, nll)))
    assert(got(2L) == ((2L, 1L, nll)))
    assert(!got.contains(3L)) // single-token doc has no bigrams
    // order sensitivity: same unigrams, scrambled order → worse bigram nll
    val corpus = Seq((1L, "the cat sat on the mat"),
      (2L, "the dog sat on the mat"),
      (3L, "mat the on sat cat the")).toDF("id", "text")
    val s = BigramLM.scoreNll(corpus, "id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(s(3L) > s(1L), s"scrambled ${s(3L)} should beat natural ${s(1L)}")
  }

  test("normalizeText: pinned order — Cc/Cf to space, accent fold, lower, " +
      "collapse") {
    val df = Seq(
      (1L, "\tCafé  ​RÉSUMÉ\r\nnaïve"),
      (2L, "plain  text"),
      (3L, "ÀÉÎ çñÿ­ end"),
      (4L, " \t\r\n​ "),
      (5L, "Ÿ ÿ")).toDF("id", "text")
    val got = df.select(col("id"),
        TextAnalysis.normalizeText(col("text")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "cafe resume naive")
    assert(got(2L) === "plain text")
    // soft hyphen (Cf) becomes a space BEFORE collapse → word split holds
    assert(got(3L) === "aei cny end")
    assert(got(4L) === "") // all-control doc trims to empty
    // case symmetry: Ÿ (U+0178) folds like ÿ — translate runs BEFORE
    // lower(), so a missing uppercase entry would leave "Ÿ" → "ÿ" while
    // "ÿ" → "y", splitting case variants of the same word (round-8 ADVICE)
    assert(got(5L) === "y y")
    // the two map halves stay aligned (drift here silently mis-folds)
    assert(TextAnalysis.AccentFrom.length === TextAnalysis.AccentTo.length)
  }
}
