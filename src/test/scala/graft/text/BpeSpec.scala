package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** BPE training + encoding invariants. Value-level cross-engine equality
  * of the frozen-model encoding is the DuckDB oracle row (`text_bpe_tokens`
  * in Verify); this spec proves (a) the driver merge loop learns the
  * classic merges on Sennrich's own fixture, (b) the pinned
  * string-replace semantics are one single consistent rule across the
  * driver reference, Java's String.replace, and the Spark expression —
  * including the self-adjacent-run edge where we deviate from
  * subword-nmt, and (c) training ⇒ encoding round-trips (encoding a
  * training word reproduces its final training-time symbols).
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Sennrich et al. 2016 fixture: {low:5, lower:2, newest:6, widest:3}
  private val sennrich = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  /** Brute encode via literal Java String.replace over the spaced form —
    * an INDEPENDENT implementation of the pinned semantics (the engines'
    * shared contract), against which the symbol-array loop is checked.
    */
  private def bruteEncode(m: Bpe.BpeModel, word: String): Array[String] = {
    val spaced = " " + word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp))).mkString(" ") +
      Bpe.EndOfWord + " "
    val folded = m.merges.foldLeft(spaced) { case (s, (a, b)) =>
      s.replace(s" $a $b ", s" $a$b ") }
    folded.trim.split("\\s+")
  }

  test("learnMerges: Sennrich fixture learns es → est</w> → lo first") {
    val merges = Bpe.learnMerges(sennrich, numMerges = 5, minPairCount = 2)
    // pair counts round 1: (e,s)=9 ties (s,t</w>)=9 → lexicographic →
    // (e,s); round 2: (es,t</w>)=9; round 3: (est</w>) fused, (l,o)=7
    assert(merges.take(3) ===
      Seq(("e", "s"), ("es", "t</w>"), ("l", "o")))
    assert(merges.size === 5)
  }

  test("training stops when no pair reaches minPairCount") {
    val merges = Bpe.learnMerges(Seq(("ab", 1L), ("cd", 1L)),
      numMerges = 10, minPairCount = 2)
    assert(merges.isEmpty)
    val one = Bpe.learnMerges(Seq(("ab", 3L)), numMerges = 10,
      minPairCount = 2)
    // a b</w> → ab</w>: one merge, then no pairs remain
    assert(one === Seq(("a", "b</w>")))
  }

  test("applyMerge matches Java String.replace semantics on runs and " +
      "interleavings") {
    val words = Seq("aaaa", "aaa", "abab", "ababab", "chacha", "xab",
      "banana", "aa", "a")
    for (w <- words; m <- Seq(Bpe.BpeModel(Seq(("a", "a"))),
        Bpe.BpeModel(Seq(("a", "b"))), Bpe.BpeModel(Seq(("b", "a"))),
        Bpe.BpeModel(Seq(("a", "b"), ("ab", "ab"))))) {
      assert(Bpe.encodeWord(m, w).toSeq === bruteEncode(m, w).toSeq,
        s"word=$w merges=${m.merges}")
    }
    // the documented deviation: [a,b,a,b] → [ab, a, b] (boundary space
    // shared between adjacent matches), NOT subword-nmt's [ab, ab]
    assert(Bpe.encodeWord(Bpe.BpeModel(Seq(("a", "b"))), "abab").toSeq ===
      Seq("ab", "a", "b</w>"))
  }

  test("prefix collision: merge (a,b) never fires inside symbol xa|b") {
    // symbols [x, a, b</w>]: " x a b</w> " contains " a b" only at a
    // true symbol boundary; after merging (a,b</w>) the x survives
    val m = Bpe.BpeModel(Seq(("a", "b</w>")))
    assert(Bpe.encodeWord(m, "xab").toSeq === Seq("x", "ab</w>"))
    // and a FALSE match candidate: merge (a,b) with symbols [xa, b</w>]
    // cannot exist after ("x","a") fused — simulate directly
    val fused = Bpe.applyMerge(Array("xa", "b</w>"), "a", "b</w>")
    assert(fused.toSeq === Seq("xa", "b</w>"))
  }

  test("training ⇒ encoding round-trip on the fixture words") {
    val m = Bpe.BpeModel(Bpe.learnMerges(sennrich, 8, minPairCount = 2))
    // re-running the merge sequence over each training word must land on
    // the same symbols the trainer held at the end (internal consistency)
    var words = sennrich.map { case (w, c) => (Bpe.symbolsOf(w), c) }
    m.merges.foreach { case (a, b) =>
      words = words.map { case (s, c) => (Bpe.applyMerge(s, a, b), c) }
    }
    sennrich.map(_._1).zip(words.map(_._1)).foreach { case (w, syms) =>
      assert(Bpe.encodeWord(m, w).toSeq === syms.toSeq, s"word=$w")
    }
  }

  test("distributed train equals the driver reference; Spark encode " +
      "equals the driver encode (incl. unicode + runs)") {
    val docs = Seq.fill(5)("low low lower newest") ++
      Seq.fill(3)("newest widest aaaa 日本語 abab") ++
      Seq("newest low   \t ") // extra whitespace is dropped by the tokenizer
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    // reference: exact word counts → driver loop
    val wc = docs.flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }
    val ref = Bpe.BpeModel(Bpe.learnMerges(wc, 6, minPairCount = 2))
    val trained = Bpe.train(df, "text", numMerges = 6)
    assert(trained.merges === ref.merges)
    // Spark-side encode vs driver-side encode, word by word
    val out = Bpe.encode(trained, df, "id", "text")
      .orderBy("id").collect()
    docs.zipWithIndex.foreach { case (t, i) =>
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val expect = toks.flatMap(w => Bpe.encodeWord(trained, w))
      val row = out.find(_.getLong(0) == i.toLong).get
      assert(row.getString(2) === expect.mkString(" "), s"doc=$t")
      assert(row.getLong(1) === expect.length.toLong)
    }
  }

  test("encode drops whitespace-only docs; tokenCount column agrees") {
    val df = Seq((1L, "low lower"), (2L, "  \t ")).toDF("id", "text")
    val m = Bpe.BpeModel(Seq(("l", "o"), ("lo", "w</w>")))
    val enc = Bpe.encode(m, df, "id", "text").collect()
    assert(enc.map(_.getLong(0)).toSeq === Seq(1L))
    val cnt = df.select(col("id"), Bpe.tokenCount(m, col("text")).as("n"))
      .orderBy("id").collect()
    assert(cnt(0).getInt(1) === 5) // low → [low</w>]=1? see below
    assert(cnt(1).isNullAt(1))
  }

  test("property: symbol-array merge loop equals literal String.replace " +
      "over random words and learned merges") {
    // small alphabet forces runs, repeats and prefix collisions — the
    // cases where replace semantics can silently diverge
    val rng = new scala.util.Random(42)
    val alpha = "abc"
    def word(): String =
      (0 until (1 + rng.nextInt(10))).map(_ =>
        alpha(rng.nextInt(alpha.length))).mkString
    var trial = 0
    while (trial < 200) {
      val corpus = Seq.fill(6)((word(), 1L + rng.nextInt(5)))
      // LEARN merges from the random corpus (so merged-symbol merges —
      // pairs whose halves are already multi-char — are exercised too)
      val m = Bpe.BpeModel(Bpe.learnMerges(corpus, numMerges = 6,
        minPairCount = 1))
      corpus.map(_._1).distinct.foreach { w =>
        assert(Bpe.encodeWord(m, w).toSeq === bruteEncode(m, w).toSeq,
          s"trial=$trial word=$w merges=${m.merges}")
      }
      trial += 1
    }
  }

  test("native bpe_encode equals the composed Column chain byte-for-byte " +
      "on a real corpus (incl. empty docs and codegen + interpreted)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .union(Seq((100001L, "  \t "), (100002L, "Café NAÏVE café"),
        (100003L, "aaaa abab 日本語")).toDF("doc_id", "text"))
    val m = Bpe.BpeModel(Seq(("e", "r</w>"), ("t", "o"), ("a", "t"),
      ("at", "o"), ("a", "a")))
    val both = docs.select(col("doc_id"),
        Bpe.encodeText(m, col("text")).as("chain"),
        Bpe.encodeTextNative(m, col("text")).as("native"))
      .collect()
    both.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2), s"null split at ${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(r.getString(1) === r.getString(2), s"doc ${r.getLong(0)}")
    }
    assert(both.length > 400)
  }

  test("line terminators U+0085/U+2028/U+2029 inside a word: Column " +
      "chain, native encode, and driver loop all isolate them (DOTALL)") {
    // these code points are NOT split by \s+ on either engine, and Java's
    // plain `.` (unlike RE2's) skips them — without (?s) the Column
    // spacing left "ab" as symbols [a, b</w>] while
    // symbolsOf/BpeRuntime produced [a, , b</w>] (round-8 ADVICE)
    val texts = Seq((1L, "ab"), (2L, "x y z w"),
      (3L, ""), (4L, "lower low"))
    val m = Bpe.BpeModel(Seq(("l", "o"), ("a", "")))
    // driver reference: whitespace-split words → per-word symbol loop
    def driverEncode(t: String): String =
      t.split("\\s+").filter(_.nonEmpty)
        .map(w => Bpe.encodeWord(m, w).mkString(" ")).mkString(" ")
    val rows = texts.toDF("doc_id", "text")
      .select(col("doc_id"),
        Bpe.encodeText(m, lower(col("text"))).as("chain"),
        Bpe.encodeTextNative(m, lower(col("text"))).as("native"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    for (((id, chain, native), (_, raw)) <- rows.zip(texts.sortBy(_._1))) {
      assert(chain === native, s"doc $id: chain vs native")
      assert(chain === driverEncode(raw.toLowerCase), s"doc $id: driver")
    }
    // and the merge across the terminator fires identically everywhere:
    // "ab" → [a, b</w>] once ("a","") merges
    assert(rows(0)._2 === "a b</w>")
  }

  test("pairCounts equals brute adjacent-pair counting") {
    val df = Seq((1L, "low low newest"), (2L, "widest newest"))
      .toDF("id", "text")
    val got = Bpe.pairCounts(df, "text")
      .orderBy(col("cnt").desc, col("left").asc, col("right").asc)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val words = Seq("low", "low", "newest", "widest", "newest")
    val brute = words.map(Bpe.symbolsOf)
      .flatMap(s => s.dropRight(1).zip(s.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case ((a, b), c) => (-c, a, b) }
    assert(got.toSeq === brute)
  }
}
