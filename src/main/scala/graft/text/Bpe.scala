package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich, Haddow & Birch 2016,
  * arXiv:1508.07909) — the real learned-subword step behind the cheap
  * regex proxy in [[TextAnalysis.regexTokenCount]]. Two halves, split the
  * way every learned-model operator in this repo is split
  * ([[QualityClassifier]], [[Features.trainIdf]], [[graft.pipeline.Dsir]]):
  *
  *  - '''train''' — distributed where the data is big, driver-side where
  *    the state is small: ONE token-keyed word-count shuffle over the
  *    corpus, a bounded top-`maxWords` collect (classic BPE learns from
  *    the word-frequency table, so the merge loop's cost scales with the
  *    VOCABULARY, not the corpus — at 100 TB the word table is the only
  *    thing that leaves the cluster, and it is capped loudly), then the
  *    standard greedy merge loop over (word, count) on the driver.
  *  - '''encode''' — a FROZEN [[BpeModel]] applied as a pure Column
  *    expression: zero shuffle, zero state, append-mode streaming safe,
  *    and reproducible in DuckDB SQL, so the whole encoding path is
  *    oracle-checkable.
  *
  * ==Merge-application semantics (pinned)==
  * A word is spaced into code-point symbols with the end-of-word marker
  * fused onto the final symbol (`"low"` → `"l o w</w>"`, exactly
  * Sennrich's `word[:-1] + [word[-1]+'</w>']`). Applying merge (A, B) is
  * a LITERAL string replace of `" A B "` with `" AB "` — symbols never
  * contain whitespace, so the space-bounded pattern can only match whole
  * symbols. Java's `String.replace`, Spark's `StringReplace` and DuckDB's
  * `replace` all share the same contract — non-overlapping occurrences,
  * left to right, scan resuming AFTER the replacement — which makes the
  * three engines byte-identical by construction. The one place this
  * deviates from subword-nmt's regex loop is self-adjacent runs (symbols
  * `[a,b,a,b]` merge to `[ab,a,b]` here, `[ab,ab]` there) because two
  * adjacent matches share one boundary space; [[learnMerges]] applies the
  * SAME rule during training, so the model is internally consistent —
  * encoding always reproduces the training-time symbol states.
  */
object Bpe {

  /** End-of-word marker, fused onto each word's final code point. */
  val EndOfWord = "</w>"

  /** Frozen trained model: merges in learned rank order. Symbols never
    * contain whitespace (tokens are whitespace-split), which is what
    * makes the space-bounded replace sound — enforced here.
    */
  final case class BpeModel(merges: Seq[(String, String)]) {
    require(merges.forall { case (a, b) =>
      a.nonEmpty && b.nonEmpty &&
        !a.exists(_.isWhitespace) && !b.exists(_.isWhitespace) },
      "BPE merge symbols must be non-empty and whitespace-free")
  }

  // ----------------------------------------------------------- training

  /** Distributed word-frequency table: one explode + one word-keyed
    * partial-aggregated shuffle (the only corpus-sized work in training).
    * Lowercased whitespace tokens — the same tokenizer as
    * [[TextAnalysis.wsTokens]] / lexical.BM25, so BPE token counts are
    * comparable with the rest of the pipeline's token accounting.
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.wsTokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Distributed adjacent-pair counts over the corpus word table — the
    * counting half of one training iteration as a standalone relational
    * operator (what a fully-distributed BPE trainer would run per merge;
    * also the cross-engine oracle surface for the counting arithmetic).
    * One word-count shuffle + one per-word explode of adjacent symbol
    * pairs + one pair-keyed aggregate. Output: (left, right, cnt).
    */
  def pairCounts(df: DataFrame, textCol: String): DataFrame = {
    val syms = symbolsCol(col("word"))
    wordCounts(df, textCol)
      .select(col("cnt"), syms.as("_s"))
      .where(size(col("_s")) >= 2)
      .select(col("cnt"), explode(
        zip_with(slice(col("_s"), lit(1), size(col("_s")) - 1),
          slice(col("_s"), lit(2), size(col("_s")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .groupBy(col("p.l").as("left"), col("p.r").as("right"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Code-point symbols of a word with [[EndOfWord]] fused onto the last
    * one, as a Column (`"low"` → `["l","o","w</w>"]`). Code points are
    * isolated by the same `"(?s)(.)" → "$1 "` spacing [[encodeText]]
    * uses — words are whitespace-split, so a space delimiter can never
    * collide. DOTALL is load-bearing: Java's plain `.` skips the line
    * terminators U+0085/U+2028/U+2029, which `\s+` does NOT split
    * either, so without `(?s)` a word like `"ab"` would keep the
    * terminator glued to its neighbor here while [[symbolsOf]] /
    * `BpeRuntime` (code-point loops) isolate it — breaking the
    * byte-identical encodeText ↔ encodeTextNative contract. RE2 (the
    * DuckDB oracle) honors the same `(?s)` flag.
    */
  private def symbolsCol(word: Column): Column = {
    val chars = filter(split(regexp_replace(word, "(?s)(.)", "$1 "), " "),
      c => length(c) > 0)
    val n = size(chars)
    transform(chars, (c, i) =>
      when(i === n - 1, concat(c, lit(EndOfWord))).otherwise(c))
  }

  /** Trains a BPE model: distributed word counts → bounded
    * top-(`maxWords`) collect (count desc, word asc — deterministic) →
    * driver merge loop. Training stops early when no pair reaches
    * `minPairCount`. The collect is the loud cap: at 100 TB raise
    * `maxWords`, never remove the limit.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 65536, minPairCount: Long = 2L): BpeModel = {
    require(numMerges > 0 && maxWords > 0,
      s"train: numMerges $numMerges / maxWords $maxWords")
    val top = wordCounts(df, textCol)
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    BpeModel(learnMerges(top, numMerges, minPairCount))
  }

  /** Code-point symbols of `word` (driver-side twin of [[symbolsCol]]). */
  private[text] def symbolsOf(word: String): Array[String] = {
    val cps = word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)))
    cps(cps.length - 1) += EndOfWord
    cps
  }

  /** Driver-side greedy merge loop over the word-frequency table
    * (Sennrich's learn_bpe). Each iteration counts adjacent pairs
    * weighted by word count, picks the most frequent — ties break to the
    * lexicographically smallest (left, right), so training is
    * deterministic — and applies the merge to every word under the
    * pinned string-replace semantics (see class doc: after a match at
    * symbols (i, i+1) the next match starts at i+3, because adjacent
    * matches would share one boundary space).
    */
  private[text] def learnMerges(wordTable: Seq[(String, Long)],
      numMerges: Int, minPairCount: Long): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] =
      wordTable.iterator.filter(_._1.nonEmpty)
        .map { case (w, c) => (symbolsOf(w), c) }.toArray
    val out = Seq.newBuilder[(String, String)]
    var k = 0
    var done = words.isEmpty
    while (k < numMerges && !done) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (s, c) =>
        var i = 0
        while (i < s.length - 1) {
          val key = (s(i), s(i + 1))
          pc.update(key, pc.getOrElse(key, 0L) + c)
          i += 1
        }
      }
      if (pc.isEmpty) done = true
      else {
        val best = pc.iterator.minBy { case ((a, b), c) => (-c, a, b) }
        if (best._2 < minPairCount) done = true
        else {
          val (a, b) = best._1
          out += ((a, b))
          words = words.map { case (s, c) => (applyMerge(s, a, b), c) }
          k += 1
        }
      }
    }
    out.result()
  }

  /** One merge over a symbol array under the pinned replace semantics. */
  private[text] def applyMerge(s: Array[String], a: String,
      b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
        out += (a + b)
        // the match consumed the boundary space before symbol i+2, so
        // i+2 can never START the next match — emit it verbatim
        if (i + 2 < s.length) out += s(i + 2)
        i += 3
      } else { out += s(i); i += 1 }
    }
    out.result()
  }

  /** Driver-side reference encode of one word (spec twin of [[encode]]). */
  private[text] def encodeWord(m: BpeModel, word: String): Array[String] = {
    var s = symbolsOf(word)
    m.merges.foreach { case (a, b) => s = applyMerge(s, a, b) }
    s
  }

  // ----------------------------------------------------------- encoding

  /** Space-joined BPE tokens of `text` under a FROZEN model, as a pure
    * Column: lowercased whitespace words are code-point-spaced (EOW fused
    * onto the final symbol), words joined with a DOUBLE space — merge
    * patterns `" A B "` need single-space adjacency, so merges can never
    * cross a word boundary — and the merge list folds into a chain of
    * literal `replace` calls (codegen'd StringReplace, no UDF, no regex
    * engine in the hot loop). NULL for all-whitespace text.
    *
    * Row-local ⇒ zero shuffle, streams in append mode, and fuses into
    * whatever scan the caller already runs. Per-row cost is
    * O(merges × doc length) byte scanning, the same envelope as running
    * a tokenizer's merge table linearly — prefer modest merge lists
    * (10²–10³) in a single expression; beyond that, chunk the fold.
    */
  def encodeText(m: BpeModel, text: Column): Column = {
    val toks = TextAnalysis.wsTokens(text)
    val spaced = transform(toks, t => concat(
      trim(regexp_replace(t, "(?s)(.)", "$1 ")), lit(EndOfWord)))
    val doc0 = concat(lit(" "), array_join(spaced, "  "), lit(" "))
    val folded = m.merges.foldLeft(doc0) { case (c, (a, b)) =>
      replace(c, lit(s" $a $b "), lit(s" $a$b "))
    }
    when(size(toks) > 0,
      regexp_replace(trim(folded), "\\s+", " "))
  }

  /** [[encodeText]] as ONE native codegen'd call
    * ([[graft.functions.BpeEncode]] → [[BpeRuntime]]): byte-identical
    * output, but a single pass per document instead of one full-string
    * scan/copy per merge — the production encode. [[encodeText]] stays
    * as the composed-Column reference the cross-engine SQL oracle
    * mirrors; `BpeSpec` asserts the two agree on real corpora.
    */
  def encodeTextNative(m: BpeModel, text: Column): Column =
    graft.functions.bpe_encode(text,
      m.merges.map { case (a, b) => Array(a, b) }.toArray)

  /** BPE token count of `text` under a frozen model (NULL when empty). */
  def tokenCount(m: BpeModel, text: Column): Column = {
    val enc = encodeTextNative(m, text)
    when(enc.isNotNull, size(split(enc, " ")))
  }

  /** Batch/streaming encoding frame: (idCol, n_bpe bigint, bpe_text).
    * The corpus-scale shape — score everything in one row-local
    * projection (the native single-pass encode); both columns are
    * oracle-checkable byte-for-byte. A narrower-than-parallelism batch
    * scan is round-robin-widened first ([[graft.functions.spread_input]];
    * no-op on streaming frames and at real scan widths) so the encode
    * never runs single-task on a bench-scale single-file table.
    */
  def encode(m: BpeModel, df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    graft.functions.spread_input(df)
      .select(col(idCol), encodeTextNative(m, col(textCol)).as("bpe_text"))
      .where(col("bpe_text").isNotNull)
      .select(col(idCol),
        size(split(col("bpe_text"), " ")).cast("long").as("n_bpe"),
        col("bpe_text"))
}
