package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, language-ID (marker-token heuristic), quality scoring,
  * and document fingerprinting. All column-level (codegen-friendly, no
  * UDFs) and deterministic, so every operator is oracle-checkable.
  */
object TextAnalysis {

  /** Whitespace tokens, empties dropped (same tokenizer as lexical.BM25). */
  def wsTokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(wsTokens(text))

  /** BPE-ish token count: alpha runs, digit runs, and single punctuation
    * marks each count as one token (a cheap, deterministic proxy for
    * subword tokenizer cost estimation).
    */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Explicit 1:1 accent-folding map (both halves of [[normalizeText]]'s
    * `translate` — an EXPLICIT shared table, not a library call, so any
    * engine reproduces it verbatim; DuckDB's `strip_accents` would fold
    * more codepoints under ICU rules Spark has no twin of).
    */
  val AccentFrom: String =
    "áàâäãåéèêëíìîïóòôöõúùûüýÿçñ" + "ÁÀÂÄÃÅÉÈÊËÍÌÎÏÓÒÔÖÕÚÙÛÜÝŸÇÑ"
  val AccentTo: String =
    "aaaaaaeeeeiiiiooooouuuuyycn" + "AAAAAAEEEEIIIIOOOOOUUUUYYCN"

  /** CCNet-style text normalization (the cleanup pass run before dedup /
    * hashing so trivially-different copies collide): control & format
    * characters (Cc/Cf — tabs, CRs, zero-width joiners, BOMs) become
    * spaces, the explicit accent table folds, everything lowercases, and
    * whitespace collapses to single spaces. Order is load-bearing and
    * PINNED: flattening Cc/Cf to spaces FIRST means the later `\s+`
    * collapse only ever sees plain spaces, which neutralizes the
    * Java-vs-RE2 `\s` dialect difference — both engines compute the
    * identical result. Non-ASCII spaces (U+00A0 …) are Zs, not Cc/Cf,
    * and are deliberately left alone (neither engine's `\s` matches
    * them). Pure codegen'd column — zero shuffle, streams in append
    * mode.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      lower(translate(
        regexp_replace(text, "[\\p{Cc}\\p{Cf}]", " "),
        AccentFrom, AccentTo)),
      "\\s+", " "))

  /** Marker-token lists per language for the heuristic language-ID.
    * Deliberately tiny — the operator's value is the distributed shape
    * (set-membership counting per row), not lexicography.
    */
  val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "en" -> Seq("the", "a", "an", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "los", "las", "una", "es", "y"),
    "fr" -> Seq("le", "les", "une", "et", "est", "du"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  /** Fraction of tokens that are markers of `lang`. */
  def markerRatio(toks: Column, lang: String): Column = {
    val m = markers.toMap.apply(lang)
    val hits = size(filter(toks, t => t.isInCollection(m)))
    hits.cast("double") / size(toks).cast("double")
  }

  /** All marker ratios at once, as struct<de,en,es,fr,zh>. Materialize
    * THIS as a column and feed [[langIdFromScores]]: the argmax chain
    * references every score ~6 times, and Catalyst does not CSE the
    * underlying array filters across `when` branches — inlined, each
    * reference re-scans the token array (measured ~30 array scans per
    * row); against a materialized struct each is a field read.
    */
  def langScores(toks: Column): Column =
    struct(markers.map { case (lang, _) =>
      markerRatio(toks, lang).as(lang) }: _*)

  /** Predicted language from a (materialized) [[langScores]] struct:
    * argmax of marker ratios, ties broken alphabetically, 'unknown' when
    * no marker hits at all.
    */
  def langIdFromScores(ls: Column): Column = {
    val scores = markers.map { case (lang, _) => lang -> ls.getField(lang) }
    val top = greatest(scores.map(_._2): _*)
    val cases = scores.foldLeft(when(top === 0.0, lit("unknown"))) {
      case (acc, (lang, sc)) => acc.when(sc === top, lit(lang))
    }
    cases.otherwise(lit("unknown"))
  }

  /** Predicted language straight from tokens — convenience form; prefer
    * materializing [[langScores]] when other outputs share the ratios.
    */
  def langId(toks: Column): Column = langIdFromScores(langScores(toks))

  /** Share of characters outside [A-Za-z0-9 ]. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9 ]", "")).cast("double") /
      length(text).cast("double")

  /** Mean token length. */
  def meanWordLen(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      size(toks).cast("double")

  /** Composite quality score in [0,1]: length, stopword-ness, cleanliness,
    * and word-shape each contribute a bounded share. The exact weights are
    * a policy choice; the operator shape (pure column arithmetic over the
    * corpus) is what scales.
    */
  def qualityScore(text: Column): Column = {
    val toks = wsTokens(text)
    qualityFromParts(size(toks).cast("double"), markerRatio(toks, "en"),
      punctRatio(text), meanWordLen(toks))
  }

  /** [[qualityScore]] over already-materialized ingredients — the form a
    * multi-signal pipeline wants, so tokenization and ratio columns are
    * computed once and shared across outputs.
    */
  def qualityFromParts(nTok: Column, stopRatio: Column, punct: Column,
      mwl: Column): Column = {
    val lenScore = least(lit(1.0), nTok / lit(100.0))
    val stopScore = least(lit(1.0), stopRatio * lit(4.0))
    val cleanScore = lit(1.0) - punct
    val shapeScore = least(lit(1.0), mwl / lit(8.0))
    lenScore * lit(0.3) + stopScore * lit(0.3) +
      cleanScore * lit(0.2) + shapeScore * lit(0.2)
  }

  /** In-order (non-distinct) word n-grams joined with spaces; empty array
    * when the document has fewer than `n` tokens (the guard matters:
    * `sequence(1, size-n+1)` would DESCEND for short docs, not return
    * empty).
    */
  def ngrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array())

  /** Canonical-form fingerprint: md5 of lowercased, whitespace-collapsed,
    * trimmed text. Identical logical content → identical fingerprint.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Polynomial rolling hash of the token stream (base 1000003, 31-bit
    * Mersenne modulus — products stay < 2^52, so no long overflow under
    * ANSI arithmetic) — an order-sensitive document fingerprint: same
    * tokens reordered → different hash, unlike the set-based minhash
    * family.
    */
  def rollingHash(toks: Column): Column = {
    val mod = lit(2147483647L) // 2^31 - 1
    aggregate(toks, lit(0L),
      (acc, t) => pmod(acc * lit(1000003L) + pmod(xxhash64(t), mod), mod))
  }
}

/** Corpus-level unigram language model for perplexity-style quality
  * scoring (the CCNet-family filter: score each document by how "typical"
  * its tokens are of the corpus, drop the tails).
  *
  * Scale shape: one token-keyed counting shuffle builds the LM, one
  * token-keyed equi-join + per-doc aggregation scores against it — both
  * linear, and the count table is exactly the aggregate Spark would
  * broadcast when the (pruned) vocabulary fits. No driver-side model
  * materialization: the corpus total N rides along as a broadcast 1-row
  * cross join.
  */
object UnigramLM {
  import org.apache.spark.sql.DataFrame

  /** Per-document mean negative log-likelihood under the corpus unigram
    * LM: `nll = ln N − avg(ln c(t))` over the doc's token OCCURRENCES
    * (maximum-likelihood estimate; every scored token appears in the LM
    * by construction, so no smoothing term is needed). Lower = more
    * typical; perplexity = e^nll. Output: (id, n_tokens, nll), docs with
    * ≥1 token.
    */
  def scoreNll(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val occ = df.select(col(idCol).as("id"),
      explode(TextAnalysis.wsTokens(col(textCol))).as("t"))
    val counts = occ.groupBy("t").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("n"))
    occ.join(counts, "t")
      .crossJoin(org.apache.spark.sql.functions.broadcast(total))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        round(log(first(col("n")).cast("double"))
          - avg(log(col("c").cast("double"))), 6).as("nll"))
  }
}

/** Corpus bigram language model — the next step up from [[UnigramLM]]
  * toward the 5-gram KenLM CCNet actually runs: a CONDITIONAL model
  * p(t₂|t₁), so word-order anomalies (shuffled text, keyword stuffing,
  * boilerplate splices) score badly even when every individual token is
  * common. Smoothing is add-α (unseen mass exists, unlike the ML unigram
  * case where every scored token is in the model by construction).
  *
  * Scale shape, same family as the unigram scorer: one bigram-keyed
  * counting shuffle builds the LM (context counts fold from it for
  * free), one bigram-keyed equi-join + per-doc aggregation scores — all
  * linear in corpus tokens, broadcastable when the (pruned) vocabulary
  * fits, never pairwise.
  */
object BigramLM {
  import org.apache.spark.sql.DataFrame

  /** Per-document mean negative log-likelihood under the corpus bigram
    * LM with add-α smoothing:
    *
    *   p̂(t₂|t₁) = (c(t₁,t₂) + α) / (c₁(t₁) + α·V)
    *
    * where c(t₁,t₂) is the corpus bigram count, c₁(t₁) the count of t₁
    * as a bigram context (= Σ_t c(t₁,t)), and V the distinct unigram
    * vocabulary size. `nll = −avg ln p̂` over the doc's bigram
    * occurrences; perplexity = e^nll. Output: (id, n_bigrams, nll), one
    * row per doc with ≥ 2 tokens.
    */
  def scoreNll(df: DataFrame, idCol: String, textCol: String,
      alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, s"BigramLM: alpha must be positive ($alpha)")
    val occ = df
      .select(col(idCol).as("id"),
        TextAnalysis.wsTokens(col(textCol)).as("ts"))
      .where(size(col("ts")) >= 2)
      .withColumn("_l", slice(col("ts"), lit(1), size(col("ts")) - 1))
      .withColumn("_r", slice(col("ts"), lit(2), size(col("ts")) - 1))
      .select(col("id"), explode(arrays_zip(col("_l"), col("_r"))).as("bg"))
      .select(col("id"), col("bg._l").as("t1"), col("bg._r").as("t2"))
    // context counts fold from the bigram counts as a t1-keyed WINDOW so
    // the LM table is ONE lineage — a c2.groupBy(t1) branch re-reads the
    // corpus (ReuseExchange defeated, same mechanism as hashedTfIdf's df)
    val lm = occ.groupBy("t1", "t2").agg(count(lit(1)).as("c2"))
      .withColumn("c1", sum(col("c2"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("t1")))
    // V rides along as a broadcast 1-row distinct-count — no driver-side
    // action at plan-construction time, matching UnigramLM's lazy
    // broadcast-scalar pattern for N
    val v = df.select(explode(TextAnalysis.wsTokens(col(textCol))).as("t"))
      .agg(count_distinct(col("t")).cast("double").as("_v"))
    occ.join(lm, Seq("t1", "t2"))
      .crossJoin(org.apache.spark.sql.functions.broadcast(v))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(-avg(log((col("c2").cast("double") + alpha) /
          (col("c1").cast("double") + col("_v") * alpha))), 6).as("nll"))
  }
}
