package graft.lexical

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 lexical search as plain aggregation/join pipelines (vecgo
  * `lexical/bm25/bm25.go`).
  *
  * Semantics preserved from the reference:
  *  - tokenizer = lowercase + whitespace split, empty tokens dropped
  *    (`bm25.go:92-178`)
  *  - k1 = 1.2, b = 0.75 (`bm25.go:13-16`)
  *  - idf = ln(1 + (N - df + 0.5) / (df + 0.5)) (`bm25.go:383-387`)
  *  - score = Σ_terms idf * tf·(k1+1) / (tf + k1·(1 - b + b·len/avgLen))
  *    (`bm25.go:282-381` DAAT scoring)
  *
  * Spark shape: the inverted index is a pair of derived DataFrames —
  * postings (term, id, tf) and doc lengths (id, dlen) — over the LIVE
  * corpus, plus two scalars (doc count, average doc length). A query
  * filters the postings with its own tiny term set as an IN predicate
  * (pushed down to the term-sorted parquet scan — the DAAT analog: only
  * the query terms' posting ranges are read) and derives per-term
  * document frequencies from those same hit rows with a window count —
  * ONE postings pass per query, and df needs no separate maintained
  * table, which is what lets the index resolve incrementally from
  * per-segment deltas + tombstones (vecgo maintains its inverted index
  * incrementally on every insert/delete, `bm25.go:180-278`
  * `Add`/`Delete`; here segment postings are immutable deltas and deletes
  * are the store's tombstone anti-join, so df/avgdl/N follow the live
  * row set automatically).
  */
object BM25 {

  val K1 = 1.2
  val B = 0.75

  /** Lowercase-whitespace tokenizer (vecgo `bm25.go:92-178`). */
  def tokenize(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Tokenize a query string driver-side with identical semantics —
    * Locale.ROOT lowercasing to match Spark's locale-insensitive
    * `lower()` (default-locale toLowerCase diverges under e.g. tr-TR:
    * 'I' → dotless 'ı' would miss the postings the engine built).
    */
  def tokenizeQuery(text: String): Seq[String] =
    text.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty).distinct.toSeq

  /** The inverted index over the live corpus: postings(term, id, tf) and
    * docLen(id, dlen) frames plus corpus constants. Per-term document
    * frequencies are derived at query time from the query's own hit rows
    * (see [[search]]) — they are NOT a third maintained table, so any
    * union/anti-join composition of immutable segment deltas is already
    * a complete index.
    */
  final case class Index(
      postings: DataFrame,
      docLen: DataFrame,
      numDocs: Long,
      avgDocLen: Double)

  /** Tokenized postings + doc lengths of one (id, text) frame, lazily —
    * the per-segment delta build (one explode + two map-side-combinable
    * aggregations over ONLY this frame's rows). Docs with zero tokens
    * produce no rows on either side, matching [[build]] and the oracle.
    */
  def buildFrames(docs: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    val toks = docs
      .select(col(idCol).as("id"), explode(tokenize(col(textCol))).as("term"))
    val postings = toks.groupBy("term", "id")
      .agg(count(lit(1)).cast("double").as("tf"))
    val docLen = toks.groupBy("id")
      .agg(count(lit(1)).cast("double").as("dlen"))
    (postings, docLen)
  }

  /** Build a complete in-memory index from a (id, text) corpus (the
    * whole-corpus path: read-only engines and the operator-level
    * queries). One eager stats aggregation; everything else lazy.
    */
  def build(docs: DataFrame, idCol: String, textCol: String): Index = {
    val (postings, docLen) = buildFrames(docs, idCol, textCol)
    val stats = docLen.agg(
      count(lit(1)).cast("long").as("n"), avg(col("dlen")).as("avgdl"))
      .collect()(0)
    Index(postings, docLen, stats.getLong(0),
      if (stats.isNullAt(1)) 0.0 else stats.getDouble(1))
  }

  /** idf column for a df (document frequency) column. */
  def idf(df: Column, n: Long): Column =
    log(lit(1.0) + (lit(n.toDouble) - df + lit(0.5)) / (df + lit(0.5)))

  /** Per-(term, doc) BM25 contribution. */
  def termScore(tf: Column, dlen: Column, dfCol: Column, n: Long, avgdl: Double): Column =
    idf(dfCol, n) *
      (tf * lit(K1 + 1.0)) /
      (tf + lit(K1) * (lit(1.0 - B) + lit(B) * dlen / lit(avgdl)))

  /** Top-k BM25 search. The query's term set becomes an `IN` PREDICATE
    * on the postings scan — not a broadcast join — so it pushes down to
    * the parquet reader (`PushedFilters: In(term, …)`): with the
    * persisted per-segment postings SORTED by term (see
    * `GraftDB.segLexDelta`), row-group min/max stats plus the term bloom
    * filter skip everything but the query terms' posting ranges. That is
    * the 100 TB shape: query cost scales with the matched postings, not
    * the corpus's postings. Per-term document frequencies come from a
    * window count over the hit rows (df is a corpus statistic, so it is
    * computed BEFORE any filter), then scoring aggregates per doc id
    * (partial aggregation does the per-partition heavy lifting).
    *
    * `allowedIds` (one id column) restricts scoring to those documents via
    * a left-semi join AFTER the df window and BEFORE aggregation — the
    * lexical half of a filtered hybrid search. Postings for other docs
    * are dropped at the join, so the filter narrows work instead of
    * adding a post-pass.
    */
  def search(index: Index, query: String, k: Int,
      allowedIds: Option[DataFrame] = None): DataFrame = {
    val spark = index.postings.sparkSession
    import spark.implicits._
    val hits = index.postings
      .where(col("term").isInCollection(tokenizeQuery(query)))
      .withColumn("df",
        count(lit(1)).over(Window.partitionBy("term")).cast("double"))
    allowedIds.fold(hits)(ids => hits.join(
        ids.select(col(ids.columns.head).as("id")), Seq("id"), "left_semi"))
      .join(index.docLen, "id")
      .groupBy(col("id"))
      .agg(sum(
        termScore(col("tf"), col("dlen"), col("df"), index.numDocs, index.avgDocLen))
        .as("score"))
      .orderBy(round(col("score"), 6).desc, col("id").asc)
      .limit(k)
  }
}
