package graft.lexical

import org.apache.spark.sql.{Column, DataFrame}
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
  * Spark shape: the inverted index is a set of derived DataFrames
  * (postings / doc lengths / term document-frequencies), rebuilt per
  * snapshot and joinable at scale — postings are partitioned by term, so a
  * query touches only its own terms' postings (the DAAT analog). The big
  * side (postings) is joined against a broadcast of the tiny query-term
  * set, so no full shuffle of the corpus happens at query time.
  */
object BM25 {

  val K1 = 1.2
  val B = 0.75

  /** Lowercase-whitespace tokenizer (vecgo `bm25.go:92-178`). */
  def tokenize(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Tokenize a query string driver-side with identical semantics. */
  def tokenizeQuery(text: String): Seq[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.toSeq

  /** The inverted index as derived DataFrames (SURVEY.md §1.1 "Lexical
    * index" row): postings(term, id, tf), docLen(id, dlen),
    * termDf(term, df), plus corpus constants.
    */
  final case class Index(
      postings: DataFrame,
      docLen: DataFrame,
      termDf: DataFrame,
      numDocs: Long,
      avgDocLen: Double)

  /** Build the index from a (id, text) corpus. One explode + three
    * aggregations; all map-side-combinable.
    */
  def build(docs: DataFrame, idCol: String, textCol: String): Index = {
    val toks = docs
      .select(col(idCol).as("id"), explode(tokenize(col(textCol))).as("term"))
    val postings = toks.groupBy("term", "id")
      .agg(count(lit(1)).cast("double").as("tf"))
    val docLen = toks.groupBy("id")
      .agg(count(lit(1)).cast("double").as("dlen"))
    val termDf = postings.groupBy("term")
      .agg(count(lit(1)).cast("double").as("df"))
    val stats = docLen.agg(
      count(lit(1)).cast("long").as("n"), avg(col("dlen")).as("avgdl"))
      .collect()(0)
    Index(postings, docLen, termDf, stats.getLong(0), stats.getDouble(1))
  }

  /** idf column for a df (document frequency) column. */
  def idf(df: Column, n: Long): Column =
    log(lit(1.0) + (lit(n.toDouble) - df + lit(0.5)) / (df + lit(0.5)))

  /** Per-(term, doc) BM25 contribution. */
  def termScore(tf: Column, dlen: Column, dfCol: Column, n: Long, avgdl: Double): Column =
    idf(dfCol, n) *
      (tf * lit(K1 + 1.0)) /
      (tf + lit(K1) * (lit(1.0 - B) + lit(B) * dlen / lit(avgdl)))

  /** Top-k BM25 search. The query-term frame is broadcast into the
    * postings join; scoring aggregates per doc id (partial aggregation
    * does the per-partition heavy lifting).
    *
    * `allowedIds` (one id column) restricts scoring to those documents via
    * a left-semi join BEFORE aggregation — the lexical half of a filtered
    * hybrid search. Postings for other docs are dropped at the join, so
    * the filter narrows work instead of adding a post-pass.
    */
  def search(index: Index, query: String, k: Int,
      allowedIds: Option[DataFrame] = None): DataFrame = {
    val spark = index.postings.sparkSession
    import spark.implicits._
    val qterms = tokenizeQuery(query).toDF("term")
    val hits = index.postings.join(broadcast(qterms), "term")
    allowedIds.fold(hits)(ids => hits.join(
        ids.select(col(ids.columns.head).as("id")), Seq("id"), "left_semi"))
      .join(broadcast(index.termDf.join(broadcast(qterms), "term")), "term")
      .join(index.docLen, "id")
      .groupBy(col("id"))
      .agg(sum(
        termScore(col("tf"), col("dlen"), col("df"), index.numDocs, index.avgDocLen))
        .as("score"))
      .orderBy(round(col("score"), 6).desc, col("id").asc)
      .limit(k)
  }
}
