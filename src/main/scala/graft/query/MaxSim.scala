package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.types.Metric

/** ColBERT-style multi-vector late interaction (Khattab & Zaharia 2020,
  * arXiv:2004.12832; PLAID/ColBERTv2 serve it two-stage): every document
  * carries an ARRAY of token vectors, a query is an array of token
  * vectors, and relevance is MaxSim —
  *
  *   score(q, d) = Σ_{i ∈ q} max_{j ∈ d} ⟨q_i, d_j⟩
  *
  * — the retrieval shape training-data pipelines increasingly use where
  * single-vector cosine is too coarse (per-token evidence, partial
  * matches). The production pattern this module implements is the
  * two-stage one: a CHEAP single-vector candidate pool (the existing ANN
  * path — pooled embedding, IVF/brute top-N) followed by exact MaxSim
  * rescoring of candidates only.
  *
  * 100 TB shape: the scoring is one row-local projection AFTER the
  * candidate join — nested codegen'd higher-order functions, so the
  * |q|×|d| token interaction never becomes an explode-join of token
  * pairs (a q-tokens × d-tokens Generate+Join would shuffle |corpus| ×
  * |q|×|d| rows; this plan shuffles nothing beyond the candidate
  * retrieval itself). The per-row cost is |q|·|d|·dim multiplies — the
  * same arithmetic ColBERT's own GPU kernel does per candidate.
  */
object MaxSim {

  /** Σ over query tokens of the max dot product against the document's
    * tokens — row-local, codegen'd (nested HOFs, no UDF). Both sides are
    * arrays of equal-dim numeric arrays; accumulation is double,
    * sequentially in array order (seeded at 0.0), so results verify
    * bit-exact against DuckDB's `list_reduce(..., (a,b) -> a+b)` fold.
    * An empty document-token array scores -inf per query token; callers
    * filter empty docs upstream if they carry them.
    */
  def maxSimCol(qTokens: Column, dTokens: Column): Column =
    aggregate(qTokens, lit(0.0), (acc, qt) =>
      acc + array_max(transform(dTokens, dt =>
        aggregate(zip_with(qt, dt, (a, b) => a * b), lit(0.0),
          (s, x) => s + x))))

  /** Split one pooled vector into `nTokens` contiguous `tokDim`-wide
    * token vectors (double) — the deterministic multi-vector frame the
    * oracle row derives from the embeddings fixture; real corpora load
    * token vectors directly as `array<array<float>>`.
    */
  def splitTokensCol(vec: Column, nTokens: Int, tokDim: Int): Column =
    transform(sequence(lit(0), lit(nTokens - 1)), t =>
      transform(slice(vec, t * tokDim + 1, lit(tokDim)),
        x => x.cast("double")))

  /** Two-stage MaxSim retrieval: single-vector candidate pool (top
    * `candidates` by `metric` on `vecCol` — brute scan here; swap any
    * ANN candidate source with the same (id, vec, tokens) columns), then
    * exact MaxSim rerank of the pool down to top `k`.
    *
    * @param df        corpus with a pooled vector column and a token
    *                  column (`array<array<float|double>>`)
    * @param queryVec  pooled query vector (candidate stage)
    * @param queryToks query token vectors (rerank stage), as a Column
    *                  (typically `typedlit(...)` or derived from a
    *                  1-row broadcast frame)
    */
  def rerank(df: DataFrame, idCol: String, vecCol: String, tokCol: String,
      queryVec: Column, queryToks: Column, k: Int, candidates: Int,
      metric: Metric = Metric.Dot): DataFrame = {
    require(candidates >= k, s"candidate pool $candidates < k $k")
    val pool = df
      .withColumn("_cand_score", metric.score(col(vecCol), queryVec))
      .orderBy(metric.sort(col("_cand_score")), col(idCol).asc)
      .limit(candidates)
    pool
      .select(col(idCol), maxSimCol(queryToks, col(tokCol)).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
