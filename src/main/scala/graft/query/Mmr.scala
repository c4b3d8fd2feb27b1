package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.vec_dot
import graft.types.Metric

/** Maximal Marginal Relevance (Carbonell & Goldstein 1998, SIGIR) — the
  * standard diversity rerank for retrieval-augmented pipelines: given a
  * relevance-ranked candidate pool, greedily pick
  *
  *   argmax_{i ∉ S} [ λ·rel(i) − (1−λ)·max_{j ∈ S} sim(i, j) ]
  *
  * k times, trading relevance against redundancy with the already-selected
  * set. λ=1 degenerates to plain top-k; λ→0 maximizes spread.
  *
  * 100 TB shape: candidate generation is the existing bounded-heap ANN
  * path ([[Search.topKPerKeyPayload]] — per-partition heaps, the shuffle
  * carries only queries × fetchK structs); the greedy selection itself is
  * ONE row-local fold over the per-query candidate array (O(k²·fetchK)
  * dot products per query, never a pairwise explode-join across the
  * corpus). The selection fold and every dot product accumulate in double,
  * sequentially in array order, so results verify bit-exact against a
  * DuckDB `list_transform`/`list_max`/`list_position` mirror of the same
  * greedy steps.
  *
  * The diversity penalty is inner-product similarity between candidate
  * vectors (cosine when the embeddings are normalized — the common case);
  * relevance is the retrieval metric's score, negated for ascending
  * metrics so "higher = more relevant" holds inside the objective.
  */
object Mmr {

  /** Typed empty accumulator: array<struct<p:int, s:double>>. */
  private def emptySel: Column =
    slice(array(struct(lit(0).as("p"), lit(0.0).as("s"))), 1, 0)

  /** Greedy MMR over one row's candidate arrays — returns the selected
    * candidates as array<struct<p, s>> in selection order, where `p` is
    * the 1-based position into the input arrays and `s` the MMR objective
    * value at selection time (rank 1's s is λ·rel: the penalty over an
    * empty set is 0).
    *
    * `rels` must be "higher = better" and the arrays sorted best-first
    * with ids ascending within ties, so the first-position argmax
    * tie-break is deterministic. Steps clamp at size(rels): asking for
    * more selections than candidates returns them all.
    */
  def selectCol(rels: Column, vecs: Column, k: Int, lambda: Double): Column = {
    require(k > 0, s"k must be positive, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda out of [0,1]: $lambda")
    val n = size(rels)
    val mu = 1.0 - lambda
    aggregate(
      sequence(lit(1), least(lit(k), n)),
      emptySel,
      (sel, _) => {
        val selPos = transform(sel, e => e.getField("p"))
        val scores = transform(sequence(lit(1), n), i => {
          val ii = i.cast("int")
          when(array_contains(selPos, ii), lit(Double.NegativeInfinity))
            .otherwise(
              lit(lambda) * element_at(rels, i) -
                lit(mu) * coalesce(
                  array_max(transform(selPos, j =>
                    vec_dot(element_at(vecs, i), element_at(vecs, j)))),
                  lit(0.0)))
        })
        val best = array_max(scores)
        array_append(sel,
          struct(array_position(scores, best).cast("int").as("p"),
            best.as("s")))
      })
  }

  /** Diversified batch retrieval: for every query row, a top-`fetchK`
    * candidate pool by `metric` (broadcast queries into the scan, bounded
    * per-partition heaps — no shuffle of the corpus), then row-local
    * greedy MMR down to `k`.
    *
    * Output: (queryIdCol, rank, idCol, score) — rank is 1-based selection
    * order, score the MMR objective at selection time.
    */
  def diversify(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      fetchK: Int,
      lambda: Double,
      metric: Metric = Metric.Dot): DataFrame = {
    require(fetchK >= k, s"candidate pool $fetchK < k $k")
    val score = metric.score(col(vecCol), col(queryVecCol))
    val orderScore = if (metric.ascending) score else -score
    val scored = df
      .crossJoin(broadcast(queries))
      .withColumn("_os_in", orderScore)
    // each query's pool stays an array through the aggregation (no
    // explode/re-group): sorted best-first (os asc = best first for both
    // orientations), ids ascending within ties
    val packed = Search.topKPerKeyPayloadArr(
        scored, queryIdCol, col("_os_in"), idCol, col(vecCol), fetchK)
      .select(col(queryIdCol),
        transform(col("cs"), c => c.getField("_id")).as("_ids"),
        transform(col("cs"), c => -c.getField("os")).as("_rels"),
        transform(col("cs"), c => c.getField("_payload")).as("_vecs"))
    packed
      .select(col(queryIdCol), col("_ids"),
        posexplode(selectCol(col("_rels"), col("_vecs"), k, lambda)))
      .select(col(queryIdCol),
        (col("pos") + 1).cast("int").as("rank"),
        element_at(col("_ids"), col("col.p")).as(idCol),
        col("col.s").as("score"))
  }
}
