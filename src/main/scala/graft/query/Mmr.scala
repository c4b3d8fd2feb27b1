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
  * path ([[Search.topKPerKey]] — per-partition (os, id) heaps, the
  * shuffle carries only queries × fetchK structs — with the winners'
  * vectors late-materialized by ONE broadcast-hash re-join,
  * [[Search.poolWithVectors]]); the greedy selection itself is
  * ONE row-local fold over the per-query candidate array (O(k²·fetchK)
  * dot products per query, never a pairwise explode-join across the
  * corpus). The selection fold and every dot product accumulate in double,
  * sequentially in array order, so results verify bit-exact against a
  * DuckDB `list_transform`/`list_max`/`list_position` mirror of the same
  * greedy steps.
  *
  * The diversity penalty is inner-product similarity between candidate
  * vectors (cosine when the embeddings are normalized — the common case);
  * relevance enters the objective in the metric's CANONICAL units,
  * oriented higher-better (similarities as-is; L2 pools as −√d², the
  * true Euclidean distance — one convention across the distributed,
  * facade and serving tiers).
  */
object Mmr {

  /** The DuckDB mirror of [[selectCol]]'s greedy fold, unrolled to `k`
    * chained CTE steps (DuckDB's `list_reduce` cannot carry a list
    * accumulator). `prefix` must be a `WITH`-clause prefix whose LAST CTE
    * is `cand(qid, vec_id, v DOUBLE[], rel DOUBLE)` — the per-query
    * candidate pool. Every step recomputes the masked MMR objective with
    * the exact literals the Spark side folds with (`mu` prints from the
    * same `1.0 - lambda` double, so 0.7 → 0.30000000000000004 on both
    * engines) and appends the first-position argmax — `list_position`
    * breaks ties toward better-relevance/lower-id exactly like Spark's
    * `array_position`. `finalSql` may reference `selK` (the last step)
    * plus the arrays `ids`/`sel`/`ss`. `simExpr` is the redundancy term
    * between candidates `vs[i]` and `vs[j]` (those exact tokens) —
    * defaults to the float tiers' inner product; the code tier passes a
    * negated sign-bit Hamming count ([[hammingSimExpr]]).
    */
  def oracleSql(prefix: String, k: Int, lambda: Double,
      finalSql: String,
      simExpr: String = "list_inner_product(vs[i], vs[j])"): String = {
    val mu = 1.0 - lambda
    val step =
      s"""SELECT qid, ids, rels, vs,
         |       list_append(sel, CAST(list_position(scores, list_max(scores)) AS BIGINT)) AS sel,
         |       list_append(ss, list_max(scores)) AS ss
         |FROM (SELECT *, list_transform(range(1, len(ids) + 1), i ->
         |        CASE WHEN list_contains(sel, i)
         |             THEN CAST('-infinity' AS DOUBLE)
         |             ELSE $lambda * rels[i] - $mu * coalesce(
         |                    list_max(list_transform(sel, j ->
         |                      $simExpr)), 0.0)
         |        END) AS scores FROM SEL_PREV)""".stripMargin
    val steps = (1 to k).map(t =>
      s"sel$t AS (${step.replace("SEL_PREV", if (t == 1) "sel0" else s"sel${t - 1}")})")
      .mkString(",\n")
    s"""$prefix,
       |arr AS (SELECT qid,
       |               list(vec_id ORDER BY rel DESC, vec_id ASC) AS ids,
       |               list(rel ORDER BY rel DESC, vec_id ASC) AS rels,
       |               list(v ORDER BY rel DESC, vec_id ASC) AS vs
       |        FROM cand GROUP BY qid),
       |sel0 AS (SELECT qid, ids, rels, vs,
       |                []::BIGINT[] AS sel, []::DOUBLE[] AS ss FROM arr),
       |$steps
       |${finalSql.replace("selK", s"sel$k")}""".stripMargin
  }

  /** The code tier's redundancy term for [[oracleSql]]: −(count of bit
    * positions where candidates i and j disagree), over `vs` carried as
    * 0/1 DOUBLE[] sign bits — the DuckDB mirror of
    * [[graft.serve.LocalCodeReplica.mmrGreedyCodes]]'s −popcount(cᵢ⊕cⱼ).
    * Exact integer arithmetic in double on both engines.
    */
  def hammingSimExpr(bits: Int): String =
    s"-list_sum(list_transform(range(1, ${bits + 1}), p -> " +
      "CASE WHEN vs[i][p] <> vs[j][p] THEN 1.0 ELSE 0.0 END))"

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
    // n = 0 must short-circuit: sequence(1, least(k, 0)) DESCENDS
    // ([1, 0]), so the fold would run two steps and element_at(rels, 0)
    // throws — an empty pool (e.g. a filter matching no rows) selects
    // nothing instead
    when(n === lit(0), emptySel).otherwise(aggregate(
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
      }))
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
    // bounded (os, id) heaps first, vectors late-materialized after the
    // cut — carrying the vector through the heaps copies it once per
    // SCORED row, a cost that scales with the scan, not the pool (see
    // Search.poolWithVectors)
    val cands = Search.topKPerKey(scored, queryIdCol, col("_os_in"),
      idCol, fetchK)
    val packed = Search.poolWithVectors(cands, df, vecCol, idCol,
      queryIdCol)
    finishDiversify(packed, queryIdCol, idCol, k, lambda, metric)
  }

  /** Joined diversified retrieval — MMR over [[Search.knnJoinIvfPooled]]
    * candidates, for the BOTH-SIDES-LARGE shape `diversify` cannot
    * broadcast: corpus tagged with its IVF cell, queries exploded to
    * their nprobe cells, ONE equi-join shuffle on the cell key, bounded
    * per-query heaps kept as arrays, then the same row-local greedy
    * fold. Exact at `nprobe = model.k`; recall-bounded IVF approximation
    * below it (the pool, not the greedy, is what approximates).
    */
  def diversifyJoin(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      fetchK: Int,
      lambda: Double,
      model: graft.index.IVF.Model,
      nprobe: Int,
      metric: Metric = Metric.L2,
      filter: Column = lit(true),
      broadcastQueries: Boolean = false): DataFrame = {
    require(fetchK >= k, s"candidate pool $fetchK < k $k")
    val packed = Search.knnJoinIvfPooled(corpus, vecCol, idCol, queries,
      queryIdCol, queryVecCol, fetchK, model, nprobe, metric, filter,
      broadcastQueries = broadcastQueries)
    finishDiversify(packed, queryIdCol, idCol, k, lambda, metric)
  }

  /** Unpack a (key, cs) pooled frame, fold, explode the k selections.
    * Relevance enters the objective in CANONICAL units — an L2 pool's
    * heap key is the squared distance, surfaced as −√d² so the DuckDB
    * mirror is plain `-list_distance` (bitwise; √ then negate are exact
    * IEEE ops) — and similarities ride through as-is.
    */
  private def finishDiversify(packed: DataFrame, queryIdCol: String,
      idCol: String, k: Int, lambda: Double, metric: Metric): DataFrame = {
    val rel: Column => Column =
      if (metric == Metric.L2) os => -sqrt(os)
      else os => -os // descending heaps store os = -score; -os = score
    packed
      .select(col(queryIdCol),
        transform(col("cs"), c => c.getField("_id")).as("_ids"),
        transform(col("cs"), c => rel(c.getField("os"))).as("_rels"),
        transform(col("cs"), c => c.getField("_payload")).as("_vecs"))
      .select(col(queryIdCol), col("_ids"),
        posexplode(selectCol(col("_rels"), col("_vecs"), k, lambda)))
      .select(col(queryIdCol),
        (col("pos") + 1).cast("int").as("rank"),
        element_at(col("_ids"), col("col.p")).as(idCol),
        col("col.s").as("score"))
  }
}
