package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.types.{FilterSet, Metric}

/** The read-path query surface (SURVEY.md §2.2): k-NN search, filtered
  * search, threshold (range) search, batch search, point get, scan.
  *
  * Spark-first shapes:
  *  - k-NN = `score = metric(vector, q)` + `ORDER BY score LIMIT k`, which
  *    Catalyst plans as TakeOrderedAndProject — per-partition bounded top-k
  *    heaps merged on the driver, exactly the reference's per-segment-heap +
  *    global-heap pattern (vecgo `internal/engine/search.go:120-1128`) but
  *    distributed.
  *  - Filters are plain `Column` predicates evaluated BEFORE scoring —
  *    Spark always "pre-filters", which is optimal without a graph index
  *    (SURVEY.md §4); predicates push down to the Parquet scan.
  *  - Batch search broadcasts the (small) query set against the (huge)
  *    vector table and takes per-query top-k, so the big side is never
  *    shuffled (vecgo `engine.go:1303-1366`).
  *
  * Determinism: ties broken by id ascending (vecgo breaks ties by
  * (SegmentID, RowID), `search.go:71-114`; id order is our equivalent).
  */
object Search {

  /** Top-k nearest neighbors of `query` in `df`.
    *
    * @param df      table with an id column and a vector column
    * @param vecCol  name of the array<float> vector column
    * @param idCol   name of the id column (tie-break + output)
    * @param query   query vector as a Column (e.g. a literal array, or a
    *                column from a broadcast 1-row frame)
    * @param k       number of results
    * @param metric  distance metric (score direction handled internally)
    * @param filter  metadata pre-filter (vecgo R3)
    * @param orderKey optional monotone transform of the score used ONLY as
    *                the ordering key (ties still break by id): callers that
    *                need cross-engine-reproducible boundary membership pass
    *                a rounded key (e.g. hybrid pools rank over scores
    *                rounded to 6 decimals)
    */
  def knn(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      query: Column,
      k: Int,
      metric: Metric = Metric.L2,
      filter: Column = lit(true),
      projectCols: Seq[String] = Nil,
      orderKey: Column => Column = identity): DataFrame = {
    val scored = df
      .where(filter)
      .withColumn("score", metric.score(col(vecCol), query))
    val out = (idCol +: projectCols) :+ "score"
    scored
      .orderBy(metric.sort(orderKey(col("score"))), col(idCol).asc)
      .limit(k)
      .select(out.map(col): _*)
  }

  /** knn against a 1-row query frame (id-less); the query side is broadcast
    * so the vector table never shuffles.
    */
  def knnWithQueryFrame(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryFrame: DataFrame,
      queryVecCol: String,
      k: Int,
      metric: Metric = Metric.L2,
      filter: Column = lit(true)): DataFrame = {
    val joined = df.where(filter).crossJoin(broadcast(queryFrame))
    joined
      .withColumn("score", metric.score(col(vecCol), col(queryVecCol)))
      .orderBy(metric.sort(col("score")), col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("score"))
  }

  /** Range query: all rows within `threshold` of the query, capped at
    * `maxResults`, best-first (vecgo R5 `SearchThreshold`,
    * `engine.go:1485-1532`). Direction depends on metric: L2/Hamming keep
    * score <= t; Cosine/Dot keep score >= t.
    */
  def searchThreshold(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      query: Column,
      threshold: Double,
      maxResults: Int,
      metric: Metric = Metric.L2,
      filter: Column = lit(true)): DataFrame = {
    val scored = df
      .where(filter)
      .withColumn("score", metric.score(col(vecCol), query))
    val kept =
      if (metric.ascending) scored.where(col("score") <= threshold)
      else scored.where(col("score") >= threshold)
    kept
      .orderBy(metric.sort(col("score")), col(idCol).asc)
      .limit(maxResults)
      .select(col(idCol), col("score"))
  }

  /** Per-key bounded top-k via Spark's internal CollectTopK aggregate:
    * every partition keeps a size-k heap per key (partial aggregation),
    * so the shuffle carries only numPartitions × keys × k structs instead
    * of the full scored set — the distributed version of vecgo's
    * per-segment bounded heaps merged into a global heap
    * (`internal/searcher/queue.go:190-219`).
    *
    * Ordering: ascending on (orderScore, id); pass orderScore = -score for
    * descending metrics so ties still break by id ASC.
    */
  def topKPerKey(scored: DataFrame, keyCol: String, orderScore: Column,
      idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK
    val pair = struct(orderScore.as("os"), col(idCol).as("_id"))
    val topk = ColumnBridge.column(
      new CollectTopK(ColumnBridge.expression(pair), k, true)
        .toAggregateExpression())
    scored
      .groupBy(col(keyCol))
      .agg(topk.as("topk"))
      .select(col(keyCol), posexplode(sort_array(col("topk"))).as(Seq("pos", "p")))
      .select(col(keyCol), col("p._id").as(idCol), col("p.os").as("_os"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  // NOTE: a `topKPerKeyPayload` variant that carried an extra column
  // through the heaps existed here and was REMOVED: CollectTopK's update
  // path materializes its input struct for every scored row before heap
  // admission, so a vector payload costs one copy per SCANNED row — 10×
  // the whole join at 5M rows (tools/PooledCostProbe). Use
  // [[poolWithVectors]] (bounded winners re-joined by broadcast) instead.

  /** Attach vectors to a BOUNDED per-key candidate set by re-scanning the
    * corpus once with the candidates broadcast (late materialization),
    * packing each key's pool into one best-first sorted array of
    * (os, _id, _payload) structs — the candidate source for row-local
    * rerankers (MMR). `cands` must carry (keyCol, idCol, _os) — e.g.
    * [[topKPerKey]] output — and be bounded (keys × k rows: it is
    * collected for the broadcast).
    *
    * Why not carry the vector THROUGH the top-k heaps: the aggregate's
    * update path materializes its input struct — vector included — for
    * every SCORED row before heap admission, so the copy cost scales
    * with the scan, not the pool (measured 10× the whole join at 5M
    * corpus rows, `tools/PooledCostProbe`). One broadcast-hash re-join
    * against the corpus touches only the winners instead.
    */
  def poolWithVectors(cands: DataFrame, corpus: DataFrame, vecCol: String,
      idCol: String, keyCol: String): DataFrame =
    corpus.select(col(idCol), col(vecCol))
      .join(broadcast(cands.select(col(keyCol), col(idCol), col("_os"))),
        Seq(idCol))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("_os").as("os"),
        col(idCol).as("_id"), col(vecCol).as("_payload")))).as("cs"))

  /** Batch search: top-k per query for a whole frame of queries (vecgo R6
    * `BatchSearch`). The query frame is broadcast into the scan (no
    * shuffle of the vector table); per-query top-k runs as bounded-heap
    * partial aggregation via [[topKPerKey]].
    */
  def batchSearch(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      metric: Metric = Metric.L2,
      filter: Column = lit(true)): DataFrame = {
    val score = metric.score(col(vecCol), col(queryVecCol))
    val orderScore = if (metric.ascending) score else -score
    val scored = df
      .where(filter)
      .crossJoin(broadcast(queries))
      .withColumn("_os_in", orderScore)
    val restore = if (metric.ascending) col("_os") else -col("_os")
    topKPerKey(scored, queryIdCol, col("_os_in"), idCol, k)
      .select(col(queryIdCol), col(idCol), restore.as("score"), col("rank"))
  }

  /** Batch search against an in-memory query matrix — the faithful twin of
    * vecgo's `BatchSearch(ctx, [][]float32, k)` (`engine.go:1303-1366`).
    * One [[graft.functions.vec_l2sq_multi]] kernel call scores ALL queries
    * per row (the query matrix rides into codegen as a primitive
    * float[][]), then bounded per-partition heaps take over — no join, no
    * full sort, shuffle = partitions × queries × k rows.
    *
    * Output: (query_id, id, score, rank), L2 metric.
    */
  def batchSearchMatrix(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queries: Seq[(Long, Array[Float])],
      k: Int,
      filter: Column = lit(true)): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import graft.functions.MultiTopKDirect
    val qmat = queries.map(_._2).toArray
    val qids = queries.map(_._1).toArray
    // fused distance+top-k aggregate: no per-row m-double materialization
    // (TypedImperativeAggregate updates run interpreted — a pre-computed
    // distances array would cost an allocation + m boxed reads per row)
    val agg = ColumnBridge.column(MultiTopKDirect(
      ColumnBridge.expression(col(vecCol)),
      ColumnBridge.expression(col(idCol).cast("long")),
      qmat, k = k).toAggregateExpression())
    df.where(filter)
      .agg(agg.as("all_topk"))
      .select(posexplode(col("all_topk")).as(Seq("_qidx", "_topk")))
      .select(element_at(lit(qids), col("_qidx") + 1).as("query_id"),
        posexplode(col("_topk")).as(Seq("_pos", "_p")))
      .select(col("query_id"), col("_p.id").as(idCol),
        col("_p.score").as("score"), (col("_pos") + 1).cast("int").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Distributed k-NN JOIN: the top-k corpus neighbors of EVERY query row,
    * where BOTH sides are large datasets. [[batchSearch]] broadcasts the
    * query set — right for thousands of queries, impossible for millions.
    * This is the shape that remains at 100 TB: embed a whole table and
    * find each row's neighbors in another table (near-dup linking,
    * retrieval-augmented labeling, kNN classification).
    *
    * Plan: corpus rows are tagged with their IVF cell (one nearest-centroid
    * expression, no shuffle — or reuse a persisted `ivf_part` layout
    * column); each query row explodes to its `nprobe` nearest cells; both
    * sides shuffle ONCE on the cell key into an equi-join (no cartesian —
    * a query meets only the ~nprobe/nlist fraction of the corpus it probes,
    * and each (query, corpus) pair meets at most once because a corpus row
    * lives in exactly one cell); per-query bounded top-k heaps
    * ([[topKPerKey]]) reduce before the final shuffle. Skewed cells are
    * AQE's skew-join case. With `nprobe = model.k` the join is EXACT
    * (every pair is scored); with nprobe < nlist it is the standard IVF
    * approximation — gate recall like the engine does (≥0.95 at the
    * benched shapes; `KnnJoinSpec`).
    *
    * The reference's engine has no two-large-sides analog — its
    * `BatchSearch` (`engine.go:1303-1366`) iterates queries against the
    * in-process index; this operator is the missing cluster-scale twin.
    *
    * Caller aliases query columns so names don't collide with corpus
    * columns (same contract as [[batchSearch]]); queryIdCol must differ
    * from idCol or the output schema would carry two identical names.
    * Cosine callers should L2-normalize both sides first (IVF cells are
    * L2-trained); Dot is rejected — inner-product has no metric cell
    * geometry (same loud refusal as the RaBitQ route).
    *
    * `reuseLayoutCol = true` skips cell assignment and trusts the
    * corpus's existing `ivf_part` column (e.g. an [[graft.index.IVF
    * .writeLayout]] directory) — the caller asserts that column was
    * produced by THIS `model`: a foreign or retrained layout would leave
    * cells >= model.k unprobeable and silently drop their rows from
    * every result, so by default the column is ignored and assignment is
    * recomputed from the model (consistent by construction).
    *
    * @return (queryIdCol, idCol, score, rank), rank 1..k per query
    */
  def knnJoinIvf(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      model: graft.index.IVF.Model,
      nprobe: Int,
      metric: Metric = Metric.L2,
      filter: Column = lit(true),
      reuseLayoutCol: Boolean = false,
      broadcastQueries: Boolean = false): DataFrame = {
    require(metric == Metric.L2 || metric == Metric.Cosine,
      s"knnJoinIvf: $metric unsupported — IVF cells are L2-trained " +
        "(L2/Cosine only; pre-normalize for Cosine)")
    require(queryIdCol != idCol,
      s"knnJoinIvf: queryIdCol and idCol are both '$idCol' — alias the " +
        "query id so the output schema is unambiguous")
    val assigned =
      if (reuseLayoutCol && corpus.columns.contains("ivf_part"))
        corpus.where(filter)
      else corpus.where(filter)
        .withColumn("ivf_part", model.assignCol(col(vecCol)))
    // the cell key has only nlist distinct values, so a shuffled join at
    // a SMALL query count is the worst shape twice over: the corpus side
    // sorts n rows on a key with massive duplication, and the key's low
    // cardinality skews partitions. When the caller KNOWS the query side
    // is bounded (queries × nprobe rows), `broadcastQueries = true` pins
    // the broadcast-hash plan — the corpus is scanned once in place,
    // nothing is sorted, nothing shuffles before the partial top-k.
    // (Planner stats can't see this: the exploded side's estimate comes
    // from its parent, and at large corpus sizes AQE has been observed
    // picking the sort-merge plan — a 3× wall-clock cliff at 5M rows.)
    // With BOTH sides large, keep the default: one shuffle each on the
    // cell key IS the right 100 TB shape.
    val probed0 = queries
      .select(col(queryIdCol), col(queryVecCol))
      .withColumn("ivf_part",
        explode(model.probeCol(col(queryVecCol), nprobe)))
    val score = metric.score(col(vecCol), col(queryVecCol))
    val orderScore = if (metric.ascending) score else -score
    val scored =
      if (broadcastQueries)
        assigned.join(broadcast(probed0), "ivf_part")
          .withColumn("_os_in", orderScore)
      else {
        // Shuffled path: the join's OUTPUT explodes ~|cell| × nprobe-fold
        // relative to its input bytes, which AQE's input-byte-based
        // partition coalescing cannot see — measured at sf0.1 it folded
        // the tiny (≈300 KB) inputs into ONE post-shuffle partition and
        // evaluated 4M scored pairs single-threaded (r12 OptProbe: 3.4 s
        // → 1.1 s just from pinning the exchange). Pin both exchanges at
        // the session's reduce width with an explicit repartition, and
        // when the cell-key cardinality is itself below that width (toy
        // nlist, or one hot cell), SALT the key (guide §2.5): the corpus
        // side gets a deterministic per-row salt, the probe side explodes
        // every salt value, pairs are produced exactly once. At scale
        // nlist ≫ cores so salt degenerates to 1 and the shape is the
        // same one-shuffle-per-side equi-join as before.
        val spark = corpus.sparkSession
        val width = math.max(spark.sparkContext.defaultParallelism,
          spark.conf.get("spark.sql.shuffle.partitions", "1").toInt)
        val salt = math.max(1L, math.min(32L,
          math.ceil(width.toDouble / math.max(1, model.k)).toLong)).toInt
        val saltedCorpus = assigned
          .withColumn("_salt", pmod(xxhash64(col(idCol)), lit(salt)))
          .repartition(width, col("ivf_part"), col("_salt"))
        val saltedProbes = probed0
          .withColumn("_salt", explode(array((0 until salt).map(lit(_)): _*)))
          .repartition(width, col("ivf_part"), col("_salt"))
        saltedCorpus.join(saltedProbes, Seq("ivf_part", "_salt"))
          .withColumn("_os_in", orderScore)
      }
    val restore = if (metric.ascending) col("_os") else -col("_os")
    topKPerKey(scored, queryIdCol, col("_os_in"), idCol, k)
      .select(col(queryIdCol), col(idCol), restore.as("score"), col("rank"))
  }

  /** [[knnJoinIvf]] with each query's bounded top-k kept AS an array
    * carrying the corpus vector payload ((os, _id, _payload) structs,
    * best-first) — the candidate source for joined rerankers
    * ([[Mmr.diversifyJoin]]): same cell-key equi-join shape, but the
    * pool never leaves the aggregation as rows.
    */
  def knnJoinIvfPooled(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      model: graft.index.IVF.Model,
      nprobe: Int,
      metric: Metric = Metric.L2,
      filter: Column = lit(true),
      reuseLayoutCol: Boolean = false,
      broadcastQueries: Boolean = false): DataFrame = {
    require(metric == Metric.L2 || metric == Metric.Cosine,
      s"knnJoinIvfPooled: $metric unsupported — IVF cells are L2-trained " +
        "(L2/Cosine only; pre-normalize for Cosine)")
    require(queryIdCol != idCol,
      s"knnJoinIvfPooled: queryIdCol and idCol are both '$idCol' — alias " +
        "the query id so the output schema is unambiguous")
    // phase 1: the plain cell-routed join's bounded (os, id) heaps — no
    // payload rides the heaps (see poolWithVectors' cost note)
    val cands = knnJoinIvf(corpus, vecCol, idCol, queries, queryIdCol,
        queryVecCol, k, model, nprobe, metric, filter, reuseLayoutCol,
        broadcastQueries)
      .select(col(queryIdCol), col(idCol),
        (if (metric.ascending) col("score") else -col("score")).as("_os"))
    // phase 2: late-materialize the winners' vectors
    poolWithVectors(cands, corpus, vecCol, idCol, queryIdCol)
  }

  /** Point lookup by primary key (vecgo R7 `Get`). */
  def get(df: DataFrame, idCol: String, id: Long): DataFrame =
    df.where(col(idCol) === lit(id))

  /** Full / filtered scan with projection (vecgo R8 `Scan`). Unlike the
    * reference — which evaluates the filter after fetch (`engine.go:
    * 1393-1481`) — the predicate is part of the scan and pushes down to
    * Parquet.
    */
  def scan(
      df: DataFrame,
      filter: FilterSet = FilterSet.empty,
      projectCols: Seq[String] = Nil): DataFrame = {
    val base = df.where(filter.toColumn)
    if (projectCols.isEmpty) base else base.select(projectCols.map(col): _*)
  }

  /** Two-phase approximate→exact re-rank (vecgo R11): take the top
    * k*refineFactor by `approxScore`, recompute `exactScore` on the
    * survivors, re-sort, limit k. Used by the quantized index paths.
    */
  def rerank(
      df: DataFrame,
      idCol: String,
      approxScore: Column,
      exactScore: Column,
      k: Int,
      refineFactor: Int,
      metric: Metric): DataFrame = {
    val pool = df
      .withColumn("approx_score", approxScore)
      .orderBy(metric.sort(col("approx_score")), col(idCol).asc)
      .limit(k * math.max(1, refineFactor))
    pool
      .withColumn("score", exactScore)
      .orderBy(metric.sort(col("score")), col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("score"))
  }
}
