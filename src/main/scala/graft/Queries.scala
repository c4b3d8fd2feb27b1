package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._
import graft.query.Search
import graft.types.{Filter, FilterSet, Metric}

/** The operator-coverage query set: one named query per implemented operator
  * (SURVEY.md §2), each with an equivalent DuckDB oracle in
  * [[Queries.oracle]]. Column names and row ordering are deterministic and
  * identical on both sides (ties broken by id); floating outputs are
  * computed double-precision left-to-right on both sides and rounded to 6
  * decimals so the driver's hash compare is stable.
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** 1-row frame holding the embedding of `vec_id = qid` as column qv. */
  private def queryVec(emb: DataFrame, qid: Long): DataFrame =
    emb.where(col("vec_id") === qid).select(col("embedding").as("qv"))

  private def r6(c: Column): Column = round(c, 6)

  // ---------------------------------------------------------------------
  // k-NN search family (vecgo R1/R3/R5/R6/R7/R8)
  // ---------------------------------------------------------------------

  /** R1: exact top-10 by Euclidean distance, query = embedding of vec_id 0. */
  def knnL2(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    emb
      .crossJoin(broadcast(queryVec(emb, 0)))
      .withColumn("score", vec_l2(col("embedding"), col("qv")))
      .orderBy(col("score").asc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), r6(col("score")).as("score"))
  }

  /** R1 (Cosine): top-10 by cosine similarity, query = vec_id 1. */
  def knnCosine(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    emb
      .crossJoin(broadcast(queryVec(emb, 1)))
      .withColumn("score", vec_cos(col("embedding"), col("qv")))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), r6(col("score")).as("score"))
  }

  /** R1 (Dot): top-10 by inner product, query = vec_id 2. */
  def knnDot(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    emb
      .crossJoin(broadcast(queryVec(emb, 2)))
      .withColumn("score", vec_dot(col("embedding"), col("qv")))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), r6(col("score")).as("score"))
  }

  /** R3: filtered k-NN — pre-filter `label IN (1,3,5)` then top-10 L2. */
  def knnFiltered(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    emb
      .where(FilterSet.of(Filter.In("label", Seq(1, 3, 5))).toColumn)
      .crossJoin(broadcast(queryVec(emb, 3)))
      .withColumn("score", vec_l2(col("embedding"), col("qv")))
      .orderBy(col("score").asc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), col("label"), r6(col("score")).as("score"))
  }

  /** Diversity-capped k-NN (grouped top-k): the global top-12 by L2
    * subject to at most 3 results per `label` — the facet/source cap a
    * training-data retrieval pass uses so one dominant cluster cannot
    * monopolize the result page. Greedy-in-score-order with a per-group
    * cap is exactly "top-3 per group, then global top-k of the capped
    * set", so the plan is one [[Search.topKPerKey]] bounded-heap
    * aggregation on the group key (shuffle = groups × cap structs, never
    * the scored corpus) + a TakeOrderedAndProject — no global sort, no
    * unpartitioned window.
    */
  def knnGrouped(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val scored = emb
      .crossJoin(broadcast(queryVec(emb, 5)))
      .withColumn("score", vec_l2(col("embedding"), col("qv")))
    Search.topKPerKey(scored, "label", col("score"), "vec_id", 3)
      .orderBy(col("_os").asc, col("vec_id").asc)
      .limit(12)
      .select(col("label"), col("vec_id"), r6(col("_os")).as("score"),
        col("rank"))
  }

  /** R5: threshold (range) search — all within Euclidean distance 1.2 of
    * vec_id 4's embedding, capped at 100, best-first.
    */
  def searchThreshold(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    emb
      .crossJoin(broadcast(queryVec(emb, 4)))
      .withColumn("score", vec_l2(col("embedding"), col("qv")))
      .where(col("score") <= 1.2)
      .orderBy(col("score").asc, col("vec_id").asc)
      .limit(100)
      .select(col("vec_id"), r6(col("score")).as("score"))
  }

  /** R6: batch search — 8 queries (vec_id < 8), top-5 each, via broadcast
    * cross-score + per-query window rank.
    */
  def batchSearch(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val queries = emb
      .where(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    Search
      .batchSearch(emb, "embedding", "vec_id", queries, "query_id", "qv",
        k = 5, metric = Metric.L2)
      .select(col("query_id"), col("vec_id"), col("rank"),
        r6(sqrt(col("score"))).as("score"))
      .orderBy(col("query_id").asc, col("rank").asc)
  }

  /** R7: point lookup by primary key. */
  def pointGet(s: SparkSession, dir: String): DataFrame =
    Search
      .get(t(s, dir, "embeddings"), "vec_id", 123L)
      .select(col("vec_id"), col("label"),
        size(col("embedding")).cast("long").as("dim"))

  /** R8: filtered scan with projection (predicate pushed to Parquet). */
  def scanFilter(s: SparkSession, dir: String): DataFrame =
    Search
      .scan(t(s, dir, "embeddings"),
        FilterSet.of(Filter.Eq("label", 7)), Seq("vec_id", "label"))
      .orderBy(col("vec_id").asc)

  /** R4: the full filter-operator matrix (eq/ne/gt/gte/lt/lte/in/contains)
    * as one conjunctive scan over `part` — `contains` is substring
    * containment per vecgo `metadata/filter.go:196-201` ('OM' hits both
    * ECONOMY and PROMO).
    */
  def filterOps(s: SparkSession, dir: String): DataFrame =
    Search
      .scan(t(s, dir, "part"),
        FilterSet.of(
          Filter.Contains("p_type", "OM"),
          Filter.Gte("p_size", 10),
          Filter.Lt("p_size", 45),
          Filter.Gt("p_retailprice", 100.0),
          Filter.Lte("p_retailprice", 1900.0),
          Filter.Ne("p_brand", "Brand#13"),
          Filter.In("p_brand", Seq("Brand#1", "Brand#2", "Brand#9",
            "Brand#13", "Brand#20", "Brand#22"))),
        Seq("p_partkey", "p_brand", "p_type", "p_size"))
      .orderBy(col("p_partkey").asc)

  // ---------------------------------------------------------------------
  // Relational surface (Spark-native analytics over the same tables)
  // ---------------------------------------------------------------------

  /** TPC-H Q1-style pricing summary. Double sums are made engine-exact by
    * casting each term to DECIMAL before SUM (both Spark and DuckDB sum
    * decimals exactly), then casting the final value back to DOUBLE.
    */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val charge = disc * (lit(1.0) + col("l_tax"))
    // filter + project FIRST (guide §2.3), then widen: the sf tables are
    // single-row-group parquet files, so the decimal-exact partial agg
    // otherwise runs on ONE scan task (r12; spread_input is a no-op at
    // real scan widths, so the 100 TB plan keeps its single exchange)
    graft.functions.spread_input(
        li.where(col("l_shipdate") <= lit("1999-09-02").cast("timestamp"))
          .select(col("l_returnflag"), col("l_linestatus"),
            col("l_quantity"), col("l_extendedprice"), col("l_discount"),
            col("l_tax")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,6)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(28,10)")).cast("double").as("sum_base_price"),
        sum(disc.cast("decimal(28,10)")).cast("double").as("sum_disc_price"),
        sum(charge.cast("decimal(28,10)")).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag").asc, col("l_linestatus").asc)
  }

  /** Broadcast join + aggregation: revenue count per market segment. */
  def joinAgg(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    orders
      .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(28,10)")).cast("double")
          .as("total_price"))
      .orderBy(col("c_mktsegment").asc)
  }

  /** Window top-N: 3 most expensive orders per order status. */
  def topnWindow(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val w = Window
      .partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("o_orderstatus"), col("rank"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_orderstatus").asc, col("rank").asc)
  }

  /** Semi/anti join family: suppliers that DO supply a shipped part
    * (left-semi against lineitem) and suppliers that never shipped
    * (left-anti), counted per nation in one frame. Both probes are the
    * same broadcast-friendly distinct-key build; at 100 TB the semi/anti
    * pair stays one shuffle on s_suppkey with partial aggregation — no
    * row explosion, unlike an inner join + distinct.
    */
  def joinSemiAnti(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier")
    val li = t(s, dir, "lineitem").select(col("l_suppkey").as("s_suppkey"))
    val semi = sup.join(li, Seq("s_suppkey"), "left_semi")
      .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n"))
      .withColumn("op", lit("supplies"))
    val anti = sup.join(li, Seq("s_suppkey"), "left_anti")
      .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n"))
      .withColumn("op", lit("never_shipped"))
    semi.unionByName(anti)
      .select(col("op"), col("s_nationkey").as("nationkey"), col("n"))
      .orderBy(col("op").asc, col("nationkey").asc)
  }

  /** Analytic window-function sampler — lag/lead, dense_rank, ntile and a
    * running frame sum in ONE window pass per customer (all functions
    * share one (partition, order) spec, so Catalyst plans a single
    * Sort+Window at any scale).
    */
  def windowFuncs(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders").where(col("o_custkey") < 200)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"),
        dense_rank().over(w).as("rk"),
        ntile(4).over(w).as("quartile"),
        sum(col("o_totalprice").cast("decimal(28,10)")).over(run)
          .cast("double").as("run_spend"))
      .orderBy(col("o_custkey").asc, col("o_orderkey").asc)
  }

  // ---------------------------------------------------------------------
  // Lexical + hybrid search (vecgo R9/R10)
  // ---------------------------------------------------------------------

  import graft.lexical.BM25
  import graft.hybrid.RRF

  private val TextQuery = "spark vector merge"

  /** Persisted per-dataset BM25 index, mirroring `GraftDB.lexicalIndex`:
    * first call builds + writes the postings/doclen tables (df derives
    * from the query's hit rows at search time), later calls read them
    * back — so the benched cost of `bm25_search`/`hybrid_rrf` is the
    * query-time postings scan, not a corpus re-tokenization per query.
    */
  private def persistedBm25(s: SparkSession, dir: String): BM25.Index = {
    // the cache key carries a content fingerprint (size + mtime of the
    // source parquet) so an in-place change of the documents table can
    // never reuse a stale index
    val src = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
    val fsrc = src.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fsrc.getFileStatus(src)
    val fp = java.lang.Long.toHexString(st.getLen ^ java.lang.Long
      .rotateLeft(st.getModificationTime, 21))
    val root = s"${sys.props("java.io.tmpdir")}/graft_bm25_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + s"_$fp"
    val stats = java.nio.file.Paths.get(root, "_STATS")
    if (!java.nio.file.Files.exists(stats)) {
      val idx = BM25.build(t(s, dir, "documents"), "doc_id", "text")
      idx.postings.sort("term", "id")
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#term", "true")
        .parquet(s"$root/postings")
      idx.docLen.write.mode("overwrite").parquet(s"$root/doclen")
      // _STATS is the commit marker: written LAST via temp + atomic rename
      // so a concurrent run can never observe the marker before the data
      val tmp = java.nio.file.Paths.get(root, s"._STATS.tmp-${Thread.currentThread.getId}")
      java.nio.file.Files.write(tmp,
        s"${idx.numDocs},${idx.avgDocLen}".getBytes("UTF-8"))
      try java.nio.file.Files.move(tmp, stats,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { // another run won the race with identical content: fine
        case _: java.nio.file.FileAlreadyExistsException =>
          java.nio.file.Files.deleteIfExists(tmp)
      }
    }
    val parts = new String(
      java.nio.file.Files.readAllBytes(stats), "UTF-8").trim.split(",")
    BM25.Index(
      s.read.parquet(s"$root/postings"),
      s.read.parquet(s"$root/doclen"),
      parts(0).toLong, parts(1).toDouble)
  }

  /** R10: BM25 top-10 over the documents corpus (persisted index). */
  def bm25Search(s: SparkSession, dir: String): DataFrame = {
    val idx = persistedBm25(s, dir)
    BM25.search(idx, TextQuery, 10)
      .select(col("id").as("doc_id"), r6(col("score")).as("score"))
  }

  /** R9: hybrid search — RRF fusion of vector top-50 (query = vec_id 5's
    * embedding, doc_id ≡ vec_id) and BM25 top-50, k = 10, rrfK = 60.
    */
  def hybridRrf(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val m = RRF.poolSize(10)
    val vpool = emb
      .crossJoin(broadcast(queryVec(emb, 5)))
      .select(col("vec_id").as("id"),
        vec_l2(col("embedding"), col("qv")).as("score"))
      .orderBy(round(col("score"), 6).asc, col("id").asc)
      .limit(m)
    val vranks = RRF.ranked(vpool, "id", "score", ascending = true)
    val idx = persistedBm25(s, dir)
    val bpool = BM25.search(idx, TextQuery, m).select(col("id"), col("score"))
    val branks = RRF.ranked(bpool, "id", "score", ascending = false)
    RRF.fuse(vranks, branks, 10)
      .select(col("id"), r6(col("score")).as("score"))
  }

  /** SQL-text twin of the k-NN path through the registered function
    * surface ([[graft.functions.registerAll]] / [[graft.GraftExtensions]]):
    * the entire query is one SQL string, proving a SQL-only client (Thrift
    * / Connect) can run vector search with no Scala Column API at all.
    */
  def sqlKnn(s: SparkSession, dir: String): DataFrame = {
    graft.functions.registerAll(s)
    t(s, dir, "embeddings").createOrReplaceTempView("graft_embeddings")
    s.sql(
      """WITH q AS (SELECT embedding AS qv FROM graft_embeddings WHERE vec_id = 3)
        |SELECT e.vec_id AS vec_id,
        |       round(vec_l2(e.embedding, q.qv), 6) AS score
        |FROM graft_embeddings e CROSS JOIN q
        |ORDER BY vec_l2(e.embedding, q.qv) ASC, e.vec_id ASC
        |LIMIT 10""".stripMargin)
  }

  // ---------------------------------------------------------------------
  // SparkEntry wiring
  // ---------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_knn" -> (sqlKnn _),
    "knn_l2" -> (knnL2 _),
    "knn_cosine" -> (knnCosine _),
    "knn_dot" -> (knnDot _),
    "knn_filtered" -> (knnFiltered _),
    "knn_grouped" -> (knnGrouped _),
    "search_threshold" -> (searchThreshold _),
    "batch_search" -> (batchSearch _),
    "point_get" -> (pointGet _),
    "scan_filter" -> (scanFilter _),
    "filter_ops" -> (filterOps _),
    "q1_agg" -> (q1Agg _),
    "join_agg" -> (joinAgg _),
    "topn_window" -> (topnWindow _),
    "join_semi_anti" -> (joinSemiAnti _),
    "window_funcs" -> (windowFuncs _),
    "bm25_search" -> (bm25Search _),
    "hybrid_rrf" -> (hybridRrf _)
  )

  /** DuckDB-runnable oracles, same column names + ordering as the Spark
    * side. Distances are computed double-precision left-to-right (DuckDB
    * list kernels over DOUBLE[] casts ≡ our kernels' accumulation order).
    */
  val oracle: Map[String, String] = Map(
    "sql_knn" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 3)
        |SELECT e.vec_id AS vec_id,
        |       round(list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 6) AS score
        |FROM embeddings e, q
        |ORDER BY list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]) ASC, e.vec_id ASC
        |LIMIT 10""".stripMargin,
    "knn_l2" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id AS vec_id,
        |       round(list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 6) AS score
        |FROM embeddings e, q
        |ORDER BY list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]) ASC, e.vec_id ASC
        |LIMIT 10""".stripMargin,
    "knn_cosine" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1),
        |s AS (SELECT e.vec_id,
        |             list_inner_product(e.embedding::DOUBLE[], q.qv::DOUBLE[]) /
        |             (sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
        |              sqrt(list_inner_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))) AS score
        |      FROM embeddings e, q)
        |SELECT vec_id, round(score, 6) AS score
        |FROM s ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,
    "knn_dot" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 2),
        |s AS (SELECT e.vec_id,
        |             list_inner_product(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS score
        |      FROM embeddings e, q)
        |SELECT vec_id, round(score, 6) AS score
        |FROM s ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,
    // grouped diversity cap: rank-within-label ≤ 3, then global top-12 —
    // the window mirror of the bounded-heap plan (greedy-in-score-order
    // with a per-group cap ≡ per-group top-m then global top-k)
    "knn_grouped" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 5),
        |s AS (SELECT e.label, e.vec_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv) AS score
        |      FROM embeddings e, q),
        |g AS (SELECT label, vec_id, score,
        |             row_number() OVER (PARTITION BY label
        |                                ORDER BY score ASC, vec_id ASC) AS rn
        |      FROM s QUALIFY rn <= 3)
        |SELECT label, vec_id, round(score, 6) AS score, rn::INT AS rank
        |FROM g ORDER BY score ASC, vec_id ASC LIMIT 12""".stripMargin,
    "knn_filtered" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 3),
        |s AS (SELECT e.vec_id, e.label,
        |             list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS score
        |      FROM embeddings e, q WHERE e.label IN (1, 3, 5))
        |SELECT vec_id, label, round(score, 6) AS score
        |FROM s ORDER BY score ASC, vec_id ASC LIMIT 10""".stripMargin,
    "search_threshold" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 4),
        |s AS (SELECT e.vec_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS score
        |      FROM embeddings e, q)
        |SELECT vec_id, round(score, 6) AS score
        |FROM s WHERE score <= 1.2
        |ORDER BY score ASC, vec_id ASC LIMIT 100""".stripMargin,
    "batch_search" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |           FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT q.query_id, e.vec_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS score,
        |             row_number() OVER (PARTITION BY q.query_id
        |               ORDER BY list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]) ASC,
        |                        e.vec_id ASC) AS rank
        |      FROM embeddings e, q)
        |SELECT query_id, vec_id, rank, round(score, 6) AS score
        |FROM s WHERE rank <= 5
        |ORDER BY query_id ASC, rank ASC""".stripMargin,
    "point_get" ->
      """SELECT vec_id, label, len(embedding)::BIGINT AS dim
        |FROM embeddings WHERE vec_id = 123""".stripMargin,
    "scan_filter" ->
      """SELECT vec_id, label FROM embeddings
        |WHERE label = 7 ORDER BY vec_id ASC""".stripMargin,
    "filter_ops" ->
      """SELECT p_partkey, p_brand, p_type, p_size FROM part
        |WHERE p_type LIKE '%OM%'
        |  AND p_size >= 10 AND p_size < 45
        |  AND p_retailprice > 100.0 AND p_retailprice <= 1900.0
        |  AND p_brand <> 'Brand#13'
        |  AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#9', 'Brand#13',
        |                  'Brand#20', 'Brand#22')
        |ORDER BY p_partkey ASC""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_charge,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag ASC, l_linestatus ASC""".stripMargin,
    "join_agg" ->
      """SELECT c_mktsegment,
        |  COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment ASC""".stripMargin,
    "bm25_search" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                                    x -> len(x) > 0)) AS term
        |  FROM documents),
        |post AS (SELECT term, doc_id, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, count(*)::DOUBLE AS dlen FROM tok GROUP BY 1),
        |stats AS (SELECT count(*)::DOUBLE AS n, avg(dlen) AS avgdl FROM dl),
        |qt AS (SELECT unnest(ARRAY['spark', 'vector', 'merge']) AS term),
        |dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM post GROUP BY 1),
        |scored AS (
        |  SELECT p.doc_id,
        |         sum( ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
        |              (p.tf * (1.2::DOUBLE + 1)) /
        |              (p.tf + 1.2::DOUBLE * ((1 - 0.75::DOUBLE) + 0.75::DOUBLE * l.dlen / s.avgdl)) ) AS score
        |  FROM post p
        |  JOIN qt USING (term)
        |  JOIN dfreq d USING (term)
        |  JOIN dl l ON l.doc_id = p.doc_id, stats s
        |  GROUP BY p.doc_id)
        |SELECT doc_id, round(score, 6) AS score
        |FROM scored ORDER BY round(score, 6) DESC, doc_id ASC LIMIT 10""".stripMargin,
    "hybrid_rrf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                                    x -> len(x) > 0)) AS term
        |  FROM documents),
        |post AS (SELECT term, doc_id, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, count(*)::DOUBLE AS dlen FROM tok GROUP BY 1),
        |stats AS (SELECT count(*)::DOUBLE AS n, avg(dlen) AS avgdl FROM dl),
        |qt AS (SELECT unnest(ARRAY['spark', 'vector', 'merge']) AS term),
        |dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM post GROUP BY 1),
        |bscore AS (
        |  SELECT p.doc_id AS id,
        |         sum( ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
        |              (p.tf * (1.2::DOUBLE + 1)) /
        |              (p.tf + 1.2::DOUBLE * ((1 - 0.75::DOUBLE) + 0.75::DOUBLE * l.dlen / s.avgdl)) ) AS score
        |  FROM post p
        |  JOIN qt USING (term)
        |  JOIN dfreq d USING (term)
        |  JOIN dl l ON l.doc_id = p.doc_id, stats s
        |  GROUP BY p.doc_id),
        |brank AS (
        |  SELECT id, row_number() OVER (ORDER BY round(score, 6) DESC, id ASC) AS lrank
        |  FROM bscore QUALIFY lrank <= 50),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 5),
        |vscore AS (
        |  SELECT e.vec_id AS id,
        |         list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS score
        |  FROM embeddings e, q),
        |vrank AS (
        |  SELECT id, row_number() OVER (ORDER BY round(score, 6) ASC, id ASC) AS vrank
        |  FROM vscore QUALIFY vrank <= 50),
        |fused AS (
        |  SELECT coalesce(v.id, b.id) AS id,
        |         coalesce(1.0::DOUBLE / (60 + v.vrank), 0.0) +
        |         coalesce(1.0::DOUBLE / (60 + b.lrank), 0.0) AS score
        |  FROM vrank v FULL OUTER JOIN brank b ON v.id = b.id)
        |SELECT id, round(score, 6) AS score
        |FROM fused ORDER BY score DESC, id ASC LIMIT 10""".stripMargin,
    "topn_window" ->
      """WITH r AS (SELECT o_orderstatus, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
        |  FROM orders)
        |SELECT o_orderstatus, rank, o_orderkey, o_totalprice
        |FROM r WHERE rank <= 3
        |ORDER BY o_orderstatus ASC, rank ASC""".stripMargin,
    "join_semi_anti" ->
      """WITH li AS (SELECT DISTINCT l_suppkey FROM lineitem)
        |SELECT 'supplies' AS op, s_nationkey AS nationkey, count(*) AS n
        |FROM supplier WHERE s_suppkey IN (SELECT l_suppkey FROM li)
        |GROUP BY s_nationkey
        |UNION ALL
        |SELECT 'never_shipped' AS op, s_nationkey AS nationkey, count(*) AS n
        |FROM supplier WHERE s_suppkey NOT IN (SELECT l_suppkey FROM li)
        |GROUP BY s_nationkey
        |ORDER BY op ASC, nationkey ASC""".stripMargin,
    "window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_orderkey, 1) OVER w AS prev_order,
        |  lead(o_orderkey, 1) OVER w AS next_order,
        |  dense_rank() OVER w AS rk,
        |  ntile(4) OVER w AS quartile,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10)))
        |    OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate ASC, o_orderkey ASC
        |          ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS DOUBLE) AS run_spend
        |FROM orders WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey ASC, o_orderkey ASC""".stripMargin
  )
}
