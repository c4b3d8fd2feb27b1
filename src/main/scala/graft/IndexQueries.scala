package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._
import graft.index.{BQ, IVF, OPQ, PQ, RaBitQ, SQ8}
import graft.query.Search
import graft.types.Metric

/** Index-layer operator coverage (SURVEY.md §2.3 I4-I6, I8): IVF probe
  * search, SQ8 and PQ two-phase quantized→exact rerank, binary-quantized
  * Hamming search. Each query is configured so its result is EXACT
  * (all-probe IVF; generous refine factors) and therefore oracle-checkable
  * against plain brute-force SQL; the approximation/recall trade-offs are
  * exercised in ScalaTest instead (FIXTURES.md §C recall gates).
  */
object IndexQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def r6(c: Column): Column = round(c, 6)

  private def qvec(emb: DataFrame, qid: Long): Array[Float] =
    emb.where(col("vec_id") === qid).select("embedding")
      .collect()(0).getSeq[Float](0).toArray

  /** I4: IVF with all partitions probed — exact top-10 through the FULL
    * layout path: train → assign → write partitioned parquet → read back →
    * probe (the `ivf_part IN (...)` filter prunes partition directories
    * before listing, which is the 100 TB win).
    */
  def ivfKnn(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val model = IVF.trainLocal(emb, "embedding", k = 8, maxIter = 8)
    // layout dir is per-sf so concurrent runs over different data never
    // collide on a shared path
    val layout = s"${sys.props("java.io.tmpdir")}/graft_ivf_layout_" +
      dir.replaceAll("[^A-Za-z0-9]", "_")
    IVF.writeLayout(IVF.assign(emb, "embedding", model), layout)
    val stored = s.read.parquet(layout)
    val q = qvec(emb, 6)
    IVF.search(stored, "embedding", "vec_id", model, q, k = 10, nprobe = 8)
      .select(col("vec_id"), r6(sqrt(col("score"))).as("score"))
  }

  /** I5 + R11: SQ8 approx scan → exact rerank (refine 3×) — recovers the
    * exact top-10.
    */
  def sq8Rerank(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val model = SQ8.train(emb, "embedding")
    val coded = SQ8.encode(emb, "embedding", model)
    val q = qvec(emb, 7)
    Search.rerank(coded, "vec_id",
        approxScore = vec_l2sq(model.decodeCol(col("codes")), lit(q)),
        exactScore = vec_l2sq(col("embedding"), lit(q)),
        k = 10, refineFactor = 3, Metric.L2)
      .select(col("vec_id"), r6(sqrt(col("score"))).as("score"))
  }

  /** Refine factor sized as a corpus FRACTION so the exact-recovery gate
    * holds at every scale factor (a fixed pool that is 20% of 500 rows is
    * only 2% of 5000 — quantized recall depends on the fraction).
    */
  private def fracRefine(n: Long, k: Int, frac: Double, floor: Int): Int =
    math.max(floor, math.ceil(n * frac / k).toInt)

  /** I6 + R11: PQ ADC approx scan → exact rerank (pool ≈ 20% of corpus). */
  def pqAdcRerank(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val model = PQ.train(emb, "embedding", m = 8, ksub = 64, iters = 10)
    val coded = PQ.encode(emb, "embedding", model)
    val q = qvec(emb, 9)
    Search.rerank(coded, "vec_id",
        approxScore = model.adcScoreCol(col("pq_codes"), q),
        exactScore = vec_l2sq(col("embedding"), lit(q)),
        k = 10, refineFactor = fracRefine(emb.count(), 10, 0.2, 10), Metric.L2)
      .select(col("vec_id"), r6(sqrt(col("score"))).as("score"))
  }

  /** I7: OPQ — learned-rotation PQ, ADC approx scan → exact rerank. */
  def opqRerank(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val model = OPQ.train(emb, "embedding", m = 8, ksub = 64, iters = 2)
    val coded = emb.withColumn("opq_codes", model.encodeCol(col("embedding")))
    val q = qvec(emb, 2)
    Search.rerank(coded, "vec_id",
        approxScore = model.adcScoreCol(col("opq_codes"), q),
        exactScore = vec_l2sq(col("embedding"), lit(q)),
        k = 10, refineFactor = fracRefine(emb.count(), 10, 0.2, 10), Metric.L2)
      .select(col("vec_id"), r6(sqrt(col("score"))).as("score"))
  }

  /** I9: RaBitQ-style randomized binary quantization — sign bits of a
    * random rotation, Hamming-angle distance estimate, exact rerank.
    */
  def rabitqRerank(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val model = RaBitQ.train(dim = 64)
    val coded = RaBitQ.encode(emb, "embedding", model)
    val q = qvec(emb, 4)
    Search.rerank(coded, "vec_id",
        approxScore = model.approxScoreCol(col("rq_codes"), q),
        exactScore = vec_l2sq(col("embedding"), lit(q)),
        k = 10, refineFactor = fracRefine(emb.count(), 10, 0.7, 35), Metric.L2)
      .select(col("vec_id"), r6(sqrt(col("score"))).as("score"))
  }

  /** I10: INT4 (4-bit scalar codes) approx scan → exact rerank; coarser
    * codes need a wider refine pool than SQ8 (vecgo `int4_test.go`).
    */
  def int4Rerank(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val model = SQ8.train(emb, "embedding", levels = 15)
    val coded = SQ8.encode(emb, "embedding", model)
    val q = qvec(emb, 1)
    Search.rerank(coded, "vec_id",
        approxScore = vec_l2sq(model.decodeCol(col("codes")), lit(q)),
        exactScore = vec_l2sq(col("embedding"), lit(q)),
        k = 10, refineFactor = 8, Metric.L2)
      .select(col("vec_id"), r6(sqrt(col("score"))).as("score"))
  }

  /** I8: binary-quantized Hamming top-10 (sign bits packed 32/word,
    * popcount distance).
    */
  def bqHamming(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = qvec(emb, 8)
    val qPacked = {
      val bits = q.zipWithIndex
      (0 until 2).map { w =>
        bits.slice(w * 32, w * 32 + 32).foldLeft(0L) { case (acc, (x, i)) =>
          if (x > 0f) acc | (1L << (i % 32)) else acc
        }
      }.toArray
    }
    emb
      .withColumn("hamming",
        vec_hamming(BQ.packCol(col("embedding"), 64), lit(qPacked)))
      .orderBy(col("hamming").asc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), col("hamming"))
  }

  /** Distributed k-NN JOIN ([[graft.query.Search.knnJoinIvf]]): every
    * embeddings row finds its 3 nearest OTHER rows through the IVF
    * cell-routed equi-join — both sides shuffle once on the cell key,
    * per-query bounded heaps, no broadcast of either side. Probing ALL
    * cells (nprobe = nlist) makes the result exact, so the same SQL cross
    * join + row_number oracle checks the whole join path (cell assignment,
    * probe explosion, join, heap merge); partial-nprobe recall is gated in
    * `KnnJoinSpec`. Self-match excluded like near-dup linking would.
    */
  def knnJoin(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val model = IVF.trainLocal(emb, "embedding", k = 8, maxIter = 8)
    val queries = emb.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"))
    Search.knnJoinIvf(
        emb, "embedding", "vec_id", queries, "query_id", "qv",
        k = 3, model = model, nprobe = model.k,
        filter = lit(true))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), col("rank"),
        r6(sqrt(col("score"))).as("score"))
      .orderBy(col("query_id").asc, col("rank").asc)
  }

  /** Joined MMR ([[graft.query.Mmr.diversifyJoin]]): every 50th embedding
    * diversifies against the whole corpus through the IVF cell-routed
    * join — all cells probed, so the 20-candidate pool is exact and the
    * greedy λ=0.7 selection of 5 replays bit-exact in the unrolled DuckDB
    * mirror (relevance = −list_distance, the canonical-units convention).
    */
  def mmrJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.query.Mmr
    val emb = t(s, dir, "embeddings")
    val model = IVF.trainLocal(emb, "embedding", k = 8, maxIter = 8)
    val queries = emb.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    Mmr.diversifyJoin(emb, "embedding", "vec_id", queries, "query_id", "qv",
        k = 5, fetchK = 20, lambda = 0.7, model, nprobe = model.k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        // +0.0 normalizes the self-match's −0.0 (λ·−√0) identically on
        // both engines
        (r6(col("score")) + lit(0.0)).as("score"))
      .orderBy(col("query_id").asc, col("rank").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ivf_knn" -> (ivfKnn _),
    "knn_join" -> (knnJoin _),
    "mmr_join" -> (mmrJoin _),
    "sq8_rerank" -> (sq8Rerank _),
    "int4_rerank" -> (int4Rerank _),
    "pq_adc_rerank" -> (pqAdcRerank _),
    "opq_rerank" -> (opqRerank _),
    "rabitq_rerank" -> (rabitqRerank _),
    "bq_hamming" -> (bqHamming _)
  )

  private def exactKnnSql(qid: Int): String =
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $qid)
       |SELECT e.vec_id AS vec_id,
       |       round(list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 6) AS score
       |FROM embeddings e, q
       |ORDER BY list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]) ASC, e.vec_id ASC
       |LIMIT 10""".stripMargin

  val oracle: Map[String, String] = Map(
    "ivf_knn" -> exactKnnSql(6),
    "knn_join" ->
      """WITH s AS (
        |  SELECT q.vec_id AS query_id, e.vec_id,
        |         list_distance(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS score,
        |         row_number() OVER (PARTITION BY q.vec_id
        |           ORDER BY list_distance(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) ASC,
        |                    e.vec_id ASC) AS rank
        |  FROM embeddings e, embeddings q)
        |SELECT query_id, vec_id, rank, round(score, 6) AS score
        |FROM s WHERE rank <= 3 AND query_id <> vec_id
        |ORDER BY query_id ASC, rank ASC""".stripMargin,
    // joined MMR: exact pool (all cells probed) → the shared unrolled
    // greedy mirror; relevance −list_distance == Spark's −√(l2sq fold)
    "mmr_join" -> graft.query.Mmr.oracleSql(
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id % 50 = 0),
        |sc AS (SELECT q.qid, e.vec_id, e.embedding::DOUBLE[] AS v,
        |              -list_distance(e.embedding::DOUBLE[], q.qv) AS rel
        |       FROM embeddings e, q),
        |cand AS (SELECT * FROM sc
        |         QUALIFY row_number() OVER (PARTITION BY qid
        |                   ORDER BY rel DESC, vec_id ASC) <= 20)""".stripMargin,
      k = 5, lambda = 0.7,
      """SELECT qid AS query_id, t::INT AS rank,
        |       ids[CAST(sel[CAST(t AS INT)] AS INT)] AS vec_id,
        |       round(ss[CAST(t AS INT)], 6) + 0.0 AS score
        |FROM selK, unnest(range(1, 6)) u(t)
        |ORDER BY query_id ASC, rank ASC""".stripMargin),
    "sq8_rerank" -> exactKnnSql(7),
    "int4_rerank" -> exactKnnSql(1),
    "pq_adc_rerank" -> exactKnnSql(9),
    "opq_rerank" -> exactKnnSql(2),
    "rabitq_rerank" -> exactKnnSql(4),
    "bq_hamming" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 8)
        |SELECT e.vec_id AS vec_id,
        |       len(list_filter(range(1, 65),
        |           i -> (e.embedding[i] > 0) <> (q.qv[i] > 0)))::BIGINT AS hamming
        |FROM embeddings e, q
        |ORDER BY hamming ASC, e.vec_id ASC
        |LIMIT 10""".stripMargin
  )
}
