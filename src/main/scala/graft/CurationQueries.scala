package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{vec_l2sq, vec_norm, vec_sum_double}

/** Training-data curation operators beyond the dedup/decontam set: corpus
  * vocabulary + IDF extraction, nearest-centroid cluster assignment,
  * per-class centroid embeddings, and embedding-norm outlier detection.
  * All oracle-checked against DuckDB on the driver corpus.
  *
  * 100 TB shapes: every operator here is one partial-aggregated shuffle
  * (token/label/cluster keyed) over a broadcast model side — no windows
  * over unpartitioned data, no driver-side loops.
  */
object CurationQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def r6(c: Column): Column = round(c, 6)

  /** Corpus vocabulary: top-25 word tokens by document frequency, with
    * smoothed IDF (`ln(N / (df + 1)) + 1`). Tokenization is the portable
    * lowercase [^a-z]+ split used by the dedup shingles, distinct per doc
    * — one explode + one token-keyed partial-aggregated shuffle, the
    * canonical vocabulary-extraction shape at corpus scale.
    */
  def vocabTopk(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val n = docs.count()
    docs
      .select(explode(array_distinct(
        split(lower(col("text")), "[^a-z]+"))).as("word"))
      .where(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("df"))
      .withColumn("idf", r6(log(lit(n.toDouble) / (col("df") + 1)) + 1))
      .orderBy(col("df").desc, col("word").asc)
      .limit(25)
  }

  /** Nearest-centroid cluster assignment (the classification half of
    * k-means, vecgo's IVF assignment step as a standalone operator):
    * centroids = the embeddings of vec_id 0..7 (broadcast), every vector
    * assigned by argmin distance with deterministic (rounded-distance,
    * centroid-id) tie-break via a lexicographic min-struct aggregate —
    * partial-aggregated, no window sort. Output: per-cluster size + mean
    * distance.
    */
  def clusterAssign(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        r6(sqrt(vec_l2sq(col("embedding"), col("cv")))).as("dr"))
      .groupBy("vec_id")
      .agg(min(struct(col("dr"), col("cid"))).as("m"))
      .select(col("m.cid").as("cid"), col("m.dr").as("dr"))
      .groupBy("cid")
      // ORDER-INSENSITIVE mean: dr is a round-6 value, so its micro-unit
      // (dr·1e6 rounded) is an exact integer — summing INTEGERS is
      // deterministic under any parallel aggregation order, then ONE
      // division pair reproduces bitwise on both engines. A double
      // avg() here flapped: DuckDB's parallel sum order varies run to
      // run, and one sf0.001 cluster mean sits exactly on a 5e-7
      // rounding boundary (~12% of checker runs read 1.256388 vs
      // .389).
      .agg(count(lit(1)).as("n"),
        sum(round(col("dr") * lit(1e6)).cast("long")).as("_sm"))
      .select(col("cid"), col("n"),
        r6(col("_sm").cast("double") / lit(1e6) / col("n")).as("avg_dist"))
      .orderBy(col("cid").asc)
  }

  /** Per-class centroid embedding (class prototypes for curriculum /
    * coverage analysis): element-wise mean per label via the
    * [[graft.functions.VecSumDouble]] partial aggregate — one double[dim]
    * buffer per task per label, one label-keyed shuffle; the
    * posexplode+groupBy alternative shuffles dim rows per vector. First
    * four dimensions exposed for the oracle.
    */
  def classCentroid(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val dim = emb.select(size(col("embedding"))).limit(1).collect()(0).getInt(0)
    emb.groupBy("label")
      .agg(count(lit(1)).as("n"), vec_sum_double(col("embedding"), dim).as("vs"))
      .select(col("label"), col("n"),
        r6(element_at(col("vs"), 1) / col("n")).as("c0"),
        r6(element_at(col("vs"), 2) / col("n")).as("c1"),
        r6(element_at(col("vs"), 3) / col("n")).as("c2"),
        r6(element_at(col("vs"), 4) / col("n")).as("c3"))
      .orderBy(col("label").asc)
  }

  /** Embedding hygiene: flag vectors whose L2 norm sits outside
    * mean ± 2·stddev (broken encoders produce near-zero or exploded
    * norms). The global moments are one tiny aggregate broadcast back
    * over the scan; comparisons round to 6 decimals on both engines so
    * boundary membership is deterministic.
    */
  def embeddingOutliers(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val withNorm = emb.select(col("vec_id"), vec_norm(col("embedding")).as("nrm"))
    val stats = withNorm.agg(avg(col("nrm")).as("mu"),
      stddev_pop(col("nrm")).as("sd"))
    withNorm.crossJoin(broadcast(stats))
      .select(col("vec_id"), r6(col("nrm")).as("norm"),
        (r6(col("nrm") - (col("mu") + lit(2) * col("sd"))) > 0 ||
          r6((col("mu") - lit(2) * col("sd")) - col("nrm")) > 0).as("is_outlier"))
      .orderBy(col("vec_id").asc)
  }

  /** Overlapping token-window chunking ([[graft.text.Features.chunk]]):
    * 48-token windows advancing by 40 (8 tokens of shared context) — the
    * step every embedding/retrieval pipeline runs before a model with a
    * context limit sees a long document. Pure per-row explode, no
    * shuffle until the output sort.
    */
  def textChunk(s: SparkSession, dir: String): DataFrame =
    graft.text.Features.chunk(t(s, dir, "documents"), "doc_id", "text",
        maxTokens = 48, overlap = 8)
      .orderBy(col("doc_id").asc, col("chunk_idx").asc)

  /** Hashed TF-IDF features ([[graft.text.Features.hashedTfIdf]]), 64
    * buckets: the text→vector front door checked end-to-end — tf shuffle,
    * windowed df/idf and L2 norm, all reproduced in the DuckDB oracle via
    * the corpus-wide portable md5 bucket hash. Uses the lazy overload (N
    * rides along in-plan), so constructing or benching the frame runs no
    * eager count job.
    */
  def hashedTfIdfQ(s: SparkSession, dir: String): DataFrame =
    graft.text.Features.hashedTfIdf(t(s, dir, "documents"), "doc_id",
        "text", dim = 64)
      .orderBy(col("doc_id").asc, col("bucket").asc)

  /** FROZEN BPE merge list for the oracle rows — learned once from the
    * sf0.01 documents corpus by [[graft.tools.BpeProbe]] (24 merges,
    * count-desc/lexicographic tie-break) and pinned here, the same
    * freeze-the-learned-model pattern as the quality classifier's
    * weights. Real training (distributed word counts → driver merge
    * loop) is exercised in `BpeSpec`; this list makes the ENCODING
    * arithmetic cross-engine-checkable: the DuckDB oracle applies the
    * identical merges as nested `replace` calls. None of the symbols
    * contains a single quote, so the SQL literals below need no escaping.
    */
  private[graft] val frozenBpe = graft.text.Bpe.BpeModel(Seq(
    ("e", "r</w>"), ("o", "w</w>"), ("t", "o"), ("a", "t"),
    ("l", "u"), ("a", "s"), ("i", "n"), ("e", "r"),
    ("o", "r"), ("a", "r"), ("p", "ar"), ("i", "n</w>"),
    ("j", "o"), ("jo", "in</w>"), ("as", "h</w>"), ("h", "ash</w>"),
    ("r", "ow</w>"), ("at", "c"), ("atc", "h</w>"), ("b", "atch</w>"),
    ("a", "n</w>"), ("c", "an</w>"), ("s", "can</w>"), ("c", "o")))

  /** BPE encoding under the frozen model ([[graft.text.Bpe.encode]]):
    * one row-local projection per document — token count and the full
    * space-joined subword stream, both hash-checked byte-for-byte
    * against DuckDB applying the same merge chain.
    */
  def bpeTokens(s: SparkSession, dir: String): DataFrame =
    graft.text.Bpe.encode(frozenBpe, t(s, dir, "documents"), "doc_id",
        "text")
      .orderBy(col("doc_id").asc)

  /** Adjacent-symbol pair counts over the corpus word table
    * ([[graft.text.Bpe.pairCounts]]) — the counting half of a BPE
    * training iteration as a standalone distributed operator (top-20 by
    * count, deterministic tie-break). `left`/`right` are SQL keywords,
    * so the row exposes them as lsym/rsym.
    */
  def bpePairs(s: SparkSession, dir: String): DataFrame =
    graft.text.Bpe.pairCounts(t(s, dir, "documents"), "text")
      .select(col("left").as("lsym"), col("right").as("rsym"), col("cnt"))
      .orderBy(col("cnt").desc, col("lsym").asc, col("rsym").asc)
      .limit(20)

  /** Random-projection dimensionality reduction
    * ([[graft.index.RandomProjection]]): 64d → 16d under the seeded ±1/√k
    * matrix, exposed as (vec_id, j, w) rows. Row-local (k literal inner
    * products per vector, one divide), zero shuffle before the output
    * sort; the identical matrix regenerates from md5 in the oracle.
    */
  def embeddingProject(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val dim = emb.select(size(col("embedding"))).limit(1).collect()(0)
      .getInt(0)
    val mat = graft.index.RandomProjection.matrix(dim, 16, "rp0")
    emb.select(col("vec_id"),
        posexplode(graft.index.RandomProjection.projectCol(
          col("embedding"), mat)))
      .select(col("vec_id"), col("pos").cast("long").as("j"),
        r6(col("col")).as("w"))
      .orderBy(col("vec_id").asc, col("j").asc)
  }

  /** Matryoshka prefix truncation ([[graft.index.Mrl]], Kusupati et al.
    * 2022): first 16 of 64 dims, L2-renormalized in double — the
    * zero-model dimension-cut serving tiers use on MRL-trained
    * embeddings. Exploded to (vec_id, j, w) like `embedding_project`
    * so the fold-accumulated norm verifies bitwise cross-engine.
    */
  def embeddingMrl(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    emb.select(col("vec_id"),
        posexplode(graft.index.Mrl.truncateColExact(col("embedding"), 16)))
      .select(col("vec_id"), col("pos").cast("long").as("j"),
        r6(col("col")).as("w"))
      .orderBy(col("vec_id").asc, col("j").asc)
  }

  /** ColBERT-style MaxSim rerank ([[graft.query.MaxSim]], Khattab &
    * Zaharia 2020): documents as arrays of token vectors (derived
    * deterministically here by splitting the 64-d fixture embedding into
    * 8×8-d tokens), a single-vector dot-product candidate pool of 50,
    * then exact Σ-max-dot late-interaction rescoring down to 10 — the
    * two-stage serving shape, with the token interaction as one
    * row-local codegen'd projection AFTER the candidate cut (never an
    * explode-join of token pairs; see `PlanSpec`'s maxsim gate). The
    * double fold order matches DuckDB's `list_reduce` exactly, so the
    * row hash-checks bitwise.
    */
  def maxsimRerank(s: SparkSession, dir: String): DataFrame = {
    import graft.query.MaxSim
    val toks = t(s, dir, "embeddings").select(col("vec_id"),
      col("embedding"), MaxSim.splitTokensCol(col("embedding"), 8, 8).as("toks"))
    val q = toks.where(col("vec_id") === 3)
      .select(col("embedding").as("qv"), col("toks").as("qtoks"))
    val cand = toks.crossJoin(broadcast(q))
      .withColumn("cs", graft.functions.vec_dot(col("embedding"), col("qv")))
      .orderBy(col("cs").desc, col("vec_id").asc)
      .limit(50)
    cand.select(col("vec_id"),
        MaxSim.maxSimCol(col("qtoks"), col("toks")).as("s"))
      .orderBy(col("s").desc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), r6(col("s")).as("score"))
  }

  /** MMR diversity rerank ([[graft.query.Mmr]], Carbonell & Goldstein
    * 1998): 4 queries, a 30-candidate dot-product pool each (bounded
    * per-partition heaps), then the greedy λ=0.7 trade of relevance
    * against redundancy down to 8 — one row-local fold per query, never
    * a pairwise explode-join. Every dot product and the fold itself
    * accumulate double in array order, so the selection decisions (not
    * just the rounded scores) replay bit-exact in the DuckDB mirror of
    * the same greedy steps.
    */
  def mmrDiversify(s: SparkSession, dir: String): DataFrame = {
    import graft.query.Mmr
    val emb = t(s, dir, "embeddings")
    val qs = emb.where(col("vec_id").isin(1, 3, 5, 7))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    Mmr.diversify(emb, "embedding", "vec_id", qs, "query_id", "qv",
        k = 8, fetchK = 30, lambda = 0.7, metric = graft.types.Metric.Dot)
      .select(col("query_id"), col("rank"), col("vec_id"),
        r6(col("score")).as("score"))
      .orderBy(col("query_id").asc, col("rank").asc)
  }

  /** Per-dimension PSI drift ([[graft.stats.PsiDrift]]) between two
    * "crawls" (label < 5 vs label >= 5 slices of the fixture): fixed
    * [-1, 1) 16-bucket histograms, Jeffreys smoothing, bucket-ordered
    * fold — the distribution-shift report read before trusting an index
    * or threshold across corpus versions.
    */
  def embeddingDrift(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    graft.stats.PsiDrift.perDim(
        emb.where(col("label") < 5), emb.where(col("label") >= 5),
        "embedding", dims = 64, lo = -1.0, hi = 1.0, buckets = 16)
      .select(col("j"), r6(col("psi")).as("psi"))
      .orderBy(col("j").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_vocab_topk" -> (vocabTopk _),
    "cluster_assign" -> (clusterAssign _),
    "class_centroid" -> (classCentroid _),
    "embedding_outliers" -> (embeddingOutliers _),
    "text_chunk" -> (textChunk _),
    "text_hashed_tfidf" -> (hashedTfIdfQ _),
    "text_bpe_tokens" -> (bpeTokens _),
    "text_bpe_pairs" -> (bpePairs _),
    "embedding_project" -> (embeddingProject _),
    "embedding_mrl" -> (embeddingMrl _),
    "maxsim_rerank" -> (maxsimRerank _),
    "mmr_diversify" -> (mmrDiversify _),
    "embedding_drift" -> (embeddingDrift _)
  )

  /** `mmr_diversify`'s DuckDB mirror — the shared unrolled-greedy builder
    * ([[graft.query.Mmr.oracleSql]]) over a 4-query dot-product pool.
    */
  private def mmrOracleSql(k: Int, fetchK: Int, lambda: Double): String =
    graft.query.Mmr.oracleSql(
      s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
         |           FROM embeddings WHERE vec_id IN (1, 3, 5, 7)),
         |sc AS (SELECT q.qid, e.vec_id, e.embedding::DOUBLE[] AS v,
         |              list_inner_product(e.embedding::DOUBLE[], q.qv) AS rel
         |       FROM embeddings e, q),
         |cand AS (SELECT * FROM sc
         |         QUALIFY row_number() OVER (PARTITION BY qid
         |                   ORDER BY rel DESC, vec_id ASC) <= $fetchK)""".stripMargin,
      k, lambda,
      s"""SELECT qid AS query_id, t::INT AS rank,
         |       ids[CAST(sel[CAST(t AS INT)] AS INT)] AS vec_id,
         |       round(ss[CAST(t AS INT)], 6) AS score
         |FROM selK, unnest(range(1, ${k + 1})) u(t)
         |ORDER BY query_id ASC, rank ASC""".stripMargin)

  /** The frozen merge list as a DuckDB nested-replace chain — the same
    * pinned string-replace semantics (non-overlapping, left-to-right,
    * resume after the replacement) Java, Spark and DuckDB share.
    */
  private def bpeChain(e: String): String =
    frozenBpe.merges.foldLeft(e) { case (x, (a, b)) =>
      s"replace($x, ' $a $b ', ' $a$b ')" }

  val oracle: Map[String, String] = Map(
    "text_vocab_topk" ->
      """WITH n AS (SELECT count(*) AS c FROM documents),
        |toks AS (SELECT unnest(list_distinct(
        |           string_split_regex(lower(text), '[^a-z]+'))) AS word
        |         FROM documents)
        |SELECT word, count(*) AS df,
        |       round(ln((SELECT c FROM n) * 1.0 / (count(*) + 1)) + 1, 6) AS idf
        |FROM toks WHERE length(word) >= 2
        |GROUP BY word
        |ORDER BY df DESC, word ASC
        |LIMIT 25""".stripMargin,
    "cluster_assign" ->
      """WITH cents AS (SELECT vec_id AS cid, embedding AS cv
        |               FROM embeddings WHERE vec_id < 8),
        |d AS (SELECT e.vec_id, c.cid,
        |             round(list_distance(e.embedding::DOUBLE[],
        |                                 c.cv::DOUBLE[]), 6) AS dr
        |      FROM embeddings e, cents c),
        |a AS (SELECT vec_id, cid, dr,
        |             row_number() OVER (PARTITION BY vec_id
        |                                ORDER BY dr ASC, cid ASC) AS rk
        |      FROM d)
        |SELECT cid, count(*) AS n,
        |       round(sum(CAST(round(dr * 1e6) AS BIGINT))::DOUBLE
        |             / 1e6 / count(*), 6) AS avg_dist
        |FROM a WHERE rk = 1
        |GROUP BY cid ORDER BY cid ASC""".stripMargin,
    "class_centroid" ->
      """SELECT label, count(*) AS n,
        |       round(sum(embedding[1]::DOUBLE) / count(*), 6) AS c0,
        |       round(sum(embedding[2]::DOUBLE) / count(*), 6) AS c1,
        |       round(sum(embedding[3]::DOUBLE) / count(*), 6) AS c2,
        |       round(sum(embedding[4]::DOUBLE) / count(*), 6) AS c3
        |FROM embeddings GROUP BY label ORDER BY label ASC""".stripMargin,
    "embedding_outliers" ->
      """WITH nn AS (SELECT vec_id,
        |              sqrt(list_inner_product(embedding::DOUBLE[],
        |                                      embedding::DOUBLE[])) AS nrm
        |            FROM embeddings),
        |st AS (SELECT avg(nrm) AS mu, stddev_pop(nrm) AS sd FROM nn)
        |SELECT vec_id, round(nrm, 6) AS norm,
        |       (round(nrm - (mu + 2 * sd), 6) > 0 OR
        |        round((mu - 2 * sd) - nrm, 6) > 0) AS is_outlier
        |FROM nn, st ORDER BY vec_id ASC""".stripMargin,
    // 48-token windows, step 40 (overlap 8); chunks are original-case —
    // tokenization must round-trip the document text
    "text_chunk" ->
      """WITH tk AS (SELECT doc_id,
        |              list_filter(regexp_split_to_array(text, '\s+'),
        |                          x -> len(x) > 0) AS ts
        |            FROM documents),
        |n AS (SELECT doc_id, ts, len(ts) AS n FROM tk WHERE len(ts) > 0),
        |c AS (SELECT doc_id, ts, n,
        |        unnest(range(0, 1 + CASE WHEN n <= 48 THEN 0
        |          ELSE ceil((n - 48)::DOUBLE / 40.0)::BIGINT END)) AS chunk_idx
        |      FROM n)
        |SELECT doc_id, chunk_idx,
        |       array_to_string(ts[(chunk_idx*40 + 1):(chunk_idx*40 + 48)],
        |                       ' ') AS chunk_text,
        |       least(48, n - chunk_idx*40)::BIGINT AS n_tokens
        |FROM c ORDER BY doc_id ASC, chunk_idx ASC""".stripMargin,
    // same portable md5 bucket hash as the Spark side; idf is sklearn
    // smooth idf over bucket df; w is L2-normalized per doc
    "text_hashed_tfidf" ->
      """WITH nd AS (SELECT count(*) AS c FROM documents),
        |tok AS (SELECT doc_id, unnest(list_filter(
        |          regexp_split_to_array(lower(text), '\s+'),
        |          x -> len(x) > 0)) AS tk
        |        FROM documents),
        |tfx AS (SELECT doc_id,
        |          CAST('0x' || substring(md5('tfidf:' || tk), 1, 15)
        |               AS BIGINT) % 64 AS bucket,
        |          count(*) AS tf
        |        FROM tok GROUP BY 1, 2),
        |dfx AS (SELECT bucket, count(*) AS dfb FROM tfx GROUP BY 1),
        |w0 AS (SELECT t.doc_id, t.bucket, t.tf,
        |         t.tf::DOUBLE * (ln(((SELECT c FROM nd) + 1)::DOUBLE /
        |                            (x.dfb + 1)::DOUBLE) + 1) AS w0
        |       FROM tfx t JOIN dfx x ON x.bucket = t.bucket),
        |nm AS (SELECT doc_id, sqrt(sum(w0 * w0)) AS nrm
        |       FROM w0 GROUP BY 1)
        |SELECT w.doc_id, w.bucket, round(w.w0 / m.nrm, 6) AS w
        |FROM w0 w JOIN nm m ON m.doc_id = w.doc_id
        |ORDER BY w.doc_id ASC, w.bucket ASC""".stripMargin,
    // frozen-merge BPE encode: code-point spacing with the fused </w>
    // marker, words joined by TWO spaces (merges cannot cross words),
    // then the identical 24-merge replace chain as the Spark side
    "text_bpe_tokens" ->
      s"""WITH tok AS (SELECT doc_id, list_filter(
         |          regexp_split_to_array(lower(text), '\\s+'),
         |          x -> len(x) > 0) AS ts
         |        FROM documents),
         |sp AS (SELECT doc_id,
         |         ' ' || array_to_string(list_transform(ts, t ->
         |             trim(regexp_replace(t, '(?s)(.)', '\\1 ', 'g')) || '</w>'),
         |           '  ') || ' ' AS s
         |       FROM tok WHERE len(ts) > 0),
         |m AS (SELECT doc_id, ${bpeChain("s")} AS s2 FROM sp)
         |SELECT doc_id,
         |       len(regexp_split_to_array(trim(s2), '\\s+'))::BIGINT AS n_bpe,
         |       regexp_replace(trim(s2), '\\s+', ' ', 'g') AS bpe_text
         |FROM m ORDER BY doc_id ASC""".stripMargin,
    // adjacent-symbol pair counts over the word-frequency table (the
    // counting half of one BPE training iteration), top-20 deterministic
    "text_bpe_pairs" ->
      """WITH tok AS (SELECT doc_id, list_filter(
        |          regexp_split_to_array(lower(text), '\s+'),
        |          x -> len(x) > 0) AS ts
        |        FROM documents),
        |w AS (SELECT unnest(ts) AS word FROM tok),
        |wc AS (SELECT word, count(*)::BIGINT AS cnt FROM w GROUP BY 1),
        |sy AS (SELECT cnt, list_filter(regexp_split_to_array(
        |         regexp_replace(word, '(?s)(.)', '\1 ', 'g'), ' '),
        |         x -> len(x) > 0) AS cs FROM wc),
        |s2 AS (SELECT cnt, list_append(cs[1:len(cs)-1],
        |                               cs[len(cs)] || '</w>') AS s
        |       FROM sy),
        |pr AS (SELECT s[i] AS lsym, s[i+1] AS rsym, cnt
        |       FROM s2, unnest(range(1, len(s))) t(i)
        |       WHERE len(s) >= 2)
        |SELECT lsym, rsym, sum(cnt)::BIGINT AS cnt
        |FROM pr GROUP BY 1, 2
        |ORDER BY cnt DESC, lsym ASC, rsym ASC
        |LIMIT 20""".stripMargin,
    // seeded ±1/√k projection: the sign matrix regenerates from the md5
    // parity convention, inner products accumulate ascending on both
    // engines, ONE divide by the exact √16 = 4
    "embedding_project" ->
      """WITH d AS (SELECT max(len(embedding)) AS dim FROM embeddings),
        |mat AS (SELECT j, list_transform(range(0, (SELECT dim FROM d)),
        |          i -> CASE WHEN CAST('0x' ||
        |                 substring(md5('rp:rp0:' || i || ':' || j), 1, 15)
        |                 AS BIGINT) % 2 = 0
        |               THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END) AS r
        |        FROM unnest(range(0, 16)) t(j))
        |SELECT e.vec_id, m.j,
        |       round(list_inner_product(e.embedding::DOUBLE[], m.r)
        |             / 4.0::DOUBLE, 6) AS w
        |FROM embeddings e, mat m
        |ORDER BY e.vec_id ASC, m.j ASC""".stripMargin,
    // MRL prefix truncation: double slice, fold norm (list_inner_product
    // accumulates ascending like Spark's aggregate — bitwise agreement),
    // one divide, round 6
    "embedding_mrl" ->
      """WITH p AS (SELECT vec_id, (embedding[1:16])::DOUBLE[] AS pre
        |           FROM embeddings),
        |n AS (SELECT vec_id, pre,
        |             sqrt(list_inner_product(pre, pre)) AS nrm FROM p)
        |SELECT vec_id, j,
        |       round(CASE WHEN nrm > 0 THEN pre[CAST(j + 1 AS INT)] / nrm
        |             ELSE 0.0::DOUBLE END, 6) AS w
        |FROM n, unnest(range(0, 16)) t(j)
        |ORDER BY vec_id ASC, j ASC""".stripMargin,
    // ColBERT MaxSim: tokens = 8×8-d slices of the pooled embedding;
    // candidate pool by single-vector dot (list_inner_product ==
    // vec_dot, proven by knn_dot); the Σ-max fold via list_reduce is
    // sequential in list order, exactly Spark's 0.0-seeded aggregate
    "maxsim_rerank" ->
      """WITH tok AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |         list_transform(range(0, 8), t ->
        |           (embedding::DOUBLE[])[t*8+1 : t*8+8]) AS toks
        |  FROM embeddings),
        |q AS (SELECT v AS qv, toks AS qtoks FROM tok WHERE vec_id = 3),
        |cand AS (
        |  SELECT tok.vec_id, tok.toks, q.qtoks
        |  FROM tok, q
        |  ORDER BY list_inner_product(tok.v, q.qv) DESC, tok.vec_id ASC
        |  LIMIT 50),
        |s AS (
        |  SELECT vec_id,
        |         list_reduce(list_transform(qtoks, qq ->
        |           list_max(list_transform(toks, d ->
        |             list_inner_product(qq, d)))),
        |           (a, b) -> a + b) AS score
        |  FROM cand)
        |SELECT vec_id, round(score, 6) AS score
        |FROM s ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,
    // MMR diversity rerank: the greedy fold unrolled to k CTE steps —
    // see mmrOracleSql for the bitwise-agreement argument
    "mmr_diversify" -> mmrOracleSql(k = 8, fetchK = 30, lambda = 0.7),
    // PSI drift: dense 64x16 grid, integer counts -> deterministic
    // smoothed proportions; per-dim sum folds in bucket order
    // (list_reduce left fold == Spark's 0.0-seeded aggregate)
    "embedding_drift" ->
      """WITH a AS (SELECT embedding FROM embeddings WHERE label < 5),
        |b AS (SELECT embedding FROM embeddings WHERE label >= 5),
        |ha AS (SELECT CAST(t.j AS INT) AS j,
        |              LEAST(15, GREATEST(0, CAST(floor(
        |                (a.embedding[CAST(t.j + 1 AS INT)]::DOUBLE + 1.0)
        |                / 2.0 * 16) AS INT))) AS bk,
        |              count(*) AS ca
        |       FROM a, unnest(range(0, 64)) t(j)
        |       GROUP BY 1, 2),
        |hb AS (SELECT CAST(t.j AS INT) AS j,
        |              LEAST(15, GREATEST(0, CAST(floor(
        |                (b.embedding[CAST(t.j + 1 AS INT)]::DOUBLE + 1.0)
        |                / 2.0 * 16) AS INT))) AS bk,
        |              count(*) AS cb
        |       FROM b, unnest(range(0, 64)) t(j)
        |       GROUP BY 1, 2),
        |grid AS (SELECT CAST(dj.d AS INT) AS j, CAST(bb.b AS INT) AS bk
        |         FROM unnest(range(0, 64)) dj(d),
        |              unnest(range(0, 16)) bb(b)),
        |cnts AS (
        |  SELECT g.j, g.bk,
        |         coalesce(ha.ca, 0)::DOUBLE AS ca,
        |         coalesce(hb.cb, 0)::DOUBLE AS cb,
        |         sum(coalesce(ha.ca, 0)) OVER (PARTITION BY g.j)::DOUBLE
        |           + 8.0 AS na,
        |         sum(coalesce(hb.cb, 0)) OVER (PARTITION BY g.j)::DOUBLE
        |           + 8.0 AS nb
        |  FROM grid g
        |  LEFT JOIN ha ON ha.j = g.j AND ha.bk = g.bk
        |  LEFT JOIN hb ON hb.j = g.j AND hb.bk = g.bk),
        |terms AS (
        |  SELECT j, bk,
        |         ((ca + 0.5) / na - (cb + 0.5) / nb)
        |         * ln(((ca + 0.5) / na) / ((cb + 0.5) / nb)) AS t
        |  FROM cnts)
        |SELECT j, round(list_reduce(list(t ORDER BY bk), (p, q) -> p + q), 6)
        |       AS psi
        |FROM terms GROUP BY j ORDER BY j ASC""".stripMargin
  )
}
