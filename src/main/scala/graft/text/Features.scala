package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text → feature operators for the embedding front door of a training /
  * retrieval pipeline: overlapping token-window chunking (the step before
  * any embedding model sees a long document) and hashed TF-IDF document
  * vectors (sklearn `HashingVectorizer` + `TfidfTransformer` semantics,
  * smooth idf, L2-normalized) that feed the ANN engine directly — the
  * whole text→vector→index path stays inside the library.
  *
  * Everything is column-level (codegen-friendly, zero UDFs) and
  * deterministic, so both operators are oracle-checkable in DuckDB.
  *
  * 100 TB shapes: chunking is a per-row explode (no shuffle at all);
  * TF-IDF is one token-keyed partial-aggregated shuffle for tf, a
  * ≤`dim`-row broadcast for df/idf, and one doc-keyed window for the
  * norm — nothing corpus-cartesian, nothing driver-side.
  */
object Features {

  /** Original-case whitespace tokens, empties dropped (chunk text must
    * round-trip the document, so no lowercasing here — unlike
    * [[TextAnalysis.wsTokens]]).
    */
  def rawTokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Overlapping token-window chunks: windows of `maxTokens` whitespace
    * tokens advancing by `maxTokens - overlap`, so consecutive chunks
    * share `overlap` tokens of context. The last window is allowed to be
    * short; all-whitespace documents produce no chunks. Pure per-row
    * explode — embarrassingly parallel, the plan has no shuffle until a
    * caller adds one.
    *
    * Output: (idCol, chunk_idx, chunk_text, n_tokens), chunk_idx 0-based.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens > 0, s"chunk: maxTokens must be positive ($maxTokens)")
    require(overlap >= 0 && overlap < maxTokens,
      s"chunk: overlap $overlap must be in [0, maxTokens) — an overlap >= " +
        "the window never advances")
    val step = maxTokens - overlap
    df.select(col(idCol), rawTokens(col(textCol)).as("_toks"))
      .withColumn("_n", size(col("_toks")))
      .where(col("_n") > 0)
      // nchunks - 1 = ceil((n - maxTokens) / step), floored at 0; the
      // cast to double is exact for any real token count (< 2^52)
      .withColumn("chunk_idx", explode(sequence(lit(0),
        when(col("_n") <= maxTokens, lit(0)).otherwise(
          ceil((col("_n") - maxTokens).cast("double") / step).cast("int")))))
      .withColumn("_start", col("chunk_idx") * step)
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        array_join(slice(col("_toks"), col("_start") + 1, lit(maxTokens)),
          " ").as("chunk_text"),
        least(lit(maxTokens), col("_n") - col("_start")).cast("long")
          .as("n_tokens"))
  }

  /** Engine-portable feature bucket of a (lowercased) token: the 60-bit
    * md5 hash used corpus-wide ([[graft.dedup.Dedup.portableHash]]),
    * reduced mod `dim`.
    */
  def bucketOf(tok: Column, dim: Int): Column =
    pmod(graft.dedup.Dedup.portableHash(lit("tfidf"), tok), lit(dim.toLong))

  /** THE tokenize+bucket projection every TF-IDF path shares — one
    * exploded (\_fid, bucket) row per non-empty lowercased whitespace
    * token. [[hashedTfIdf]], [[trainIdf]] and (in its per-row array
    * form, via [[bucketOf]]) [[scoreTfIdf]] must tokenize identically
    * or frozen-model/batch parity breaks; keeping the expression in one
    * place removes the drift surface.
    */
  private def tokenBuckets(df: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame =
    df.select(col(idCol).as("_fid"),
        explode(split(lower(col(textCol)), "\\s+")).as("_tok"))
      .where(length(col("_tok")) > 0)
      .select(col("_fid"), bucketOf(col("_tok"), dim).as("bucket"))

  private def tfRows(df: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame =
    tokenBuckets(df, idCol, textCol, dim)
      .groupBy("_fid", "bucket").agg(count(lit(1)).as("tf"))

  /** Shared tail of both [[hashedTfIdf]] overloads: df-as-window, smooth
    * idf (`nPlusOne` = N+1 as a column so the corpus size can ride along
    * lazily), windowed L2 norm, round 6.
    */
  private def tfIdfFinish(tf: DataFrame, nPlusOne: Column,
      idCol: String): DataFrame = {
    // tf has one row per (doc, bucket) → df = row count per bucket,
    // computed as a window over tf so the corpus is scanned exactly once
    val dfb = count(lit(1)).over(Window.partitionBy("bucket"))
    val idf = log(nPlusOne / (col("_df") + 1).cast("double")) + 1
    val w0 = tf.withColumn("_df", dfb)
      .withColumn("_w0", col("tf").cast("double") * idf)
    val nrm = sqrt(sum(col("_w0") * col("_w0"))
      .over(Window.partitionBy("_fid")))
    w0.select(col("_fid").as(idCol), col("bucket"),
      round(col("_w0") / nrm, 6).as("w"))
  }

  /** Hashed TF-IDF rows: one (id, bucket, w) per non-zero feature.
    * tf = token count in the hash bucket, idf = ln((N+1)/(df+1)) + 1
    * (sklearn smooth idf over bucket document frequency), w L2-normalized
    * per document. `numDocs` is the corpus size the idf is taken against
    * — this overload keeps it explicit for callers scoring under a
    * pinned statistic; the 4-arg overload derives it lazily in-plan.
    *
    * Shuffle budget: ONE corpus scan/tokenize feeding one
    * partial-aggregated (id, bucket) shuffle for tf; df and the L2 norm
    * are windows over the already-tiny tf rows (≤ docs·dim, vs corpus
    * tokens), keyed by bucket and id respectively. A tf→groupBy(bucket)
    * formulation reads twice: Catalyst prunes the unused count from the
    * df branch, the subtrees stop canonicalizing equal, and ReuseExchange
    * never fires — verified by `tools.ReuseCheck` and the FeaturesSpec
    * plan gate. Rounded to 6 decimals for cross-engine checks.
    */
  def hashedTfIdf(df: DataFrame, idCol: String, textCol: String,
      dim: Int, numDocs: Long): DataFrame = {
    require(dim > 0, s"hashedTfIdf: dim must be positive ($dim)")
    tfIdfFinish(tfRows(df, idCol, textCol, dim),
      lit((numDocs + 1).toDouble), idCol)
  }

  /** [[hashedTfIdf]] with the corpus size derived IN-PLAN: N rides along
    * as a broadcast 1-row count (an empty-schema scan — cheap next to
    * the tokenize pass), so building/explaining the frame runs no eager
    * driver action and repeated invocations pay no extra count job.
    */
  def hashedTfIdf(df: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    require(dim > 0, s"hashedTfIdf: dim must be positive ($dim)")
    val n = df.agg((count(lit(1)) + 1).cast("double").as("_np1"))
    tfIdfFinish(tfRows(df, idCol, textCol, dim).crossJoin(broadcast(n)),
      col("_np1"), idCol)
  }

  /** Frozen corpus statistic for TF-IDF scoring: bucket document
    * frequencies (dense, `df(b)` for b in [0, dim)) and the corpus size
    * they were taken against. Small by construction (dim ≤ a few
    * thousand), so it rides along as a plain literal — no broadcast
    * variable, no join.
    */
  final case class TfIdfModel(dim: Int, numDocs: Long, df: Array[Long])

  /** Trains the frozen idf statistic: one corpus scan → (doc, bucket)
    * partial-aggregated tf → ≤`dim`-row df collect.
    */
  def trainIdf(df: DataFrame, idCol: String, textCol: String,
      dim: Int): TfIdfModel = {
    require(dim > 0, s"trainIdf: dim must be positive ($dim)")
    val n = df.count()
    val dfRows = tokenBuckets(df, idCol, textCol, dim)
      .distinct()
      .groupBy("bucket").agg(count(lit(1)).as("_df"))
      .collect()
    val dense = new Array[Long](dim)
    dfRows.foreach(r => dense(r.getLong(0).toInt) = r.getLong(1))
    TfIdfModel(dim, n, dense)
  }

  /** Scores documents under a FROZEN [[TfIdfModel]] — same output shape
    * and arithmetic as [[hashedTfIdf]] (smooth idf, per-doc L2 norm,
    * round 6), but entirely ROW-LOCAL: each document's buckets, tf, idf
    * lookup (a `dim`-length array literal), and norm are array
    * expressions over that row alone. Zero shuffle, zero state — which
    * makes it the scale path for scoring NEW documents against an
    * existing corpus statistic, and directly usable on a streaming
    * DataFrame in append mode (the streaming twin of the batch
    * operator, like [[graft.pipeline.Dsir.score]]).
    *
    * Per-row cost is O(distinct buckets × tokens) (the tf count scans
    * the bucket array once per distinct bucket) — trivial at the
    * embedding dims this feeds (≤1024); for huge dims prefer the batch
    * [[hashedTfIdf]], whose tf is a hash aggregate.
    */
  def scoreTfIdf(m: TfIdfModel, df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val idf = lit(m.df.map(d =>
      math.log((m.numDocs + 1).toDouble / (d + 1).toDouble) + 1.0))
    df.select(col(idCol),
        filter(transform(split(lower(col(textCol)), "\\s+"),
          t => when(length(t) > 0, bucketOf(t, m.dim))), _.isNotNull)
          .as("_bs"))
      .where(size(col("_bs")) > 0)
      .withColumn("_ws", transform(array_sort(array_distinct(col("_bs"))),
        b => struct(b.as("bucket"),
          (size(filter(col("_bs"), x => x === b)).cast("double") *
            element_at(idf, b.cast("int") + 1)).as("w0"))))
      .withColumn("_nrm", sqrt(aggregate(col("_ws"), lit(0.0),
        (acc, s) => acc + s.getField("w0") * s.getField("w0"))))
      .select(col(idCol), explode(col("_ws")).as("_e"), col("_nrm"))
      .select(col(idCol), col("_e.bucket").as("bucket"),
        round(col("_e.w0") / col("_nrm"), 6).as("w"))
  }

  /** Dense hashed-TF-IDF vectors ready for the ANN engine: assembles the
    * sparse rows of [[hashedTfIdf]] into `array<float>` of length `dim`
    * (unit L2 norm, so Cosine ≡ Dot for downstream search). Map-backed
    * densification is O(dim · lookup) per doc — right for the embedding
    * dims this feeds (64–1024); keep `dim` out of the 100k+ range where a
    * sparse representation should be used instead.
    */
  def tfidfVectors(df: DataFrame, idCol: String, textCol: String,
      dim: Int, numDocs: Long): DataFrame =
    hashedTfIdf(df, idCol, textCol, dim, numDocs)
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("w"))))
        .as("_m"))
      .select(col(idCol),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("_m"), i.cast("long")), lit(0.0))
            .cast("float")).as("vec"))
}
