package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.vec_sum_double

/** Model-based document quality filtering — the FineWeb-Edu / CCNet
  * "train a cheap classifier, score the whole corpus" step of a
  * training-data pipeline. A linear (logistic) model over hashed
  * bag-of-words features, trained as full-batch gradient descent where
  * each iteration is ONE Spark aggregate (per-partition partial gradient
  * buffers merged to a single `dim`-length vector — the `treeAggregate`
  * shape MLlib's own LogisticRegression uses), and scored under a FROZEN
  * model as a row-local column expression: zero shuffle, zero state,
  * directly usable on a streaming DataFrame in append mode.
  *
  * Feature space: the corpus-wide portable md5 token bucket of
  * [[Features.bucketOf]] (shared with the hashed-TF-IDF path), with
  * L1-normalized term frequencies `x_b = tf_b / n_tokens` — a linear
  * model over these is exactly fastText's mean-of-bucket-embeddings with
  * a 1-dimensional embedding per bucket.
  *
  * 100 TB shapes: training caches one dense `double[dim]` feature row
  * per document (dim ≤ ~1024 by design — use the sparse scoring path,
  * not training, beyond that) and runs `iters` shuffle-free aggregates
  * over it; the only driver state is the `dim`-length weight vector.
  * Scoring is per-row arithmetic over the document's own tokens — it
  * fuses into whatever scan/filter pipeline the caller already runs.
  */
object QualityClassifier {

  /** Frozen trained model: `score(doc) = σ(bias + Σ_b x_b · weights(b))`.
    * Small by construction — rides along as plain literals in the
    * scoring expression, no broadcast variable, no join.
    */
  final case class LinearQualityModel(dim: Int, weights: Array[Double],
      bias: Double) {
    require(weights.length == dim,
      s"LinearQualityModel: ${weights.length} weights for dim $dim")
  }

  /** One training observation per document: dense L1-normalized hashed
    * tf vector + label. Dense-by-`dim` is the aggregate-friendly layout
    * (the gradient is a [[vec_sum_double]] partial aggregate over it);
    * map-backed densification is O(dim·lookup) per doc, same envelope
    * as [[Features.tfidfVectors]]. All-whitespace documents carry no
    * signal and are dropped.
    */
  private def featureRows(df: DataFrame, idCol: String, textCol: String,
      labelCol: String, dim: Int): DataFrame =
    df.select(col(idCol).as("_qid"), col(labelCol).cast("double").as("_y"),
        filter(transform(split(lower(col(textCol)), "\\s+"),
          t => when(length(t) > 0, Features.bucketOf(t, dim))), _.isNotNull)
          .as("_bs"))
      .where(size(col("_bs")) > 0)
      .select(col("_qid"), col("_y"),
        transform(array_sort(array_distinct(col("_bs"))), b =>
          struct(b.as("b"), (size(filter(col("_bs"), x => x === b))
            .cast("double") / size(col("_bs"))).as("x"))).as("_sp"))
      .select(col("_qid"), col("_y"),
        map_from_entries(col("_sp")).as("_m"))
      .select(col("_qid"), col("_y"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("_m"), i.cast("long")), lit(0.0)))
          .as("_x"))

  /** Trains a logistic-regression quality model by full-batch gradient
    * descent with L2 regularization. Per iteration: margins and
    * per-document residuals are row-local expressions under the
    * broadcast-literal current weights, and the gradient reduces in one
    * shuffle-free aggregate — `vec_sum_double` of `x · (σ(m) − y)` plus
    * scalar sums for the bias and the monitored log-loss. Feature rows
    * are computed once and cached for the duration.
    *
    * Float summation order across partitions is not deterministic, so
    * two runs agree to ~1e-12 but not bitwise — freeze the returned
    * model (as [[Features.trainIdf]] / DSIR do) anywhere downstream
    * needs reproducibility.
    *
    * @return the model and the per-iteration mean log-loss (for
    *         convergence monitoring; strictly decreasing on any sane lr)
    */
  def train(df: DataFrame, idCol: String, textCol: String,
      labelCol: String, dim: Int, iters: Int = 30, lr: Double = 1.0,
      l2: Double = 1e-6): (LinearQualityModel, Array[Double]) = {
    require(dim > 0 && iters > 0, s"train: dim $dim / iters $iters")
    val feat = featureRows(df, idCol, textCol, labelCol, dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = feat.count().toDouble
      require(n > 0, "train: no documents with tokens")
      var w = new Array[Double](dim)
      var b = 0.0
      val losses = new Array[Double](iters)
      var it = 0
      while (it < iters) {
        // margin, probability and residual are row-local under lit(w);
        // the reduce is one partial-aggregated job, no shuffle-by-key
        val g = feat.select(
            (aggregate(zip_with(col("_x"), lit(w), (a, c) => a * c),
              lit(b), (acc, v) => acc + v)).as("_mrg"),
            col("_y"), col("_x"))
          .select(
            (lit(1.0) / (lit(1.0) + exp(-col("_mrg"))) - col("_y"))
              .as("_g"),
            // log(1+e^-|m|) + max(-ym̃,0) is the overflow-safe log-loss
            (log(lit(1.0) + exp(-abs(col("_mrg")))) +
              greatest(lit(0.0), when(col("_y") > 0.5, -col("_mrg"))
                .otherwise(col("_mrg")))).as("_ls"),
            col("_x"))
          .select(transform(col("_x"), v => v * col("_g")).as("_gx"),
            col("_g"), col("_ls"))
          .agg(vec_sum_double(col("_gx"), dim).as("gw"),
            sum(col("_g")).as("gb"), sum(col("_ls")).as("ls"))
          .collect()(0)
        val gw = g.getSeq[Double](0)
        val nw = new Array[Double](dim)
        var j = 0
        while (j < dim) {
          nw(j) = w(j) - lr * (gw(j) / n + l2 * w(j)); j += 1
        }
        b -= lr * g.getDouble(1) / n
        losses(it) = g.getDouble(2) / n
        w = nw
        it += 1
      }
      (LinearQualityModel(dim, w, b), losses)
    } finally { feat.unpersist(); () }
  }

  /** Token bucket array of a text column (NULL-free, one md5 per token). */
  private def bucketsOf(text: Column, dim: Int): Column =
    filter(transform(split(lower(text), "\\s+"),
      t => when(length(t) > 0, Features.bucketOf(t, dim))), _.isNotNull)

  /** Sigmoid margin over a PRE-MATERIALIZED bucket-array column.
    * `bs` MUST be an attribute reference (projected column), not the
    * tokenize+hash expression itself: a Column tree inlines at every
    * reference, so the per-distinct-bucket `filter(bs, …)` tf count
    * would re-split and re-md5 the whole document once per distinct
    * bucket — O(u·n) hashes/row, measured 38× slower at sf0.1. Over the
    * materialized int array the same shape is plain array arithmetic.
    */
  private def sigmoidOf(bs: Column, m: LinearQualityModel): Column = {
    val ws = lit(m.weights)
    val margin = aggregate(
      transform(array_sort(array_distinct(bs)), b =>
        size(filter(bs, x => x === b)).cast("double") / size(bs) *
          element_at(ws, b.cast("int") + 1)),
      lit(m.bias), (acc, v) => acc + v)
    lit(1.0) / (lit(1.0) + exp(-margin))
  }

  /** Quality score under a FROZEN model as a pure Column over the text:
    * `σ(bias + Σ_b (tf_b / n_tokens) · weights(b))`, NULL for
    * all-whitespace text. Entirely row-local (the weight table is a
    * `dim`-length array literal) — zero shuffle, zero state, append-mode
    * streaming safe, and usable directly inside a `.where` for the
    * actual filtering step. For corpus-scale scoring prefer [[score]],
    * which materializes the token-bucket array once per row (this
    * single-Column form re-tokenizes per distinct bucket — see
    * [[sigmoidOf]]).
    */
  def qualityScore(m: LinearQualityModel, text: Column): Column = {
    val bs = bucketsOf(text, m.dim)
    when(size(bs) > 0, sigmoidOf(bs, m))
  }

  /** Batch/streaming scoring frame: (idCol, q_score rounded 6, keep).
    * The shape of the real pipeline step — score everything, keep the
    * documents above the operating threshold. Two row-local projections
    * (buckets, then score) — still zero shuffle, zero state.
    */
  def score(m: LinearQualityModel, df: DataFrame, idCol: String,
      textCol: String, threshold: Double): DataFrame =
    df.select(col(idCol), bucketsOf(col(textCol), m.dim).as("_qc_bs"))
      .where(size(col("_qc_bs")) > 0)
      .select(col(idCol), round(sigmoidOf(col("_qc_bs"), m), 6).as("q_score"))
      .select(col(idCol), col("q_score"),
        (col("q_score") >= threshold).as("keep"))
}
