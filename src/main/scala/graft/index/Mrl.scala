package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Matryoshka representation truncation (MRL, Kusupati et al. 2022,
  * arXiv:2205.13147): MRL-trained embeddings carry a usable
  * representation in every PREFIX, so a serving/index tier can cut its
  * vector cost d → d' by keeping the first d' components and
  * re-normalizing — no projection matrix, no training, no stored model
  * (the trick real embedding APIs expose as a `dimensions` knob).
  *
  * Entirely row-local (slice + one fold-accumulated norm + transform,
  * all codegen'd HOFs — no UDF, zero shuffle), so it composes with
  * [[IVF]]/[[graft.query.Search]]/replica export exactly like
  * [[RandomProjection]]'s output does, at 1/(d/d') the scan bytes.
  * MRL vs random projection: MRL needs prefix-trained embeddings but
  * preserves their geometry better at the same d'; the projection works
  * on ANY vectors. Both live here so a pipeline can pick per corpus.
  */
object Mrl {

  /** First `dims` components L2-renormalized, as `array<double>` — the
    * exact-arithmetic surface (fold-accumulated norm in ascending input
    * order, one divide; the same sequential accumulation DuckDB's
    * `list_inner_product` performs, so verification agrees bitwise).
    * An all-zero prefix passes through as zeros (no NaN) — callers
    * treat it like any zero vector (cosine surfaces reject it at
    * ingest, L2 serves it). A vector SHORTER than `dims` fails loudly
    * at evaluation time (`raise_error`): `slice` would silently return
    * an under-length prefix that only surfaces much later as a
    * confusing dim mismatch in buildIndex/replica export (round-9
    * advice).
    */
  def truncateColExact(vec: Column, dims: Int): Column = {
    require(dims > 0, s"truncateCol: dims must be positive, got $dims")
    val pre = transform(slice(vec, 1, dims), x => x.cast("double"))
    val nrm = sqrt(aggregate(pre, lit(0.0), (acc, x) => acc + x * x))
    val out =
      transform(pre, x => when(nrm > lit(0.0), x / nrm).otherwise(lit(0.0)))
    when(size(vec) >= dims, out).otherwise(raise_error(concat(
      lit(s"mrl truncate: vector has "), size(vec).cast("string"),
      lit(s" dims, need >= $dims"))))
  }

  /** Float32 truncation for the engine surfaces (every vector path —
    * store, index, replica — speaks `array<float>`).
    */
  def truncateCol(vec: Column, dims: Int): Column =
    transform(truncateColExact(vec, dims), x => x.cast("float"))

  /** Truncation frame for the ANN/store path: (idCol, `mrl`
    * array<float> of length `dims`) — feeds `buildIndex`/`knn`/replica
    * export unchanged.
    */
  def truncate(df: DataFrame, idCol: String, vecCol: String,
      dims: Int): DataFrame =
    df.select(col(idCol), truncateCol(col(vecCol), dims).as("mrl"))
}
