package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seeded random-projection dimensionality reduction (Achlioptas 2003,
  * "Database-friendly random projections"; the JL-lemma workhorse):
  * `y = R·x / √k` with `R ∈ {±1}^{k×d}` — the cheap, data-independent
  * step a 100 TB embedding pipeline runs before indexing / clustering /
  * near-dup bucketing when the stored dimension is larger than the
  * geometry needs. The sign matrix derives from the corpus-wide portable
  * md5 convention ([[graft.dedup.Dedup.portableHash]] family), so the
  * SAME matrix is reproducible in any engine — the projection is
  * oracle-checkable, and a frozen (seed, dim, outDim) triple IS the
  * model: nothing to store, nothing to broadcast but a k×d literal.
  *
  * Projection is entirely ROW-LOCAL (k inner products per row against a
  * driver-built literal matrix): zero shuffle, append-mode streaming
  * safe, fuses into whatever scan the caller runs. Unlike the learned
  * rotation in [[OPQ]] this never trains, so it is also the right
  * pre-step when the corpus is too skewed/fresh to train on.
  */
object RandomProjection {

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  /** ±1 sign of matrix cell (i=input dim, j=output dim): parity of the
    * 60-bit md5 prefix of `"rp:<seed>:<i>:<j>"` — the exact expression
    * `CAST('0x' || substring(md5(…), 1, 15) AS BIGINT) % 2` computes in
    * DuckDB, so both engines build the identical matrix.
    */
  def signAt(seed: String, i: Int, j: Int): Double = {
    val h = java.lang.Long.parseLong(
      md5hex(s"rp:$seed:$i:$j").substring(0, 15), 16)
    if (h % 2 == 0) 1.0 else -1.0
  }

  /** The k×d sign matrix (row j = output dimension j). */
  def matrix(dim: Int, outDim: Int, seed: String): Array[Array[Double]] = {
    require(dim > 0 && outDim > 0, s"matrix: dim $dim outDim $outDim")
    Array.tabulate(outDim)(j => Array.tabulate(dim)(i => signAt(seed, i, j)))
  }

  /** Projected vector as a Column of `array<double>` length k: for each
    * output dim, one fold-accumulated inner product (ascending input
    * order — the same sequential accumulation DuckDB's
    * `list_inner_product` performs, so the doubles agree bitwise), then
    * ONE divide by √k. Keep `outDim` a power of four (16, 64…) when
    * cross-engine bit-parity matters — √k is then exact in binary.
    */
  def projectCol(vec: Column, mat: Array[Array[Double]]): Column = {
    val k = mat.length
    val matLit = typedlit(mat.map(_.toSeq).toSeq)
    val scale = math.sqrt(k.toDouble)
    transform(sequence(lit(1), lit(k)), j =>
      aggregate(zip_with(vec, element_at(matLit, j),
        (a, b) => a.cast("double") * b),
        lit(0.0), (acc, v) => acc + v) / scale)
  }

  /** Projection frame for the ANN/clustering path: (idCol, `proj`
    * array<float>) — `float` because every engine vector surface
    * ([[IVF]], [[graft.serve.LocalReplica]], [[graft.query.Search]])
    * speaks float32; the projected corpus feeds `buildIndex`/`knn`
    * unchanged.
    */
  def project(df: DataFrame, idCol: String, vecCol: String, outDim: Int,
      seed: String, dim: Int): DataFrame = {
    val mat = matrix(dim, outDim, seed)
    // the HOF matmul is dim×outDim mults per row — spread a narrow scan
    // so it never runs single-task (no-op at real scan widths)
    graft.functions.spread_input(df).select(col(idCol),
      transform(projectCol(col(vecCol), mat), v => v.cast("float"))
        .as("proj"))
  }
}
