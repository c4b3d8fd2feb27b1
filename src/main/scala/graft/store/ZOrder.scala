package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering key for multi-column data layout —
  * the Delta/Iceberg `OPTIMIZE ZORDER BY` move: rows sorted by the
  * interleaved bits of per-column quantile-bucket ranks land so that
  * each output file covers a small hyper-rectangle of the key space,
  * which turns parquet footer min/max stats into real multi-column file
  * and row-group pruning. Linear (single-column) clustering only prunes
  * on the leading column; the Morton curve spends its locality budget
  * evenly across all `cols`.
  *
  * Scale shape: per-column bounds are ONE deterministic Greenwald-Khanna
  * quantile sketch each (the [[graft.pipeline.Packing]] precedent — no
  * sampling randomness), the z-value is a pure codegen'd expression
  * (native bucket binary search + bit interleave, no UDF), and the
  * clustering itself is the one range-shuffle the rewrite needs anyway.
  * Nothing here is corpus-cartesian or driver-bound.
  */
object ZOrder {

  /** Morton z-value over `cols` as a pure Column: each column is rank-
    * bucketized into `2^bits` quantile buckets (bounds computed once,
    * driver-small) and the bucket bits are interleaved LSB-first across
    * columns. Monotone per column within a bucket row — the curve key a
    * range-repartition + sort clusters by.
    *
    * `df` is only used to SAMPLE the bounds; the returned Column can be
    * applied to any frame with the same columns (e.g. both passes of a
    * rewrite see the identical key).
    */
  def zColumn(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    val nc = cols.size
    require(nc >= 1, "zColumn needs at least one column")
    require(bits >= 1 && nc * bits <= 62,
      s"zColumn: $nc cols × $bits bits must fit a long (≤62)")
    val buckets = 1 << bits
    val qs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bucketCols: Seq[Column] = cols.map { c =>
      // deterministic GK sketch; duplicate bounds collapse (heavy hitters
      // share a bucket — correct: equal values are indistinguishable)
      val bounds = df.stat.approxQuantile(c, qs, 0.001).distinct.sorted
      graft.functions.lower_bound_bucket_d(col(c).cast("double"), bounds)
        .cast("long")
    }
    var z: Column = lit(0L)
    var bit = 0
    while (bit < bits) {
      var ci = 0
      while (ci < nc) {
        z = z + shiftleft(
          shiftright(bucketCols(ci), bit).bitwiseAND(lit(1L)),
          bit * nc + ci)
        ci += 1
      }
      bit += 1
    }
    z
  }
}
