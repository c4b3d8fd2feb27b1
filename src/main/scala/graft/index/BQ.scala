package graft.index

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Binary quantization (vecgo I8, `internal/quantization/binary.go` +
  * Hamming `distance/distance.go:36-38`): 1 bit per dimension (sign),
  * packed 32 bits per long word (32 not 64, so the packing arithmetic
  * stays positive under ANSI mode), distance = popcount of XOR via
  * [[graft.functions.vec_hamming]].
  */
object BQ {

  /** Column: pack an array<float> of `dim` dims into ceil(dim/32) longs,
    * bit i of word w = sign(vec[32w + i]) > 0.
    */
  def packCol(vec: Column, dim: Int): Column = {
    val nwords = (dim + 31) / 32
    val words = (0 until nwords).map { w =>
      val hi = math.min(32, dim - w * 32)
      (0 until hi).map { i =>
        when(element_at(vec, w * 32 + i + 1) > 0f, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    array(words: _*)
  }
}
