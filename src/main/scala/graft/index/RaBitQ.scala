package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** RaBitQ-style randomized binary quantization (vecgo I9,
  * `internal/quantization/rabitq.go`, after the SIGMOD'24 paper): a seeded
  * random orthonormal rotation decorrelates dimensions, then each rotated
  * dimension keeps only its sign (1 bit/dim). For (near-)unit vectors the
  * angle is estimated from the Hamming distance h as θ ≈ π·h/d, giving the
  * unbiased distance estimate |a−b|² ≈ 2 − 2·cos(π·h/d) used as the
  * approximate first-pass score before the exact rerank.
  *
  * (The full RaBitQ estimator also tracks per-vector norms and an error
  * bound; this implementation keeps the randomized-rotation + sign-bit
  * core and relies on the two-phase rerank for exactness.)
  */
object RaBitQ {

  final case class Model(rotation: Array[Array[Float]], dim: Int) {
    def encodeCol(vec: Column): Column =
      graft.index.BQ.packCol(vec_matmul(vec, rotation), dim)

    def packQuery(query: Array[Float]): Array[Long] = {
      val r = rotate(query)
      val nwords = (dim + 31) / 32
      val out = new Array[Long](nwords)
      for (i <- 0 until dim if r(i) > 0f) out(i / 32) |= (1L << (i % 32))
      out
    }

    def rotate(v: Array[Float]): Array[Float] = {
      val out = new Array[Float](dim)
      var j = 0
      while (j < dim) {
        var s = 0.0; var i = 0
        while (i < dim) { s += rotation(j)(i).toDouble * v(i).toDouble; i += 1 }
        out(j) = s.toFloat; j += 1
      }
      out
    }

    /** Approximate squared L2 from the sign-bit Hamming distance. */
    def approxScoreCol(codes: Column, query: Array[Float]): Column = {
      val h = vec_hamming(codes, lit(packQuery(query)))
      lit(2.0) - lit(2.0) * cos(lit(math.Pi) * h.cast("double") / lit(dim.toDouble))
    }
  }

  /** Seeded random orthonormal rotation via Gram-Schmidt on a Gaussian
    * matrix — data-independent, so "training" needs no data pass.
    */
  def train(dim: Int, seed: Long = 42L): Model = {
    val rng = new scala.util.Random(seed)
    val m = Array.fill(dim, dim)(rng.nextGaussian())
    for (i <- 0 until dim) {
      for (j <- 0 until i) {
        var dot = 0.0
        for (k <- 0 until dim) dot += m(i)(k) * m(j)(k)
        for (k <- 0 until dim) m(i)(k) -= dot * m(j)(k)
      }
      val n = math.sqrt(m(i).map(x => x * x).sum)
      for (k <- 0 until dim) m(i)(k) /= n
    }
    Model(m.map(_.map(_.toFloat)), dim)
  }

  def encode(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn("rq_codes", model.encodeCol(col(vecCol)))
}
