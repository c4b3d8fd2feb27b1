package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization with ADC scoring (vecgo I6,
  * `internal/quantization/pq.go:20-500`): m subvectors × ksub centroids;
  * codebooks trained by a seeded local Lloyd's k-means over a driver-side
  * sample (the reference trains on a capped sample the same way — PQ
  * training is the one deliberately non-distributed step, SURVEY.md §7.4).
  *
  * Query scoring is ADC (`pq.go:468-495`): a per-query distance table
  * (m × ksub doubles) is built on the driver, baked into the plan as a
  * flat literal array, and looked up per row with pure column expressions
  * — `aggregate(codes, sum of element_at(table, sub*ksub + code))` — so
  * the 100 TB scan stays inside whole-stage codegen with no UDF.
  */
object PQ {

  /** codebooks(sub)(centroid)(dimWithinSub) */
  final case class Model(m: Int, ksub: Int, subDim: Int,
      codebooks: Array[Array[Array[Float]]]) {

    /** Flat per-sub codebooks (`flatBooks(s)` = ksub·subDim floats) — the
      * ONE reference object the encode expression carries into codegen.
      */
    @transient private lazy val flatBooks: Array[Array[Float]] =
      codebooks.map { book =>
        val flat = new Array[Float](ksub * subDim)
        var c = 0
        while (c < book.length) {
          System.arraycopy(book(c), 0, flat, c * subDim, subDim)
          c += 1
        }
        flat
      }

    /** Column: encode array<float> → array<int> of m codes. A native
      * codegen expression ([[graft.functions.vec_pq_encode]]): the old
      * expression-composed nearest-centroid (ksub distance sub-expressions
      * per subspace) embedded the whole codebook as literals — 80+ MB task
      * binaries and a 64KB codegen blowout at real m·ksub.
      */
    def encodeCol(vec: Column): Column =
      graft.functions.vec_pq_encode(vec, flatBooks, ksub, subDim)

    /** Driver-side ADC distance table for a query: flat m*ksub doubles. */
    def adcTable(query: Array[Float]): Array[Double] = {
      val t = new Array[Double](m * ksub)
      var s = 0
      while (s < m) {
        var c = 0
        while (c < ksub) {
          var acc = 0.0
          var d = 0
          while (d < subDim) {
            val diff = query(s * subDim + d).toDouble - codebooks(s)(c)(d).toDouble
            acc += diff * diff
            d += 1
          }
          t(s * ksub + c) = acc
          c += 1
        }
        s += 1
      }
      t
    }

    /** Column: approximate squared L2 of a codes row against the query,
      * via table lookups — a native codegen kernel
      * ([[graft.functions.vec_pq_adc]]), no UDF, no boxed lambda eval.
      */
    def adcScoreCol(codes: Column, query: Array[Float]): Column =
      graft.functions.vec_pq_adc(codes, adcTable(query), ksub)

    /** Driver-side ADC table for INNER-PRODUCT scoring: the dot product
      * decomposes additively over subvectors, so `t(s,c) = ⟨q_s, cb_s(c)⟩`
      * and the approximate dot of a row is the sum of its m lookups
      * (vecgo's PQ serves IP the same way, `quantization/pq.go:468-500`).
      */
    def adcTableDot(query: Array[Float]): Array[Double] = {
      val t = new Array[Double](m * ksub)
      var s = 0
      while (s < m) {
        var c = 0
        while (c < ksub) {
          var acc = 0.0
          var d = 0
          while (d < subDim) {
            acc += query(s * subDim + d).toDouble * codebooks(s)(c)(d).toDouble
            d += 1
          }
          t(s * ksub + c) = acc
          c += 1
        }
        s += 1
      }
      t
    }

    /** Column: approximate inner product of a codes row against the query. */
    def adcScoreColDot(codes: Column, query: Array[Float]): Column =
      graft.functions.vec_pq_adc(codes, adcTableDot(query), ksub)
  }

  /** Seeded local Lloyd's k-means (the codebook trainer). */
  def lloydLocal(points: Array[Array[Float]], k: Int, iters: Int,
      seed: Long): Array[Array[Float]] = {
    val dim = points(0).length
    val rng = new scala.util.Random(seed)
    val n = points.length
    val centroids = Array.tabulate(math.min(k, n))(i => points(rng.nextInt(n)).clone())
    // pad with random points if fewer distinct samples than k
    val cents = if (centroids.length < k)
      centroids ++ Array.fill(k - centroids.length)(points(rng.nextInt(n)).clone())
    else centroids
    def l2sq(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d.toDouble * d; i += 1 }
      s
    }
    for (_ <- 0 until iters) {
      val sums = Array.fill(k, dim)(0.0)
      val counts = new Array[Int](k)
      points.foreach { p =>
        var best = 0; var bd = Double.MaxValue
        var c = 0
        while (c < k) { val d = l2sq(p, cents(c)); if (d < bd) { bd = d; best = c }; c += 1 }
        counts(best) += 1
        var d = 0
        while (d < dim) { sums(best)(d) += p(d); d += 1 }
      }
      for (c <- 0 until k if counts(c) > 0; d <- 0 until dim)
        cents(c)(d) = (sums(c)(d) / counts(c)).toFloat
    }
    cents
  }

  /** Train codebooks on a driver-side sample. `sampleCap` bounds driver
    * memory (reference caps its sample the same way).
    */
  def train(df: DataFrame, vecCol: String, m: Int, ksub: Int = 256,
      iters: Int = 10, seed: Long = 42L, sampleCap: Int = 100000): Model = {
    val sample = df.select(col(vecCol)).limit(sampleCap)
      .collect().map(_.getSeq[Float](0).toArray)
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val books = (0 until m).toArray.map { s =>
      val sub = sample.map(v => v.slice(s * subDim, (s + 1) * subDim))
      lloydLocal(sub, ksub, iters, seed + s)
    }
    Model(m, ksub, subDim, books)
  }

  def encode(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn("pq_codes", model.encodeCol(col(vecCol)))
}
