package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OPQ — optimized product quantization (vecgo I7,
  * `internal/quantization/opq.go`): PQ preceded by a LEARNED orthonormal
  * rotation that decorrelates the subspaces, trained by the classic
  * alternating scheme (OPQ-NP): encode with the current rotation → solve
  * the orthogonal Procrustes problem between data and reconstructions via
  * SVD → update R → retrain codebooks. Training is driver-side on a capped
  * sample (like PQ); the learned rotation is applied at scale as the
  * [[graft.functions.VecMatMul]] codegen expression.
  */
object OPQ {

  final case class Model(rotation: Array[Array[Float]], pq: PQ.Model) {
    /** Rotate then PQ-encode. */
    def encodeCol(vec: Column): Column =
      pq.encodeCol(graft.functions.vec_matmul(vec, rotation))
    /** ADC score of codes against a query (query rotated driver-side). */
    def adcScoreCol(codes: Column, query: Array[Float]): Column =
      pq.adcScoreCol(codes, rotate(query))
    def rotate(v: Array[Float]): Array[Float] = {
      val d = rotation.length
      val out = new Array[Float](d)
      var j = 0
      while (j < d) {
        var s = 0.0; var i = 0
        while (i < d) { s += rotation(j)(i).toDouble * v(i).toDouble; i += 1 }
        out(j) = s.toFloat
        j += 1
      }
      out
    }
  }

  // ---------------- dense linear algebra on the driver (dim x dim) -------

  private type Mat = Array[Array[Double]]

  private def matT(a: Mat): Mat = {
    val n = a.length; val m = a(0).length
    Array.tabulate(m, n)((i, j) => a(j)(i))
  }

  private def matMul(a: Mat, b: Mat): Mat = {
    val n = a.length; val k = a(0).length; val m = b(0).length
    val out = Array.ofDim[Double](n, m)
    var i = 0
    while (i < n) {
      var l = 0
      while (l < k) {
        val av = a(i)(l)
        if (av != 0.0) {
          var j = 0
          while (j < m) { out(i)(j) += av * b(l)(j); j += 1 }
        }
        l += 1
      }
      i += 1
    }
    out
  }

  /** Eigendecomposition of a symmetric matrix by cyclic Jacobi rotations:
    * returns (eigenvalues, eigenvectors-as-columns).
    */
  private def jacobiEigen(aIn: Mat, sweeps: Int = 30): (Array[Double], Mat) = {
    val n = aIn.length
    val a = aIn.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 0 until sweeps) {
      var off = 0.0
      for (p <- 0 until n; q <- p + 1 until n) off += a(p)(q) * a(p)(q)
      if (off < 1e-18) {
        return (Array.tabulate(n)(i => a(i)(i)), v)
      }
      for (p <- 0 until n; q <- p + 1 until n if math.abs(a(p)(q)) > 1e-15) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (i <- 0 until n) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - s * aiq
          a(i)(q) = s * aip + c * aiq
        }
        for (i <- 0 until n) {
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = c * api - s * aqi
          a(q)(i) = s * api + c * aqi
        }
        for (i <- 0 until n) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq
          v(i)(q) = s * vip + c * viq
        }
      }
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** Orthogonal Procrustes: the R maximizing tr(R · M) for M = X̂ᵀX,
    * via SVD of M built from eigen-decompositions.
    */
  private def procrustes(m: Mat): Mat = {
    // SVD(M) = U S Vᵀ; R = U Vᵀ. Get V from eigen(MᵀM), U = M V S⁻¹.
    val mtm = matMul(matT(m), m)
    val (eig, vMat) = jacobiEigen(mtm)
    val n = m.length
    // columns of vMat are eigenvectors; singular values = sqrt(eig)
    val u = Array.ofDim[Double](n, n)
    for (j <- 0 until n) {
      val sv = math.sqrt(math.max(eig(j), 1e-12))
      for (i <- 0 until n) {
        var s = 0.0
        for (k <- 0 until n) s += m(i)(k) * vMat(k)(j)
        u(i)(j) = s / sv
      }
    }
    matMul(u, matT(vMat))
  }

  /** Train rotation + codebooks on a driver-side sample. */
  def train(df: DataFrame, vecCol: String, m: Int, ksub: Int = 64,
      iters: Int = 3, pqIters: Int = 8, seed: Long = 42L,
      sampleCap: Int = 20000): Model = {
    val sample = df.select(col(vecCol)).limit(sampleCap)
      .collect().map(_.getSeq[Float](0).toArray)
    val dim = sample(0).length
    var rot: Mat = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    var pq: PQ.Model = null
    def applyRot(r: Mat, x: Array[Float]): Array[Float] = {
      val out = new Array[Float](dim)
      var j = 0
      while (j < dim) {
        var s = 0.0; var i = 0
        while (i < dim) { s += r(j)(i) * x(i); i += 1 }
        out(j) = s.toFloat; j += 1
      }
      out
    }
    for (_ <- 0 until iters) {
      val rotated = sample.map(applyRot(rot, _))
      pq = trainLocalPq(rotated, m, ksub, pqIters, seed)
      val recon = rotated.map(x => reconstruct(pq, x))
      // M = X̂ᵀ X (dim x dim); new R* aligns X to reconstructions:
      // rotate-by R means y = R x, want argmin |R x - x̂| → procrustes(X̂ᵀX)
      val mm = Array.ofDim[Double](dim, dim)
      for (t <- sample.indices) {
        val x = sample(t); val xh = recon(t)
        for (i <- 0 until dim; j <- 0 until dim)
          mm(i)(j) += xh(i).toDouble * x(j).toDouble
      }
      rot = procrustes(mm)
    }
    Model(rot.map(_.map(_.toFloat)), pq)
  }

  private def trainLocalPq(rotated: Array[Array[Float]], m: Int, ksub: Int,
      iters: Int, seed: Long): PQ.Model = {
    val dim = rotated(0).length
    val subDim = dim / m
    val books = (0 until m).toArray.map { s =>
      val sub = rotated.map(v => v.slice(s * subDim, (s + 1) * subDim))
      PQ.lloydLocal(sub, ksub, iters, seed + s)
    }
    PQ.Model(m, ksub, subDim, books)
  }

  private def reconstruct(pq: PQ.Model, x: Array[Float]): Array[Float] = {
    val out = new Array[Float](x.length)
    for (s <- 0 until pq.m) {
      var best = 0; var bd = Double.MaxValue
      for (c <- 0 until pq.ksub) {
        var d = 0.0
        for (i <- 0 until pq.subDim) {
          val t = x(s * pq.subDim + i) - pq.codebooks(s)(c)(i); d += t.toDouble * t
        }
        if (d < bd) { bd = d; best = c }
      }
      for (i <- 0 until pq.subDim)
        out(s * pq.subDim + i) = pq.codebooks(s)(best)(i)
    }
    out
  }
}
