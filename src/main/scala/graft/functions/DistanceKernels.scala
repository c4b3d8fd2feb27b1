package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Tight scalar kernels over Catalyst [[ArrayData]] (no boxing, no array
  * copy). Called both from interpreted `nullSafeEval` and from generated
  * code (whole-stage codegen emits static calls to these forwarders).
  *
  * Accumulation is double-precision, strictly left-to-right, so results are
  * bit-deterministic and match a sequential-loop oracle (DuckDB
  * `list_inner_product`/`list_distance` over DOUBLE casts).
  *
  * Reference semantics: vecgo `distance/distance.go` (L2 = squared L2;
  * Cosine = similarity on normalized inputs; Dot = raw inner product;
  * Hamming = popcount over binary codes).
  */
object DistanceKernels {

  @inline private def checkDims(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"vector dimension mismatch: ${n} vs ${b.numElements()}")
    n
  }

  /** Squared Euclidean distance. */
  def l2sq(a: ArrayData, b: ArrayData): Double =
    // bulk copies (single copyMemory for UnsafeArrayData) beat per-element
    // megamorphic getFloat calls by ~10x; see the Q-variants below
    l2sqFF(a.toFloatArray(), b.toFloatArray())

  /** Inner product. */
  def dot(a: ArrayData, b: ArrayData): Double = dotFF(a.toFloatArray(), b.toFloatArray())

  private def dotFF(af: Array[Float], bf: Array[Float]): Double = {
    if (af.length != bf.length)
      throw new IllegalArgumentException(
        s"vector dimension mismatch: ${af.length} vs ${bf.length}")
    var s = 0.0
    var i = 0
    while (i < af.length) { s += af(i).toDouble * bf(i).toDouble; i += 1 }
    s
  }

  /** Cosine similarity: dot / (||a|| * ||b||); 0.0 if either norm is 0. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val af = a.toFloatArray()
    val bf = b.toFloatArray()
    if (af.length != bf.length)
      throw new IllegalArgumentException(
        s"vector dimension mismatch: ${af.length} vs ${bf.length}")
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < af.length) {
      val x = af(i).toDouble
      val y = bf(i).toDouble
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else d / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb))
  }

  /** L2 norm of a single vector. */
  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      s += x * x
      i += 1
    }
    java.lang.Math.sqrt(s)
  }

  // ---- constant-query fast paths (primitive float[] right side) --------
  // When the query side of a distance expression is foldable (a literal
  // vector), the generic path would route every element access through a
  // boxed GenericArrayData — ~2 orders of magnitude slower. These variants
  // take the query as a primitive float[] baked into the generated code as
  // a reference object.

  def l2sqQ(a: ArrayData, q: Array[Float]): Double = {
    // bulk-copy once (single copyMemory for UnsafeArrayData) then run a
    // primitive-array loop the JIT can inline + auto-vectorize — per-element
    // ArrayData.getFloat is a megamorphic virtual call and ~10x slower
    val af = a.toFloatArray()
    l2sqFF(af, q)
  }

  /** primitive-array squared L2 (double accumulation, left-to-right) */
  def l2sqFF(af: Array[Float], q: Array[Float]): Double = {
    val n = q.length
    if (af.length != n)
      throw new IllegalArgumentException(
        s"vector dimension mismatch: ${af.length} vs $n")
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = af(i).toDouble - q(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  def dotQ(a: ArrayData, q: Array[Float]): Double = {
    val af = a.toFloatArray()
    val n = q.length
    if (af.length != n)
      throw new IllegalArgumentException(
        s"vector dimension mismatch: ${af.length} vs $n")
    var s = 0.0
    var i = 0
    while (i < n) { s += af(i).toDouble * q(i).toDouble; i += 1 }
    s
  }

  def cosineQ(a: ArrayData, q: Array[Float]): Double = {
    val af = a.toFloatArray()
    val n = q.length
    if (af.length != n)
      throw new IllegalArgumentException(
        s"vector dimension mismatch: ${af.length} vs $n")
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = af(i).toDouble
      val y = q(i).toDouble
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else d / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb))
  }

  /** Multi-query squared-L2: one pass per query over a primitive matrix —
    * the batch-search kernel (vecgo R6). Returns a primitive double[]
    * wrapped for Catalyst.
    */
  def l2sqMulti(a: ArrayData, qs: Array[Array[Float]]): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val af = a.toFloatArray() // one bulk copy amortized over ALL queries
    val m = qs.length
    val out = new Array[Double](m)
    var j = 0
    while (j < m) {
      out(j) = l2sqFF(af, qs(j))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Dense rotation: out[j] = sum_i m[j][i] * a[i], double accumulation,
    * float output — the OPQ/RaBitQ rotation kernel (matrix rides into
    * codegen as a primitive float[][]).
    */
  def matMul(a: ArrayData, m: Array[Array[Float]]): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val af = a.toFloatArray()
    val outDim = m.length
    val out = new Array[Float](outDim)
    var j = 0
    while (j < outDim) {
      val row = m(j)
      var s = 0.0
      var i = 0
      while (i < row.length) { s += row(i).toDouble * af(i).toDouble; i += 1 }
      out(j) = s.toFloat
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Hamming distance over packed binary codes (array<long> words). */
  def hammingLong(a: ArrayData, b: ArrayData): Long = {
    val n = checkDims(a, b)
    var s = 0L
    var i = 0
    while (i < n) {
      s += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    s
  }
}
