package graft.functions

import jdk.incubator.vector.{FloatVector, VectorOperators, VectorSpecies}

/** Panama Vector API distance kernels — the production fast path's SIMD
  * tier (the JVM twin of vecgo's hand-written AVX/NEON kernels,
  * `distance/simd_*.s`). Species is hardware-preferred (512-bit → 16
  * float lanes on AVX-512).
  *
  * This class is only LOADED behind [[KernelMode.simdAvailable]]: if the
  * JVM was started without `--add-modules=jdk.incubator.vector`, call
  * sites fall back to the scalar unrolled kernels and this class is never
  * initialized.
  *
  * Accumulation order is lane-parallel (not left-to-right) — same
  * non-reproducibility trade every SIMD float engine makes; verify paths
  * keep the exact double kernels.
  */
object SimdKernels {
  private val SP: VectorSpecies[java.lang.Float] = FloatVector.SPECIES_PREFERRED

  def l2sq(a: Array[Float], q: Array[Float]): Double = {
    val n = q.length
    if (a.length != n)
      throw new IllegalArgumentException(
        s"vector dimension mismatch: ${a.length} vs $n")
    val L = SP.length()
    var acc0 = FloatVector.zero(SP)
    var acc1 = FloatVector.zero(SP)
    var i = 0
    val ub2 = n - 2 * L + 1
    while (i < ub2) { // two FMA chains hide the FMA latency
      val d0 = FloatVector.fromArray(SP, a, i).sub(FloatVector.fromArray(SP, q, i))
      acc0 = d0.fma(d0, acc0)
      val d1 = FloatVector.fromArray(SP, a, i + L).sub(FloatVector.fromArray(SP, q, i + L))
      acc1 = d1.fma(d1, acc1)
      i += 2 * L
    }
    val ub = SP.loopBound(n)
    while (i < ub) {
      val d = FloatVector.fromArray(SP, a, i).sub(FloatVector.fromArray(SP, q, i))
      acc0 = d.fma(d, acc0)
      i += L
    }
    var s = acc0.add(acc1).reduceLanes(VectorOperators.ADD)
    while (i < n) { val d = a(i) - q(i); s += d * d; i += 1 }
    s.toDouble
  }

  /** Squared L2 of `q` against the row of a packed row-major matrix
    * starting at `base` — the serving-replica kernel
    * ([[graft.serve.LocalReplica]]): no per-row slice copy, the vector
    * loads read straight out of the shared flat array.
    */
  def l2sqAt(a: Array[Float], base: Int, q: Array[Float]): Double = {
    val n = q.length
    val L = SP.length()
    var acc0 = FloatVector.zero(SP)
    var acc1 = FloatVector.zero(SP)
    var i = 0
    val ub2 = n - 2 * L + 1
    while (i < ub2) {
      val d0 = FloatVector.fromArray(SP, a, base + i)
        .sub(FloatVector.fromArray(SP, q, i))
      acc0 = d0.fma(d0, acc0)
      val d1 = FloatVector.fromArray(SP, a, base + i + L)
        .sub(FloatVector.fromArray(SP, q, i + L))
      acc1 = d1.fma(d1, acc1)
      i += 2 * L
    }
    val ub = SP.loopBound(n)
    while (i < ub) {
      val d = FloatVector.fromArray(SP, a, base + i)
        .sub(FloatVector.fromArray(SP, q, i))
      acc0 = d.fma(d, acc0)
      i += L
    }
    var s = acc0.add(acc1).reduceLanes(VectorOperators.ADD)
    while (i < n) { val d = a(base + i) - q(i); s += d * d; i += 1 }
    s.toDouble
  }

  /** Inner product against a packed matrix row (see [[l2sqAt]]). */
  def dotAt(a: Array[Float], base: Int, q: Array[Float]): Double = {
    val n = q.length
    val L = SP.length()
    var acc0 = FloatVector.zero(SP)
    var acc1 = FloatVector.zero(SP)
    var i = 0
    val ub2 = n - 2 * L + 1
    while (i < ub2) {
      acc0 = FloatVector.fromArray(SP, a, base + i)
        .fma(FloatVector.fromArray(SP, q, i), acc0)
      acc1 = FloatVector.fromArray(SP, a, base + i + L)
        .fma(FloatVector.fromArray(SP, q, i + L), acc1)
      i += 2 * L
    }
    val ub = SP.loopBound(n)
    while (i < ub) {
      acc0 = FloatVector.fromArray(SP, a, base + i)
        .fma(FloatVector.fromArray(SP, q, i), acc0)
      i += L
    }
    var s = acc0.add(acc1).reduceLanes(VectorOperators.ADD)
    while (i < n) { s += a(base + i) * q(i); i += 1 }
    s.toDouble
  }

  def dot(a: Array[Float], q: Array[Float]): Double = {
    val n = q.length
    if (a.length != n)
      throw new IllegalArgumentException(
        s"vector dimension mismatch: ${a.length} vs $n")
    val L = SP.length()
    var acc0 = FloatVector.zero(SP)
    var acc1 = FloatVector.zero(SP)
    var i = 0
    val ub2 = n - 2 * L + 1
    while (i < ub2) {
      acc0 = FloatVector.fromArray(SP, a, i)
        .fma(FloatVector.fromArray(SP, q, i), acc0)
      acc1 = FloatVector.fromArray(SP, a, i + L)
        .fma(FloatVector.fromArray(SP, q, i + L), acc1)
      i += 2 * L
    }
    val ub = SP.loopBound(n)
    while (i < ub) {
      acc0 = FloatVector.fromArray(SP, a, i)
        .fma(FloatVector.fromArray(SP, q, i), acc0)
      i += L
    }
    var s = acc0.add(acc1).reduceLanes(VectorOperators.ADD)
    while (i < n) { s += a(i) * q(i); i += 1 }
    s.toDouble
  }
}
