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
  private val ISP = jdk.incubator.vector.IntVector.SPECIES_PREFERRED
  // byte species with the SAME lane count as the float species, so one
  // byte load zero-extends into one float group (needs >= 8 float lanes —
  // below that there is no 8·L-bit byte shape; callers gate on sq8Ok)
  private val BSP: VectorSpecies[java.lang.Byte] =
    if (SP.length() >= 8)
      jdk.incubator.vector.VectorSpecies.of(java.lang.Byte.TYPE,
        jdk.incubator.vector.VectorShape.forBitSize(SP.length() * 8))
    else jdk.incubator.vector.ByteVector.SPECIES_64

  /** Whether the SQ8 coded kernels can run vectorized on this hardware. */
  val sq8Ok: Boolean = SP.length() >= 8

  // sign-extend + mask instead of ZERO_EXTEND_B2I: JDK 17's convertShape
  // mis-broadcasts the zero-extend mask (fixed in later JDKs)
  @inline private def codesAsFloats(codes: Array[Byte],
      off: Int): FloatVector =
    jdk.incubator.vector.ByteVector.fromArray(BSP, codes, off)
      .convertShape(VectorOperators.B2I, ISP, 0)
      .asInstanceOf[jdk.incubator.vector.IntVector].and(0xFF)
      .convert(VectorOperators.I2F, 0)
      .asInstanceOf[FloatVector]

  /** Approximate squared L2 of a query against one SQ8-coded row: the
    * decoded difference is `p1 + c·step` with `p1(i) = mins(i) − q(i)`
    * precomputed per query — one byte load + zero-extend + two FMAs per
    * lane group, a 4× memory-traffic cut vs the float row (the shape of
    * vecgo's SQ8 flat-segment scan, `segment/flat/segment.go:488-604`).
    */
  def sq8L2At(codes: Array[Byte], base: Int, p1: Array[Float],
      step: Array[Float]): Double = {
    val n = p1.length
    val L = SP.length()
    var acc0 = FloatVector.zero(SP)
    var acc1 = FloatVector.zero(SP)
    var i = 0
    val ub2 = n - 2 * L + 1
    while (i < ub2) {
      val d0 = codesAsFloats(codes, base + i)
        .fma(FloatVector.fromArray(SP, step, i), FloatVector.fromArray(SP, p1, i))
      acc0 = d0.fma(d0, acc0)
      val d1 = codesAsFloats(codes, base + i + L)
        .fma(FloatVector.fromArray(SP, step, i + L), FloatVector.fromArray(SP, p1, i + L))
      acc1 = d1.fma(d1, acc1)
      i += 2 * L
    }
    val ub = SP.loopBound(n)
    while (i < ub) {
      val d = codesAsFloats(codes, base + i)
        .fma(FloatVector.fromArray(SP, step, i), FloatVector.fromArray(SP, p1, i))
      acc0 = d.fma(d, acc0)
      i += L
    }
    var s = acc0.add(acc1).reduceLanes(VectorOperators.ADD)
    while (i < n) {
      val d = p1(i) + (codes(base + i) & 0xFF) * step(i)
      s += d * d; i += 1
    }
    s.toDouble
  }

  /** Approximate inner product against one SQ8-coded row: Σ qs(i)·c(i)
    * with `qs(i) = q(i)·step(i)`; the caller adds Σ q(i)·mins(i).
    */
  def sq8DotAt(codes: Array[Byte], base: Int, qs: Array[Float]): Double = {
    val n = qs.length
    val L = SP.length()
    var acc0 = FloatVector.zero(SP)
    var acc1 = FloatVector.zero(SP)
    var i = 0
    val ub2 = n - 2 * L + 1
    while (i < ub2) {
      acc0 = codesAsFloats(codes, base + i)
        .fma(FloatVector.fromArray(SP, qs, i), acc0)
      acc1 = codesAsFloats(codes, base + i + L)
        .fma(FloatVector.fromArray(SP, qs, i + L), acc1)
      i += 2 * L
    }
    val ub = SP.loopBound(n)
    while (i < ub) {
      acc0 = codesAsFloats(codes, base + i)
        .fma(FloatVector.fromArray(SP, qs, i), acc0)
      i += L
    }
    var s = acc0.add(acc1).reduceLanes(VectorOperators.ADD)
    while (i < n) { s += (codes(base + i) & 0xFF) * qs(i); i += 1 }
    s.toDouble
  }

  /** Approximate (dot, squared-norm) of one decoded SQ8 row against the
    * query — the cosine first pass reconstructs `x̃ = mins + c·step` once
    * and accumulates both Σ x̃·q and Σ x̃² in the same sweep.
    */
  def sq8DotNormAt(codes: Array[Byte], base: Int, mins: Array[Float],
      step: Array[Float], q: Array[Float]): (Double, Double) = {
    val n = q.length
    val L = SP.length()
    var accD = FloatVector.zero(SP)
    var accN = FloatVector.zero(SP)
    var i = 0
    val ub = SP.loopBound(n)
    while (i < ub) {
      val x = codesAsFloats(codes, base + i)
        .fma(FloatVector.fromArray(SP, step, i), FloatVector.fromArray(SP, mins, i))
      accD = x.fma(FloatVector.fromArray(SP, q, i), accD)
      accN = x.fma(x, accN)
      i += L
    }
    var d = accD.reduceLanes(VectorOperators.ADD).toDouble
    var nn = accN.reduceLanes(VectorOperators.ADD).toDouble
    while (i < n) {
      val x = mins(i) + (codes(base + i) & 0xFF) * step(i)
      d += x * q(i); nn += x * x; i += 1
    }
    (d, nn)
  }

  // --- INT4 packed kernels (split-plane nibble layout): byte j of a row
  // holds the code for dim j in its LOW nibble and dim half+j in its HIGH
  // nibble (half = ceil(dim/2)), so ONE byte load feeds two contiguous
  // float lane groups — half the first-pass memory traffic of SQ8 at two
  // extra mask/shift ops per load. The shape of vecgo's int4-coded
  // segment scan (`internal/segment/diskann/writer.go:73-95` codes the
  // same 4-bit cells), laid out for Panama instead of hand-written asm.

  // each kernel loads the byte vector ONCE and derives both nibble planes
  // from it (two masks + two converts) — separate lo/hi helpers would pay
  // the byte load twice

  /** Approximate squared L2 against one INT4-packed row starting at byte
    * `base`: decoded difference is `p1 + c·step` with
    * `p1(i) = mins(i) − q(i)` precomputed per query (same contract as
    * [[sq8L2At]]); `half = (dim+1)/2` is the row's nibble-plane width.
    */
  def int4L2At(codes: Array[Byte], base: Int, half: Int, p1: Array[Float],
      step: Array[Float]): Double = {
    val dim = p1.length
    val hiLen = dim - half // hi plane width (== half, or half-1 for odd dim)
    val L = SP.length()
    var acc0 = FloatVector.zero(SP)
    var acc1 = FloatVector.zero(SP)
    var i = 0
    val ub = SP.loopBound(hiLen)
    while (i < ub) {
      val bv = jdk.incubator.vector.ByteVector.fromArray(BSP, codes, base + i)
        .convertShape(VectorOperators.B2I, ISP, 0)
        .asInstanceOf[jdk.incubator.vector.IntVector]
      val lo = bv.and(0x0F).convert(VectorOperators.I2F, 0)
        .asInstanceOf[FloatVector]
      val hi = bv.and(0xFF).lanewise(VectorOperators.LSHR, 4)
        .convert(VectorOperators.I2F, 0).asInstanceOf[FloatVector]
      val d0 = lo.fma(FloatVector.fromArray(SP, step, i),
        FloatVector.fromArray(SP, p1, i))
      acc0 = d0.fma(d0, acc0)
      val d1 = hi.fma(FloatVector.fromArray(SP, step, half + i),
        FloatVector.fromArray(SP, p1, half + i))
      acc1 = d1.fma(d1, acc1)
      i += L
    }
    var s = acc0.add(acc1).reduceLanes(VectorOperators.ADD)
    while (i < half) {
      val b = codes(base + i) & 0xFF
      val dl = p1(i) + (b & 0x0F) * step(i)
      s += dl * dl
      if (i < hiLen) {
        val dh = p1(half + i) + (b >>> 4) * step(half + i)
        s += dh * dh
      }
      i += 1
    }
    s.toDouble
  }

  /** Approximate inner product against one INT4-packed row:
    * Σ qs(i)·c(i) with `qs(i) = q(i)·step(i)`; the caller adds
    * Σ q(i)·mins(i) (same contract as [[sq8DotAt]]).
    */
  def int4DotAt(codes: Array[Byte], base: Int, half: Int,
      qs: Array[Float]): Double = {
    val dim = qs.length
    val hiLen = dim - half
    val L = SP.length()
    var acc0 = FloatVector.zero(SP)
    var acc1 = FloatVector.zero(SP)
    var i = 0
    val ub = SP.loopBound(hiLen)
    while (i < ub) {
      val bv = jdk.incubator.vector.ByteVector.fromArray(BSP, codes, base + i)
        .convertShape(VectorOperators.B2I, ISP, 0)
        .asInstanceOf[jdk.incubator.vector.IntVector]
      val lo = bv.and(0x0F).convert(VectorOperators.I2F, 0)
        .asInstanceOf[FloatVector]
      val hi = bv.and(0xFF).lanewise(VectorOperators.LSHR, 4)
        .convert(VectorOperators.I2F, 0).asInstanceOf[FloatVector]
      acc0 = lo.fma(FloatVector.fromArray(SP, qs, i), acc0)
      acc1 = hi.fma(FloatVector.fromArray(SP, qs, half + i), acc1)
      i += L
    }
    var s = acc0.add(acc1).reduceLanes(VectorOperators.ADD)
    while (i < half) {
      val b = codes(base + i) & 0xFF
      s += (b & 0x0F) * qs(i)
      if (i < hiLen) s += (b >>> 4) * qs(half + i)
      i += 1
    }
    s.toDouble
  }

  /** Approximate (dot, squared-norm) of one decoded INT4 row against the
    * query — the cosine first pass (same contract as [[sq8DotNormAt]]).
    */
  def int4DotNormAt(codes: Array[Byte], base: Int, half: Int,
      mins: Array[Float], step: Array[Float],
      q: Array[Float]): (Double, Double) = {
    val dim = q.length
    val hiLen = dim - half
    val L = SP.length()
    var accD = FloatVector.zero(SP)
    var accN = FloatVector.zero(SP)
    var i = 0
    val ub = SP.loopBound(hiLen)
    while (i < ub) {
      val bv = jdk.incubator.vector.ByteVector.fromArray(BSP, codes, base + i)
        .convertShape(VectorOperators.B2I, ISP, 0)
        .asInstanceOf[jdk.incubator.vector.IntVector]
      val lo = bv.and(0x0F).convert(VectorOperators.I2F, 0)
        .asInstanceOf[FloatVector]
      val hi = bv.and(0xFF).lanewise(VectorOperators.LSHR, 4)
        .convert(VectorOperators.I2F, 0).asInstanceOf[FloatVector]
      val x0 = lo.fma(FloatVector.fromArray(SP, step, i),
        FloatVector.fromArray(SP, mins, i))
      accD = x0.fma(FloatVector.fromArray(SP, q, i), accD)
      accN = x0.fma(x0, accN)
      val x1 = hi.fma(FloatVector.fromArray(SP, step, half + i),
        FloatVector.fromArray(SP, mins, half + i))
      accD = x1.fma(FloatVector.fromArray(SP, q, half + i), accD)
      accN = x1.fma(x1, accN)
      i += L
    }
    var d = accD.reduceLanes(VectorOperators.ADD).toDouble
    var nn = accN.reduceLanes(VectorOperators.ADD).toDouble
    while (i < half) {
      val b = codes(base + i) & 0xFF
      val x0 = mins(i) + (b & 0x0F) * step(i)
      d += x0 * q(i); nn += x0 * x0
      if (i < hiLen) {
        val x1 = mins(half + i) + (b >>> 4) * step(half + i)
        d += x1 * q(half + i); nn += x1 * x1
      }
      i += 1
    }
    (d, nn)
  }

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

  // ---------------------------------------- bit-exact vertical double lanes

  /** Lane count of the double species (callers pad blocks to this). */
  val doubleLanes: Int = jdk.incubator.vector.DoubleVector.SPECIES_PREFERRED
    .length()

  /** L2² of `doubleLanes` centroids against one query, VERTICALLY: lane
    * `l` owns centroid `l` of the block and accumulates over dims in
    * order with a separate mul and add (NO fma — fma skips the
    * intermediate rounding and would change low bits). Each lane
    * therefore performs the exact operation sequence of
    * `DistanceKernels.l2sqFF`, so results are BIT-IDENTICAL to the
    * scalar exact kernel while the block runs `doubleLanes`× wider —
    * SIMD speed without giving up machine-deterministic probe selection.
    *
    * `packed((blockOff + d) * L + l)` = dim `d` of lane-`l` centroid,
    * as double; `blockOff` = block index · dim.
    */
  def l2sqVerticalBlock(packed: Array[Double], blockOff: Int,
      q: Array[Float], out: Array[Double], outOff: Int): Unit = {
    val DSP = jdk.incubator.vector.DoubleVector.SPECIES_PREFERRED
    val L = DSP.length()
    val dim = q.length
    var acc = jdk.incubator.vector.DoubleVector.zero(DSP)
    var d = 0
    val base = blockOff * L
    while (d < dim) {
      val c = jdk.incubator.vector.DoubleVector.fromArray(DSP, packed,
        base + d * L)
      val diff = c.sub(q(d).toDouble)
      acc = acc.add(diff.mul(diff))
      d += 1
    }
    acc.intoArray(out, outOff)
  }

  /** Number of float lanes of the preferred species (query-transpose
    * padding unit for the multi-query kernels).
    */
  val floatLanes: Int = SP.length()

  /** Squared L2 of ONE row against MANY queries, query-VERTICAL: `qT` is
    * the dim-major transpose of the query matrix padded to `mPad` lanes
    * (`qT(d * mPad + j)` = dim d of query j), and `out(j)` receives
    * |row − q_j|². Why this layout beats per-query horizontal kernels for
    * batch search: each accumulator LANE is one query, so (a) there are
    * no reduceLanes at all — the accumulator vectors ARE the results —
    * and (b) the 4 group accumulators give 4 independent FMA chains, so
    * the loop is FMA-throughput-bound instead of latency-bound. One row
    * element is broadcast once per dim per group and amortized over every
    * query. Float-lane accumulation, same contract as the other fast
    * kernels (verify paths use the exact double kernels).
    */
  def l2sqMultiVertical(row: Array[Float], dim: Int, qT: Array[Float],
      mPad: Int, out: Array[Float]): Unit = {
    val L = SP.length()
    var g = 0
    while (g + 4 * L <= mPad) {
      var acc0 = FloatVector.zero(SP)
      var acc1 = FloatVector.zero(SP)
      var acc2 = FloatVector.zero(SP)
      var acc3 = FloatVector.zero(SP)
      var d = 0
      while (d < dim) {
        val r = FloatVector.broadcast(SP, row(d))
        val base = d * mPad + g
        val d0 = r.sub(FloatVector.fromArray(SP, qT, base))
        acc0 = d0.fma(d0, acc0)
        val d1 = r.sub(FloatVector.fromArray(SP, qT, base + L))
        acc1 = d1.fma(d1, acc1)
        val d2 = r.sub(FloatVector.fromArray(SP, qT, base + 2 * L))
        acc2 = d2.fma(d2, acc2)
        val d3 = r.sub(FloatVector.fromArray(SP, qT, base + 3 * L))
        acc3 = d3.fma(d3, acc3)
        d += 1
      }
      acc0.intoArray(out, g)
      acc1.intoArray(out, g + L)
      acc2.intoArray(out, g + 2 * L)
      acc3.intoArray(out, g + 3 * L)
      g += 4 * L
    }
    while (g + 2 * L <= mPad) {
      var acc0 = FloatVector.zero(SP)
      var acc1 = FloatVector.zero(SP)
      var d = 0
      while (d < dim) {
        val r = FloatVector.broadcast(SP, row(d))
        val base = d * mPad + g
        val d0 = r.sub(FloatVector.fromArray(SP, qT, base))
        acc0 = d0.fma(d0, acc0)
        val d1 = r.sub(FloatVector.fromArray(SP, qT, base + L))
        acc1 = d1.fma(d1, acc1)
        d += 1
      }
      acc0.intoArray(out, g)
      acc1.intoArray(out, g + L)
      g += 2 * L
    }
    while (g < mPad) {
      // single-vector tail: split the dim walk over two accumulators to
      // keep two chains in flight
      var acc0 = FloatVector.zero(SP)
      var acc1 = FloatVector.zero(SP)
      var d = 0
      val ub = dim - 1
      while (d < ub) {
        val r0 = FloatVector.broadcast(SP, row(d))
        val d0 = r0.sub(FloatVector.fromArray(SP, qT, d * mPad + g))
        acc0 = d0.fma(d0, acc0)
        val r1 = FloatVector.broadcast(SP, row(d + 1))
        val d1 = r1.sub(FloatVector.fromArray(SP, qT, (d + 1) * mPad + g))
        acc1 = d1.fma(d1, acc1)
        d += 2
      }
      if (d < dim) {
        val r = FloatVector.broadcast(SP, row(d))
        val d0 = r.sub(FloatVector.fromArray(SP, qT, d * mPad + g))
        acc0 = d0.fma(d0, acc0)
      }
      acc0.add(acc1).intoArray(out, g)
      g += L
    }
  }
}
