package graft.tools

import graft.functions.{DistanceKernels, KernelMode, MultiTopKBuffer, SimdKernels}

/** Microbench of the batch-search aggregate's update loop shape
  * (`MultiTopKDirect.update`): where do the cycles go between the raw
  * SIMD kernel and the measured `knn_dist_per_sec_big`? Variants:
  *  - `kernel_only`: l2sqFFfast over pre-unpacked rows (upper bound)
  *  - `update_loop`: the real shape — per-row bytesToFloats + per-query
  *    kernel + buffer insert
  *  - `blocked`: 4-query-unrolled kernel over pre-unpacked rows
  */
object BatchKernelProbe {
  def main(args: Array[String]): Unit = {
    val n = 100000
    val dim = 128
    val m = 100
    val k = 10
    val rnd = new java.util.Random(7)
    val rowsF = Array.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    val rowsB = rowsF.map(DistanceKernels.floatsToBytes)
    val queries = Array.fill(m)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    println(s"simd=${KernelMode.simdAvailable} fast=${KernelMode.fast}")

    def time(name: String, reps: Int)(f: => Double): Unit = {
      var s = 0.0
      var i = 0
      while (i < reps) { s += f; i += 1 } // warm
      val t0 = System.nanoTime()
      i = 0
      while (i < reps) { s += f; i += 1 }
      val sec = (System.nanoTime() - t0) / 1e9 / reps
      println(f"$name: ${sec * 1e3}%.1f ms  ${n.toLong * m / sec / 1e6}%.0f Mdist/s (sink=$s%.1f)")
    }

    for (r <- 1 to 3) {
      println(s"--- round $r")
      time("kernel_only", 2) {
        var acc = 0.0
        var i = 0
        while (i < n) {
          val v = rowsF(i)
          var q = 0
          while (q < m) {
            acc += DistanceKernels.l2sqFFfast(v, queries(q)); q += 1
          }
          i += 1
        }
        acc
      }
      time("update_loop", 2) {
        val buf = new MultiTopKBuffer(m, k)
        var i = 0
        while (i < n) {
          val v = DistanceKernels.bytesToFloats(rowsB(i))
          var q = 0
          while (q < m) {
            buf.insert(q, DistanceKernels.l2sqFFfast(v, queries(q)), i.toLong)
            q += 1
          }
          i += 1
        }
        buf.hashCode.toDouble
      }
      time("vertical_loop", 2) {
        val L = SimdKernels.floatLanes
        val mPad = (m + L - 1) / L * L
        val qT = new Array[Float](dim * mPad)
        for (q <- 0 until m; d <- 0 until dim) qT(d * mPad + q) = queries(q)(d)
        val out = new Array[Float](mPad)
        val buf = new MultiTopKBuffer(m, k)
        var i = 0
        while (i < n) {
          val v = DistanceKernels.bytesToFloats(rowsB(i))
          SimdKernels.l2sqMultiVertical(v, dim, qT, mPad, out)
          var q = 0
          while (q < m) { buf.insert(q, out(q).toDouble, i.toLong); q += 1 }
          i += 1
        }
        buf.hashCode.toDouble
      }
      time("unpack_only", 2) {
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += DistanceKernels.bytesToFloats(rowsB(i))(0); i += 1
        }
        acc
      }
      time("insert_only", 2) {
        val buf = new MultiTopKBuffer(m, k)
        var i = 0
        while (i < n) {
          var q = 0
          while (q < m) { buf.insert(q, 1e9 + i, i.toLong); q += 1 }
          i += 1
        }
        buf.hashCode.toDouble
      }
    }
  }
}
