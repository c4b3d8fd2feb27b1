package graft

import graft.functions.{DistanceKernels, KernelMode, MultiTopKBuffer}

/** Kernel-isolation microbench: measures the raw distance kernels and the
  * top-k buffer insert WITHOUT Spark around them, so scan/agg overhead in
  * the full Bench numbers can be attributed. Run:
  * `sbt "runMain graft.KernelBench"` — prints one JSON line.
  */
object KernelBench {

  private def genVecs(n: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
  }

  def main(args: Array[String]): Unit = {
    val n = 500000
    val dim = 128
    val m = 100
    val threads = Runtime.getRuntime.availableProcessors()
    val data = genVecs(n, dim, 42L)
    val queries = genVecs(m, dim, 7L)

    def sweep(fast: Boolean, withHeap: Boolean): Double = {
      // one parallel pass: every (row, query) distance, like batch search
      val t0 = System.nanoTime()
      val per = n / threads
      val ts = (0 until threads).map { t =>
        new Thread(() => {
          val buf = if (withHeap) new MultiTopKBuffer(m, 10) else null
          var sink = 0.0
          val lo = t * per
          val hi = if (t == threads - 1) n else lo + per
          var i = lo
          while (i < hi) {
            val v = data(i)
            var q = 0
            while (q < m) {
              val d =
                if (fast) DistanceKernels.l2sqFFfast(v, queries(q))
                else DistanceKernels.l2sqFF(v, queries(q))
              if (withHeap) buf.insert(q, d, i.toLong) else sink += d
              q += 1
            }
            i += 1
          }
          if (sink == Double.MinValue) println(sink) // defeat DCE
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }

    // JIT warmup then measure
    sweep(fast = true, withHeap = true)
    sweep(fast = false, withHeap = true)
    val dists = n.toDouble * m
    val tFast = math.min(sweep(fast = true, withHeap = false),
      sweep(fast = true, withHeap = false))
    val tFastHeap = math.min(sweep(fast = true, withHeap = true),
      sweep(fast = true, withHeap = true))
    val tExact = math.min(sweep(fast = false, withHeap = false),
      sweep(fast = false, withHeap = false))
    println(s"""{"simd":${KernelMode.simdAvailable},"threads":$threads,""" +
      s""""fast_dist_per_sec":${(dists / tFast).toLong},""" +
      s""""fast_heap_dist_per_sec":${(dists / tFastHeap).toLong},""" +
      s""""exact_dist_per_sec":${(dists / tExact).toLong}}""")
  }
}
