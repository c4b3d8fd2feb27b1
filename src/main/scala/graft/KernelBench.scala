package graft

import graft.functions.{DistanceKernels, KernelMode, MultiTopKBuffer}

/** Kernel-isolation microbench: measures the raw distance kernels and the
  * top-k buffer insert WITHOUT Spark around them, so scan/agg overhead in
  * the full Bench numbers can be attributed. Run:
  * `sbt "runMain graft.KernelBench"` — prints one JSON line.
  *
  * [[envelope]] is the few-second variant [[Bench]] runs as a
  * degraded-window canary: this host has HOUR-scale variance (BASELINE.md),
  * and a pure-JVM kernel reading far below the documented clean floor
  * (~320 M dist/s) proves the WINDOW is sick before any Spark row is
  * blamed — the round-11 committed artifact under-sold identical code up
  * to 31× because nothing gated publication on window health.
  */
object KernelBench {

  private def genVecs(n: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
  }

  /** One parallel (rows × queries) distance pass — the batch-search shape. */
  private def sweep(data: Array[Array[Float]], queries: Array[Array[Float]],
      threads: Int, fast: Boolean, withHeap: Boolean): Double = {
    val n = data.length
    val m = queries.length
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

  /** Few-second host-health canary: fast+heap kernel dist/s on a 200k×128d
    * fixture (one discarded JIT pass, then min of two). Clean windows on
    * this box read ~300–335 M (BASELINE.md KernelBench envelope); a
    * reading far below that adjudicates host-window sickness, not code.
    */
  def envelope(): Double = {
    val n = 200000
    val dim = 128
    val m = 100
    val threads = Runtime.getRuntime.availableProcessors()
    val data = genVecs(n, dim, 42L)
    val queries = genVecs(m, dim, 7L)
    sweep(data, queries, threads, fast = true, withHeap = true) // JIT warmup
    val t = math.min(
      sweep(data, queries, threads, fast = true, withHeap = true),
      sweep(data, queries, threads, fast = true, withHeap = true))
    n.toDouble * m / t
  }

  def main(args: Array[String]): Unit = {
    val n = 500000
    val dim = 128
    val m = 100
    val threads = Runtime.getRuntime.availableProcessors()
    val data = genVecs(n, dim, 42L)
    val queries = genVecs(m, dim, 7L)

    def run(fast: Boolean, withHeap: Boolean): Double =
      sweep(data, queries, threads, fast, withHeap)

    // JIT warmup then measure
    run(fast = true, withHeap = true)
    run(fast = false, withHeap = true)
    val dists = n.toDouble * m
    val tFast = math.min(run(fast = true, withHeap = false),
      run(fast = true, withHeap = false))
    val tFastHeap = math.min(run(fast = true, withHeap = true),
      run(fast = true, withHeap = true))
    val tExact = math.min(run(fast = false, withHeap = false),
      run(fast = false, withHeap = false))
    println(s"""{"simd":${KernelMode.simdAvailable},"threads":$threads,""" +
      s""""fast_dist_per_sec":${(dists / tFast).toLong},""" +
      s""""fast_heap_dist_per_sec":${(dists / tFastHeap).toLong},""" +
      s""""exact_dist_per_sec":${(dists / tExact).toLong}}""")
  }
}
