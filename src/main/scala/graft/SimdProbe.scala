package graft
// scratch: probed-pattern (scattered ranges) scan cost, coded vs float
object SimdProbe {
  def main(args: Array[String]): Unit = {
    import graft.functions.SimdKernels
    val dim = 128
    val n = 50000
    val rnd = new java.util.Random(42)
    val flat = Array.fill(n * dim)(rnd.nextFloat() * 2 - 1)
    val codes = Array.fill[Byte](n * dim)((rnd.nextInt(256) - 128).toByte)
    val qs = Array.fill(100)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    val p1s = qs.map(q => Array.tabulate(dim)(i => -1f - q(i)))
    val step = Array.fill(dim)(2f / 255f)
    // 100 random probe sets of 16 ranges x ~195 rows
    val rangeSets = Array.fill(100)(
      Array.fill(16)(rnd.nextInt(n - 200)).sorted.map(s => (s, s + 195)))
    def timeUs(name: String, iters: Int)(f: Int => Unit): Unit = {
      var i = 0
      while (i < iters) { f(i); i += 1 }
      val t0 = System.nanoTime()
      i = 0
      while (i < iters) { f(i); i += 1 }
      println(f"$name: ${(System.nanoTime() - t0) / 1e3 / iters}%.1f us")
    }
    var sink = 0.0
    for (_ <- 1 to 3) {
      timeUs("scatter_float", 2000) { it =>
        val q = qs(it % 100)
        var s = 0.0
        rangeSets(it % 100).foreach { case (lo, hi) =>
          var r = lo
          while (r < hi) { s += SimdKernels.l2sqAt(flat, r * dim, q); r += 1 }
        }
        sink += s
      }
      timeUs("scatter_coded", 2000) { it =>
        val p1 = p1s(it % 100)
        var s = 0.0
        rangeSets(it % 100).foreach { case (lo, hi) =>
          var r = lo
          while (r < hi) { s += SimdKernels.sq8L2At(codes, r * dim, p1, step); r += 1 }
        }
        sink += s
      }
      // same scattered coded scan + a 10-heap admission emulation
      timeUs("scatter_coded_admit", 2000) { it =>
        val p1 = p1s(it % 100)
        val hs = new Array[Double](10)
        java.util.Arrays.fill(hs, Double.MaxValue)
        var hn = 0
        val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
        rangeSets(it % 100).foreach { case (lo, hi) =>
          var r = lo
          while (r < hi) {
            val a = SimdKernels.sq8L2At(codes, r * dim, p1, step)
            if (hn < 10) { hs(hn) = a; hn += 1 }
            else if (a < hs(0)) { buf += r; hs(0) = a }
            r += 1
          }
        }
        sink += hs(0) + buf.length
      }
      println("---")
    }
    println(sink)
  }
}
