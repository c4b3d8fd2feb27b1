package graft.tools

import graft.functions.{DistanceKernels, KernelMode, SimdKernels}

/** Microbench: scalar l2sqFF loop vs vertical-lane double kernel for the
  * 256×128d centroid probe pass, plus Model.probes end-to-end.
  */
object ProbeKernelBench {
  def main(args: Array[String]): Unit = {
    // optional: bring up a Spark session first to test whether the
    // in-session environment (executor threads, JIT/code-cache load)
    // explains the 10us -> ~57us probes slowdown seen in ReplicaProbe
    val sparkMode = sys.env.getOrElse("PKB_SPARK", "")
    val spark =
      if (sparkMode.nonEmpty) {
        val s = org.apache.spark.sql.SparkSession.builder()
          .master(s"local[$sparkMode]")
          .config("spark.ui.enabled", "false").getOrCreate()
        s.sparkContext.setLogLevel("ERROR")
        s.range(0, 1000000).selectExpr("sum(id)").collect() // touch the JIT
        Some(s)
      } else None
    println(s"spark=${sparkMode} simdAvailable=${KernelMode.simdAvailable} doubleLanes=${SimdKernels.doubleLanes}")
    val k = 256; val dim = 128
    val rnd = new java.util.Random(3)
    val cents = Array.fill(k)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    val q = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    val L = SimdKernels.doubleLanes
    val blocks = (k + L - 1) / L
    val packed = new Array[Double](blocks * dim * L)
    for (c <- 0 until k; d <- 0 until dim)
      packed(((c / L) * dim + d) * L + (c % L)) = cents(c)(d).toDouble
    val out = new Array[Double](blocks * L)
    val model = graft.index.IVF.Model(cents)
    def time(name: String, iters: Int)(f: => Unit): Unit = {
      var i = 0
      while (i < iters) { f; i += 1 }
      val t0 = System.nanoTime()
      i = 0
      while (i < iters) { f; i += 1 }
      println(f"$name: ${(System.nanoTime() - t0) / 1e3 / iters}%.2f us/call")
    }
    for (r <- 1 to 3) {
      println(s"--- round $r")
      time("scalar_256", 20000) {
        var c = 0; var s = 0.0
        while (c < k) { s += DistanceKernels.l2sqFF(cents(c), q); c += 1 }
        if (s == Double.MinValue) println("")
      }
      time("vertical_256", 20000) {
        var b = 0
        while (b < blocks) {
          SimdKernels.l2sqVerticalBlock(packed, b * dim, q, out, b * L)
          b += 1
        }
      }
      time("model_probes_np16", 20000) { model.probes(q, 16); () }
      // 100 distinct query arrays like the replica benches use
      val qs = Array.fill(100)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
      var qi = 0
      time("model_probes_np16_100q", 20000) {
        model.probes(qs(qi % 100), 16); qi += 1; ()
      }
    }
    spark.foreach(_.stop())
  }
}
