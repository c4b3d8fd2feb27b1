package graft.tools

import jdk.incubator.vector.{FloatVector, VectorSpecies}

object FmaCeiling {
  private val SP: VectorSpecies[java.lang.Float] = FloatVector.SPECIES_PREFERRED
  def main(args: Array[String]): Unit = {
    val a = FloatVector.broadcast(SP, 1.0001f)
    val b = FloatVector.broadcast(SP, 0.9999f)
    var c0 = FloatVector.zero(SP); var c1 = FloatVector.zero(SP)
    var c2 = FloatVector.zero(SP); var c3 = FloatVector.zero(SP)
    var c4 = FloatVector.zero(SP); var c5 = FloatVector.zero(SP)
    var c6 = FloatVector.zero(SP); var c7 = FloatVector.zero(SP)
    for (r <- 1 to 3) {
      val iters = 100000000
      val t0 = System.nanoTime()
      var i = 0
      while (i < iters) {
        c0 = a.fma(b, c0); c1 = a.fma(b, c1); c2 = a.fma(b, c2); c3 = a.fma(b, c3)
        c4 = a.fma(b, c4); c5 = a.fma(b, c5); c6 = a.fma(b, c6); c7 = a.fma(b, c7)
        i += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val vfma = 8L * iters
      println(f"round=$r vec_fma_per_sec=${vfma / sec / 1e9}%.2f G  flops=${vfma * SP.length() * 2 / sec / 1e9}%.1f GF/s (sink=${c0.lane(0) + c7.lane(1)})")
    }
  }
}
