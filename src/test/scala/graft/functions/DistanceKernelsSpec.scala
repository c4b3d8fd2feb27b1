package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalatest.funsuite.AnyFunSuite

class DistanceKernelsSpec extends AnyFunSuite {

  private def arr(xs: Array[Float]): ArrayData =
    ArrayData.toArrayData(xs)

  private val rng = new scala.util.Random(42)
  private def randVec(n: Int): Array[Float] =
    Array.fill(n)(rng.nextFloat() * 2f - 1f)

  test("l2sq matches naive double-accumulation") {
    for (_ <- 1 to 20) {
      val a = randVec(64); val b = randVec(64)
      val expected = a.zip(b).map { case (x, y) =>
        val d = x.toDouble - y.toDouble; d * d
      }.sum
      assert(math.abs(DistanceKernels.l2sq(arr(a), arr(b)) - expected) < 1e-12)
    }
  }

  test("dot matches naive") {
    val a = randVec(128); val b = randVec(128)
    val expected = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    assert(math.abs(DistanceKernels.dot(arr(a), arr(b)) - expected) < 1e-12)
  }

  test("cosine of identical vectors is 1, zero vector is 0") {
    val a = randVec(32)
    assert(math.abs(DistanceKernels.cosine(arr(a), arr(a)) - 1.0) < 1e-9)
    val z = Array.fill(32)(0f)
    assert(DistanceKernels.cosine(arr(z), arr(a)) == 0.0)
  }

  test("norm is sqrt of self-dot") {
    val a = randVec(64)
    val d = DistanceKernels.dot(arr(a), arr(a))
    assert(math.abs(DistanceKernels.norm(arr(a)) - math.sqrt(d)) < 1e-12)
  }

  test("hamming over packed longs") {
    val a = ArrayData.toArrayData(Array(0L, -1L, 0xF0L))
    val b = ArrayData.toArrayData(Array(0L, 0L, 0x0FL))
    assert(DistanceKernels.hammingLong(a, b) == 0 + 64 + 8)
  }

  test("dimension mismatch throws") {
    intercept[IllegalArgumentException] {
      DistanceKernels.l2sq(arr(randVec(3)), arr(randVec(4)))
    }
  }
}
