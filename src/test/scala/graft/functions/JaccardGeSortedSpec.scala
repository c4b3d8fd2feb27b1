package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The sorted-merge verification kernel must reproduce the old
  * `size(array_intersect)/(|a|+|b|-inter)` expression EXACTLY: same
  * pass/fail decisions at the `>= minJ` filter (including boundary pairs
  * whose jaccard equals the threshold) and bit-identical jaccard values
  * for survivors.
  */
class JaccardGeSortedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def refJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    val inter = a.toSet.intersect(b.toSet).size.toLong
    inter.toDouble / (a.size.toLong + b.size.toLong - inter).toDouble
  }

  test("kernel matches the exact set-arithmetic jaccard on random sets") {
    val rng = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val a = (0 until 1 + rng.nextInt(40)).map(_ => rng.nextInt(60).toLong)
        .distinct.sorted
      val b = (0 until 1 + rng.nextInt(40)).map(_ => rng.nextInt(60).toLong)
        .distinct.sorted
      val t = rng.nextInt(11) / 10.0
      val got = DistanceKernels.jaccardGeSorted(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(a.toArray),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(b.toArray), t)
      val ref = refJaccard(a, b)
      if (ref >= t) assert(got === ref, s"a=$a b=$b t=$t")
      else assert(got < t, s"a=$a b=$b t=$t got=$got ref=$ref")
    }
  }

  test("boundary: jaccard exactly at the threshold passes") {
    // |A∩B|=4, |A∪B|=5 → jaccard 0.8 exactly
    val a = Array(1L, 2L, 3L, 4L)
    val b = Array(1L, 2L, 3L, 4L, 9L)
    val ga = new org.apache.spark.sql.catalyst.util.GenericArrayData(a)
    val gb = new org.apache.spark.sql.catalyst.util.GenericArrayData(b)
    assert(DistanceKernels.jaccardGeSorted(ga, gb, 0.8) === 0.8)
    assert(DistanceKernels.jaccardGeSorted(ga, gb,
      java.lang.Math.nextUp(0.8)) === -1.0)
  }

  test("in a plan, the kernel agrees with the old array_intersect form") {
    val rng = new scala.util.Random(13)
    val rows = (1 to 300).map { i =>
      val a = (0 until 1 + rng.nextInt(30)).map(_ => rng.nextInt(40).toLong)
        .distinct.sorted
      val b = (0 until 1 + rng.nextInt(30)).map(_ => rng.nextInt(40).toLong)
        .distinct.sorted
      (i, a, b)
    }
    val df = spark.createDataFrame(rows).toDF("i", "a", "b")
    val t = 0.5
    val old = df
      .withColumn("n_inter",
        size(array_intersect(col("a"), col("b"))).cast("long"))
      .withColumn("j", col("n_inter").cast("double") /
        (size(col("a")) + size(col("b")) - col("n_inter")).cast("double"))
      .where(col("j") >= t).select("i", "j")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    val neu = df
      .withColumn("j", graft.functions.jaccard_ge_sorted(col("a"), col("b"), t))
      .where(col("j") >= t).select("i", "j")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    assert(neu === old)
  }

  test("empty-side pairs fail instead of NaN-ing") {
    val e = new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val x = new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(1L))
    assert(DistanceKernels.jaccardGeSorted(e, x, 0.5) === -1.0)
    assert(DistanceKernels.jaccardGeSorted(e, e, 0.5) === -1.0)
    // minJ = 0: everything passes, including the disjoint pair at 0.0
    assert(DistanceKernels.jaccardGeSorted(x,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(2L)),
      0.0) === 0.0)
  }
}
