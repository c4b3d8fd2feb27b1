package graft.stats

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** PSI drift report: exact-zero on identical corpora, driver-reference
  * parity, shift localization, and edge-bucket clamping.
  */
class PsiDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  private def refPsi(a: Seq[Array[Float]], b: Seq[Array[Float]],
      dims: Int, lo: Double, hi: Double, bk: Int): Array[Double] = {
    def hist(rows: Seq[Array[Float]], j: Int): Array[Long] = {
      val h = new Array[Long](bk)
      rows.foreach { v =>
        if (j < v.length) {
          val raw = math.floor((v(j).toDouble - lo) / (hi - lo) * bk)
          h(math.min(bk - 1, math.max(0, raw.toInt))) += 1
        }
      }
      h
    }
    Array.tabulate(dims) { j =>
      val (ha, hb) = (hist(a, j), hist(b, j))
      // denominators are per-dimension histogram totals: rows missing a
      // dimension (short/null vectors) must not deflate its proportions
      val nA = ha.sum + 0.5 * bk
      val nB = hb.sum + 0.5 * bk
      var s = 0.0
      for (t <- 0 until bk) {
        val pa = (ha(t) + 0.5) / nA
        val pb = (hb(t) + 0.5) / nB
        s += (pa - pb) * math.log(pa / pb)
      }
      s
    }
  }

  test("identical corpora score exactly zero on every dimension") {
    val a = emb.where(col("label") < 5)
    val got = PsiDrift.perDim(a, a, "embedding", 64, -1.0, 1.0, 16)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got.size === 64)
    assert(got.values.forall(_ == 0.0), got.filter(_._2 != 0.0))
  }

  test("matches the driver-side reference on the fixture slices") {
    val a = emb.where(col("label") < 5)
    val b = emb.where(col("label") >= 5)
    val got = PsiDrift.perDim(a, b, "embedding", 64, -1.0, 1.0, 16)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("embedding").collect().map(_.getSeq[Float](0).toArray).toSeq
    val want = refPsi(rows(a), rows(b), 64, -1.0, 1.0, 16)
    for (j <- 0 until 64)
      assert(math.abs(got(j) - want(j)) < 1e-12, s"dim $j")
  }

  test("a shift in one dimension localizes: that dimension dominates") {
    val a = spark.range(0, 400, 1, 4).select(col("id"),
      transform(sequence(lit(0), lit(7)),
        i => (pmod(xxhash64(col("id") * lit(31) + i), lit(1000))
          .cast("double") / lit(1000.0) - lit(0.5)).cast("float")).as("v"))
    // b: dim 0 shifted by +0.4, other dims identical distribution
    val b = a.select(col("id"),
      transform(col("v"), (x, i) =>
        when(i === 0, x + lit(0.4f)).otherwise(x)).as("v"))
    val psi = PsiDrift.perDim(a, b, "v", 8, -1.0, 1.0, 16)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(psi(0) > 0.25, s"shifted dim reads stable: ${psi(0)}")
    for (j <- 1 until 8)
      assert(psi(j) == 0.0, s"unshifted dim $j drifted: ${psi(j)}")
  }

  test("short vectors on one side do not skew an identical dimension") {
    // dim 0 identically distributed on both sides; side b additionally
    // carries rows whose vectors stop before dim 1. With per-dimension
    // denominators dim 0 still reads the same proportions (rows present
    // in both histograms), and dim 1 compares only the rows that HAVE a
    // dim 1 — a row-count denominator would report phantom drift on
    // BOTH dimensions.
    val a = Seq(Tuple1(Array(0.1f, 0.2f)), Tuple1(Array(0.3f, 0.4f)),
      Tuple1(Array(0.5f, 0.6f)), Tuple1(Array(0.7f, 0.8f))).toDF("v")
    val b = Seq(Tuple1(Array(0.1f, 0.2f)), Tuple1(Array(0.3f, 0.4f)),
      Tuple1(Array(0.5f, 0.6f)), Tuple1(Array(0.7f, 0.8f)),
      Tuple1(Array(0.1f)), Tuple1(Array(0.3f)),
      Tuple1(Array(0.5f)), Tuple1(Array(0.7f))).toDF("v")
    val psi = PsiDrift.perDim(a, b, "v", 2, -1.0, 1.0, 16)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // dim 1 sees identical 4-row histograms on both sides → exactly 0
    assert(psi(1) == 0.0, s"dim 1 phantom drift: ${psi(1)}")
    // dim 0 matches the per-dim driver reference (tiny residual from the
    // smoothing term at different totals, far below the 0.1 "stable" bar)
    val want = refPsi(
      Seq(Array(0.1f, 0.2f), Array(0.3f, 0.4f), Array(0.5f, 0.6f),
        Array(0.7f, 0.8f)),
      Seq(Array(0.1f, 0.2f), Array(0.3f, 0.4f), Array(0.5f, 0.6f),
        Array(0.7f, 0.8f), Array(0.1f), Array(0.3f), Array(0.5f),
        Array(0.7f)), 2, -1.0, 1.0, 16)
    assert(math.abs(psi(0) - want(0)) < 1e-12, s"dim 0: ${psi(0)}")
    assert(psi(0) < 0.1, s"dim 0 reads unstable: ${psi(0)}")
  }

  test("out-of-range values clamp into the edge buckets, never lost") {
    val a = Seq(Tuple1(Array(-9.0f)), Tuple1(Array(9.0f))).toDF("v")
    val b = Seq(Tuple1(Array(0.0f)), Tuple1(Array(0.0f))).toDF("v")
    val psi = PsiDrift.perDim(a, b, "v", 1, -1.0, 1.0, 4)
      .collect().map(_.getDouble(1))
    // reference: a = one count in bucket 0 and one in bucket 3; b = two
    // counts in bucket 2
    val want = refPsi(Seq(Array(-9.0f), Array(9.0f)),
      Seq(Array(0.0f), Array(0.0f)), 1, -1.0, 1.0, 4)(0)
    assert(math.abs(psi(0) - want) < 1e-12)
    assert(psi(0) > 0.25)
  }
}
