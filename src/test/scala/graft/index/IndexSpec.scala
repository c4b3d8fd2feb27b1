package graft.index

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions._
import graft.query.Search
import graft.types.Metric

/** Recall gates mirroring the reference's quantization tests
  * (`integration_test/quantization_recall_test.go:17`): approximate paths
  * must recover >= 0.9 of the exact top-10, and exact-configured paths
  * must recover all of it.
  */
class IndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 32
  private val n = 1000
  private val rng = new scala.util.Random(7)
  private val data = (0 until n).map(i => (i.toLong, Array.fill(dim)(rng.nextFloat() * 2 - 1)))
  private lazy val df = data.toDF("id", "vec")
  private val q = Array.fill(dim)(rng.nextFloat() * 2 - 1)

  private lazy val exactTop10: Seq[Long] = data
    .map { case (id, v) =>
      (id, v.zip(q).map { case (a, b) => val d = a.toDouble - b; d * d }.sum)
    }
    .sortBy { case (id, d) => (d, id) }.take(10).map(_._1)

  private def recall(got: Seq[Long]): Double =
    got.toSet.intersect(exactTop10.toSet).size.toDouble / exactTop10.size

  test("IVF all-probe is exact; partial probe keeps high recall") {
    val model = IVF.train(df, "vec", k = 8)
    val assigned = IVF.assign(df, "vec", model).cache()
    val all = IVF.search(assigned, "vec", "id", model, q, 10, nprobe = 8)
      .as[(Long, Double)].collect().map(_._1).toSeq
    assert(all == exactTop10)
    val partial = IVF.search(assigned, "vec", "id", model, q, 10, nprobe = 3)
      .as[(Long, Double)].collect().map(_._1).toSeq
    assert(recall(partial) >= 0.6, s"nprobe=3 recall ${recall(partial)}")
  }

  test("IVF partitioned layout prunes partitions at probe time") {
    val model = IVF.train(df, "vec", k = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IVF.writeLayout(IVF.assign(df, "vec", model), dir)
    val reread = spark.read.parquet(dir)
    val probes = model.probes(q, 2)
    val plan = reread.where(col("ivf_part").isin(probes: _*))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("ivf_part"),
      s"expected partition pruning in:\n$plan")
  }

  test("probe selection is identical with the fast kernel on and off") {
    // IVF.Model.probes must always score exact-double-deterministic: a
    // lane-order float accumulation could flip near-ties across JVMs and
    // make the probed list set — hence recall — machine-dependent
    val model = IVF.train(df, "vec", k = 16)
    import graft.functions.KernelMode
    for (np <- Seq(1, 3, 8, 16)) {
      val a = KernelMode.withFast(true)(model.probes(q, np))
      val b = KernelMode.withFast(false)(model.probes(q, np))
      assert(a == b, s"nprobe=$np: $a vs $b")
    }
  }

  test("SIMD probe path == hand-rolled scalar exact selection (k over and under the gate)") {
    // k=16 rides the vertical-lane SIMD pass, k=8 the scalar loop — both
    // must reproduce a from-scratch l2sqFF (distance, index) selection
    for (k <- Seq(8, 16)) {
      val model = IVF.train(df, "vec", k = k)
      val dists = model.centroids.map(c =>
        graft.functions.DistanceKernels.l2sqFF(c, q))
      for (np <- Seq(1, 5, k)) {
        val expect = dists.zipWithIndex
          .sortBy { case (d, i) => (d, i) }.take(np).map(_._2).toSeq
        assert(model.probes(q, np) == expect, s"k=$k np=$np")
      }
    }
  }

  test("vertical double kernel matches l2sqFF bit-for-bit") {
    assume(graft.functions.KernelMode.simdAvailable)
    import graft.functions.{DistanceKernels, SimdKernels}
    val L = SimdKernels.doubleLanes
    val dim = 37 // non-multiple of any lane width
    val rnd = new scala.util.Random(7)
    val cents = Array.fill(L)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    val qv = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    val packed = new Array[Double](dim * L)
    for (l <- 0 until L; d <- 0 until dim)
      packed(d * L + l) = cents(l)(d).toDouble
    val out = new Array[Double](L)
    SimdKernels.l2sqVerticalBlock(packed, 0, qv, out, 0)
    for (l <- 0 until L)
      assert(java.lang.Double.doubleToLongBits(out(l)) ==
        java.lang.Double.doubleToLongBits(DistanceKernels.l2sqFF(cents(l), qv)),
        s"lane $l differs")
  }

  test("SQ8 round-trip error is small; approx-only search has high recall") {
    val model = SQ8.train(df, "vec")
    val coded = SQ8.encode(df, "vec", model).cache()
    val err = coded.select(
      max(vec_l2sq(col("vec"), model.decodeCol(col("codes")))).as("e"))
      .as[Double].collect()(0)
    // max per-dim error ~ (span/255)/2; squared summed over 32 dims stays tiny
    assert(err < 0.01, s"max reconstruction l2sq $err")
    val approx = coded
      .withColumn("score", vec_l2sq(model.decodeCol(col("codes")), lit(q)))
      .orderBy(col("score").asc, col("id").asc).limit(10)
      .select("id").as[Long].collect().toSeq
    assert(recall(approx) >= 0.9, s"sq8 approx recall ${recall(approx)}")
    // two-phase rerank is exact
    val reranked = Search.rerank(coded, "id",
        vec_l2sq(model.decodeCol(col("codes")), lit(q)),
        vec_l2sq(col("vec"), lit(q)), 10, 3, Metric.L2)
      .as[(Long, Double)].collect().map(_._1).toSeq
    assert(reranked == exactTop10)
  }

  test("PQ ADC rerank recovers exact top-10; raw ADC recall reasonable") {
    val model = PQ.train(df, "vec", m = 8, ksub = 64, iters = 10)
    val coded = PQ.encode(df, "vec", model).cache()
    val adc = coded
      .withColumn("score", model.adcScoreCol(col("pq_codes"), q))
      .orderBy(col("score").asc, col("id").asc).limit(10)
      .select("id").as[Long].collect().toSeq
    assert(recall(adc) >= 0.5, s"raw ADC recall ${recall(adc)}")
    val reranked = Search.rerank(coded, "id",
        model.adcScoreCol(col("pq_codes"), q),
        vec_l2sq(col("vec"), lit(q)), 10, 16, Metric.L2)
      .as[(Long, Double)].collect().map(_._1).toSeq
    assert(reranked == exactTop10, s"PQ rerank recall ${recall(reranked)}")
  }

  test("BQ packing: hamming(pack(a), pack(a)) == 0 and sign flips count") {
    val v1 = Array.fill(64)(1.0f)
    val v2 = v1.clone(); v2(0) = -1f; v2(40) = -1f
    val d = Seq((1L, v1), (2L, v2)).toDF("id", "vec")
      .select(BQ.packCol(col("vec"), 64).as("p"))
      .as[Array[Long]].collect()
    val ham = (d(0), d(1)).zipped.map((a, b) => java.lang.Long.bitCount(a ^ b)).sum
    assert(ham == 2)
  }
}
