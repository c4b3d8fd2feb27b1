package graft.index

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions._
import graft.query.Search
import graft.types.Metric

/** OPQ / RaBitQ recall + rotation-math gates. */
class RotationQuantSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 32
  private val n = 600
  private val rng = new scala.util.Random(3)
  // near-unit vectors (RaBitQ's angle estimator assumes normalized-ish)
  private val data = (0 until n).map { i =>
    val v = Array.fill(dim)(rng.nextFloat() * 2 - 1)
    val nm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    (i.toLong, v.map(_ / nm))
  }
  private lazy val df = data.toDF("id", "vec")
  private val q = {
    val v = Array.fill(dim)(rng.nextFloat() * 2 - 1)
    val nm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    v.map(_ / nm)
  }
  private lazy val exactTop10: Seq[Long] = data
    .map { case (id, v) =>
      (id, v.zip(q).map { case (a, b) => val d = a.toDouble - b; d * d }.sum)
    }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1)

  test("RaBitQ rotation is orthonormal; encode+rerank recovers exact top-10") {
    val model = RaBitQ.train(dim)
    // R Rᵀ = I
    for (i <- 0 until dim; j <- 0 until dim) {
      val dot = (0 until dim).map(k =>
        model.rotation(i)(k).toDouble * model.rotation(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-4, s"($i,$j)=$dot")
    }
    // rotation preserves norms → distances
    val v = data.head._2
    val rv = model.rotate(v)
    val nv = math.sqrt(rv.map(x => x.toDouble * x).sum)
    assert(math.abs(nv - 1.0) < 1e-4)
    val coded = RaBitQ.encode(df, "vec", model).cache()
    val reranked = Search.rerank(coded, "id",
        model.approxScoreCol(col("rq_codes"), q),
        vec_l2sq(col("vec"), lit(q)), 10, 20, Metric.L2)
      .as[(Long, Double)].collect().map(_._1).toSeq
    val recall = reranked.toSet.intersect(exactTop10.toSet).size / 10.0
    assert(recall >= 0.9, s"rabitq rerank recall $recall")
  }

  test("OPQ reduces quantization error vs plain PQ and reranks exactly") {
    val mSub = 8
    val pq = PQ.train(df, "vec", m = mSub, ksub = 16, iters = 8)
    val opq = OPQ.train(df, "vec", m = mSub, ksub = 16, iters = 3, pqIters = 8)
    def pqErr: Double = {
      val coded = PQ.encode(df, "vec", pq)
      coded.select(avg(coded.col("pq_codes").isNotNull.cast("int"))).collect()
      // reconstruction error via ADC of each row against itself is complex
      // distributed; sample driver-side instead
      data.take(200).map { case (_, v) =>
        adcSelf(pq, v)
      }.sum / 200.0
    }
    def opqErr: Double = data.take(200).map { case (_, v) =>
      adcSelf(opq.pq, opq.rotate(v))
    }.sum / 200.0
    assert(opqErr <= pqErr * 1.05, s"opq=$opqErr pq=$pqErr")
    val coded = df.withColumn("opq_codes", opq.encodeCol(col("vec"))).cache()
    val reranked = Search.rerank(coded, "id",
        opq.adcScoreCol(col("opq_codes"), q),
        vec_l2sq(col("vec"), lit(q)), 10, 12, Metric.L2)
      .as[(Long, Double)].collect().map(_._1).toSeq
    assert(reranked == exactTop10)
  }

  /** Quantization error of encoding v and ADC-scoring against itself. */
  private def adcSelf(pq: PQ.Model, v: Array[Float]): Double = {
    var err = 0.0
    for (s <- 0 until pq.m) {
      var bd = Double.MaxValue
      for (c <- 0 until pq.ksub) {
        var d = 0.0
        for (i <- 0 until pq.subDim) {
          val t = v(s * pq.subDim + i).toDouble - pq.codebooks(s)(c)(i); d += t * t
        }
        bd = math.min(bd, d)
      }
      err += bd
    }
    err
  }
}
