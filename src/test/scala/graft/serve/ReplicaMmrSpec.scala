package graft.serve

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.types.{Candidate, Metric}

/** Serving-tier MMR ([[LocalReplica.searchMmr]] / [[ReplicaSet.searchMmr]]):
  * agreement with a driver-side greedy reference built from the replica's
  * OWN pool, the λ=1 degeneracy, metric-orientation handling, shard-count
  * invariance, and mutation safety.
  */
class ReplicaMmrSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dim = 16
  private val n = 600

  private def corpus = spark.range(0, n, 1, 4).select(
    col("id"),
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(col("id") * lit(97) + i), lit(1000))
        .cast("double") / lit(500.0) - lit(1.0)).cast("float")).as("vec"))

  private def queryVec(seed: Long): Array[Float] =
    Array.tabulate(dim)(i =>
      (((seed * 131 + i * 7919) % 1000) / 500.0 - 1.0).toFloat)

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** Reference greedy over (id, rel, vec), first-index tie-break. */
  private def refMmr(pool: Seq[(Long, Double, Array[Float])], k: Int,
      lambda: Double): Seq[(Long, Double)] = {
    val mu = 1.0 - lambda
    val sel = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    while (out.size < math.min(k, pool.size)) {
      var bestI = -1; var best = Double.NegativeInfinity
      for (i <- pool.indices if !sel.contains(i)) {
        val pen = if (sel.isEmpty) 0.0
          else sel.map(j => dot(pool(i)._3, pool(j)._3)).max
        val s = lambda * pool(i)._2 - mu * pen
        if (s > best) { best = s; bestI = i }
      }
      sel += bestI
      out += ((pool(bestI)._1, best))
    }
    out.toSeq
  }

  private def check(rep: LocalReplica, metric: Metric, q: Array[Float],
      k: Int, fetchK: Int, lambda: Double): Unit = {
    val got = rep.searchMmr(q, k, fetchK, lambda)
    val pool = rep.search(q, fetchK).map { c =>
      // ascending pools carry squared L2 → canonical rel is −√d²
      (c.id, if (metric.ascending) -math.sqrt(c.score) else c.score,
        rep.get(c.id).get)
    }
    val want = refMmr(pool, k, lambda)
    assert(got.map(_.id) === want.map(_._1), s"$metric ids")
    got.zip(want).foreach { case (c, (_, ws)) =>
      assert(math.abs(c.score - ws) < 1e-12, s"$metric score ${c.id}")
    }
  }

  test("searchMmr equals the greedy reference on its own pool, all metrics") {
    for (metric <- Seq(Metric.L2, Metric.Cosine, Metric.Dot)) {
      val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", metric)
      check(rep, metric, queryVec(3), k = 10, fetchK = 40, lambda = 0.7)
      check(rep, metric, queryVec(11), k = 5, fetchK = 25, lambda = 0.3)
    }
  }

  test("lambda=1 degenerates to the plain search order") {
    val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.Dot)
    val q = queryVec(5)
    val got = rep.searchMmr(q, 10, 30, lambda = 1.0)
    assert(got.map(_.id) === rep.search(q, 10).map(_.id))
  }

  test("diversification binds and contract violations are loud") {
    val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.Dot)
    val q = queryVec(9)
    val plain = rep.search(q, 10).map(_.id)
    // near-zero lambda maximizes spread: with a random corpus the picked
    // set must diverge from the pure-relevance page after rank 1
    val spread = rep.searchMmr(q, 10, 60, lambda = 0.05).map(_.id)
    assert(spread.head === plain.head, "rank 1 is always the most relevant")
    assert(spread.toSet !== plain.toSet, "diversification never bound")
    intercept[IllegalArgumentException] { rep.searchMmr(q, 10, 5, 0.5) }
    intercept[IllegalArgumentException] { rep.searchMmr(q, 10, 20, 1.5) }
  }

  test("sharded router matches the single replica at any shard count") {
    val single = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2)
    val q = queryVec(13)
    val want = single.searchMmr(q, 8, 32, 0.6)
    for (shards <- Seq(2, 4)) {
      val set = ReplicaSet.fromDataFrame(corpus, "vec", "id", Metric.L2,
        shards = shards)
      val got = set.searchMmr(q, 8, 32, 0.6)
      assert(got.map(_.id) === want.map(_.id), s"$shards shards")
      assert(got.map(_.score) === want.map(_.score), s"$shards shards")
    }
  }

  test("mmrGreedy drops a pool id whose vector vanished mid-flight") {
    val vecs = Map(
      1L -> Array(1.0f, 0.0f),
      3L -> Array(0.0f, 1.0f))
    val pool = Seq(Candidate(1L, 3.0), Candidate(2L, 2.0), Candidate(3L, 1.0))
    // id 2's row was deleted between the pool fetch and the vector read
    val got = LocalReplica.mmrGreedy(pool, vecs.get, ascending = false,
      k = 3, fetchK = 3, lambda = 0.5)
    assert(got.map(_.id) === Seq(1L, 3L))
  }

  test("a candidate deleted after the pool fetch is skipped, not fatal") {
    val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2)
    val q = queryVec(3)
    val pool = rep.search(q, 20)
    rep.delete(Array(pool(2).id))
    val got = rep.searchMmr(q, 10, 20, 0.7)
    assert(!got.map(_.id).contains(pool(2).id))
    assert(got.length === 10)
  }
}
