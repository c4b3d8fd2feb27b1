package graft.serve

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.index.PQ
import graft.types.Metric

/** The PQ-coded replica path (format v4): ADC first pass + exact rerank.
  * The admission margin is sound (pq.maxErr bounds every row's
  * reconstruction error), so results must EQUAL the uncoded float scan —
  * same ids, same scores, same tie-breaks — not merely approximate it.
  */
class LocalPQReplicaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dim = 64
  private val n = 3000

  private def corpus = {
    spark.range(0, n, 1, 4).select(
      col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("id") * lit(131) + i), lit(1000))
          .cast("double") / lit(500.0) - lit(1.0)).cast("float")).as("vec"))
  }

  private def queryVec(seed: Long): Array[Float] =
    Array.tabulate(dim)(i => (((seed * 131 + i * 7919) % 1000) / 500.0 - 1.0).toFloat)

  private lazy val pqModel: PQ.Model =
    PQ.train(corpus, "vec", m = 8, iters = 8, seed = 42L)

  test("PQ replica equals the uncoded scan exactly, all metrics") {
    for (metric <- Seq(Metric.L2, Metric.Cosine, Metric.Dot)) {
      val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", metric,
        pqModel = Some(pqModel))
      assert(rep.pqCoded && !rep.coded)
      val plain = rep.withoutCodes
      for (seed <- Seq(3L, 17L, 55L)) {
        val q = queryVec(seed)
        val got = rep.search(q, 20)
        val want = plain.search(q, 20)
        assert(got.map(_.id) == want.map(_.id), s"$metric ids")
        assert(got.map(_.score) == want.map(_.score), s"$metric scores")
      }
    }
  }

  test("PQ + IVF probed replica equals the probed uncoded scan") {
    val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2,
      nlist = 8, pqModel = Some(pqModel))
    val plain = rep.withoutCodes
    for (seed <- Seq(5L, 23L); np <- Seq(2, 4, 8)) {
      val q = queryVec(seed)
      assert(rep.search(q, 10, nprobe = np) == plain.search(q, 10, nprobe = np),
        s"seed=$seed nprobe=$np")
    }
  }

  test("PQ artifact round-trips through save/load (format v4)") {
    val dir = java.nio.file.Files.createTempDirectory("replica_pq").toString
    val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2,
      nlist = 4, pqModel = Some(pqModel))
    val path = s"$dir/rep.grlr"
    rep.save(path)
    val loaded = LocalReplica.load(path)
    assert(loaded.pqCoded && !loaded.coded)
    val q = queryVec(9)
    assert(loaded.search(q, 15) == rep.search(q, 15))
    assert(loaded.search(q, 10, nprobe = 2) == rep.search(q, 10, nprobe = 2))
  }

  test("PQ first pass admits a small candidate set but never loses a row") {
    // sanity on the economics: the coded pass should rerank far fewer rows
    // than it scans (the whole point) while staying exact. Measured via
    // the public results only: top-k equality at several k.
    val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2,
      pqModel = Some(pqModel))
    val plain = rep.withoutCodes
    for (k <- Seq(1, 10, 100)) {
      val q = queryVec(31)
      assert(rep.search(q, k) == plain.search(q, k), s"k=$k")
    }
  }

  // ------------------------------------------------------- OPQ (format v7)

  private lazy val opqModel: graft.index.OPQ.Model =
    graft.index.OPQ.train(corpus, "vec", m = 8, iters = 3, seed = 42L)

  test("OPQ replica equals the uncoded scan exactly, all metrics") {
    // codes live in ROTATED space; the query rotates for the ADC tables
    // and the exact rerank runs on the original floats — with the
    // measured-defect margin the result must EQUAL the uncoded scan
    for (metric <- Seq(Metric.L2, Metric.Cosine, Metric.Dot)) {
      val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", metric,
        opqModel = Some(opqModel))
      assert(rep.opqCoded && rep.pqCoded && !rep.coded)
      val plain = rep.withoutCodes
      for (seed <- Seq(3L, 17L, 55L)) {
        val q = queryVec(seed)
        val got = rep.search(q, 20)
        val want = plain.search(q, 20)
        assert(got.map(_.id) == want.map(_.id), s"$metric ids")
        assert(got.map(_.score) == want.map(_.score), s"$metric scores")
      }
    }
  }

  test("OPQ + IVF probed replica equals the probed uncoded scan") {
    val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2,
      nlist = 8, opqModel = Some(opqModel))
    val plain = rep.withoutCodes
    for (seed <- Seq(5L, 23L); np <- Seq(2, 4, 8)) {
      val q = queryVec(seed)
      assert(rep.search(q, 10, nprobe = np) == plain.search(q, 10, nprobe = np),
        s"seed=$seed nprobe=$np")
    }
  }

  test("OPQ artifact round-trips through save/load (format v7)") {
    val dir = java.nio.file.Files.createTempDirectory("replica_opq").toString
    val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.Cosine,
      nlist = 4, opqModel = Some(opqModel))
    val path = s"$dir/rep.grlr"
    rep.save(path)
    val loaded = LocalReplica.load(path)
    assert(loaded.opqCoded && loaded.pqCoded && !loaded.coded)
    val q = queryVec(9)
    assert(loaded.search(q, 15) == rep.search(q, 15))
    assert(loaded.search(q, 10, nprobe = 2) == rep.search(q, 10, nprobe = 2))
  }

  test("OPQ/PQ/INT4 mirror selection conflicts fail loudly") {
    val e1 = intercept[IllegalArgumentException] {
      LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2,
        pqModel = Some(pqModel), opqModel = Some(opqModel))
    }
    assert(e1.getMessage.contains("ONE of pqModel / opqModel"))
    val e2 = intercept[IllegalArgumentException] {
      LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2,
        int4 = true, opqModel = Some(opqModel))
    }
    assert(e2.getMessage.contains("ONE coded mirror"))
  }
}
