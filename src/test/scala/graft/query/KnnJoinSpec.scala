package graft.query

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.index.IVF

/** [[Search.knnJoinIvf]] — the two-large-sides k-NN join.
  *
  * Contract under test:
  *  - nprobe = nlist ⇒ EXACT: identical (ids, scores, ranks) to the
  *    brute-force per-query ranking, because every (query, corpus) pair is
  *    scored exactly once (a corpus row lives in one cell).
  *  - nprobe < nlist ⇒ the standard IVF approximation; recall@k vs brute
  *    force must clear the same ≥0.95 gate the engine's indexed routes use.
  *  - `Model.probeCol` is the column twin of the driver-side
  *    `Model.probes` — same cells, same order, same tie-breaks.
  */
class KnnJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rng = new scala.util.Random(7)
  private val dim = 12
  private val n = 600
  // clustered data so IVF cells are meaningful: 6 gaussian blobs
  private val data: Seq[(Long, Array[Float])] = (0 until n).map { i =>
    val c = i % 6
    (i.toLong, Array.tabulate(dim)(d =>
      (c * 2.0 + rng.nextGaussian() * 0.4 + (if (d % 6 == c) 3.0 else 0.0)).toFloat))
  }
  private lazy val corpus = data.toDF("id", "vec")
  private lazy val queries = data.map { case (id, v) => (id, v) }
    .toDF("qid", "qv")
  private lazy val model = IVF.train(corpus, "vec", k = 6, maxIter = 10)

  private def bruteTopK(k: Int): Map[Long, Seq[(Long, Double)]] =
    data.map { case (qid, qv) =>
      qid -> data.map { case (id, v) =>
        val d = v.zip(qv).map { case (x, y) =>
          val t = x.toDouble - y.toDouble; t * t
        }.sum
        (id, d)
      }.sortBy { case (id, d) => (d, id) }.take(k)
    }.toMap

  test("probeCol matches driver-side probes (cells, order, ties)") {
    val got = queries
      .select(col("qid"), model.probeCol(col("qv"), 4).as("cells"))
      .as[(Long, Seq[Int])].collect().toMap
    data.foreach { case (qid, qv) =>
      assert(got(qid) == model.probes(qv, 4),
        s"probeCol != probes for query $qid")
    }
  }

  test("knn join with nprobe = nlist is exact (ids, scores, ranks)") {
    val k = 5
    val got = Search
      .knnJoinIvf(corpus, "vec", "id", queries, "qid", "qv",
        k = k, model = model, nprobe = model.k)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).map { case (q, rows) =>
        q -> rows.sortBy(_._4).map(r => (r._2, r._3)).toSeq
      }
    val want = bruteTopK(k)
    assert(got.keySet == want.keySet)
    got.foreach { case (q, rows) =>
      assert(rows.map(_._1) == want(q).map(_._1), s"ids differ for query $q")
      rows.zip(want(q)).foreach { case ((_, a), (_, b)) =>
        assert(math.abs(a - b) < 1e-9)
      }
    }
  }

  test("broadcastQueries pins a broadcast-hash plan and answers " +
      "identically to the shuffled join") {
    val k = 5
    def run(bcast: Boolean) = Search
      .knnJoinIvf(corpus, "vec", "id", queries, "qid", "qv",
        k = k, model = model, nprobe = model.k, broadcastQueries = bcast)
    val a = run(false).as[(Long, Long, Double, Int)].collect().toSet
    val b = run(true).as[(Long, Long, Double, Int)].collect().toSet
    assert(a == b, "broadcast hint changed answers")
    val p = run(true).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "pinned broadcast must remove the corpus-side sort\n" + p)
  }

  test("partial nprobe clears the 0.95 recall gate on clustered data") {
    val k = 5
    val got = Search
      .knnJoinIvf(corpus, "vec", "id", queries, "qid", "qv",
        k = k, model = model, nprobe = 2)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = bruteTopK(k)
    val recall = data.map { case (qid, _) =>
      val hit = got.getOrElse(qid, Set.empty)
      want(qid).count { case (id, _) => hit(id) }.toDouble / k
    }.sum / n
    assert(recall >= 0.95, f"recall@$k = $recall%.3f < 0.95 at nprobe=2/6")
  }

  test("corpus filter applies before cell scoring") {
    val k = 3
    val got = Search
      .knnJoinIvf(corpus, "vec", "id", queries.limit(20), "qid", "qv",
        k = k, model = model, nprobe = model.k,
        filter = col("id") % 2 === 0)
      .as[(Long, Long, Double, Int)].collect()
    assert(got.nonEmpty && got.forall(_._2 % 2 == 0))
  }

  test("a foreign ivf_part column is ignored unless reuse is asserted") {
    // poison the corpus with a layout column no model produced: every row
    // in a cell the model can't probe. Default must recompute assignment
    // (exact result); reuseLayoutCol = true must trust it (empty result).
    val poisoned = corpus.withColumn("ivf_part", lit(model.k + 5))
    val safe = Search.knnJoinIvf(poisoned, "vec", "id",
        queries.limit(5), "qid", "qv", k = 3, model, nprobe = model.k)
      .count()
    assert(safe == 15, "default must recompute cells from the model")
    val trusted = Search.knnJoinIvf(poisoned, "vec", "id",
        queries.limit(5), "qid", "qv", k = 3, model, nprobe = model.k,
        reuseLayoutCol = true)
      .count()
    assert(trusted == 0, "asserted reuse must take the column as-is")
  }

  test("colliding query/corpus id names are rejected loudly") {
    intercept[IllegalArgumentException] {
      Search.knnJoinIvf(corpus, "vec", "id",
        corpus.select(col("id"), col("vec").as("qv")), "id", "qv",
        k = 3, model, nprobe = 1)
    }
  }

  test("dot metric is rejected loudly") {
    intercept[IllegalArgumentException] {
      Search.knnJoinIvf(corpus, "vec", "id", queries, "qid", "qv",
        k = 3, model = model, nprobe = 1, metric = graft.types.Metric.Dot)
    }
  }
}
