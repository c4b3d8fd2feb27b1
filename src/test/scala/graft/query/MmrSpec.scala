package graft.query

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.types.Metric

/** MMR diversity rerank: value-level agreement with a driver-side greedy
  * reference, the degenerate/clamp contracts, a case where diversification
  * provably changes the result, and the plan gate (value-level
  * cross-engine equality is the `mmr_diversify` DuckDB oracle in Verify).
  */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Driver-side greedy MMR over (id, rel, vec) sorted best-first. */
  private def refMmr(pool: Seq[(Long, Double, Array[Double])], k: Int,
      lambda: Double): Seq[(Long, Double)] = {
    val mu = 1.0 - lambda
    val sel = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    while (out.size < math.min(k, pool.size)) {
      var bestI = -1; var best = Double.NegativeInfinity
      for (i <- pool.indices if !sel.contains(i)) {
        val pen =
          if (sel.isEmpty) 0.0
          else sel.map(j => dot(pool(i)._3, pool(j)._3)).max
        val s = lambda * pool(i)._2 - mu * pen
        if (s > best) { best = s; bestI = i } // strict > = first-pos ties
      }
      sel += bestI
      out += ((pool(bestI)._1, best))
    }
    out.toSeq
  }

  private def queriesDf(qids: Long*) =
    emb.where(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

  test("diversify equals the driver-side greedy reference per query") {
    val got = Mmr.diversify(emb, "embedding", "vec_id", queriesDf(1L, 4L),
        "query_id", "qv", k = 6, fetchK = 20, lambda = 0.7, Metric.Dot)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
      .toMap
    for (q <- Seq(1L, 4L)) {
      val qv = vecs(q)
      val pool = vecs.toSeq.map { case (id, v) => (id, dot(v, qv), v) }
        .sortBy { case (id, rel, _) => (-rel, id) }.take(20)
      val want = refMmr(pool, 6, 0.7)
      val rows = got(q).sortBy(_._2)
      assert(rows.map(_._3).toSeq === want.map(_._1), s"query $q ids")
      rows.zip(want).foreach { case ((_, _, _, s), (_, ws)) =>
        assert(math.abs(s - ws) < 1e-12, s"query $q score")
      }
    }
  }

  test("lambda=1 degenerates to plain relevance top-k") {
    val got = Mmr.diversify(emb, "embedding", "vec_id", queriesDf(2L),
        "query_id", "qv", k = 5, fetchK = 20, lambda = 1.0, Metric.Dot)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    val want = emb.crossJoin(
        broadcast(queriesDf(2L).select(col("qv"))))
      .withColumn("s", graft.functions.vec_dot(col("embedding"), col("qv")))
      .orderBy(col("s").desc, col("vec_id").asc)
      .limit(5).select("vec_id").as[Long].collect().toSeq
    assert(got === want)
  }

  test("empty candidate pool selects nothing (no descending-sequence fold)") {
    // sequence(1, least(k, 0)) DESCENDS in Spark, so an unguarded fold
    // would run two steps and throw on element_at(rels, 0); the guard
    // must return zero rows instead. Exercised both at the selectCol
    // level (empty arrays) and through diversify with no matching query.
    val row = spark.range(1).select(
      slice(array(lit(0.0)), 1, 0).as("rels"),
      slice(array(array(lit(0.0f))), 1, 0).as("vecs"))
    val sel = row.select(size(Mmr.selectCol(col("rels"), col("vecs"),
      k = 3, lambda = 0.7)).as("n")).collect()
    assert(sel.head.getInt(0) === 0)
    val got = Mmr.diversify(emb.where(col("vec_id") < 0), "embedding",
      "vec_id", queriesDf(1L), "query_id", "qv", k = 3, fetchK = 5,
      lambda = 0.7, Metric.Dot)
    assert(got.count() === 0)
  }

  test("k beyond the pool clamps: every candidate returned once") {
    // a 3-row corpus with k = fetchK = 10: the pool holds all 3 rows and
    // the fold must stop there, each candidate picked exactly once
    val tiny = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.5f, 0.5f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val qs = Seq((0L, Array(1.0f, 1.0f))).toDF("query_id", "qv")
    val got = Mmr.diversify(tiny, "embedding", "vec_id", qs,
        "query_id", "qv", k = 10, fetchK = 10, lambda = 0.5, Metric.Dot)
      .collect()
    assert(got.length === 3)
    assert(got.map(_.getLong(2)).distinct.length === 3, "duplicate pick")
    intercept[IllegalArgumentException] {
      Mmr.diversify(emb, "embedding", "vec_id", queriesDf(3L),
        "query_id", "qv", k = 20, fetchK = 10, lambda = 0.5)
    }
  }

  test("diversification binds: an exact-duplicate runner-up is deferred") {
    // rel(q,a)=2 for both copies of a; rel(q,b)=1. Plain top-2 = the two
    // copies of a; MMR at lambda=0.5 must take b second: the duplicate
    // scores 0.5*2 - 0.5*dot(a,a) = 1 - 2 = -1, b scores
    // 0.5*1 - 0.5*dot(b,a) = 0.5 - 0 = 0.5.
    val df = Seq(
      (1L, Array(2.0f, 0.0f)),
      (2L, Array(2.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val qs = Seq((0L, Array(1.0f, 1.0f))).toDF("query_id", "qv")
    val got = Mmr.diversify(df, "embedding", "vec_id", qs, "query_id", "qv",
        k = 2, fetchK = 3, lambda = 0.5, Metric.Dot)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(got === Seq(1L, 3L), s"got $got")
  }

  test("diversifyJoin at nprobe=nlist equals the broadcast diversify " +
      "(exact pool parity) and keeps the cell-key equi-join plan") {
    val model = graft.index.IVF.train(emb, "embedding", k = 4, maxIter = 8)
    val qs = queriesDf(2L, 6L)
    // L2 exercises the canonical −√d² relevance on both paths
    val joined = Mmr.diversifyJoin(emb, "embedding", "vec_id", qs,
      "query_id", "qv", k = 6, fetchK = 25, lambda = 0.6, model,
      nprobe = model.k, Metric.L2)
    val broad = Mmr.diversify(emb, "embedding", "vec_id", qs,
      "query_id", "qv", k = 6, fetchK = 25, lambda = 0.6, Metric.L2)
    val a = joined.orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val b = broad.orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(a.toSeq === b.toSeq)
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), "cartesian leaked\n" + p)
    assert("collect_top_k".r.findAllIn(p).size >= 2, "partial+final agg\n" + p)
    assert(!p.contains("Window"), p)
  }

  test("plan gate: MMR selection is row-local after the bounded-heap " +
      "candidate pool — no pairwise join, no window, no global sort") {
    val d = Mmr.diversify(emb, "embedding", "vec_id", queriesDf(1L, 3L),
      "query_id", "qv", k = 8, fetchK = 30, lambda = 0.7, Metric.Dot)
    val p = d.queryExecution.executedPlan.toString
    // candidate scoring joins the corpus with the BROADCAST query frame
    // exactly once; the k^2*fetchK interaction never becomes a join
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 1, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), "window leaked into the plan\n" + p)
    assert(!p.contains("Exchange rangepartitioning"), "global sort\n" + p)
    // bounded (os, id) heaps, partial+final — no payload rides the heaps
    assert("collect_top_k".r.findAllIn(p).size >= 2, "partial+final agg\n" + p)
    // the winners' vectors come back via ONE broadcast-hash re-join
    // (late materialization), never a shuffled join of the corpus
    assert(p.contains("BroadcastHashJoin"), p)
    // both per-query shuffles (heap merge, pool re-group) are bounded:
    // queries x fetchK structs
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
  }
}
