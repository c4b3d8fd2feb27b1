package graft.query

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.types.Metric

/** ColBERT MaxSim late interaction: value-level agreement with a
  * driver-side reference, the two-stage rerank contract, and the plan
  * gate (value-level cross-engine equality is the `maxsim_rerank` DuckDB
  * oracle in Verify).
  */
class MaxSimSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  private def refScore(q: Array[Array[Double]],
      d: Array[Array[Double]]): Double = {
    var acc = 0.0
    q.foreach { qt =>
      var best = Double.NegativeInfinity
      d.foreach { dt =>
        var s = 0.0
        var i = 0
        while (i < qt.length) { s += qt(i) * dt(i); i += 1 }
        if (s > best) best = s
      }
      acc += best
    }
    acc
  }

  test("maxSimCol equals the driver-side reference on fixture tokens") {
    val toks = emb.select(col("vec_id"),
      MaxSim.splitTokensCol(col("embedding"), 8, 8).as("toks"))
    val qtoks = toks.where(col("vec_id") === 3)
      .collect()(0).getSeq[scala.collection.Seq[Double]](1).map(_.toArray).toArray
    val got = toks.limit(40)
      .select(col("vec_id"),
        MaxSim.maxSimCol(typedlit(qtoks.map(_.toSeq).toSeq),
          col("toks")).as("s"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val src = emb.limit(40).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray.map(_.toDouble).grouped(8).toArray).toMap
    src.foreach { case (id, dtoks) =>
      assert(math.abs(got(id) - refScore(qtoks, dtoks)) < 1e-12, s"id $id")
    }
  }

  test("two-stage rerank: self-retrieval wins, pool bounds the rerank, " +
      "and the candidate cut actually binds") {
    val toks = emb.select(col("vec_id"), col("embedding"),
      MaxSim.splitTokensCol(col("embedding"), 8, 8).as("toks"))
    val qrow = toks.where(col("vec_id") === 7).collect()(0)
    val qv = qrow.getSeq[Float](1).toArray
    val qt = qrow.getSeq[scala.collection.Seq[Double]](2).map(_.toSeq).toSeq
    val top = MaxSim.rerank(toks, "vec_id", "embedding", "toks",
      typedlit(qv), typedlit(qt), k = 5, candidates = 50, Metric.Dot)
      .collect()
    assert(top.head.getLong(0) == 7L, s"self-retrieval: ${top.toSeq}")
    assert(top.length == 5)
    // monotone scores
    val scores = top.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
    // a 1-candidate pool can only ever return that candidate
    val one = MaxSim.rerank(toks, "vec_id", "embedding", "toks",
      typedlit(qv), typedlit(qt), k = 1, candidates = 1, Metric.Dot)
      .collect()
    assert(one.map(_.getLong(0)).toSeq == Seq(7L))
    intercept[IllegalArgumentException] {
      MaxSim.rerank(toks, "vec_id", "embedding", "toks",
        typedlit(qv), typedlit(qt), k = 10, candidates = 5)
    }
  }

  test("plan gate: MaxSim scoring is a row-local projection after the " +
      "candidate cut — no token-pair explode-join, one bounded top-k") {
    val toks = emb.select(col("vec_id"), col("embedding"),
      MaxSim.splitTokensCol(col("embedding"), 8, 8).as("toks"))
    val qt = Seq.fill(8)(Seq.fill(8)(0.1))
    val d = MaxSim.rerank(toks, "vec_id", "embedding", "toks",
      typedlit(Array.fill(64)(0.1f)), typedlit(qt), k = 10,
      candidates = 50, Metric.Dot)
    val p = d.queryExecution.executedPlan.toString
    // the |q|x|d| interaction must NOT materialize as rows
    assert(!p.contains("Generate"), "token explode leaked into the plan\n" + p)
    assert(!p.contains("Join"), "token-pair join leaked into the plan\n" + p)
    // both stages are bounded top-k, never a global sort
    assert("TakeOrderedAndProject".r.findAllIn(p).size == 2, p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }
}
