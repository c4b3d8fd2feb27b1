package graft.lexical

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.hybrid.RRF

class BM25Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "a quick brown cat sleeps"),
    (2L, "the dog barks at the cat"),
    (3L, "foxes and dogs and cats"),
    (4L, "QUICK quick Quick brown"))
  private lazy val docs = corpus.toDF("doc_id", "text")

  /** Brute-force BM25 oracle mirroring vecgo bm25.go formulas. */
  private def brute(query: String): Map[Long, Double] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }.toMap
    val n = corpus.size.toDouble
    val avgdl = toks.values.map(_.size).sum / n
    val qts = query.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
    val dfm = qts.map(t => t -> toks.values.count(_.contains(t)).toDouble).toMap
    corpus.flatMap { case (id, _) =>
      val dlen = toks(id).size.toDouble
      val score = qts.map { t =>
        val tf = toks(id).count(_ == t).toDouble
        if (tf == 0 || dfm(t) == 0) 0.0
        else {
          val idf = math.log(1 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5))
          idf * (tf * (BM25.K1 + 1)) /
            (tf + BM25.K1 * ((1 - BM25.B) + BM25.B * dlen / avgdl))
        }
      }.sum
      if (score > 0) Some(id -> score) else None
    }.toMap
  }

  test("bm25 scores match the reference formula oracle") {
    val idx = BM25.build(docs, "doc_id", "text")
    assert(idx.numDocs == 5)
    val got = BM25.search(idx, "quick dog", 10)
      .as[(Long, Double)].collect().toMap
    val want = brute("quick dog")
    assert(got.keySet == want.keySet)
    got.foreach { case (id, s) => assert(math.abs(s - want(id)) < 1e-9, s"doc $id") }
  }

  test("repeated query terms count once; case-insensitive tf counts") {
    val idx = BM25.build(docs, "doc_id", "text")
    val a = BM25.search(idx, "quick QUICK quick", 10).as[(Long, Double)].collect().toMap
    val b = BM25.search(idx, "quick", 10).as[(Long, Double)].collect().toMap
    assert(a == b)
    // doc 4 has tf=4 for 'quick' (case-folded) in 4 tokens — highest tf density
    assert(a.maxBy(_._2)._1 == 4L)
  }

  test("rrf fusion favors ids present in both lists") {
    val v = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("id", "rank")
    val l = Seq((11L, 1), (13L, 2)).toDF("id", "rank")
    val fused = RRF.fuse(v, l, 4).as[(Long, Double)].collect()
    assert(fused.head._1 == 11L) // in both lists
    val expect11 = 1.0 / 62 + 1.0 / 61
    assert(math.abs(fused.head._2 - expect11) < 1e-12)
    assert(fused.map(_._1).toSet == Set(10L, 11L, 12L, 13L))
  }
}
