package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.text.TextAnalysis

class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus = Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta"),
    (1L, "alpha  beta gamma delta epsilon zeta eta theta"), // ws-only diff
    (2L, "alpha beta gamma delta epsilon zeta eta iota"),   // near-dup of 0
    (3L, "totally different words entirely here now ok yes"),
    (4L, "ALPHA BETA GAMMA DELTA EPSILON ZETA ETA THETA"))  // case-only diff
  private lazy val docs = corpus.toDF("id", "text")

  test("exact dedup folds whitespace- and case-variants") {
    val groups = Dedup.exactGroups(docs, "id", "text").collect()
    assert(groups.length == 3) // {0,1,4}, {2}, {3}
    val g0 = groups.find(_.getAs[Long]("keep_id") == 0L).get
    assert(g0.getAs[Long]("n_dups") == 3)
  }

  test("jaccard pairs match brute force") {
    def sh(t: String): Set[String] = {
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val want = (for {
      (i, ti) <- corpus; (j, tj) <- corpus if i < j
      si = sh(ti); sj = sh(tj)
      jac = si.intersect(sj).size.toDouble / si.union(sj).size.toDouble
      if jac >= 0.3
    } yield (i, j, jac)).toSet
    val got = Dedup.jaccardPairs(docs, "id", "text", 3, 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(got.map(p => (p._1, p._2)) == want.map(p => (p._1, p._2)))
    got.foreach { case (i, j, jac) =>
      val w = want.find(p => p._1 == i && p._2 == j).get._3
      assert(math.abs(jac - w) < 1e-9)
    }
  }

  test("minhash LSH finds the high-jaccard pairs that exact jaccard finds") {
    val exact = Dedup.jaccardPairs(docs, "id", "text", 3, 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLsh(docs, "id", "text", 3, 32, 4, 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh == exact) // at jaccard ~1.0, all 8 bands collide
  }

  test("simhash64: near-identical docs have small hamming distance") {
    val hs = Dedup.simhash64(docs, "id", "text")
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(0L), hs(2L)) < ham(hs(0L), hs(3L)),
      "near-dups closer than distinct docs")
    assert(ham(hs(0L), hs(3L)) > 15, "distinct docs far")
    assert(hs(0L) == hs(1L) && hs(0L) == hs(4L), "canonical variants equal")
  }

  test("srpNearDups finds every exact near-dup pair with no cartesian product") {
    val rng = new scala.util.Random(5)
    val dim = 16
    val base = (0L until 60L).map(i => (i, Array.fill(dim)(rng.nextFloat() * 2 - 1)))
    // plant a near-identical copy of every 4th vector
    val planted = base.collect { case (i, v) if i % 4 == 0 =>
      (i + 1000L, v.map(x => x + (rng.nextFloat() - 0.5f) * 0.02f))
    }
    val corpus = (base ++ planted).toDF("id", "vec")
    val exact = Dedup.cosineNearDups(corpus, "id", "vec", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val srp = Dedup.srpNearDups(corpus, "id", "vec", dim, 0.95)
    assert(srp.select("id_a", "id_b").as[(Long, Long)].collect().toSet == exact)
    val plan = srp.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"scale path must not cross-join the corpus:\n$plan")
  }

  test("srp bucket keys: identical vectors share a bucket") {
    val vecs = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (1L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Array(-1.0f, -2.0f, -3.0f, -4.0f))).toDF("id", "vec")
    val keys = vecs.select(col("id"),
        Dedup.srpBucket(col("vec"), dim = 4, nbits = 8).as("k"))
      .as[(Long, String)].collect().toMap
    assert(keys(0L) == keys(1L))
    assert(keys(0L) != keys(2L)) // antipodal vectors flip every plane
  }

  test("line dedup: repeated lines removed, order preserved, blanks kept") {
    val docs = Seq(
      (1L, "COOKIE BANNER\nalpha beta\n\ngamma"),
      (2L, "COOKIE BANNER\ndelta\n\nepsilon"),
      (3L, "unique prose\nzeta")
    ).toDF("doc_id", "text")
    val got = Dedup.dedupLines(docs, "doc_id", "text", minDocFreq = 2)
      .select("id", "text", "n_lines", "n_removed")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      // "COOKIE BANNER" repeats in 2 docs -> dropped; the BLANK line is
      // structural and repeats too, but blanks are never candidates
      (1L, "alpha beta\n\ngamma", 4L, 1L),
      (2L, "delta\n\nepsilon", 4L, 1L),
      (3L, "unique prose\nzeta", 2L, 0L)))
  }

  test("line dedup: a doc of pure boilerplate rebuilds as empty text") {
    val docs = Seq(
      (1L, "SAME\nSAME"),
      (2L, "SAME"),
      (3L, "keep me")
    ).toDF("doc_id", "text")
    val got = Dedup.dedupLines(docs, "doc_id", "text", minDocFreq = 2)
      .select("id", "text", "n_removed")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "", 2L), (2L, "", 1L), (3L, "keep me", 0L)))
  }
}
