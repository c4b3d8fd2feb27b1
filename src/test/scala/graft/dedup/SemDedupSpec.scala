package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Dedup.semanticDedup]] vs a brute-force union-find reference:
  * within-cluster pairwise cosine edges, connected components, keep the
  * member with the lowest (rounded) cosine to its cluster centroid.
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 8
  private val rng = new scala.util.Random(11)
  // two clusters; inside cluster 0, ids 0/1/2 are a near-identical triple
  // and ids 3/4 a pair; 5 is isolated. cluster 1 has pair 10/11, lone 12.
  private def jitter(base: Array[Float], s: Float): Array[Float] =
    base.map(x => x + (rng.nextFloat() - 0.5f) * s)
  private val b0 = Array.fill(dim)(rng.nextFloat() + 1f)
  private val b1 = Array.fill(dim)(rng.nextFloat() - 2f)
  private val b2 = Array.fill(dim)(rng.nextFloat() * 3f)
  private val data: Seq[(Long, Int, Array[Float])] = Seq(
    (0L, 0, jitter(b0, 0.01f)), (1L, 0, jitter(b0, 0.01f)),
    (2L, 0, jitter(b0, 0.01f)),
    (3L, 0, jitter(b1, 0.01f)), (4L, 0, jitter(b1, 0.01f)),
    (5L, 0, Array.tabulate(dim)(i => if (i % 2 == 0) 5f else -5f)),
    (10L, 1, jitter(b2, 0.01f)), (11L, 1, jitter(b2, 0.01f)),
    (12L, 1, Array.tabulate(dim)(i => if (i < 4) -1f else 4f)))

  private val eps = 0.95

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { i => d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private def brute(): Map[Long, (Long, Boolean)] = {
    val vecs = data.map { case (id, _, v) => id -> v.map(_.toDouble) }.toMap
    val parent = scala.collection.mutable.Map(data.map(d => d._1 -> d._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for {
      (ia, ca, _) <- data; (ib, cb, _) <- data
      if ca == cb && ia < ib && cos(vecs(ia), vecs(ib)) >= eps
    } { val (ra, rb) = (find(ia), find(ib)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val cents = data.groupBy(_._2).map { case (c, rows) =>
      // float32 round-trip like the operator: double mean -> float -> double
      c -> Array.tabulate(dim)(i =>
        (rows.map(_._3(i).toDouble).sum / rows.size).toFloat.toDouble)
    }
    val score = data.map { case (id, c, v) =>
      id -> BigDecimal(cos(v.map(_.toDouble), cents(c)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val byComp = data.groupBy(d => find(d._1))
    byComp.flatMap { case (_, rows) =>
      val keepId = rows.map(_._1).minBy(id => (score(id), id))
      rows.map(r => r._1 -> (find(r._1), r._1 == keepId))
    }
  }

  test("semanticDedup matches union-find + centroid-argmin brute force") {
    val df = data.toDF("id", "cluster", "v")
    val got = Dedup.semanticDedup(df, "id", "v", "cluster", eps, dim)
      .select("id", "component", "keep")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val want = brute()
    assert(got == want)
    // structure sanity: the triple keeps exactly one, loners keep
    assert(Seq(0L, 1L, 2L).count(got(_)._2) == 1)
    assert(got(5L)._2 && got(12L)._2)
    // one keeper per component, nothing lost
    assert(got.size == data.size)
    got.groupBy(_._2._1).foreach { case (c, rows) =>
      assert(rows.values.count(_._2) == 1, s"component $c keeper count != 1")
    }
  }

  test("skew guard: an over-budget cluster fails loudly, never silently " +
      "quadratic; disabling the budget lets it through") {
    val df = data.toDF("id", "cluster", "v")
    // cluster 0 has 6 members = 15 pairs: a budget of 14 must trip on it
    val e = intercept[IllegalArgumentException] {
      Dedup.semanticDedup(df, "id", "v", "cluster", eps, dim,
        maxPairsPerCluster = 14L)
    }
    assert(e.getMessage.contains("15 candidate pairs"), e.getMessage)
    assert(e.getMessage.contains("re-cluster finer"), e.getMessage)
    // budget exactly at the worst cluster passes, as does a disabled guard
    val atBudget = Dedup.semanticDedup(df, "id", "v", "cluster", eps, dim,
      maxPairsPerCluster = 15L).count()
    val disabled = Dedup.semanticDedup(df, "id", "v", "cluster", eps, dim,
      maxPairsPerCluster = 0L).count()
    assert(atBudget == data.size && disabled == data.size)
  }
}
