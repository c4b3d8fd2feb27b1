package graft.serve

import org.scalatest.funsuite.AnyFunSuite

/** The primitive pool-rank sort behind roundedCut/rrfFuse/the lexical
  * flush: checked against the boxed sortWith it replaced, with heavy key
  * ties (the reference hybrid fixture's regime) and both directions.
  */
class SortRankSpec extends AnyFunSuite {

  private def reference(key: Array[Double], id: Array[Long],
      asc: Boolean): Seq[(Double, Long)] =
    key.zip(id).toSeq.sortWith { (a, b) =>
      if (a._1 != b._1) { if (asc) a._1 < b._1 else a._1 > b._1 }
      else a._2 < b._2
    }

  test("sortRank == boxed sortWith on (key, id) — tie-heavy, both " +
      "directions, aux co-permuted") {
    val rng = new scala.util.Random(42)
    for (trial <- 0 until 200) {
      val n = rng.nextInt(3000)
      // tiny key domain → massive tie classes (the adversarial shape for
      // a quicksort with strict-less partitioning)
      val domain = 1 + rng.nextInt(8)
      val key = Array.fill(n)(rng.nextInt(domain).toDouble / 2)
      val asc = rng.nextBoolean()
      // unique ids, scrambled so id order != input order
      val id = Array.tabulate(n)(i => ((i * 2654435761L) % 100000) * 16 + i)
      val aux = key.map(_ * 3.0 + 1.0) // must travel with its key
      val want = reference(key.clone(), id.clone(), asc)
      LocalReplica.sortRank(key, id, aux, n, asc)
      assert(key.zip(id).toSeq == want, s"trial $trial n=$n asc=$asc")
      assert((0 until n).forall(i => aux(i) == key(i) * 3.0 + 1.0),
        s"trial $trial: aux decoupled from its key")
    }
  }

  test("sortRank handles a presorted run with all-equal keys without " +
      "quadratic blowup or stack overflow") {
    val n = 300000
    val key = new Array[Double](n) // all equal: comparisons fall to id
    val id = Array.tabulate(n)(i => (n - i).toLong)
    val t0 = System.nanoTime()
    LocalReplica.sortRank(key, id, null, n, asc = true)
    val ms = (System.nanoTime() - t0) / 1e6
    assert((0 until n).forall(i => id(i) == i + 1L))
    assert(ms < 5000, s"sortRank took $ms ms on the all-ties run")
  }
}
