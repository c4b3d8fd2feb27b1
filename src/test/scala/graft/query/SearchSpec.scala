package graft.query

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions._
import graft.types.{Filter, FilterSet, Metric}

/** Oracle tests: engine results vs brute-force in-memory evaluation,
  * mirroring the reference's equivalence-test pattern
  * (vecgo `internal/engine/filtering_equivalence_test.go:16`).
  */
class SearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rng = new scala.util.Random(42)
  private val dim = 16
  private val n = 500
  private val data: Seq[(Long, Array[Float], Int)] =
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rng.nextFloat()), i % 5))
  private lazy val df = data.toDF("id", "vec", "label")
  private val q = Array.fill(dim)(rng.nextFloat())

  private def bruteL2(filter: Int => Boolean): Seq[(Long, Double)] =
    data
      .filter { case (_, _, l) => filter(l) }
      .map { case (id, v, _) =>
        val d = v.zip(q).map { case (x, y) =>
          val t = x.toDouble - y.toDouble; t * t
        }.sum
        (id, d)
      }
      .sortBy { case (id, d) => (d, id) }

  test("knn matches brute force oracle") {
    val got = Search
      .knn(df, "vec", "id", lit(q), k = 10, Metric.L2)
      .as[(Long, Double)].collect().toSeq
    val want = bruteL2(_ => true).take(10)
    assert(got.map(_._1) == want.map(_._1))
    got.zip(want).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-9)
    }
  }

  test("filtered knn pre-filters then ranks") {
    val got = Search
      .knn(df, "vec", "id", lit(q), k = 10, Metric.L2,
        filter = FilterSet.of(Filter.In("label", Seq(1, 3))).toColumn)
      .as[(Long, Double)].collect().toSeq
    val want = bruteL2(l => l == 1 || l == 3).take(10)
    assert(got.map(_._1) == want.map(_._1))
  }

  test("threshold search returns exactly the in-range rows, best first") {
    val t = 0.8
    val got = Search
      .searchThreshold(df, "vec", "id", lit(q), t, maxResults = 1000, Metric.L2)
      .as[(Long, Double)].collect().toSeq
    val want = bruteL2(_ => true).filter(_._2 <= t)
    assert(got.map(_._1) == want.map(_._1))
  }

  test("cosine knn descends and matches self-query") {
    val self = data.head._2
    val got = Search
      .knn(df, "vec", "id", lit(self), k = 1, Metric.Cosine)
      .as[(Long, Double)].collect()
    assert(got.head._1 == 0L)
    assert(math.abs(got.head._2 - 1.0) < 1e-9)
  }

  test("batch search gives per-query top-k identical to single knn") {
    val queries = Seq((0L, data(0)._2), (1L, data(1)._2))
      .toDF("query_id", "qv")
    val got = Search
      .batchSearch(df, "vec", "id", queries, "query_id", "qv", k = 5, Metric.L2)
      .select("query_id", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    for (qid <- Seq(0L, 1L)) {
      val single = Search
        .knn(df, "vec", "id", lit(data(qid.toInt)._2), k = 5, Metric.L2)
        .as[(Long, Double)].collect().map(_._1).toSeq
      assert(got(qid) == single, s"query $qid")
    }
  }

  test("batchSearchMatrix (MultiTopK aggregate) equals window-based batch search") {
    val qpairs = Seq(0L, 1L, 7L).map(i => (i, data(i.toInt)._2))
    val got = Search.batchSearchMatrix(df, "vec", "id", qpairs, k = 5)
      .select("query_id", "id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    for ((qid, qv) <- qpairs) {
      val single = Search.knn(df, "vec", "id", lit(qv), k = 5, Metric.L2)
        .as[(Long, Double)].collect().toSeq
      val mine = got.filter(_._1 == qid).sortBy(_._4)
      assert(mine.map(_._2) == single.map(_._1), s"ids for query $qid")
      mine.map(_._3).zip(single.map(_._2)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-12)
      }
    }
  }

  test("missing (null) metadata field matches no operator, including ne") {
    val withNulls = df.withColumn("tag",
      when(col("id") < 100, lit("x")).otherwise(lit(null: String)))
    val ne = Search.scan(withNulls,
      FilterSet.of(Filter.Ne("tag", "y")), Seq("id")).count()
    assert(ne == 100) // null tag rows don't match ne either
  }

  test("rerank recovers exact top-k from an approximate first pass") {
    // Approx score = truncated-precision distance; exact = full distance.
    val scored = df.crossJoin(broadcast(Seq(Tuple1(q)).toDF("qv")))
    val out = Search.rerank(
      scored, "id",
      approxScore = round(vec_l2sq(col("vec"), col("qv")), 1),
      exactScore = vec_l2sq(col("vec"), col("qv")),
      k = 5, refineFactor = 4, Metric.L2)
      .as[(Long, Double)].collect().toSeq
    val want = bruteL2(_ => true).take(5)
    // with refineFactor=4 the exact top-5 should be recovered despite the
    // lossy first pass (they all sit within the widened pool)
    assert(out.map(_._1).toSet.subsetOf(bruteL2(_ => true).take(20).map(_._1).toSet))
    assert(out.map(_._2).zip(want.map(_._2)).forall { case (a, b) => a >= b - 1e-9 })
  }
}
