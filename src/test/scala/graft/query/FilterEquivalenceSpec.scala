package graft.query

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.types.{Filter, FilterSet}

/** Property-based filtering equivalence over reference-style adversarial
  * distributions (vecgo `internal/engine/filtering_equivalence_test.go` +
  * `testutil` generators, FIXTURES.md §B): random AND-filters evaluated by
  * the engine must match a brute-force in-memory oracle, across uniform /
  * zipfian / segment-local-skew bucket shapes and sparse-missing metadata.
  */
class FilterEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rng = new scala.util.Random(42)

  /** (id, bucket-string, numeric, maybe-missing tag) rows per distribution. */
  private def mkData(dist: String): Seq[(Long, String, Double, Option[String])] = {
    val n = 400
    (0 until n).map { i =>
      val bucket = dist match {
        case "uniform" => s"b${i % 10}"
        case "zipfian" =>
          val z = math.min(9, (math.pow(rng.nextDouble(), 3) * 10).toInt)
          s"b$z"
        case "seglocal" => if (i < n / 2) "b0" else s"b${1 + i % 9}"
      }
      val tag = if (i % 3 == 0) None else Some(s"t${i % 4}")
      (i.toLong, bucket, rng.nextDouble() * 100, tag)
    }
  }

  private val distGen = Gen.oneOf("uniform", "zipfian", "seglocal")
  private val filterGen: Gen[Filter] = Gen.oneOf(
    Gen.choose(0, 9).map(b => Filter.Eq("bucket", s"b$b")),
    Gen.choose(0, 9).map(b => Filter.Ne("bucket", s"b$b")),
    Gen.choose(0.0, 100.0).map(x => Filter.Gt("num", x)),
    Gen.choose(0.0, 100.0).map(x => Filter.Lte("num", x)),
    Gen.choose(0, 4).map(t => Filter.Eq("tag", s"t$t")),
    Gen.choose(0, 4).map(t => Filter.Ne("tag", s"t$t")),
    Gen.listOfN(3, Gen.choose(0, 9)).map(bs =>
      Filter.In("bucket", bs.map(b => s"b$b"))),
    Gen.const(Filter.Contains("bucket", "1")))

  private def bruteMatch(row: (Long, String, Double, Option[String]), f: Filter): Boolean = {
    val (_, bucket, num, tag) = row
    f match {
      case Filter.Eq("bucket", v) => bucket == v
      case Filter.Ne("bucket", v) => bucket != v
      case Filter.Eq("tag", v) => tag.contains(v)
      // vecgo semantics: missing field matches NOTHING, including ne
      case Filter.Ne("tag", v) => tag.isDefined && !tag.contains(v)
      case Filter.Gt("num", v: Double) => num > v
      case Filter.Lte("num", v: Double) => num <= v
      case Filter.In("bucket", vs) => vs.contains(bucket)
      case Filter.Contains("bucket", sub) => bucket.contains(sub)
      case other => fail(s"unhandled $other")
    }
  }

  test("random AND-filters match the brute-force oracle on every distribution") {
    val params = Gen.Parameters.default
    for (trial <- 0 until 30) {
      val seed = Seed(trial.toLong)
      val dist = distGen.pureApply(params, seed)
      val filters = Gen.listOfN(2, filterGen).pureApply(params, seed.next)
      val data = mkData(dist)
      val df = data.map(t => (t._1, t._2, t._3, t._4.orNull))
        .toDF("id", "bucket", "num", "tag")
      val got = Search.scan(df, FilterSet(filters), Seq("id"))
        .as[Long].collect().toSet
      val want = data.filter(r => filters.forall(f => bruteMatch(r, f)))
        .map(_._1).toSet
      assert(got == want, s"trial=$trial dist=$dist filters=$filters")
    }
  }
}
