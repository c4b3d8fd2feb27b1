package graft.serve

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.types.{Candidate, Metric}

/** Serving-tier grouped (diversity-capped) search: reference parity,
  * pool-deepening under a flooding group, global cap across shards, and
  * the shared null group.
  */
class ReplicaGroupedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 16
  private val n = 800

  /** label = id % 7; deterministic vectors. */
  private def corpus = spark.range(0, n, 1, 4).select(
    col("id"),
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(col("id") * lit(61) + i), lit(1000))
        .cast("double") / lit(500.0) - lit(1.0)).cast("float")).as("vec"),
    (col("id") % 7).cast("int").as("label"))

  private def queryVec(seed: Long): Array[Float] =
    Array.tabulate(dim)(i =>
      (((seed * 131 + i * 7919) % 1000) / 500.0 - 1.0).toFloat)

  /** Reference: cap-greedy over the replica's own FULL ranking. */
  private def refGrouped(rep: LocalReplica, q: Array[Float], k: Int,
      perGroup: Int, keyOf: Long => Option[Any]): Seq[Candidate] = {
    val full = rep.search(q, Int.MaxValue min 1000000)
    val counts = scala.collection.mutable.HashMap.empty[Any, Int]
    full.iterator.filter { c =>
      val key: Any = keyOf(c.id).orNull
      val cnt = counts.getOrElse(key, 0)
      if (cnt < perGroup) { counts(key) = cnt + 1; true } else false
    }.take(k).toSeq
  }

  test("matches the full-ranking cap-greedy reference") {
    val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2,
      metaCols = Seq("label"))
    val q = queryVec(7)
    val got = rep.searchGrouped(q, k = 12, "label", perGroup = 2)
    val want = refGrouped(rep, q, 12, 2, rep.groupKeyOf("label"))
    assert(got === want)
    // every group respects the cap
    val keyOf = rep.groupKeyOf("label")
    assert(got.groupBy(c => keyOf(c.id)).values.forall(_.size <= 2))
  }

  test("a flooding group forces pool deepening and the page stays exact") {
    // group 0 owns the 100 best rows; cap 1 means the page must reach
    // far past any reasonable initial pool
    val flood = spark.range(0, 500, 1, 4).select(
      col("id"),
      transform(sequence(lit(0), lit(dim - 1)), i =>
        when(col("id") < 100, (col("id").cast("double") / lit(10000.0)).cast("float"))
          .otherwise((lit(10.0) + pmod(xxhash64(col("id") * lit(3) + i),
            lit(100)).cast("double")).cast("float"))).as("vec"),
      when(col("id") < 100, 0).otherwise(col("id") % 5 + 1)
        .cast("int").as("label"))
    val rep = LocalReplica.fromDataFrame(flood, "vec", "id", Metric.L2,
      metaCols = Seq("label"))
    val q = Array.fill(dim)(0.0f)
    val got = rep.searchGrouped(q, k = 6, "label", perGroup = 1)
    assert(got.length === 6)
    val keyOf = rep.groupKeyOf("label")
    val keys = got.map(c => keyOf(c.id).get)
    assert(keys.distinct.length === 6, s"cap violated: $keys")
    assert(keyOf(got.head.id).get === 0, "best row must open the page")
    assert(got === refGrouped(rep, q, 6, 1, keyOf))
  }

  test("sharded router caps globally — identical to the single replica") {
    val single = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2,
      metaCols = Seq("label"))
    val q = queryVec(11)
    val want = single.searchGrouped(q, 10, "label", 2)
    for (shards <- Seq(2, 4)) {
      val set = ReplicaSet.fromDataFrame(corpus, "vec", "id", Metric.L2,
        shards = shards, metaCols = Seq("label"))
      assert(set.searchGrouped(q, 10, "label", 2) === want, s"$shards shards")
    }
  }

  test("NULL labels share one group; unknown column is loud") {
    val withNulls = corpus.withColumn("label",
      when(col("id") % 3 === 0, lit(null)).otherwise(col("label"))
        .cast("int"))
    val rep = LocalReplica.fromDataFrame(withNulls, "vec", "id", Metric.L2,
      metaCols = Seq("label"))
    val q = queryVec(3)
    val got = rep.searchGrouped(q, 20, "label", perGroup = 2)
    val keyOf = rep.groupKeyOf("label")
    val nullPicks = got.count(c => keyOf(c.id).isEmpty)
    assert(nullPicks <= 2, s"null group over cap: $nullPicks")
    intercept[IllegalArgumentException] {
      rep.searchGrouped(q, 5, "nope", 1)
    }
  }
}
