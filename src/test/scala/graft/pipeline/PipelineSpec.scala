package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("decontam overlap: exact fractions against a hand-built corpus") {
    val train = Seq(
      (1L, "a b c d"),        // shingles: "a b c","b c d"
      (2L, "x y z w"),        // shingles: "x y z","y z w"
      (3L, "a b")             // too short: no shingles, absent from output
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (100L, "a b c q")       // shingles: "a b c","b c q"
    ).toDF("doc_id", "text")
    val got = Decontam.overlap(train, eval_, "doc_id", "text", 3)
      .orderBy("id")
      .select("id", "n_shingles", "n_hit", "overlap_frac")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 1L, 0.5), (2L, 2L, 0L, 0.0)))
  }

  test("stratified hash sampling: deterministic, quota-shaped, subset-stable") {
    val df = spark.range(0, 4000)
      .select(col("id"), pmod(col("id"), lit(4)).as("stratum"))
    val rates = Map[Any, Double](0L -> 0.1, 1L -> 0.5)
    val kept = Sampling.stratifiedHash(df, "id", "stratum", rates, 0.9)
    val byStratum = kept.groupBy("stratum").count()
      .as[(Long, Long)].collect().toMap
    // 1000 ids per stratum; md5 gate ≈ uniform → counts near quota
    assert(math.abs(byStratum(0L) - 100) < 50)
    assert(math.abs(byStratum(1L) - 500) < 80)
    assert(math.abs(byStratum(2L) - 900) < 80)
    // deterministic: the same call returns the same rows
    val again = Sampling.stratifiedHash(df, "id", "stratum", rates, 0.9)
    assert(kept.select("id").as[Long].collect().sorted.toSeq ==
      again.select("id").as[Long].collect().sorted.toSeq)
    // monotone: raising a rate only ADDS rows (hash-gate property that
    // makes quota adjustments incremental at 100 TB — no resample churn)
    val more = Sampling.stratifiedHash(df, "id", "stratum",
      Map[Any, Double](0L -> 0.3, 1L -> 0.5), 0.9)
    val k0 = kept.where(col("stratum") === 0).select("id").as[Long].collect().toSet
    val m0 = more.where(col("stratum") === 0).select("id").as[Long].collect().toSet
    assert(k0.subsetOf(m0))
  }
}
