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

  test("capPerKey: exact cap per key, seeded rank deterministic, seed redraws") {
    val df = spark.range(0, 3000)
      .select(col("id"), concat(lit("k"), pmod(col("id"), lit(3))).as("key"))
    val kept = Sampling.capPerKey(df, "id", "key", maxPerKey = 50, "s1")
      .select("id", "key", "pos").as[(Long, String, Int)].collect()
    // exactly 50 per key, pos contiguous 1..50
    kept.groupBy(_._2).foreach { case (k, rows) =>
      assert(rows.length == 50, s"key $k kept ${rows.length}")
      assert(rows.map(_._3).sorted.toSeq == (1 to 50), s"key $k pos gap")
    }
    // deterministic rerun; different seed draws a different subset
    val again = Sampling.capPerKey(df, "id", "key", 50, "s1")
      .select("id").as[Long].collect().toSet
    assert(again == kept.map(_._1).toSet)
    val other = Sampling.capPerKey(df, "id", "key", 50, "s2")
      .select("id").as[Long].collect().toSet
    assert(other != again)
    // a key with fewer rows than the cap keeps everything
    val small = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "key")
    assert(Sampling.capPerKey(small, "id", "key", 50, "s1").count() == 3)
  }

  test("mixToBudget: rates track weights, saturate at 1, gate deterministic") {
    // k0 huge, k1 small: with w=(0.5, 0.5) and a budget bigger than 2x
    // k1's tokens, k1 saturates (rate 1) and k0 samples at its rate
    val df = spark.range(0, 10000)
      .select(col("id"),
        when(col("id") < 9000, "k0").otherwise("k1").as("key"),
        lit(10L).as("tok"))
    val budget = 2L * 1000 * 10 + 4000 // k1 share = budget/2 = 12000 > 10000
    val kept = Sampling.mixToBudget(df, "id", "key", col("tok"),
        Map("k0" -> 0.5, "k1" -> 0.5), budget, "m1")
      .select("id", "key", "rate_ppm").as[(Long, String, Long)].collect()
    val byKey = kept.groupBy(_._2)
    assert(byKey("k1").length == 1000, "saturated source must keep all rows")
    assert(byKey("k1").forall(_._3 == 1000000L))
    // k0 rate = min(1, 12000/90000) = 2/15 -> ~1200 of 9000 kept
    val k0ppm = byKey("k0").head._3
    assert(k0ppm == math.floor(12000.0 / 90000.0 * 1000000.0).toLong)
    val k0n = byKey("k0").length
    assert(math.abs(k0n - 9000.0 * k0ppm / 1000000.0) < 150,
      s"k0 kept $k0n, expected ~${9000.0 * k0ppm / 1e6}")
    // unknown sources are dropped
    assert(!kept.exists(_._2 == "k2"))
    // deterministic
    val again = Sampling.mixToBudget(df, "id", "key", col("tok"),
        Map("k0" -> 0.5, "k1" -> 0.5), budget, "m1")
      .select("id").as[Long].collect().toSet
    assert(again == kept.map(_._1).toSet)
  }

  test("mixToBudgetUpsampling: whole copies exact, fractional gate on " +
      "expectation, copy indices dense, deterministic") {
    // k0 tiny + heavily weighted → repeats; k1 big → fractional downsample
    val df = spark.range(0, 10000)
      .select(col("id"),
        when(col("id") < 1000, "k0").otherwise("k1").as("key"),
        lit(10L).as("tok"))
    // budget 50000 tokens: k0 rate = 25000/10000 = 2.5; k1 = 25000/90000 ≈ 0.2778
    val out = Sampling.mixToBudgetUpsampling(df, "id", "key", col("tok"),
        Map("k0" -> 0.5, "k1" -> 0.5), budgetTokens = 50000L, seed = "mu1")
      .select("id", "key", "copy").as[(Long, String, Long)].collect()
    val k0 = out.filter(_._2 == "k0").groupBy(_._1).view.mapValues(_.length)
    // every k0 row appears 2 or 3 times, mean ≈ 2.5
    assert(k0.size == 1000, "no k0 row may vanish (whole copies = 2)")
    assert(k0.values.forall(n => n == 2 || n == 3))
    val meanK0 = k0.values.sum.toDouble / k0.size
    assert(math.abs(meanK0 - 2.5) < 0.1, s"k0 mean copies $meanK0")
    // copy indices are dense 0..n-1 per row
    out.groupBy(r => (r._1, r._2)).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (0L until rs.length).toSeq)
    }
    // k1: 0 or 1 copies at ~27.78%
    val k1n = out.count(_._2 == "k1")
    assert(math.abs(k1n - 9000 * (25000.0 / 90000.0)) < 200, s"k1 kept $k1n")
    // deterministic
    val again = Sampling.mixToBudgetUpsampling(df, "id", "key", col("tok"),
        Map("k0" -> 0.5, "k1" -> 0.5), 50000L, "mu1")
      .select("id", "copy").as[(Long, Long)].collect().toSet
    assert(again == out.map(r => (r._1, r._3)).toSet)
  }

  test("mixToBudgetUpsampling: a weighted source with zero total tokens " +
      "fails loudly instead of exploding 2^63 copies") {
    val df = Seq((1L, "k0", 0L), (2L, "k0", 0L), (3L, "k1", 10L))
      .toDF("id", "key", "tok")
    val e = intercept[IllegalArgumentException] {
      Sampling.mixToBudgetUpsampling(df, "id", "key", col("tok"),
        Map("k0" -> 0.5, "k1" -> 0.5), budgetTokens = 100L, seed = "z0")
    }
    assert(e.getMessage.contains("zero total tokens"))
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

  test("weighted hash sampling: keep rate tracks the weight, saturates at 1") {
    // weights 100 / 500 / 1000 at scale 1000 → keep prob 0.1 / 0.5 / 1.0
    val df = spark.range(0, 3000)
      .select(col("id"),
        (pmod(col("id"), lit(3)) * 450 + 100).as("w")) // 100, 550, 1000
    val kept = Sampling.weightedHash(df, "id", col("w"), 1000L)
    val byW = kept.groupBy("w").count().as[(Long, Long)].collect().toMap
    assert(math.abs(byW(100L) - 100) < 50)     // ~10% of 1000
    assert(math.abs(byW(550L) - 550) < 80)     // ~55% of 1000
    assert(byW(1000L) == 1000)                 // saturated: ALL kept
    // deterministic re-run
    val again = Sampling.weightedHash(df, "id", col("w"), 1000L)
    assert(again.select("id").as[Long].collect().toSet ==
      kept.select("id").as[Long].collect().toSet)
  }

  test("weightedTopK: exact-size A-ES selection matches brute force; heavy rows favored") {
    val rows = (1L to 400L).map(i => (i, 1L + i % 17))
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedTopK(df, "id", col("w"), n = 50, seed = "t")
      .select("id", "sample_key").as[(Long, Double)].collect()
    assert(got.length === 50)
    // brute-force the same deterministic keys driver-side
    def key(id: Long, w: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:t".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16) % 1000000L
      val u = (h + 1).toDouble / 1e6
      BigDecimal(math.log(u) / w)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = rows.map { case (i, w) => (i, key(i, w)) }
      .sortBy { case (i, k) => (-k, i) }.take(50)
    assert(got.toSeq === want)
    // exact size even when n exceeds eligible rows; zero-weight excluded
    val tiny = Seq((1L, 0L), (2L, 3L)).toDF("id", "w")
    val t2 = Sampling.weightedTopK(tiny, "id", col("w"), 10, "t")
      .select("id").as[Long].collect()
    assert(t2.toSeq === Seq(2L))
    // the plan must be a bounded top-n, not a global sort
    val plan = Sampling.weightedTopK(df, "id", col("w"), 50, "t")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }

  test("sequence packing: prefix sum exact vs single-partition oracle, any partitioning") {
    // deterministic irregular token counts, including zeros
    val docs = spark.range(0, 997)
      .select(col("id"), pmod(col("id") * 37 + 11, lit(90)).as("tokens"))
    val budget = 256L
    for (parts <- Seq(1, 7, 32)) {
      val got = Packing.packByBudget(docs, "id", col("tokens"), budget, parts)
        .orderBy("id").as[(Long, Long, Long)].collect().toSeq
      // oracle: sequential exclusive prefix sum on the driver
      var cum = 0L
      val want = docs.orderBy("id").as[(Long, Long)].collect().toSeq.map {
        case (id, tk) => val start = cum; cum += tk; (id, tk, start / budget)
      }
      assert(got == want, s"parts=$parts")
    }
    // re-evaluation stability: the sf0.1 sweep caught pack ids CHANGING
    // between evaluations of the same frame (range-shuffle pids are not
    // stable across passes); the bucket function must be a pure id
    // function so repeated collects agree exactly
    val assigned = Packing.packByBudget(docs, "id", col("tokens"), budget, 4)
    val a = assigned.orderBy("id").as[(Long, Long, Long)].collect().toSeq
    val b = assigned.orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(a == b, "pack assignment must be stable across evaluations")
    // pack summary: token totals partition the corpus, packs are contiguous
    val sum1 = Packing.packSummary(
      Packing.packByBudget(docs, "id", col("tokens"), budget, 8))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(sum1.map(_._3).sum ==
      docs.agg(sum(col("tokens"))).as[Long].head())
    assert(sum1.map(_._1) == sum1.map(_._1).sorted)
    sum1.sliding(2).foreach {
      case Seq((_, _, _, _, lastA), (_, _, _, firstB, _)) =>
        assert(firstB == lastA + 1, "packs must be doc-contiguous")
      case _ =>
    }
  }

  test("dsir: target-like docs score higher; smoothing keeps absent buckets finite") {
    // target speaks {alpha beta}, raw is a mix of target-like docs and
    // docs of out-of-domain tokens — the log ratio must rank the
    // target-like docs strictly above the out-of-domain ones
    val target = Seq((100L, "alpha beta alpha beta alpha")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta alpha"),  // in-domain
      (2L, "gamma delta epsilon"), // out-of-domain (absent from target)
      (3L, "alpha gamma")        // half in-domain
    ).toDF("doc_id", "text")
    val got = Dsir.importanceWeights(raw, target, "doc_id", "text", 1024)
      .select("id", "dsir_logratio").as[(Long, Double)].collect().toMap
    assert(got.size == 3)
    assert(got(1L) > got(3L) && got(3L) > got(2L),
      s"dsir order wrong: $got")
    assert(got.values.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("shuffle shards: a permutation — every id exactly once, pos contiguous, seed-sensitive") {
    val df = spark.range(0, 3000).select(col("id"))
    val a = Sampling.shuffleShards(df, "id", "s1", 8)
      .select("id", "shard", "pos").as[(Long, Long, Int)].collect()
    assert(a.map(_._1).sorted.toSeq == (0L until 3000L))
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length),
        "pos must be 1..count within each shard")
    }
    // determinism + seed sensitivity
    val a2 = Sampling.shuffleShards(df, "id", "s1", 8)
      .select("id", "shard", "pos").as[(Long, Long, Int)].collect()
    assert(a.sortBy(_._1).toSeq == a2.sortBy(_._1).toSeq)
    val b = Sampling.shuffleShards(df, "id", "s2", 8)
      .select("id", "shard", "pos").as[(Long, Long, Int)].collect()
    assert(a.sortBy(_._1).toSeq != b.sortBy(_._1).toSeq,
      "different seed must be a different permutation")
  }

  test("curriculum buckets: integer-exact log2 boundaries, contiguous pos") {
    val df = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 7L),
      (6L, 8L), (7L, 1023L), (8L, 1024L), (9L, 0L))
      .toDF("id", "ntok")
    val got = Sampling.curriculumBuckets(df, "id", col("ntok"))
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L,
      6L -> 3L, 7L -> 9L, 8L -> 10L, 9L -> 0L))
  }

  test("sourceProfile: counts, exact percentiles and dup fractions on a hand-built corpus") {
    // srcA: 4 docs, one exact-dup pair; srcB: 2 docs, one of them also a
    // cross-source copy of an srcA doc (counts as dup in BOTH sources)
    val df = Seq(
      (1L, "srcA", "aa bb cc"),     // 8 chars, 3 tokens
      (2L, "srcA", "aa bb cc"),     // dup of 1
      (3L, "srcA", "dd"),           // 2 chars, 1 token
      (4L, "srcA", "ee ff gg hh"),  // 11 chars, 4 tokens
      (5L, "srcB", "dd"),           // cross-source dup of 3
      (6L, "srcB", "ii jj")         // 5 chars, 2 tokens
    ).toDF("doc_id", "source", "text")
    val got = Profile.sourceProfile(df, "source", "text")
      .as[(String, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    // srcA chars sorted: 2,8,8,11 → p50 = 8.0, p90 = (0.7·8 + 0.3·11) at
    // rank 2.7 → 8 + 0.7·(11−8) = 10.1 (linear interpolation, the
    // quantile_cont rule). Dups: docs 1,2 (pair) + 3 (cross-source) = 3/4.
    assert(got(0) == ("srcA", 4L, 11L, 2.75, 8.0, 10.1, 0.75))
    // srcB chars sorted: 2,5 → p50 = 3.5, p90 = 2 + 0.9·3 = 4.7; doc 5 dups
    assert(got(1) == ("srcB", 2L, 3L, 1.5, 3.5, 4.7, 0.5))
  }
}
