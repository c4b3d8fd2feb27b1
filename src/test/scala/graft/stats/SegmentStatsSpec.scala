package graft.stats

import org.scalactic.Tolerance._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.types.Filter

class SegmentStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1L, 10.0, "apple", Array(0.0f, 0.0f)),
    (2L, 20.0, "banana", Array(1.0f, 0.0f)),
    (3L, 30.0, "cherry", Array(0.0f, 1.0f))).toDF("id", "x", "s", "vec")

  private lazy val stats = SegmentStats.collect(df, vecCol = Some("vec"))

  test("collect gathers numeric/string bounds, ndv, and vector stats") {
    val xs = stats.cols("x")
    assert(xs.num && xs.minN.contains(10.0) && xs.maxN.contains(30.0))
    assert(stats.cols("s").minS.contains("apple"))
    assert(stats.cols("s").maxS.contains("cherry"))
    assert(stats.rows == 3)
    val vs = stats.vec.get
    assert(vs.centroid.map(v => math.rint(v * 3)) == List(1.0, 1.0))
    assert(vs.radiusMax > 0.7 && vs.radiusMax < 1.0)
  }

  test("pruning matrix mirrors vecgo segment_pruning rules") {
    // eq outside range → prune; inside → keep
    assert(SegmentStats.canPrune(stats, Filter.Eq("x", 99)))
    assert(!SegmentStats.canPrune(stats, Filter.Eq("x", 20)))
    // missing field always prunes (missing field matches nothing)
    assert(SegmentStats.canPrune(stats, Filter.Eq("nope", 1)))
    // range disjoint → prune
    assert(SegmentStats.canPrune(stats, Filter.Gt("x", 30)))
    assert(!SegmentStats.canPrune(stats, Filter.Gte("x", 30)))
    assert(SegmentStats.canPrune(stats, Filter.Lt("x", 10)))
    assert(!SegmentStats.canPrune(stats, Filter.Lte("x", 10)))
    // in-list fully outside → prune; partially inside → keep
    assert(SegmentStats.canPrune(stats, Filter.In("x", Seq(1, 2))))
    assert(!SegmentStats.canPrune(stats, Filter.In("x", Seq(1, 25))))
    // string bounds
    assert(SegmentStats.canPrune(stats, Filter.Eq("s", "zebra")))
    assert(!SegmentStats.canPrune(stats, Filter.Eq("s", "banana")))
    // ne / contains never prune (conservative)
    assert(!SegmentStats.canPrune(stats, Filter.Ne("x", 99)))
    assert(!SegmentStats.canPrune(stats, Filter.Contains("s", "zzz")))
    // AND: any provably-false conjunct prunes the segment
    assert(SegmentStats.canPruneAll(stats,
      Seq(Filter.Eq("x", 20), Filter.Eq("s", "zebra"))))
  }

  test("categorical bloom prunes mid-range string misses") {
    // "basil" sorts between apple and cherry: bounds can't prune it, the
    // bloom must (vecgo manifest blooms, internal/manifest/bloom.go)
    assert(stats.cols("s").bloom.isDefined, "low-ndv string column gets a bloom")
    assert(SegmentStats.canPrune(stats, Filter.Eq("s", "basil")))
    assert(!SegmentStats.canPrune(stats, Filter.Eq("s", "banana")))
    assert(SegmentStats.canPrune(stats, Filter.In("s", Seq("basil", "blueberry"))))
    assert(!SegmentStats.canPrune(stats, Filter.In("s", Seq("basil", "banana"))))
    // raw membership sanity on the bloom itself
    val b = CatBloom.build(Seq("apple", "banana", "cherry"))
    assert(CatBloom.mightContain(b, "apple") && CatBloom.mightContain(b, "cherry"))
    assert(!CatBloom.mightContain(b, "basil"))
  }

  test("fields without collected bounds (bool/timestamp/array) never prune") {
    import java.sql.Timestamp
    val typed = Seq(
      (1L, true, Timestamp.valueOf("2024-01-01 00:00:00"), Array(1.0f)),
      (2L, false, Timestamp.valueOf("2024-02-01 00:00:00"), Array(2.0f)))
      .toDF("id", "flag", "t", "vec")
    val st = SegmentStats.collect(typed)
    // present in the schema, no usable bounds → a presence-only marker:
    // pruning on them would silently drop every matching segment
    assert(st.cols.contains("flag") && st.cols.contains("t") && st.cols.contains("vec"))
    assert(!SegmentStats.canPrune(st, Filter.Eq("flag", true)))
    assert(!SegmentStats.canPrune(st, Filter.Eq("flag", false)))
    assert(!SegmentStats.canPrune(st, Filter.Gt("t", Timestamp.valueOf("2030-01-01 00:00:00"))))
    // genuinely-absent fields still prune (matches nothing)
    assert(SegmentStats.canPrune(st, Filter.Eq("nope", 1)))
  }

  test("time-shape detection: sorted vs shuffled timestamp segments") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val sorted = Seq((1L, ts(1)), (2L, ts(2)), (3L, ts(3))).toDF("id", "t")
      .coalesce(1)
    val shSorted = SegmentStats.collectShape(sorted, "t")
    assert(shSorted.sortedByTs && shSorted.minTs < shSorted.maxTs)
    val unsorted = Seq((1L, ts(3)), (2L, ts(1)), (3L, ts(2))).toDF("id", "t")
      .coalesce(1)
    assert(!SegmentStats.collectShape(unsorted, "t").sortedByTs)
  }

  test("shape detection is distributed: partition boundaries checked, no global window") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    def twoPart(ms: Int*) = {
      val rows = ms.zipWithIndex.map { case (m, i) => (i.toLong, ts(m)) }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2)).toDF("id", "t")
    }
    // sorted within each partition AND across the boundary → sorted
    assert(SegmentStats.collectShape(twoPart(1, 2, 3, 4), "t").sortedByTs)
    // sorted within each partition but boundary descends → NOT sorted
    val sh = SegmentStats.collectShape(twoPart(3, 4, 1, 2), "t")
    assert(!sh.sortedByTs)
    assert(sh.minTs < sh.maxTs)
  }

  test("selectivity estimation: histogram/top-k when collected, " +
      "System-R fallback without them") {
    // WITH stats upgrades: the 16-bin histogram resolves the range
    // predicates EXACTLY on this fixture (x ∈ {10,20,30}), and the s
    // top-k gives exact eq fractions
    assert(SegmentStats.estimateFraction(stats, Filter.Eq("x", 20.0)) ===
      1.0 / 3 +- 1e-9)
    assert(SegmentStats.estimateFraction(stats, Filter.Gt("x", 25.0)) ===
      1.0 / 3 +- 1e-9)
    assert(SegmentStats.estimateFraction(stats, Filter.Lte("x", 15.0)) ===
      1.0 / 3 +- 1e-9)
    assert(SegmentStats.estimateFraction(stats,
      Filter.In("s", Seq("apple", "banana"))) === 2.0 / 3 +- 1e-9)
    // the FALLBACK (pre-upgrade manifests): strip hist/topk — classic
    // uniform-range and 1/ndv numbers
    val bare = stats.copy(cols = stats.cols.view.mapValues(
      _.copy(hist = None, topk = None)).toMap)
    assert(SegmentStats.estimateFraction(bare, Filter.Gt("x", 25.0)) ===
      0.25 +- 1e-9)
    assert(SegmentStats.estimateFraction(bare, Filter.Lte("x", 15.0)) ===
      0.25 +- 1e-9)
    assert(SegmentStats.estimateFraction(bare,
      Filter.In("s", Seq("apple", "banana"))) === 2.0 / 3 +- 1e-9)
    // provably-empty predicates estimate 0 (bounds prune)
    assert(SegmentStats.estimateFraction(stats, Filter.Eq("x", 99.0)) == 0.0)
    // no-information predicates estimate the full segment
    assert(SegmentStats.estimateFraction(stats, Filter.Contains("s", "an")) == 1.0)
    // AND independence + stats-less fallback (uniform Gt(15) = 0.75)
    assert(SegmentStats.estimateRows(300L, Some(bare),
      Seq(Filter.Eq("x", 20.0), Filter.Gt("x", 15.0))) ===
      300.0 / 3 * 0.75 +- 1e-6)
    assert(SegmentStats.estimateRows(300L, None, Seq(Filter.Eq("x", 1.0))) == 300.0)
  }

  test("histogram beats uniform on skewed data; top-k is exact for hot " +
      "and provably-absent values") {
    // 900 rows at the low end, 100 spread high: a x<=10 scan matches 90%
    val rows = (1 to 900).map(i => (i.toLong, (i % 10).toDouble, "hot")) ++
      (1 to 100).map(i => (900L + i, 100.0 + i, if (i % 2 == 0) "warm"
        else "cold"))
    val sk = SegmentStats.collect(rows.toDF("id", "x", "s"))
    // all 900 low values share bin 0 (width 12.5 over [0,200]), and the
    // x=10 cut interpolates uniformly WITHIN that bin → 900·0.8 = 0.72:
    // the histogram resolves the skew to bin granularity (true 0.9),
    // where the uniform assumption predicts ~0.05 — 18× off
    val est = SegmentStats.estimateFraction(sk, Filter.Lte("x", 10.0))
    assert(est === 0.72 +- 0.02, s"hist estimate $est")
    val uni = SegmentStats.estimateFraction(
      sk.copy(cols = sk.cols.view.mapValues(_.copy(hist = None)).toMap),
      Filter.Lte("x", 10.0))
    assert(uni < 0.1, s"uniform estimate $uni should be badly low here")
    assert(math.abs(est - 0.9) < math.abs(uni - 0.9) / 4,
      s"histogram ($est) must be far closer to truth 0.9 than uniform ($uni)")
    // top-k: 'hot' is exactly 90%, 'warm' exactly 5%; a value outside a
    // FULLY-covered column (ndv 3 <= 16) estimates 0
    assert(SegmentStats.estimateFraction(sk, Filter.Eq("s", "hot")) ===
      0.9 +- 1e-9)
    assert(SegmentStats.estimateFraction(sk, Filter.Eq("s", "warm")) ===
      0.05 +- 1e-9)
    assert(SegmentStats.estimateFraction(sk, Filter.Ne("s", "hot")) ===
      0.1 +- 1e-9)
    // bloom already prunes full misses; the estimator agrees
    assert(SegmentStats.estimateFraction(sk, Filter.Eq("s", "frozen")) == 0.0)
    // histogram counts survive a manifest JSON round trip
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val json = org.json4s.jackson.Serialization.write(sk)
    val back = org.json4s.jackson.JsonMethods.parse(json)
      .extract[SegmentStats.Stats]
    assert(back.cols("x").hist === sk.cols("x").hist)
    assert(back.cols("s").topk === sk.cols("s").topk)
    assert(SegmentStats.estimateFraction(back, Filter.Lte("x", 10.0)) ===
      est +- 1e-12)
  }

  test("triangle-inequality distance pruning and segment priority") {
    val vs = stats.vec.get
    val far = Array(10.0f, 10.0f)
    // |far - centroid| ~ 13.7, radius < 1 → prunable at threshold 5
    assert(SegmentStats.canPruneByDistance(vs, far, 5.0))
    assert(!SegmentStats.canPruneByDistance(vs, far, 20.0))
    val near = SegmentStats.VecStats(List(10.0, 10.0), 0.1)
    val order = SegmentStats.segmentPriority(Seq((1L, vs), (2L, near)), far)
    assert(order == Seq(2L, 1L))
  }

  test("metric-aware best score: per-metric bounds, pruning, and priority") {
    import graft.types.Metric
    val vs = SegmentStats.VecStats(List(1.0, 0.0), 0.5)
    val q = Array(3.0f, 0.0f)
    // L2: min euclid = |q−c| − r = 2 − 0.5 → best squared = 2.25
    assert(SegmentStats.bestScore(vs, q, Metric.L2) === 2.25 +- 1e-9)
    assert(SegmentStats.canPruneByScore(vs, q, 2.0, Metric.L2))
    assert(!SegmentStats.canPruneByScore(vs, q, 2.5, Metric.L2))
    // Dot: max = ⟨q,c⟩ + r·|q| = 3 + 0.5·3 = 4.5
    assert(SegmentStats.bestScore(vs, q, Metric.Dot) === 4.5 +- 1e-9)
    assert(SegmentStats.canPruneByScore(vs, q, 5.0, Metric.Dot))
    assert(!SegmentStats.canPruneByScore(vs, q, 4.0, Metric.Dot))
    // Cosine over unit-norm stored vectors: cluster near +y, query on +x
    val vsu = SegmentStats.VecStats(List(0.0, 1.0), 0.05)
    val qx = Array(2.0f, 0.0f) // non-unit query: bound normalizes by |q|
    assert(SegmentStats.bestScore(vsu, qx, Metric.Cosine) === 0.05 +- 1e-9)
    assert(SegmentStats.canPruneByScore(vsu, qx, 0.5, Metric.Cosine))
    assert(!SegmentStats.canPruneByScore(vsu, qx, 0.04, Metric.Cosine))
    // the cosine bound clamps to 1
    assert(SegmentStats.bestScore(
      SegmentStats.VecStats(List(1.0, 0.0), 0.5), qx, Metric.Cosine) == 1.0)
    // priority is best-first in each metric's direction; the same pair of
    // segments orders OPPOSITE ways under L2 vs Dot
    val a = SegmentStats.VecStats(List(10.0, 0.0), 0.1)
    val b = SegmentStats.VecStats(List(1.0, 0.0), 0.1)
    assert(SegmentStats.segmentPriorityByScore(
      Seq(1L -> Some(a), 2L -> Some(b)), qx, Metric.L2) == Seq(2L, 1L))
    assert(SegmentStats.segmentPriorityByScore(
      Seq(1L -> Some(a), 2L -> Some(b)), qx, Metric.Dot) == Seq(1L, 2L))
    // stats-less segments sort last
    assert(SegmentStats.segmentPriorityByScore(
      Seq(1L -> None, 2L -> Some(b)), qx, Metric.L2) == Seq(2L, 1L))
  }

  test("bestScore dominates every in-ball vector's true score (sampled)") {
    import graft.types.Metric
    val rng = new scala.util.Random(3)
    val dim = 6
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    (0 until 20).foreach { trial =>
      val raw = Array.fill(30)(Array.fill(dim)(rng.nextGaussian()))
      val q = Array.fill(dim)(rng.nextGaussian().toFloat)
      // L2 / Dot: stats over the raw vectors
      val c = Array.tabulate(dim)(d => raw.map(_(d)).sum / raw.length)
      val r = raw.map(v => math.sqrt(
        v.indices.map(i => (v(i) - c(i)) * (v(i) - c(i))).sum)).max
      val vs = SegmentStats.VecStats(c.toList, r)
      raw.foreach { v =>
        val l2sq = v.indices.map(i => (v(i) - q(i)) * (v(i) - q(i))).sum
        assert(SegmentStats.bestScore(vs, q, Metric.L2) <= l2sq + 1e-9,
          s"L2 bound violated in trial $trial")
        val dot = v.indices.map(i => v(i) * q(i)).sum
        assert(SegmentStats.bestScore(vs, q, Metric.Dot) >= dot - 1e-9,
          s"Dot bound violated in trial $trial")
      }
      // Cosine: the engine stores unit vectors — stats over normalized set
      val normed = raw.map(unit)
      val cn = Array.tabulate(dim)(d => normed.map(_(d)).sum / normed.length)
      val rn = normed.map(v => math.sqrt(
        v.indices.map(i => (v(i) - cn(i)) * (v(i) - cn(i))).sum)).max
      val vsn = SegmentStats.VecStats(cn.toList, rn)
      val qn = math.sqrt(q.map(x => x.toDouble * x).sum)
      normed.foreach { v =>
        val cos = v.indices.map(i => v(i) * q(i)).sum / qn
        assert(SegmentStats.bestScore(vsn, q, Metric.Cosine) >= cos - 1e-9,
          s"Cosine bound violated in trial $trial")
      }
    }
  }
}
