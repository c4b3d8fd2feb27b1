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

  test("selectivity estimation: system-R defaults off the collected stats") {
    // x ∈ [10,30] ndv 3; s ndv 3
    assert(SegmentStats.estimateFraction(stats, Filter.Eq("x", 20.0)) ===
      1.0 / 3 +- 1e-9)
    assert(SegmentStats.estimateFraction(stats, Filter.Gt("x", 25.0)) ===
      0.25 +- 1e-9)
    assert(SegmentStats.estimateFraction(stats, Filter.Lte("x", 15.0)) ===
      0.25 +- 1e-9)
    assert(SegmentStats.estimateFraction(stats,
      Filter.In("s", Seq("apple", "banana"))) === 2.0 / 3 +- 1e-9)
    // provably-empty predicates estimate 0 (bounds prune)
    assert(SegmentStats.estimateFraction(stats, Filter.Eq("x", 99.0)) == 0.0)
    // no-information predicates estimate the full segment
    assert(SegmentStats.estimateFraction(stats, Filter.Contains("s", "an")) == 1.0)
    // AND independence + stats-less fallback
    assert(SegmentStats.estimateRows(300L, Some(stats),
      Seq(Filter.Eq("x", 20.0), Filter.Gt("x", 15.0))) ===
      300.0 / 3 * 0.75 +- 1e-6)
    assert(SegmentStats.estimateRows(300L, None, Seq(Filter.Eq("x", 1.0))) == 300.0)
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
}
