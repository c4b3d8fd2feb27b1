package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class CompactionPolicySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("policy planners pick the vecgo-shaped tasks") {
    val th = CompactionPolicy.threshold(2)
    assert(th.pick(Seq(1L -> 10L, 2L -> 10L)).isEmpty)
    assert(th.pick(Seq(1L -> 10L, 2L -> 10L, 3L -> 10L)).contains(Seq(1L, 2L, 3L)))

    val st = CompactionPolicy.sizeTiered(minMerge = 2, ratio = 4.0, minRows = 100)
    // 10 and 50 share tier 0; 100k alone in a high tier
    assert(st.pick(Seq(1L -> 10L, 2L -> 50L, 3L -> 100000L))
      .contains(Seq(1L, 2L)))
    assert(st.pick(Seq(1L -> 10L, 2L -> 100000L)).isEmpty)

    val lv = CompactionPolicy.leveled(2)
    assert(lv.pick(Seq(3L -> 1L, 1L -> 1L, 2L -> 1L)).contains(Seq(1L, 2L, 3L)))
    assert(lv.pick(Seq(1L -> 1L, 2L -> 1L)).isEmpty)
  }

  test("partial compaction merges only chosen segments, keeps delete semantics") {
    val st = new SnapshotStore(spark,
      Files.createTempDirectory("graft-pcompact").toString)
    st.insert(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))  // seg 0
    st.insert(Seq((3L, "c")).toDF("id", "v"))             // seg 1
    st.delete(Seq(Tuple1(1L)).toDF("id"))                 // del 2 (hides id1)
    st.insert(Seq((4L, "d")).toDF("id", "v"))             // seg 3
    // merge segs 0+1: live rows = {2,3} (delete applied); seg 3 untouched
    st.compactSegments(Seq(0L, 1L))
    val m = st.manifest().get
    assert(m.segments.map(_.seq).sorted == Seq(3L, 4L))
    assert(m.segments.find(_.seq == 4L).get.rows == 2)
    // delete list no longer needed (no remaining segment older than del 2)
    assert(m.deletes.isEmpty)
    assert(st.read().select("id").as[Long].collect().toSet == Set(2L, 3L, 4L))
    // re-adding id 1 after everything is visible
    st.insert(Seq((1L, "a2")).toDF("id", "v"))
    assert(st.read().select("id").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
  }

  test("maybeCompact drives a policy end-to-end") {
    val st = new SnapshotStore(spark,
      Files.createTempDirectory("graft-policy-run").toString)
    st.insert(Seq((1L, "a")).toDF("id", "v"))
    st.insert(Seq((2L, "b")).toDF("id", "v"))
    assert(st.maybeCompact(CompactionPolicy.threshold(4)).isEmpty)
    st.insert(Seq((3L, "c")).toDF("id", "v"))
    st.insert(Seq((4L, "d")).toDF("id", "v"))
    st.insert(Seq((5L, "e")).toDF("id", "v"))
    assert(st.maybeCompact(CompactionPolicy.threshold(4)).nonEmpty)
    assert(st.manifest().get.segments.size == 1)
    assert(st.read().count() == 5)
  }
}
