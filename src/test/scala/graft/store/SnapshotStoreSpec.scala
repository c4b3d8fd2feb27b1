package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SnapshotStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshStore(): SnapshotStore = {
    val dir = Files.createTempDirectory("graft-store-test").toString
    new SnapshotStore(spark, dir)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select("id", "v").as[(Long, String)].collect().toSet

  test("insert / delete / re-insert visibility follows tombstone LSN semantics") {
    val st = freshStore()
    st.insert(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    st.delete(Seq(Tuple1(1L)).toDF("id"))
    assert(rows(st.read()) == Set((2L, "b")))
    // re-insert id 1 AFTER the delete: visible again (delete seq < new seg seq)
    st.insert(Seq((1L, "a2")).toDF("id", "v"))
    assert(rows(st.read()) == Set((1L, "a2"), (2L, "b")))
  }

  test("upsert replaces in one version; time travel sees every stage") {
    val st = freshStore()
    val v0 = st.insert(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val v1 = st.upsert(Seq((2L, "b2"), (3L, "c")).toDF("id", "v"))
    assert(rows(st.read(v1)) == Set((1L, "a"), (2L, "b2"), (3L, "c")))
    assert(rows(st.read(v0)) == Set((1L, "a"), (2L, "b")))
    val v2 = st.compact()
    assert(rows(st.read(v2)) == Set((1L, "a"), (2L, "b2"), (3L, "c")))
    assert(st.manifest(v2).get.segments.size == 1)
    assert(st.manifest(v2).get.deletes.isEmpty)
    // compaction must not break older versions
    assert(rows(st.read(v0)) == Set((1L, "a"), (2L, "b")))
  }

  test("deleting a missing id is a no-op; double delete idempotent") {
    val st = freshStore()
    st.insert(Seq((1L, "a")).toDF("id", "v"))
    st.delete(Seq(Tuple1(99L)).toDF("id"))
    st.delete(Seq(Tuple1(1L)).toDF("id"))
    st.delete(Seq(Tuple1(1L)).toDF("id"))
    assert(st.read().count() == 0)
  }

  test("vacuum reclaims only files unreferenced by retained versions") {
    val st = freshStore()
    st.insert(Seq((1L, "a")).toDF("id", "v"))   // v0, seg-0
    st.insert(Seq((2L, "b")).toDF("id", "v"))   // v1, seg-1
    st.compact()                                // v2, seg-2
    st.insert(Seq((3L, "c")).toDF("id", "v"))   // v3, seg-3
    st.vacuum(keepVersions = 2)                 // keep v2, v3
    // v2 references only seg-2; seg-0/seg-1 must be gone, reads intact
    assert(rows(st.read()) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(rows(st.read(2)) == Set((1L, "a"), (2L, "b")))
    intercept[Exception] { st.read(0).collect() }
    assert(st.shouldCompact(maxSegments = 1))
  }

  test("orphan segment dirs are cleaned") {
    val st = freshStore()
    st.insert(Seq((1L, "a")).toDF("id", "v"))
    // simulate a crash leftover
    Seq((9L, "x")).toDF("id", "v").write.parquet(s"${st.root}/seg-999")
    st.cleanOrphans()
    val f = new java.io.File(st.root)
    assert(!f.listFiles().exists(_.getName == "seg-999"))
    assert(rows(st.read()) == Set((1L, "a")))
  }
}
