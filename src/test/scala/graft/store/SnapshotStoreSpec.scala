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

  test("schema evolution: added columns read NULL on older segments, " +
      "both directions; conflicting types still fail") {
    val st = freshStore()
    st.insert(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // later segment ADDS a column
    st.insert(Seq((3L, "c", 30L)).toDF("id", "v", "extra"))
    val got = st.read().select("id", "v", "extra")
      .as[(Long, String, Option[Long])].collect().toSet
    assert(got === Set((1L, "a", None), (2L, "b", None),
      (3L, "c", Some(30L))))
    // and a segment MISSING a column the store already has
    st.insert(Seq((4L, "d")).toDF("id", "v"))
    val got2 = st.read().where(col("id") === 4L)
      .select("extra").as[Option[Long]].collect().toSeq
    assert(got2 === Seq(None))
    // compaction folds the evolved schema into one segment, values intact
    st.compact()
    val after = st.read().select("id", "extra")
      .as[(Long, Option[Long])].collect().toMap
    assert(after === Map(1L -> None, 2L -> None, 3L -> Some(30L),
      4L -> None))
    // same-name column with a CONFLICTING type fails loudly at read
    // (either the union refuses the merge at analysis, or the ANSI cast
    // of the irreconcilable value throws at runtime — never silent)
    st.insert(Seq((5L, "e", "not-a-long")).toDF("id", "v", "extra"))
    assertThrows[Exception] { st.read().collect() }
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

  test("crash safety: missing CURRENT recovers the highest manifest, chain continues") {
    val st = freshStore()
    st.insert(Seq((1L, "a")).toDF("id", "v"))   // v0, seg-0
    st.insert(Seq((2L, "b")).toDF("id", "v"))   // v1, seg-1
    // simulate an interrupted commit that lost the pointer (an FS without
    // atomic overwrite-rename): the store must NOT look empty — a fresh
    // chain at seq 0 would overwrite seg-0
    assert(new java.io.File(st.root, "CURRENT").delete())
    assert(st.currentVersion == 1L)
    assert(rows(st.read()) == Set((1L, "a"), (2L, "b")))
    val v2 = st.insert(Seq((3L, "c")).toDF("id", "v"))
    assert(v2 == 2L && st.manifest(v2).get.maxSeq == 2L)
    assert(rows(st.read()) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // pointer restored, no temp leftovers from the rename-over commit
    val names = new java.io.File(st.root).listFiles().map(_.getName)
    assert(names.contains("CURRENT") && !names.exists(_.startsWith(".CURRENT.tmp")))
  }

  test("manifest timestamps: versionAt/readAsOf address versions by commit time") {
    val st = freshStore()
    val v0 = st.insert(Seq((1L, "a")).toDF("id", "v"))
    Thread.sleep(5)
    val v1 = st.upsert(Seq((1L, "a2")).toDF("id", "v"))
    val t0 = st.manifest(v0).get.ts
    val t1 = st.manifest(v1).get.ts
    assert(t0 > 0 && t1 > t0)
    assert(st.versionAt(t0).contains(v0))
    assert(st.versionAt(t1 - 1).contains(v0))
    assert(st.versionAt(System.currentTimeMillis() + 1000).contains(v1))
    assert(st.versionAt(t0 - 1).isEmpty)
    assert(rows(st.readAsOf(t0)) == Set((1L, "a")))
    assert(rows(st.readAsOf(t1)) == Set((1L, "a2")))
  }

  test("duration retention: vacuum keeps versions inside the age window") {
    val st = freshStore()
    val v0 = st.insert(Seq((1L, "a")).toDF("id", "v"))
    Thread.sleep(5)
    val v1 = st.insert(Seq((2L, "b")).toDF("id", "v"))
    Thread.sleep(5)
    val v2 = st.compact()
    val now = st.manifest(v2).get.ts + 1000
    // wide window: every version is younger than the cutoff → nothing dropped
    st.vacuum(keepVersions = 1, keepDurationMs = 1000L * 3600, nowMs = now)
    assert(rows(st.read(v0)) == Set((1L, "a")))
    // narrow window: only the count floor (last 1 version) survives
    st.vacuum(keepVersions = 1, keepDurationMs = 1, nowMs = now)
    intercept[Exception] { st.read(v0).collect() }
    intercept[Exception] { st.read(v1).collect() }
    assert(rows(st.read(v2)) == Set((1L, "a"), (2L, "b")))
  }

  test("delete sets above the broadcast cap fall back to a shuffle anti-join") {
    val dir = Files.createTempDirectory("graft-store-bigdel").toString
    val st = new SnapshotStore(spark, dir, broadcastDeleteMaxRows = 1L)
    st.insert((1L to 20L).map(i => (i, s"v$i")).toDF("id", "v"))
    st.delete((1L to 10L).map(Tuple1(_)).toDF("id"))
    val df = st.read()
    // guard active: no broadcast HINT forced on the delete side — the
    // planner (AQE) stays free to shuffle a huge delete set instead of
    // OOMing the driver (it may still choose broadcast for tiny inputs)
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.toLowerCase.contains("hint"),
      s"expected no forced broadcast hint:\n$analyzed")
    val hinted = new SnapshotStore(spark, dir).read()
    assert(hinted.queryExecution.analyzed.toString.toLowerCase.contains("hint"),
      "default cap should still hint broadcast for small delete sets")
    assert(rows(df) == (11L to 20L).map(i => (i, s"v$i")).toSet)
  }

  test("restore: rolls the head back as a NEW commit; the chain keeps " +
      "going and post-restore writes never collide with rolled-back seqs") {
    val st = freshStore()
    st.insert(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))    // v0
    st.insert(Seq((3L, "c")).toDF("id", "v"))               // v1
    st.delete(Seq(Tuple1(1L)).toDF("id"))                   // v2 (bad write)
    assert(rows(st.read()) == Set((2L, "b"), (3L, "c")))
    val v = st.restore(1)
    assert(v == 3 && st.currentVersion == 3)
    // v1's content is the head again — the bad delete is undone
    assert(rows(st.read()) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // the rolled-back head stays time-travelable
    assert(rows(st.read(version = 2)) == Set((2L, "b"), (3L, "c")))
    // post-restore writes take fresh seqs: a delete hides the RESTORED
    // rows (its seq must exceed every restored segment's), a re-insert
    // reappears — the LSN rule is intact across the rollback
    st.delete(Seq(Tuple1(2L)).toDF("id"))
    assert(rows(st.read()) == Set((1L, "a"), (3L, "c")))
    st.insert(Seq((2L, "b2")).toDF("id", "v"))
    assert(rows(st.read()) == Set((1L, "a"), (2L, "b2"), (3L, "c")))
    // guards: restoring to the head or an unknown version fails loudly
    intercept[IllegalArgumentException](st.restore(st.currentVersion))
    intercept[IllegalArgumentException](st.restore(999))
    // vacuum after restore keeps the artifacts the head re-references
    st.vacuum(keepVersions = 1)
    assert(rows(st.read()) == Set((1L, "a"), (2L, "b2"), (3L, "c")))
  }

  test("cloneAt: a pinned cut ships whole — reads equal, independently " +
      "writable, source untouched, occupied destination refused") {
    val st = freshStore()
    st.insert(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    st.delete(Seq(Tuple1(2L)).toDF("id"))
    val vCut = st.readableVersion
    st.insert(Seq((4L, "d")).toDF("id", "v")) // after the cut
    // clone the CUT, not the head
    val dest = Files.createTempDirectory("graft-store-clone").toString + "/c"
    assert(st.cloneAt(dest, vCut) == vCut)
    val clone = new SnapshotStore(spark, dest)
    assert(clone.readableVersion == vCut)
    assert(rows(clone.read()) == Set((1L, "a"), (3L, "c")),
      "clone must read exactly the pinned cut (delete applied, id 4 absent)")
    // clone is independently writable and continues its own chain
    clone.insert(Seq((9L, "z")).toDF("id", "v"))
    assert(rows(clone.read()) == Set((1L, "a"), (3L, "c"), (9L, "z")))
    // ...without touching the source
    assert(rows(st.read()) == Set((1L, "a"), (3L, "c"), (4L, "d")))
    // occupied destination refused loudly
    val e = intercept[IllegalArgumentException](st.cloneAt(dest))
    assert(e.getMessage.contains("already holds a store"))
    // head clone (default) carries the newest version
    val dest2 = Files.createTempDirectory("graft-store-clone2").toString + "/c"
    st.cloneAt(dest2)
    assert(rows(new SnapshotStore(spark, dest2).read()) ==
      Set((1L, "a"), (3L, "c"), (4L, "d")))
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
