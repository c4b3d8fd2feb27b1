package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftDB, SparkTestSession}

/** The store lifecycle under OBJECT-STORE commit semantics (round-9
  * advice ask 8, carried to round 11): every verb that rewrites or
  * publishes manifests — commit, compact, vacuum, restore, cloneAt —
  * runs against the shared `s3sim:` fixture (copy+delete manifest
  * renames, atomic conditional create), proving none of them silently
  * depends on POSIX rename atomicity. CommitGuardSpec covers the racing
  * writers; this spec covers the single-writer lifecycle end-to-end.
  */
class S3SimLifecycleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(8)(r.nextFloat() * 2 - 1)
  }
  private def records(ids: Range) =
    ids.map(i => (i.toLong, vec(i), i % 4)).toDF("id", "vector", "label")

  private def idSet(db: GraftDB, version: Long = -1L): Set[Long] =
    db.read(version).select("id").as[Long].collect().toSet

  test("insert/delete/upsert/compact/vacuum/restore/cloneAt hold on the " +
      "emulated object store") {
    val root = SparkTestSession.s3simRoot("s3sim-lifecycle")
    val db = GraftDB.open(spark, root, dim = 8, metric = "l2",
      schema = Map("label" -> "int"))
    val v1 = db.insertBatch(records(0 until 120))
    db.insertBatch(records(120 until 200))
    db.delete((0L until 200L by 17).toSeq)
    db.upsert(records(10 until 20).withColumn("label", lit(9)))
    val expect = (0L until 200L).toSet -- (0L until 200L by 17).toSet ++
      (10L until 20L).toSet
    assert(idSet(db) == expect)
    // compaction publishes a rewritten manifest through the guard
    val vc = db.compact()
    assert(vc > 0 && idSet(db) == expect)
    // search still exact after the rewrite
    val top = db.search(vec(3), 5).collect().map(_.getLong(0))
    assert(top.length == 5 && top.forall(expect.contains))
    // restore rolls back as a NEW commit; v1 content reappears
    val vr = db.restore(v1)
    assert(vr > vc && idSet(db) == (0L until 120L).toSet)
    assert(idSet(db, v1) == (0L until 120L).toSet)
    // vacuum keeps the restore target readable, drops the rest quietly
    db.vacuum(keepVersions = 2)
    assert(idSet(db) == (0L until 120L).toSet)
    // clone the head cut to a SECOND s3sim root (dest-side commit guard)
    val dest = SparkTestSession.s3simRoot("s3sim-clone")
    db.cloneAt(dest)
    val clone = GraftDB.open(spark, dest)
    assert(idSet(clone) == (0L until 120L).toSet)
    // the clone has its own version chain: writing to it does not touch
    // the source
    clone.insertBatch(records(500 until 510))
    assert(idSet(clone) == (0L until 120L).toSet ++ (500L until 510L))
    assert(idSet(db) == (0L until 120L).toSet)
  }
}
