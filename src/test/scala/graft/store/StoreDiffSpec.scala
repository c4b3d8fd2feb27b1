package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The change feed ([[SnapshotStore.diff]] / `GraftDB.changes`): the
  * apply-contract fuzzed over random histories (both the file-diff fast
  * path and the post-compaction full-diff fallback fire along the way),
  * the reads-only-the-delta property, and the empty-window edge.
  */
class StoreDiffSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("apply-contract under random histories: deletes then inserts move " +
      "any earlier version to any later one") {
    val store = new SnapshotStore(spark,
      Files.createTempDirectory("graft-diff-fuzz").toString)
    val rng = new scala.util.Random(4242)
    val model = scala.collection.mutable.Map.empty[Long, Long]
    var nextId = 0L
    val history = scala.collection.mutable.ArrayBuffer.empty[(Long, Map[Long, Long])]
    def df(pairs: Seq[(Long, Long)]) = pairs.toDF("id", "v")
    for (_ <- 0 until 22) {
      rng.nextInt(10) match {
        case 0 | 1 | 2 | 3 =>
          val batch = (0 until 1 + rng.nextInt(15)).map { _ =>
            val id = nextId; nextId += 1; (id, rng.nextLong(1000))
          }
          store.insert(df(batch)); model ++= batch
        case 4 | 5 =>
          if (model.nonEmpty) {
            val ids = rng.shuffle(model.keys.toSeq)
              .take(1 + rng.nextInt(model.size)) :+ (nextId + 500)
            store.delete(ids.toDF("id")); ids.foreach(model.remove)
          }
        case 6 | 7 =>
          val existing =
            if (model.isEmpty) Nil
            else rng.shuffle(model.keys.toSeq).take(rng.nextInt(4))
          val fresh = (0 until 1 + rng.nextInt(4)).map { _ =>
            val id = nextId; nextId += 1; id
          }
          val batch = (existing ++ fresh).map(id => (id, rng.nextLong(1000)))
          store.upsert(df(batch)); model ++= batch
        case 8 =>
          if (store.currentVersion >= 0) store.compact()
        case _ =>
          val targets = history.filter(_._1 < store.currentVersion)
          if (targets.nonEmpty) {
            val (v, snap) = targets(rng.nextInt(targets.size))
            store.restore(v)
            model.clear(); model ++= snap
          }
      }
      if (store.currentVersion >= 0)
        history += ((store.currentVersion, model.toMap))
    }
    val pairs = (for {
      i <- history.indices; j <- history.indices
      if history(i)._1 < history(j)._1
    } yield (i, j))
    assert(pairs.nonEmpty)
    for ((i, j) <- rng.shuffle(pairs).take(12)) {
      val (vi, snapI) = history(i)
      val (vj, snapJ) = history(j)
      val rows = store.diff(vi, vj).collect()
      val dels = rows.filter(_.getString(0) == "delete")
        .map(_.getLong(1)).toSet
      val ins = rows.filter(_.getString(0) == "insert")
        .map(r => r.getLong(1) -> r.getLong(2)).toMap
      val applied = (snapI -- dels) ++ ins
      assert(applied === snapJ, s"apply($vi -> $vj) diverged")
      // inserts never carry a NULL payload; deletes always do
      assert(rows.filter(_.getString(0) == "insert").forall(!_.isNullAt(2)))
      assert(rows.filter(_.getString(0) == "delete").forall(_.isNullAt(2)))
    }
  }

  test("fast path reads ONLY the window's new files — the from-version " +
      "segment never enters the feed's scan") {
    val store = new SnapshotStore(spark,
      Files.createTempDirectory("graft-diff-files").toString)
    store.insert((0L until 100L).map(i => (i, i)).toDF("id", "v"))   // v0
    store.insert((100L until 160L).map(i => (i, i)).toDF("id", "v")) // v1
    store.delete(Seq(5L, 105L).toDF("id"))                           // v2
    val seg0 = store.manifest(0).get.segments.head.path
    val d = store.diff(0, 2)
    val files = d.inputFiles.toSeq
    assert(files.nonEmpty)
    assert(!files.exists(_.startsWith(seg0)),
      s"from-version segment scanned by the feed: $files")
    // contract on the same window, for completeness
    val rows = d.collect()
    val ins = rows.filter(_.getString(0) == "insert").map(_.getLong(1)).toSet
    val dels = rows.filter(_.getString(0) == "delete").map(_.getLong(1)).toSet
    assert(ins === (100L until 160L).toSet - 105L)
    assert(dels === Set(5L, 105L))
  }

  test("restoring back to the from-version yields an empty feed; " +
      "inverted windows are loud") {
    val store = new SnapshotStore(spark,
      Files.createTempDirectory("graft-diff-empty").toString)
    store.insert(Seq((1L, 1L)).toDF("id", "v")) // v0
    store.insert(Seq((2L, 2L)).toDF("id", "v")) // v1
    store.restore(0L)                           // v2 == v0's content/files
    assert(store.diff(0, 2).count() === 0)
    intercept[IllegalArgumentException] { store.diff(2, 2) }
    intercept[IllegalArgumentException] { store.diff(2, 0) }
  }
}
