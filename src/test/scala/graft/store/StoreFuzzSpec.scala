package graft.store

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Randomized model-based store testing (vecgo's fuzz harness,
  * `internal/engine/fuzz_test.go`: random op sequences checked against an
  * in-memory model) plus torn-manifest recovery (`internal/fs/faulty.go`
  * fault-injection analog: the failure mode a crash mid-manifest-write
  * leaves behind).
  */
class StoreFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("random op sequences match an in-memory model at every version") {
    val store = new SnapshotStore(spark,
      Files.createTempDirectory("graft-fuzz").toString)
    val rng = new scala.util.Random(1234)
    val model = scala.collection.mutable.Map.empty[Long, Long]
    var nextId = 0L
    // committed (version, model-state) pairs — restore targets
    val history = scala.collection.mutable.ArrayBuffer.empty[(Long, Map[Long, Long])]

    def df(pairs: Seq[(Long, Long)]) = pairs.toDF("id", "v")

    for (step <- 0 until 30) {
      rng.nextInt(11) match {
        case 0 | 1 | 2 | 3 => // insert a fresh batch
          val batch = (0 until 1 + rng.nextInt(20)).map { _ =>
            val id = nextId; nextId += 1; (id, rng.nextLong(1000))
          }
          store.insert(df(batch))
          model ++= batch
        case 4 | 5 => // delete a random subset of live ids (+ a missing id)
          if (model.nonEmpty) {
            val ids = rng.shuffle(model.keys.toSeq)
              .take(1 + rng.nextInt(model.size)) :+ (nextId + 500)
            store.delete(ids.toDF("id"))
            ids.foreach(model.remove)
          }
        case 6 | 7 => // upsert: mix of existing and fresh ids
          val existing =
            if (model.isEmpty) Nil
            else rng.shuffle(model.keys.toSeq).take(rng.nextInt(5))
          val fresh = (0 until 1 + rng.nextInt(5)).map { _ =>
            val id = nextId; nextId += 1; id
          }
          val batch = (existing ++ fresh).map(id => (id, rng.nextLong(1000)))
          if (batch.nonEmpty) {
            store.upsert(df(batch))
            model ++= batch
          }
        case 8 => // full compaction (only defined on a non-empty chain)
          if (store.currentVersion >= 0) store.compact()
        case 9 => // policy-driven partial compaction
          if (store.currentVersion >= 0)
            store.maybeCompact(CompactionPolicy.sizeTiered())
        case _ => // RESTORE to a random earlier version: the model rolls
          // back with it, and the chain (LSN rule, later ops) continues
          val targets = history.filter(_._1 < store.currentVersion)
          if (targets.nonEmpty) {
            val (v, snap) = targets(rng.nextInt(targets.size))
            store.restore(v)
            model.clear()
            model ++= snap
          }
      }
      if (store.currentVersion >= 0) {
        val got = store.read().select("id", "v").as[(Long, Long)]
          .collect().toMap
        assert(got == model.toMap, s"divergence after step $step")
        history += ((store.currentVersion, model.toMap))
      }
    }
    // time travel still serves every retained version after the run
    assert(store.versions().forall(v => store.manifest(v).isDefined))
  }

  test("two writers from the same parent: one commits, the loser fails loudly") {
    val root = Files.createTempDirectory("graft-cas").toString
    val a = new SnapshotStore(spark, root)
    val b = new SnapshotStore(spark, root)
    a.insert(Seq((1L, "a")).toDF("id", "v")) // v0, shared parent
    // both writers derive version 1 from the same head; commit directly to
    // interleave deterministically (insert() would re-read the head)
    val head = a.manifest().get
    val m1 = head.copy(version = head.version + 1, ts = 0L)
    a.commit(m1)
    val ex = intercept[java.util.ConcurrentModificationException] {
      b.commit(head.copy(version = head.version + 1, ts = 0L))
    }
    assert(ex.getMessage.contains("concurrent commit"))
    assert(a.currentVersion == 1 && b.currentVersion == 1)
    // retry shape: the loser re-reads the head and lands on the next version
    val reread = b.manifest().get
    b.commit(reread.copy(version = reread.version + 1, ts = 0L))
    assert(a.currentVersion == 2)
    // stress: two threads racing full mutations with retry-on-conflict must
    // never lose an update (pre-CAS, a lost race silently dropped a batch)
    val ids = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val threads = (0 until 2).map { t =>
      new Thread(() => {
        val st = new SnapshotStore(spark, root)
        (0 until 4).foreach { i =>
          val id = 100L + t * 10 + i
          var done = false
          while (!done) {
            try { st.insert(Seq((id, s"w$t")).toDF("id", "v")); done = true }
            catch { case _: java.util.ConcurrentModificationException => () }
          }
          ids.add(id)
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val got = a.read().select("id").as[Long].collect().toSet
    assert(ids.asScala.toSet.subsetOf(got),
      s"lost updates: ${ids.asScala.toSet -- got}")
  }

  test("torn head manifest: readers warn+skip, writers anchor on the last durable commit") {
    val store = new SnapshotStore(spark,
      Files.createTempDirectory("graft-torn").toString)
    store.insert(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))   // v0
    store.insert(Seq((3L, "c")).toDF("id", "v"))              // v1
    val head = store.currentVersion
    assert(head == 1)
    // simulate a crash mid-write: the head manifest is half a JSON object
    val mp = Paths.get(store.root, f"MANIFEST-$head%06d.json")
    java.nio.file.Files.write(mp, """{"version":1,"maxSeq":""".getBytes)
    // readers: torn manifest parses to None instead of throwing; the
    // recovery surfaces (versions / vacuum / versionAt) keep working
    assert(store.manifest(head).isEmpty)
    assert(store.versionAt(Long.MaxValue).contains(0L))
    store.vacuum(keepVersions = 10) // must not throw on the torn file
    assert(store.read(0).select("id").as[Long].collect().toSet == Set(1L, 2L))
    // the READ surface falls back to the newest parsable manifest too: a
    // torn head must not make default reads throw until the next write
    assert(store.readableVersion == 0L)
    assert(store.read().select("id").as[Long].collect().toSet == Set(1L, 2L))
    // writers: the next commit anchors on v0 (the last PARSABLE manifest)
    // and re-commits version 1 over the torn file — no seq-0 restart, no
    // data loss
    store.insert(Seq((4L, "d")).toDF("id", "v"))
    assert(store.currentVersion == 1)
    assert(store.read().select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 4L))
  }
}
