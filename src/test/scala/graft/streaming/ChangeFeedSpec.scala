package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftDB, SparkTestSession}

/** The change-feed follower contract: an external parquet mirror driven
  * by a streaming `foreachBatch` loop converges to the store through
  * inserts, upserts, deletes, and a window spanning a compaction (the
  * two-scan fallback), and a RESTARTED follower resumes from the mirror
  * pointer — replayed ticks are idempotent no-ops.
  */
class ChangeFeedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(8)(r.nextFloat() * 2 - 1)
  }
  private def records(ids: Range) =
    ids.map(i => (i.toLong, vec(i), i % 5)).toDF("id", "vector", "label")

  private def snapshot(db: GraftDB): Seq[(Long, Int)] =
    db.read().select(col("id"), col("label").cast("int"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq

  private def mirrorRows(db: GraftDB, dir: String): Seq[(Long, Int)] =
    ChangeFeed.readMirror(db, dir)
      .select(col("id"), col("label").cast("int"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq

  test("follower converges through inserts, upserts, deletes, and a " +
      "compaction-spanning window; restart resumes from the pointer") {
    val db = GraftDB.open(spark,
      Files.createTempDirectory("graft-cf-db").toString,
      dim = 8, metric = "l2", schema = Map("label" -> "int"))
    db.insertBatch(records(0 until 100))
    val mirrorDir = Files.createTempDirectory("graft-cf-mirror").toString
    val seeded = ChangeFeed.initMirror(db, mirrorDir)
    assert(ChangeFeed.mirrorVersion(mirrorDir,
      spark.sparkContext.hadoopConfiguration).contains(seeded))

    implicit val ctx = spark.sqlContext
    val ticks = MemoryStream[Int]
    val ckpt = Files.createTempDirectory("graft-cf-ckpt").toString
    val q = ChangeFeed.follow(db, ticks.toDF(), mirrorDir, ckpt)
    try {
      // window 1: plain inserts (file-diff fast path)
      db.insertBatch(records(100 until 160))
      ticks.addData(1); q.processAllAvailable()
      assert(mirrorRows(db, mirrorDir) == snapshot(db))
      // window 2: upsert + delete under one tick
      db.upsert(records(20 until 40).withColumn("label", lit(99)))
      db.delete((0L until 160L by 13).toSeq)
      ticks.addData(2); q.processAllAvailable()
      assert(mirrorRows(db, mirrorDir) == snapshot(db))
      // a tick with NO new version is a no-op (idempotent catch-up)
      val vBefore = ChangeFeed.mirrorVersion(mirrorDir,
        spark.sparkContext.hadoopConfiguration).get
      ticks.addData(3); q.processAllAvailable()
      assert(ChangeFeed.mirrorVersion(mirrorDir,
        spark.sparkContext.hadoopConfiguration).contains(vBefore))
    } finally q.stop()

    // window 3 happens while NO follower runs: compaction + an upsert —
    // a restarted follower (fresh checkpoint, same mirror) must converge
    // through the two-scan fallback from the mirror pointer alone
    db.compact()
    db.upsert(records(50 until 60).withColumn("label", lit(77)))
    val ticks2 = MemoryStream[Int]
    val q2 = ChangeFeed.follow(db, ticks2.toDF(), mirrorDir,
      Files.createTempDirectory("graft-cf-ckpt2").toString)
    try {
      ticks2.addData(1); q2.processAllAvailable()
      assert(mirrorRows(db, mirrorDir) == snapshot(db))
    } finally q2.stop()

    // the mirror is bounded to TWO live snapshots: the current one plus
    // the window it superseded (reader grace); everything older is swept
    val fs = new org.apache.hadoop.fs.Path(mirrorDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def snapDirs() = fs.listStatus(new org.apache.hadoop.fs.Path(mirrorDir))
      .filter(_.getPath.getName.matches("v\\d+")).map(_.getPath.getName)
    val cur = ChangeFeed.mirrorVersion(mirrorDir,
      spark.sparkContext.hadoopConfiguration).get
    assert(snapDirs().length <= 2, snapDirs().mkString(", "))
    assert(snapDirs().contains(s"v$cur"), snapDirs().mkString(", "))

    // an orphan snapshot left by a crashed window (pointer swapped, its
    // own cleanup never ran) is reclaimed by the NEXT window's sweep
    fs.mkdirs(new org.apache.hadoop.fs.Path(mirrorDir, "v1"))
    db.insertBatch(records(300 until 310))
    ChangeFeed.catchUp(db, mirrorDir)
    assert(!snapDirs().contains("v1"), snapDirs().mkString(", "))
    assert(mirrorRows(db, mirrorDir) == snapshot(db))

    // follow() without a seeded mirror fails loudly
    intercept[IllegalArgumentException] {
      ChangeFeed.follow(db, ticks2.toDF(),
        Files.createTempDirectory("graft-cf-empty").toString,
        Files.createTempDirectory("graft-cf-ckpt3").toString)
    }
  }

  test("store-to-store follower: O(delta) writeBatch windows converge a " +
      "cloned destination store through mutations and compaction") {
    val src = GraftDB.open(spark,
      Files.createTempDirectory("graft-cfs-src").toString,
      dim = 8, metric = "l2", schema = Map("label" -> "int"))
    src.insertBatch(records(0 until 100))
    val destRoot = Files.createTempDirectory("graft-cfs-dest").toString + "/m"
    val dest = ChangeFeed.initStoreMirror(src, destRoot)
    assert(snapshot(dest) == snapshot(src))

    implicit val ctx = spark.sqlContext
    val ticks = MemoryStream[Int]
    val q = ChangeFeed.followStore(src, dest, ticks.toDF(),
      Files.createTempDirectory("graft-cfs-ckpt").toString)
    try {
      src.insertBatch(records(100 until 150))
      ticks.addData(1); q.processAllAvailable()
      assert(snapshot(dest) == snapshot(src))
      val destV1 = dest.effectiveVersion
      src.upsert(records(30 until 45).withColumn("label", lit(88)))
      src.delete((0L until 150L by 11).toSeq)
      ticks.addData(2); q.processAllAvailable()
      assert(snapshot(dest) == snapshot(src))
      // each window = ONE destination commit (writeBatch), and the
      // window's delta — not the table — is what moved: the seeded
      // segments are still the clone's own files, untouched
      assert(dest.effectiveVersion == destV1 + 1)
      // a tick with no new source version is a no-op commit-wise
      val vQuiet = dest.effectiveVersion
      ticks.addData(3); q.processAllAvailable()
      assert(dest.effectiveVersion == vQuiet)
      // compaction + upsert inside one window: the content-diff fallback
      // still lands as one idempotent writeBatch
      src.compact()
      src.upsert(records(60 until 70).withColumn("label", lit(77)))
      ticks.addData(4); q.processAllAvailable()
      assert(snapshot(dest) == snapshot(src))
    } finally q.stop()
    // the destination remains an independent, queryable store
    val top = dest.search(vec(5), 5).collect()
    assert(top.length == 5)
  }

  test("applyWindow is the diff apply contract: copy(v0) + window = v1") {
    val db = GraftDB.open(spark,
      Files.createTempDirectory("graft-cf-apply-db").toString,
      dim = 8, metric = "l2", schema = Map("label" -> "int"))
    val v0 = db.insertBatch(records(0 until 80))
    val copy = db.store.read(v0)
    db.upsert(records(10 until 20).withColumn("label", lit(42)))
    val v1 = db.delete(Seq(5L, 6L, 7L))
    val applied = ChangeFeed.applyWindow(copy, db.changes(v0, v1))
      .select(col("id"), col("label").cast("int"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(applied == snapshot(db))
  }
}
