package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.GraftDB

/** Structured-Streaming consumption of the row-level change feed — the
  * EXTERNAL-consumer twin of [[graft.serve.LocalReplica.refreshFrom]]
  * (which replays the same manifest diff into an in-process replica).
  * A follower keeps a materialized copy of the store converged
  * version-to-version by applying [[GraftDB.changes]] windows in order:
  * op='delete' ids first, then op='insert' rows — the
  * [[graft.store.SnapshotStore.diff]] apply contract, under which a copy
  * of version v0 plus the (v0, v1] window IS version v1, exactly.
  *
  * 100 TB shape: between compactions each window reads ONLY the window's
  * new delta files (the diff fast path, measured flat across a 10×
  * corpus); windows that span a rewrite fall back to the documented
  * two-scan content diff and still converge. The reference mirror here
  * materializes to parquet snapshot directories (copy-on-write, pointer
  * swap, bounded to two live snapshots — current plus one superseded
  * window kept as reader grace) — a production consumer with an
  * upsert-capable sink (a lakehouse table, a search cluster, a cache)
  * would feed [[applyWindow]]'s two branches straight into its own
  * delete/append API instead.
  */
object ChangeFeed {

  /** Apply ONE change-feed window to a mirror frame: drop every id the
    * window deletes or replaces, then append the inserted rows. Pure —
    * callers choose how to materialize the result.
    */
  def applyWindow(mirror: DataFrame, changes: DataFrame): DataFrame = {
    val cols = mirror.columns.toSeq
    val delIds = changes.where(col("op") === "delete").select("id")
    val ins = changes.where(col("op") === "insert")
      .select(cols.map(col): _*)
    mirror.join(delIds, Seq("id"), "left_anti").unionByName(ins)
  }

  private def pointerPath(mirrorDir: String) = new Path(mirrorDir, "MIRROR")

  /** Read a pointer file written by [[swapPointerFile]]. On a checksummed
    * filesystem the overwrite rename moves the data file and its .crc
    * sidecar in two steps, so a concurrent reader can transiently hit a
    * ChecksumException (the same race
    * [[graft.store.SnapshotStore.currentVersion]] tolerates) — retry
    * briefly before surfacing the error.
    */
  private def readPointerFile(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Option[Long] = {
    if (!fs.exists(p)) return None
    var attempt = 0
    while (true) {
      try {
        val in = fs.open(p)
        return try Some(new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
        finally in.close()
      } catch {
        case e: java.io.IOException =>
          attempt += 1
          if (attempt >= 3) throw e
          Thread.sleep(5L << attempt)
      }
    }
    None // unreachable
  }

  /** The store version the mirror at `mirrorDir` currently materializes
    * (None before [[initMirror]]).
    */
  def mirrorVersion(mirrorDir: String,
      conf: org.apache.hadoop.conf.Configuration): Option[Long] = {
    val p = pointerPath(mirrorDir)
    readPointerFile(p.getFileSystem(conf), p)
  }

  /** The mirror's current parquet snapshot (the copy of the version
    * [[mirrorVersion]] reports).
    */
  def readMirror(db: GraftDB, mirrorDir: String): DataFrame = {
    val v = mirrorVersion(mirrorDir,
      db.spark.sparkContext.hadoopConfiguration).getOrElse(
      throw new IllegalStateException(
        s"no mirror at $mirrorDir — initMirror first"))
    db.spark.read.parquet(s"$mirrorDir/v$v")
  }

  /** Write-temp-then-ATOMIC-OVERWRITE-rename for the pointer/cursor
    * files: a crash can leave either the old or the new pointer visible,
    * never neither (the delete+rename fallback for schemes without an
    * AbstractFileSystem keeps the old behavior there — same tradeoff as
    * [[graft.serve.LocalReplica.save]]).
    */
  private def swapPointerFile(dir: String, name: String, v: Long,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val p = new Path(dir, name)
    val fs = p.getFileSystem(conf)
    val tmp = new Path(dir, s"$name.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        fs.makeQualified(p).toUri, conf)
      fc.rename(fs.makeQualified(tmp), fs.makeQualified(p),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        if (fs.exists(p)) fs.delete(p, false)
        require(fs.rename(tmp, p), s"pointer swap failed at $p")
    }
  }

  private def writePointer(mirrorDir: String, v: Long,
      conf: org.apache.hadoop.conf.Configuration): Unit =
    swapPointerFile(mirrorDir, "MIRROR", v, conf)

  /** Seed the mirror with a full copy of the version `db` currently
    * reads; [[follow]] converges it forward from there. Returns the
    * seeded version. The mirror copies the store's PHYSICAL row format
    * (packed vector blobs and all) — the diff apply contract is stated
    * against store content, and a lossless copy is what makes each
    * window's application exact.
    */
  def initMirror(db: GraftDB, mirrorDir: String): Long = {
    val v = db.effectiveVersion
    db.store.read(v).write.mode("overwrite").parquet(s"$mirrorDir/v$v")
    writePointer(mirrorDir, v, db.spark.sparkContext.hadoopConfiguration)
    v
  }

  /** Catch the mirror up to the store's CURRENT version in one window
    * (no-op when already converged). Returns the version the mirror now
    * materializes. Crash-safe: the new snapshot is fully written before
    * the pointer swaps, and superseded snapshots are dropped only after —
    * a redo of an interrupted window overwrites the orphan. The cleanup
    * is a SWEEP (every `v*` dir except the new snapshot and the one it
    * superseded), so an orphan left by a crash between the pointer swap
    * and its own cleanup is reclaimed by the next window instead of
    * persisting forever; the just-superseded snapshot survives one extra
    * window as a grace period for lazy [[readMirror]] frames that were
    * planned against it before this catch-up completed.
    */
  def catchUp(db: GraftDB, mirrorDir: String): Long = {
    val conf = db.spark.sparkContext.hadoopConfiguration
    val seen = mirrorVersion(mirrorDir, conf).getOrElse(
      throw new IllegalStateException(
        s"no mirror at $mirrorDir — initMirror first"))
    val v = db.effectiveVersion
    if (v <= seen) return seen
    val window = db.changes(seen, v)
    val cur = db.spark.read.parquet(s"$mirrorDir/v$seen")
    applyWindow(cur, window)
      .write.mode("overwrite").parquet(s"$mirrorDir/v$v")
    writePointer(mirrorDir, v, conf)
    val fs = new Path(mirrorDir).getFileSystem(conf)
    val keep = Set(s"v$v", s"v$seen")
    fs.listStatus(new Path(mirrorDir)).foreach { st =>
      val nm = st.getPath.getName
      if (st.isDirectory && nm.matches("v\\d+") && !keep(nm))
        fs.delete(st.getPath, true)
    }
    v
  }

  // ------------------------------------------------ store-to-store CDC
  // The parquet-mirror follower above rewrites its one snapshot per
  // window — fine for a bounded mirror, O(table) at 100 TB. The
  // store-to-store follower below is the O(DELTA) consumer: the
  // destination is itself a GraftDB, each window lands as ONE
  // copy-on-write `writeBatch` commit (tombstone list ∪ replaced ids +
  // one appended segment — cost scales with the window, not the table),
  // and the delete side stays a distributed frame end-to-end (no driver
  // id list). Re-applying a window after a crash is idempotent: the
  // batch has upsert semantics, and re-tombstoning a dead id is a no-op.

  private def cursorPath(destRoot: String) = new Path(destRoot, "CDC_CURSOR")

  /** The source version the destination store currently materializes. */
  def storeCursor(dest: GraftDB): Option[Long] = {
    val p = cursorPath(dest.root)
    readPointerFile(
      p.getFileSystem(dest.spark.sparkContext.hadoopConfiguration), p)
  }

  private def writeCursor(dest: GraftDB, v: Long): Unit =
    swapPointerFile(dest.root, "CDC_CURSOR", v,
      dest.spark.sparkContext.hadoopConfiguration)

  /** Seed a destination store as a pinned clone of the source's current
    * version ([[GraftDB.cloneAt]] — config + artifacts + one rebased
    * manifest through the DESTINATION's commit guard) and stamp the CDC
    * cursor. Returns the opened destination handle.
    */
  def initStoreMirror(src: GraftDB, destRoot: String): GraftDB = {
    val v = src.effectiveVersion
    src.cloneAt(destRoot, v)
    val dest = GraftDB.open(src.spark, destRoot)
    writeCursor(dest, v)
    dest
  }

  /** Catch the destination store up to the source's current version in
    * one `writeBatch` window. Returns the source version the destination
    * now materializes.
    */
  def catchUpStore(src: GraftDB, dest: GraftDB): Long = {
    val seen = storeCursor(dest).getOrElse(throw new IllegalStateException(
      s"no CDC cursor at ${dest.root} — initStoreMirror first"))
    val v = src.effectiveVersion
    if (v <= seen) return seen
    val window = src.changes(seen, v)
    val dels = window.where(col("op") === "delete").select("id")
    val insCols = window.columns.filter(_ != "op").toSeq
    val ins = window.where(col("op") === "insert")
      .select(insCols.map(col): _*)
    dest.store.writeBatch(Some(ins), dels)
    writeCursor(dest, v)
    v
  }

  /** [[follow]]'s store-to-store twin: every tick catches the
    * destination store up by one window. Same cursor-is-source-of-truth
    * restart semantics.
    */
  def followStore(src: GraftDB, dest: GraftDB, ticks: DataFrame,
      checkpoint: String): StreamingQuery = {
    require(storeCursor(dest).isDefined,
      s"no CDC cursor at ${dest.root} — initStoreMirror first")
    ticks.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (_: DataFrame, _: Long) =>
        catchUpStore(src, dest)
        ()
      }
      .start()
  }

  /** Run the follower as a streaming query: every micro-batch of `ticks`
    * (any stream — a rate source, the ingest bus, a notification topic;
    * its CONTENT is ignored, arrival is the signal) triggers one
    * [[catchUp]] window. The mirror pointer, not the checkpoint, is the
    * follower's source of truth — a restarted follower resumes from
    * whatever version the mirror last materialized, so replayed ticks
    * are harmless no-ops (the catch-up is idempotent).
    */
  def follow(db: GraftDB, ticks: DataFrame, mirrorDir: String,
      checkpoint: String): StreamingQuery = {
    require(mirrorVersion(mirrorDir,
      db.spark.sparkContext.hadoopConfiguration).isDefined,
      s"no mirror at $mirrorDir — initMirror first")
    ticks.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (_: DataFrame, _: Long) =>
        catchUp(db, mirrorDir)
        ()
      }
      .start()
  }
}
