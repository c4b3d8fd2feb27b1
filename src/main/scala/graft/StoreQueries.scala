package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.SnapshotStore

/** Write-path operator coverage (vecgo §2.1 W2-W10): the full
  * insert → delete → upsert → compact lifecycle and time travel, driven
  * against a scratch store and oracle-checked as relational algebra over
  * the source table.
  */
object StoreQueries {

  private def scratch(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_$name"

  /** Build the canonical lifecycle store over the embeddings table:
    * v0 insert ids < 250, v1 insert ids >= 250, v2 delete label = 3,
    * v3 upsert ids < 50 with label+100, v4 compact.
    */
  private def buildLifecycle(s: SparkSession, dir: String, name: String): SnapshotStore =
    buildLifecycleAt(s, dir, scratch(name))

  private def buildLifecycleAt(s: SparkSession, dir: String, root: String): SnapshotStore = {
    val p = new Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val store = new SnapshotStore(s, root)
    val emb = Tables.load(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("label"))
    store.insert(emb.where(col("id") < 250))
    store.insert(emb.where(col("id") >= 250))
    store.delete(store.read().where(col("label") === 3).select("id"))
    store.upsert(emb.where(col("id") < 50)
      .withColumn("label", col("label") + 100))
    // atomic mixed batch (vecgo ApplyBatch): replace ids 50-59 with
    // label+200 AND delete ids 480-489, one version commit
    store.writeBatch(
      records = Some(emb.where(col("id") >= 50 && col("id") < 60)
        .withColumn("label", col("label") + 200)),
      deleteIds = emb.where(col("id") >= 480 && col("id") < 490).select("id"))
    store.compact()
    store
  }

  /** Final state after the full lifecycle (compacted snapshot). */
  def lifecycle(s: SparkSession, dir: String): DataFrame =
    buildLifecycle(s, dir, "store_lifecycle")
      .read()
      .select(col("id"), col("label"))
      .orderBy(col("id").asc)

  /** The full lifecycle under the emulated OBJECT STORE
    * ([[graft.store.S3SimFileSystem]]: manifest rename is copy+delete
    * with a client-side precondition, conditional create is an atomic
    * server-side PUT — S3A's commit-relevant semantics, vecgo
    * `blobstore/s3`): every verb plus a vacuum runs against `s3sim:` and
    * the head must answer the SAME relational oracle as the local-FS
    * twin. Turns the S4-S5 coverage rows from test-only into
    * oracle-verified.
    */
  def s3Lifecycle(s: SparkSession, dir: String): DataFrame = {
    graft.store.S3SimFileSystem.register(s.sparkContext.hadoopConfiguration)
    val store = buildLifecycleAt(s, dir, "s3sim:" + scratch("store_s3sim"))
    store.vacuum(keepVersions = 2) // manifest + segment GC on the sim
    store.read()
      .select(col("id"), col("label"))
      .orderBy(col("id").asc)
  }

  /** The full lifecycle on the HEAP-RESIDENT store
    * ([[graft.store.MemFileSystem]], `graftmem:` — the reference's
    * in-process memory blob store, vecgo `blobstore/memory`): parquet
    * segments, tombstones, manifests, CURRENT, vacuum all live in byte
    * arrays; nothing touches disk (gated on the map actually holding the
    * bytes). Same relational oracle as the local-FS twin.
    */
  def memLifecycle(s: SparkSession, dir: String): DataFrame = {
    graft.store.MemFileSystem.register(s.sparkContext.hadoopConfiguration)
    graft.store.MemFileSystem.clear()
    val store = buildLifecycleAt(s, dir, "graftmem:/graft/store_memory")
    store.vacuum(keepVersions = 2)
    require(graft.store.MemFileSystem.usedBytes() > 0,
      "graftmem store must hold its bytes in heap")
    store.read()
      .select(col("id"), col("label"))
      .orderBy(col("id").asc)
  }

  /** Time travel: version 2 (after the delete, before the upsert). */
  def timeTravel(s: SparkSession, dir: String): DataFrame =
    buildLifecycle(s, dir, "store_timetravel")
      .read(version = 2)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label").asc)

  /** RESTORE ([[SnapshotStore.restore]]): after the full lifecycle the
    * head rolls BACK to version 2's content as a NEW commit — nothing
    * copied, the manifest re-references the old artifacts — so the HEAD
    * read now answers the same oracle as the version-2 time travel,
    * while the rolled-back head stays time-travelable (gated).
    */
  def restoreQ(s: SparkSession, dir: String): DataFrame = {
    val store = buildLifecycle(s, dir, "store_restore")
    val headBefore = store.currentVersion
    val v = store.restore(2)
    require(v == headBefore + 1, "restore must commit a NEW head version")
    require(store.currentVersion == v, "restore did not move the head")
    require(store.manifest(headBefore).isDefined,
      "rolled-back head must remain time-travelable until vacuumed")
    store.read()
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label").asc)
  }

  /** Timestamp time travel (vecgo asOf reads): read the store as of the
    * commit timestamp of version 2 — identical visible state to
    * `read(version = 2)`, but addressed by wall-clock time from the
    * manifest's commit stamp.
    */
  def timeTravelTs(s: SparkSession, dir: String): DataFrame = {
    val store = buildLifecycle(s, dir, "store_timetravel_ts")
    val ts2 = store.manifest(2).get.ts
    store.readAsOf(ts2)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label").asc)
  }

  /** Change feed, file-diff fast path ([[SnapshotStore.diff]]): the
    * lifecycle window v1→v4 (delete label=3, upsert ids<50 (+100),
    * writeBatch replace 50-59 (+200) + delete 480-489) with no
    * compaction inside it, so the feed reads ONLY the window's new
    * files. Deletes surface as id-only rows (data NULL); the window's
    * tombstoned ids include the upsert/replace victims (delete+insert
    * is the upsert wire format) and are idempotent on ids the consumer
    * never had.
    */
  def diffQ(s: SparkSession, dir: String): DataFrame = {
    val store = buildLifecycle(s, dir, "store_diff")
    store.diff(1, 4)
      .orderBy(col("op").asc, col("id").asc)
  }

  /** Change feed, full-diff fallback: v1→v5 crosses the compaction, so
    * the file diff cannot apply and the anti-join + content-hash path
    * answers — the SAME logical change set as the v1→v4 window (compact
    * rewrites layout, not content), proving the two paths agree where
    * their windows coincide logically.
    */
  def diffFullQ(s: SparkSession, dir: String): DataFrame = {
    val store = buildLifecycle(s, dir, "store_diff_full")
    store.diff(1, 5)
      .orderBy(col("op").asc, col("id").asc)
  }

  /** Manifest-stats segment pruning: three label-range segments with
    * collected stats; a `label = 7` scan must prune two of them (asserted)
    * and still return exactly the right rows.
    */
  def prunedScan(s: SparkSession, dir: String): DataFrame = {
    val root = scratch("store_pruned")
    val p = new Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val store = new SnapshotStore(s, root)
    val emb = Tables.load(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("label"))
    store.insert(emb.where(col("label") < 3), collectStats = true)
    store.insert(emb.where(col("label") >= 3 && col("label") < 7), collectStats = true)
    store.insert(emb.where(col("label") >= 7), collectStats = true)
    val (df, scanned, pruned) =
      store.prunedRead(Seq(graft.types.Filter.Eq("label", 7)))
    require(pruned.size == 2 && scanned.size == 1,
      s"expected 2 segments pruned, got scanned=$scanned pruned=$pruned")
    df.select(col("id"), col("label")).orderBy(col("id").asc)
  }

  /** Vacuum lifecycle (vecgo W10): commit four versions, vacuum down to
    * the head — dropped manifests AND their now-unreferenced data files
    * must be reclaimed (asserted), old versions must stop resolving, and
    * the retained head must still serve exactly the right rows (the
    * oracle-checked output).
    */
  def vacuumed(s: SparkSession, dir: String): DataFrame = {
    val root = scratch("store_vacuum")
    val p = new Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val store = new SnapshotStore(s, root)
    val emb = Tables.load(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("label"))
    store.insert(emb.where(col("id") < 100))                        // v0
    store.insert(emb.where(col("id") >= 100 && col("id") < 250))    // v1
    store.delete(store.read().where(col("label") === 5).select("id")) // v2
    store.compact()                                                 // v3
    require(store.versions() == Seq(0L, 1L, 2L, 3L))
    store.vacuum(keepVersions = 1)
    // only the head survives: old manifests gone, old versions unreadable
    require(store.versions() == Seq(3L), s"expected [3], got ${store.versions()}")
    require(store.manifest(0).isEmpty && store.manifest(2).isEmpty,
      "vacuum must drop old manifests")
    // the dropped versions' files are reclaimed: exactly the compacted
    // segment remains, every pre-compaction segment and delete list is gone
    val left = fs.listStatus(p).map(_.getPath.getName)
    require(left.count(_.startsWith("seg-")) == 1,
      s"expected 1 surviving segment dir, got ${left.mkString(",")}")
    require(!left.exists(_.startsWith("del-")),
      "vacuum must reclaim delete lists referenced only by dropped versions")
    // orphan cleanup (W11): a stray unreferenced segment dir — a crash
    // leftover or the loser of a commit race — is reclaimed, while every
    // manifest-referenced file survives
    fs.mkdirs(new Path(root, "seg-999-deadbeef"))
    store.cleanOrphans()
    val after = fs.listStatus(p).map(_.getPath.getName)
    require(!after.contains("seg-999-deadbeef"),
      "cleanOrphans must remove unreferenced segment dirs")
    require(after.count(_.startsWith("seg-")) == 1,
      "cleanOrphans must keep referenced segments")
    store.read()
      .select(col("id"), col("label"))
      .orderBy(col("id").asc)
  }

  /** Policy-driven compaction (vecgo W9 `CompactionPolicy.Pick`): six
    * single-label segments trip the threshold policy (fold all when more
    * than `maxSegments` exist), one more round is a no-op below the
    * threshold — both asserted — and the folded store serves exactly the
    * union of its inputs (the oracle-checked output).
    */
  def compactionPolicy(s: SparkSession, dir: String): DataFrame = {
    val root = scratch("store_policy")
    val p = new Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val store = new SnapshotStore(s, root)
    val emb = Tables.load(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("label"))
    (0 until 6).foreach(i =>
      store.insert(emb.where(pmod(col("id"), lit(6)) === i)))
    require(store.manifest().get.segments.size == 6)
    val v = store.maybeCompact(graft.store.CompactionPolicy.threshold(4))
    require(v.isDefined, "threshold policy must pick 6 > 4 segments")
    require(store.manifest().get.segments.size == 1,
      s"expected one folded segment, got ${store.manifest().get.segments.size}")
    require(store.maybeCompact(graft.store.CompactionPolicy.threshold(4)).isEmpty,
      "policy must be a no-op below its threshold")
    store.read().select(col("id"), col("label")).orderBy(col("id").asc)
  }

  /** Categorical-bloom segment pruning (vecgo I14 manifest blooms): a
    * derived category column whose lexicographic BOUNDS straddle the probe
    * value in one segment — only the bloom can prove the miss. The scan
    * must prune that segment (asserted) and still return exactly the
    * matching rows.
    */
  def bloomScan(s: SparkSession, dir: String): DataFrame = {
    val root = scratch("store_bloom")
    val p = new Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val store = new SnapshotStore(s, root)
    val emb = Tables.load(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("label"),
        concat(lit("c"), col("label")).as("cat"))
    // segment 0 holds c0/c6: bounds [c0, c6] contain the probe 'c4', so
    // min/max pruning is powerless — the collected bloom must prune it
    store.insert(emb.where(col("label").isin(0, 6)), collectStats = true)
    store.insert(emb.where(col("label") === 4), collectStats = true)
    val (df, scanned, pruned) =
      store.prunedRead(Seq(graft.types.Filter.Eq("cat", "c4")))
    require(scanned.size == 1 && pruned.size == 1,
      s"bloom must prune the straddling segment: scanned=$scanned pruned=$pruned")
    df.select(col("id"), col("cat")).orderBy(col("id").asc)
  }

  /** Z-order clustered rewrite ([[SnapshotStore.compactZOrder]]): orders
    * inserted in three interleaved chunks (the adversarial layout for
    * min/max pruning — every file straddles both key domains), deletes
    * applied, then OPTIMIZE-ZORDER-style compaction on
    * (o_custkey, o_totalprice). The output is a multi-column box
    * predicate scanned off the clustered layout — the oracle proves the
    * rewrite loses/duplicates/corrupts nothing; the clustering geometry
    * itself (small per-file boxes, file pruning) is asserted structurally
    * in `ZOrderSpec`.
    */
  def zorderScan(s: SparkSession, dir: String): DataFrame = {
    val root = scratch("store_zorder")
    val p = new Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val store = new SnapshotStore(s, root)
    val ord = Tables.load(s, dir, "orders")
      .select(col("o_orderkey").as("id"), col("o_custkey"),
        col("o_totalprice"))
    store.insert(ord.where(col("id") % 3 === 0))
    store.insert(ord.where(col("id") % 3 === 1))
    store.insert(ord.where(col("id") % 3 === 2))
    store.delete(ord.where(col("id") % 11 === 0).select("id"))
    store.compactZOrder(Seq("o_custkey", "o_totalprice"), bits = 8,
      targetFiles = 16)
    val m = store.manifest().get
    require(m.segments.size == 1 && m.deletes.isEmpty,
      "z-order compaction must fold to one clustered segment")
    store.read()
      .where(col("o_custkey") < 200 && col("o_totalprice") >= 50000.0 &&
        col("o_totalprice") < 150000.0)
      .select(col("id"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy(col("id").asc)
  }

  /** Schema evolution (the open/dynamic metadata model — vecgo passes
    * unknown keys through, `metadata/schema.go:50`; Delta's
    * mergeSchema analog): v0 inserts (id, label), v1 adds a `cat`
    * column, a delete lands across both, and compaction folds the
    * evolved schema into one segment. Rows from the pre-evolution
    * segment read `cat` as NULL throughout.
    */
  def schemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val root = scratch("store_evolve")
    val p = new Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val store = new SnapshotStore(s, root)
    val emb = Tables.load(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("label"))
    store.insert(emb.where(col("id") < 250))
    store.insert(emb.where(col("id") >= 250)
      .withColumn("cat", concat(lit("c"), col("label"))))
    store.delete(store.read().where(col("label") === 2).select("id"))
    store.compact()
    store.read()
      .select(col("id"), col("label"), col("cat"))
      .orderBy(col("id").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "store_lifecycle" -> (lifecycle _),
    "store_s3_lifecycle" -> (s3Lifecycle _),
    "store_memory_lifecycle" -> (memLifecycle _),
    "store_timetravel" -> (timeTravel _),
    "store_restore" -> (restoreQ _),
    "store_diff" -> (diffQ _),
    "store_diff_full" -> (diffFullQ _),
    "store_timetravel_ts" -> (timeTravelTs _),
    "store_pruned_scan" -> (prunedScan _),
    "store_vacuum" -> (vacuumed _),
    "store_compaction_policy" -> (compactionPolicy _),
    "store_bloom_scan" -> (bloomScan _),
    "store_zorder_scan" -> (zorderScan _),
    "store_schema_evolution" -> (schemaEvolution _)
  )

  /** Oracles: the lifecycle re-expressed as relational algebra over the
    * source table. The upsert re-adds ids < 50 (including previously
    * deleted label-3 rows) with label+100; other rows survive unless
    * label = 3.
    */
  val oracle: Map[String, String] = Map(
    "store_lifecycle" ->
      """SELECT vec_id AS id, label + 100 AS label FROM embeddings WHERE vec_id < 50
        |UNION ALL
        |SELECT vec_id AS id, label + 200 AS label FROM embeddings
        |WHERE vec_id >= 50 AND vec_id < 60
        |UNION ALL
        |SELECT vec_id AS id, label FROM embeddings
        |WHERE vec_id >= 60 AND label <> 3 AND vec_id NOT BETWEEN 480 AND 489
        |ORDER BY id ASC""".stripMargin,
    // same chain, object-store / in-memory backends: same final state
    "store_s3_lifecycle" ->
      """SELECT vec_id AS id, label + 100 AS label FROM embeddings WHERE vec_id < 50
        |UNION ALL
        |SELECT vec_id AS id, label + 200 AS label FROM embeddings
        |WHERE vec_id >= 50 AND vec_id < 60
        |UNION ALL
        |SELECT vec_id AS id, label FROM embeddings
        |WHERE vec_id >= 60 AND label <> 3 AND vec_id NOT BETWEEN 480 AND 489
        |ORDER BY id ASC""".stripMargin,
    "store_memory_lifecycle" ->
      """SELECT vec_id AS id, label + 100 AS label FROM embeddings WHERE vec_id < 50
        |UNION ALL
        |SELECT vec_id AS id, label + 200 AS label FROM embeddings
        |WHERE vec_id >= 50 AND vec_id < 60
        |UNION ALL
        |SELECT vec_id AS id, label FROM embeddings
        |WHERE vec_id >= 60 AND label <> 3 AND vec_id NOT BETWEEN 480 AND 489
        |ORDER BY id ASC""".stripMargin,
    "store_timetravel" ->
      """SELECT label, count(*) AS n FROM embeddings
        |WHERE label <> 3 GROUP BY label ORDER BY label ASC""".stripMargin,
    // restore(2) makes version 2's content the head again
    "store_restore" ->
      """SELECT label, count(*) AS n FROM embeddings
        |WHERE label <> 3 GROUP BY label ORDER BY label ASC""".stripMargin,
    "store_timetravel_ts" ->
      """SELECT label, count(*) AS n FROM embeddings
        |WHERE label <> 3 GROUP BY label ORDER BY label ASC""".stripMargin,
    // change feed v1→v4: window tombstones = label-3 victims + upsert ids
    // [0,50) + replace ids [50,60) + deletes [480,490); window inserts =
    // the upserted/replaced rows live at v4
    "store_diff" ->
      """WITH del AS (
        |  SELECT DISTINCT vec_id AS id FROM embeddings
        |  WHERE label = 3 OR vec_id < 60
        |     OR (vec_id >= 480 AND vec_id < 490)),
        |ins AS (
        |  SELECT vec_id AS id,
        |         CASE WHEN vec_id < 50 THEN label + 100
        |              ELSE label + 200 END AS label
        |  FROM embeddings WHERE vec_id < 60)
        |SELECT 'delete' AS op, id, NULL::INTEGER AS label FROM del
        |UNION ALL
        |SELECT 'insert' AS op, id, label FROM ins
        |ORDER BY op ASC, id ASC""".stripMargin,
    // full-diff fallback v1→v5 (crosses compact): the id-level delete set
    // is identical (DISTINCT folds label-3 ids below 60 into the upsert
    // victims), and the same changed rows surface as inserts
    "store_diff_full" ->
      """WITH del AS (
        |  SELECT DISTINCT vec_id AS id FROM embeddings
        |  WHERE label = 3 OR vec_id < 60
        |     OR (vec_id >= 480 AND vec_id < 490)),
        |ins AS (
        |  SELECT vec_id AS id,
        |         CASE WHEN vec_id < 50 THEN label + 100
        |              ELSE label + 200 END AS label
        |  FROM embeddings WHERE vec_id < 60)
        |SELECT 'delete' AS op, id, NULL::INTEGER AS label FROM del
        |UNION ALL
        |SELECT 'insert' AS op, id, label FROM ins
        |ORDER BY op ASC, id ASC""".stripMargin,
    "store_pruned_scan" ->
      """SELECT vec_id AS id, label FROM embeddings
        |WHERE label = 7 ORDER BY id ASC""".stripMargin,
    "store_vacuum" ->
      """SELECT vec_id AS id, label FROM embeddings
        |WHERE vec_id < 250 AND label <> 5 ORDER BY id ASC""".stripMargin,
    "store_compaction_policy" ->
      """SELECT vec_id AS id, label FROM embeddings ORDER BY id ASC""".stripMargin,
    "store_bloom_scan" ->
      """SELECT vec_id AS id, 'c' || label AS cat FROM embeddings
        |WHERE label = 4 ORDER BY id ASC""".stripMargin,
    "store_schema_evolution" ->
      """SELECT vec_id AS id, label,
        |       CASE WHEN vec_id >= 250 THEN 'c' || label END AS cat
        |FROM embeddings WHERE label <> 2 ORDER BY id ASC""".stripMargin,
    "store_zorder_scan" ->
      """SELECT o_orderkey AS id, o_custkey,
        |       round(o_totalprice, 2) AS o_totalprice
        |FROM orders
        |WHERE o_orderkey % 11 <> 0 AND o_custkey < 200
        |  AND o_totalprice >= 50000.0 AND o_totalprice < 150000.0
        |ORDER BY id ASC""".stripMargin
  )
}
