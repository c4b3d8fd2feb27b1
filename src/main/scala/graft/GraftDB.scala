package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

import graft.functions._
import graft.hybrid.RRF
import graft.lexical.BM25
import graft.query.Search
import graft.store.SnapshotStore
import graft.types.{Filter, FilterSet, Metric}

/** Engine configuration persisted beside the store (vecgo records Metric
  * and dim in its manifest, `manifest.go:31`). `schema` pins declared
  * metadata field types (vecgo `metadata/schema.go:8-58`): Int pins accept
  * int, Float pins accept int-or-float (int upgrades), unknown columns
  * pass through (open schema).
  */
case class GraftConfig(
    dim: Int,
    metric: String,
    schema: Map[String, String] = Map.empty,
    textCol: Option[String] = None)

/** Engine-event observer (vecgo `MetricsObserver`,
  * `internal/engine/metrics.go`; registered via `WithMetricsObserver`,
  * `vecgo.go:391`). Spark reshapes the surface: write-path and
  * maintenance operations are EAGER here (each is a committed version),
  * so they report true durations; `onSearch` fires from the eager search
  * paths ([[GraftDB.searchWithStats]]) with the planner's strategy —
  * lazily-consumed search frames are observable through the session-wide
  * [[GraftDB.sessionMetrics]] listener instead. All methods default to
  * no-ops (vecgo `NoopMetricsObserver`); a throwing observer never fails
  * the operation it observes.
  */
trait MetricsObserver {
  /** op ∈ insert/upsert/delete; rows = segment rows committed (-1 if not
    * cheaply known), version = the new snapshot version. */
  def onWrite(op: String, rows: Long, durationMs: Double, version: Long): Unit = ()
  /** Fired by eager searches with the planner's routing decision. */
  def onSearch(strategy: String, k: Int, rows: Long, durationMs: Double): Unit = ()
  /** op ∈ compact/buildIndex/vacuum. */
  def onMaintenance(op: String, durationMs: Double, version: Long): Unit = ()
}

/** The top-level engine — the Spark-native equivalent of `vecgo.DB`
  * (`vecgo.go`): one object that owns the versioned store, validation,
  * write path, and the full read surface (search / threshold / batch /
  * hybrid / get / scan), plus lifecycle ops (compact / vacuum / time
  * travel / stats / explain).
  *
  * A record frame has: `id long`, `vector array<float>` (dim-checked,
  * NaN/Inf-rejected like `engine.go:786-789`, L2-normalized at write time
  * for Cosine like `hnsw.go:799+`), declared metadata columns, optional
  * `payload binary`, optional text column for lexical/hybrid search.
  */
final class GraftDB private (val spark: SparkSession, val root: String,
    val config: GraftConfig,
    val readOnly: Boolean = false,
    pinVersion: Long = -1L,
    pinTimestampMs: Long = -1L) {

  val store = new SnapshotStore(spark, root)
  val metric: Metric = Metric.fromString(config.metric)

  /** Version every read serves, when the engine was opened pinned (vecgo
    * `WithVersion`/`WithTimestamp`, `vecgo.go:433-446`): an explicit
    * version, or the newest version committed at or before the requested
    * timestamp. A pinned engine is implicitly read-only.
    */
  val pinnedVersion: Option[Long] =
    if (pinVersion >= 0) {
      require(store.manifest(pinVersion).isDefined,
        s"no version $pinVersion at $root")
      Some(pinVersion)
    } else if (pinTimestampMs >= 0) {
      Some(store.versionAt(pinTimestampMs).getOrElse(throw
        new IllegalArgumentException(
          s"no version committed at or before $pinTimestampMs at $root")))
    } else None

  /** The version reads resolve to: the pin, else the newest readable head
    * (falls back past a torn CURRENT/manifest, like the mutators do).
    */
  def effectiveVersion: Long =
    pinnedVersion.getOrElse(store.readableVersion)

  /** Writes are rejected on read-only and pinned engines (vecgo
    * `ReadOnly()`, `vecgo.go:221`).
    */
  private def requireWritable(): Unit = {
    if (readOnly) throw new IllegalStateException(
      s"GraftDB at $root was opened read-only")
    if (pinnedVersion.isDefined) throw new IllegalStateException(
      s"GraftDB at $root is pinned to version ${pinnedVersion.get}; " +
        "time-traveled engines are read-only")
  }
  // register the session-totals listener up front so every engine query
  // from this session is counted (registration is idempotent per session)
  graft.query.QueryMetrics.totals(spark)

  // ----------------------------------------------------------- observers

  private val observers =
    new java.util.concurrent.CopyOnWriteArrayList[MetricsObserver]()

  /** Register an engine-event observer (vecgo `WithMetricsObserver`). */
  def addObserver(o: MetricsObserver): GraftDB = { observers.add(o); this }

  private def notifyObs(f: MetricsObserver => Unit): Unit = {
    val it = observers.iterator()
    while (it.hasNext) {
      // an observer failure must never fail the observed operation — but
      // fatal JVM errors (OOM, thread interrupts) must still propagate
      try f(it.next()) catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  private def timedOp[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e6)
  }

  /** Rows of the newest segment at `version` (what a write just added). */
  private def lastSegmentRows(version: Long): Long =
    store.manifest(version)
      .flatMap(m => m.segments.sortBy(_.seq).lastOption.map(_.rows))
      .getOrElse(-1L)

  // ------------------------------------------------------------ validation

  /** Validate + canonicalize a record batch (vecgo insert-path checks)
    * in the SAME scan that writes it: schema/type pins are metadata-only
    * driver checks, and the per-row vector checks ride inside the
    * projected `vector` column as a `raise_error` branch — vecgo likewise
    * validates inline during insert (`engine.go:781-791`), and the old
    * separate `limit(1).count()` probe pass made every clean bulk load
    * read its input plan twice. A bad row aborts the write job;
    * [[translateValidation]] restores the IllegalArgumentException
    * contract at the driver.
    */
  private def prepare(records: DataFrame): DataFrame = {
    require(records.columns.contains("id"), "records need an `id` column")
    require(records.columns.contains("vector"), "records need a `vector` column")
    config.schema.foreach { case (field, kind) =>
      require(records.columns.contains(field),
        s"schema-declared field `$field` missing")
      val dt = records.schema(field).dataType.typeName
      val ok = kind match {
        case "int" => Seq("integer", "long", "short").contains(dt)
        case "float" => Seq("integer", "long", "short", "float", "double").contains(dt)
        case "string" => dt == "string"
        case "bool" => dt == "boolean"
        case "array" => dt.startsWith("array")
        case _ => true // Any
      }
      require(ok, s"field `$field` has type $dt, schema pins $kind")
    }
    // the failing row's id rides in the message (null-safe: a null id is
    // itself reported, not a second error)
    def tagged(msg: String): Column = concat(lit(GraftDB.ValidationTag),
      lit(msg), lit("; first bad id="),
      coalesce(col("id").cast("string"), lit("null")))
    if (metric == Metric.Hamming) {
      // Hamming stores serve PACKED BINARY CODES (vecgo `distance/
      // distance.go:36-38`): `vector` is array<long> of ceil(dim/32)
      // words ([[graft.index.BQ.packCol]]'s 32-bits-per-word, ANSI-safe
      // packing), dim = number of BITS. No NaN/normalize semantics.
      // NULL-proof: vec_check(null) is NULL and would never trip the
      // branch, so the null row is checked explicitly. The check itself is
      // ONE codegen'd kernel pass (graft.functions.vec_check) — the
      // composed `exists(vector, λ)` ran interpreted per element on the
      // ingest hot path.
      val bad = col("vector").isNull ||
        coalesce(graft.functions.vec_check(
          col("vector"), codeWords, zeroNormBad = false) =!= 0, lit(true))
      records.withColumn("vector",
        when(bad, raise_error(tagged(
          s"invalid code vectors: null or wrong word count (expect " +
            s"$codeWords longs for ${config.dim} bits)")).cast("array<bigint>"))
          .otherwise(col("vector").cast("array<bigint>")))
    } else {
      // NULL-proof as above (vecgo rejects empty vectors in prepareVector,
      // `hnsw.go:799`). Zero vectors are rejected under Cosine
      // (vecgo `distance.go:42-53`: NormalizeL2InPlace refuses zero norm).
      // ONE codegen'd kernel pass checks length + null/NaN/Inf elements +
      // (under cosine) zero norm — the composed `exists(vector, λ)`
      // formulation ran interpreted per element and was most of the
      // bulk-load gap vs a plain parquet write (BulkLoadProbe)
      val bad = col("vector").isNull ||
        coalesce(graft.functions.vec_check(col("vector"), config.dim,
          zeroNormBad = metric == Metric.Cosine) =!= 0, lit(true))
      val canon =
        if (metric == Metric.Cosine) vec_normalize(col("vector"))
        else col("vector")
      // store PACKED: one LE float32 blob per row (binary) instead of
      // LIST<FLOAT> — parquet then encodes one value per row, not one per
      // element (1.7x on the segment write, tools/PackProbe; the same
      // raw-bytes layout as the reference's segment files). Every distance
      // expression accepts the packed layout directly; public reads
      // unpack at the API boundary ([[unpackView]]).
      records.withColumn("vector",
        when(bad, raise_error(tagged(
          s"invalid vectors: null, wrong dimension (expect ${config.dim}), " +
            "NaN/Inf, or zero-norm under cosine")).cast("binary"))
          .otherwise(graft.functions.vec_pack_f32(canon)))
    }
  }

  /** Public-read boundary of the packed segment layout: records went in
    * with `vector array<float>`, so they come back out that way — binary
    * store layout (new segments) unpacks, legacy array<float> segments
    * pass through. Hamming stores (array<long> codes) are untouched.
    */
  private def unpackView(df: DataFrame): DataFrame =
    if (metric != Metric.Hamming && df.columns.contains("vector") &&
        df.schema("vector").dataType ==
          org.apache.spark.sql.types.BinaryType)
      df.withColumn("vector", graft.functions.vec_unpack_f32(col("vector")))
    else df

  /** Re-surface an executor-side inline-validation failure (the
    * `raise_error` branch planted by [[prepare]], arriving wrapped in
    * Spark's job-failure chain) as the driver-side
    * IllegalArgumentException the write API documents; anything else
    * rethrows untouched.
    */
  private def translateValidation[T](f: => T): T =
    try f catch {
      case e: Throwable =>
        var c: Throwable = e
        while (c != null) {
          val m = c.getMessage
          if (m != null && m.contains(GraftDB.ValidationTag))
            throw new IllegalArgumentException(
              m.substring(m.indexOf(GraftDB.ValidationTag) +
                GraftDB.ValidationTag.length), e)
          c = c.getCause
        }
        throw e
    }

  /** Packed-code word count for Hamming stores: ceil(dim-bits / 32). */
  def codeWords: Int = (config.dim + 31) / 32

  // ------------------------------------------------------------ write path

  /** Deferred bulk insert (vecgo W3): validate → new segment version.
    * Hamming stores skip float-vector stats (centroid/radius are
    * meaningless over packed code words).
    */
  def insertBatch(records: DataFrame, collectStats: Boolean = true): Long = {
    requireWritable()
    val (v, ms) = timedOp(translateValidation(
      store.insert(prepare(records), collectStats,
        if (metric == Metric.Hamming) None else Some("vector"))))
    notifyObs(_.onWrite("insert", lastSegmentRows(v), ms, v))
    v
  }

  /** Typed-record insert (vecgo W4 `InsertRecord`/builder ergonomics):
    * case-class `Dataset[Record]` in, same validated path.
    */
  def insertRecords(records: org.apache.spark.sql.Dataset[graft.types.Record],
      collectStats: Boolean = true): Long =
    insertBatch(records.toDF(), collectStats)

  /** Online streaming insert (vecgo W1: MemTable absorbing writes +
    * flush loop, `engine.go:833`, `engine.go:2313`): every micro-batch is
    * validated like any insert and committed as ONE snapshot version —
    * immediately visible to readers of the new version — and an optional
    * [[graft.store.CompactionPolicy]] folds segments as they accumulate
    * (the background-compaction-loop analog, `engine.go:2329`). Pass a
    * `trigger` to bound micro-batch cadence (vecgo `FlushConfig`).
    */
  def insertStream(stream: DataFrame, checkpoint: String,
      policy: Option[graft.store.CompactionPolicy] = None,
      collectStats: Boolean = true,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
      extendIndexTail: Int = 0,
      indexPolicy: Option[graft.index.IndexPolicy] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    requireWritable()
    val w0 = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        insertBatch(batch, collectStats)
        policy.foreach(p => store.maybeCompact(p))
        // index freshness: once the unindexed tail reaches
        // `extendIndexTail` segments, fold it into the probed layout —
        // under the frozen sidecar model by default (extendIndex — one
        // pass over the new rows, no k-means re-training), or through
        // an [[graft.index.IndexPolicy]] that measures the tail's drift
        // first and escalates the fold to a full retrain when the
        // ingest distribution has shifted (the streaming twin of
        // [[maintainIndex]] — vecgo's compactor retrains on every
        // merge, `internal/engine/compaction.go:136-151`; here the
        // retrain fires only on evidence). No-op until a first
        // buildIndex exists.
        if (extendIndexTail > 0) {
          val m = store.manifest()
          if (m.exists(_.segments.exists(_.index.isDefined)) &&
              m.exists(_.segments.count(_.index.isEmpty) >= extendIndexTail))
            indexPolicy match {
              case Some(pol) => maintainIndex(pol)
              case None => store.extendIndexed()
            }
        }
        ()
      }
    trigger.fold(w0)(w0.trigger).start()
  }

  /** Upsert by id (re-insert tombstones the old row, `engine.go:993`). */
  def upsert(records: DataFrame): Long = {
    requireWritable()
    val (v, ms) = timedOp(translateValidation(store.upsert(prepare(records))))
    notifyObs(_.onWrite("upsert", lastSegmentRows(v), ms, v))
    v
  }

  /** Atomic mixed batch (vecgo `ApplyBatch` / `WriteBatch`,
    * `internal/engine/batch.go:70`): validated inserts (upsert semantics)
    * plus explicit deletes by id, committed as ONE snapshot version —
    * readers observe none or all of the batch.
    */
  def writeBatch(records: Option[DataFrame] = None,
      deleteIds: Seq[Long] = Nil): Long = {
    requireWritable()
    import spark.implicits._
    val (v, ms) = timedOp(translateValidation(
      store.writeBatch(records.map(prepare), deleteIds.toDF("id"))))
    notifyObs(_.onWrite("write_batch",
      records.map(_ => lastSegmentRows(v)).getOrElse(0L) + deleteIds.size, ms, v))
    v
  }

  /** Tombstone ids (vecgo W5). Small lists take the driver-side fast path
    * ([[graft.store.SnapshotStore.deleteSmall]] — parquet-mr write, no
    * Spark job: a scheduled job has a ~100 ms floor that dominated small
    * interactive deletes); large lists go through the distributed write.
    */
  def delete(ids: Seq[Long]): Long = {
    requireWritable()
    val (v, ms) = timedOp(
      if (ids.size <= GraftDB.SmallDeleteMaxIds) store.deleteSmall(ids)
      else {
        import spark.implicits._
        store.delete(ids.toDF("id"))
      })
    notifyObs(_.onWrite("delete", ids.size.toLong, ms, v))
    v
  }

  /** Delete by predicate: resolve matching ids at current version. */
  def deleteWhere(filter: FilterSet): Long = {
    requireWritable()
    val (v, ms) = timedOp(store.delete(read().where(filter.toColumn).select("id")))
    notifyObs(_.onWrite("delete", -1L, ms, v))
    v
  }

  def compact(): Long = {
    requireWritable()
    val (v, ms) = timedOp(store.compact(collectStats = true,
      vecCol = if (metric == Metric.Hamming) None else Some("vector")))
    notifyObs(_.onMaintenance("compact", ms, v))
    v
  }

  /** Z-order clustered compaction ([[graft.store.SnapshotStore.compactZOrder]]):
    * rewrite the live rows so files cover small hyper-rectangles of the
    * given metadata columns — multi-column min/max pruning for scan/filter
    * workloads. Refuses indexed stores (the IVF layout IS that segment's
    * clustering).
    */
  def compactZOrder(cols: Seq[String], bits: Int = 8,
      targetFiles: Int = 0): Long = {
    requireWritable()
    val (v, ms) = timedOp(store.compactZOrder(cols, bits,
      collectStats = true,
      vecCol = if (metric == Metric.Hamming) None else Some("vector"),
      targetFiles = targetFiles))
    notifyObs(_.onMaintenance("compactZOrder", ms, v))
    v
  }

  /** Build the vector index INTO the store (vecgo builds IVF flat segments
    * at compaction, `compaction.go:136-151`): compacts live rows into one
    * IVF-partitioned coded segment and records the model in the manifest.
    * Subsequent [[search]] calls route through probe-pruned two-phase
    * rerank automatically. `nlist = 0` → rows/4096 heuristic (bounded to
    * [2, 1024]); pass explicitly to tune.
    *
    * `kind` picks the coded first pass (vecgo's quantizer choice per
    * segment, `internal/segment/diskann/writer.go:73-95`):
    *   - `"sq8"` (default): per-dim scalar codes, `levels` = 255
    *     (or 15 for INT4 — vecgo I10);
    *   - `"pq"`: product quantization + ADC-scored probes — `pqM`
    *     sub-codebooks (0 → dim/4); at real embedding dims the PQ codes
    *     are 6–12× smaller than SQ8, the 100 TB layout.
    */
  def buildIndex(nlist: Int = 0, levels: Int = 255, kind: String = "sq8",
      pqM: Int = 0): Long = {
    requireWritable()
    require(metric != Metric.Hamming,
      "IVF indexes apply to float-vector metrics (l2/cosine/dot)")
    val idxKind = kind match {
      case "sq8" | "int4" => "ivf_sq8"
      case "pq" => "ivf_pq"
      case "opq" => "ivf_opq"
      case "rabitq" => "ivf_rabitq"
      case other => throw new IllegalArgumentException(
        s"unknown index kind `$other` (sq8 | int4 | pq | opq | rabitq)")
    }
    // RaBitQ's first pass estimates the ANGLE from sign-bit Hamming — a
    // sound proxy for L2/cosine ordering, but not for dot over varying
    // norms (vecgo's RaBitQ path serves normalized vectors the same way)
    require(idxKind != "ivf_rabitq" || metric != Metric.Dot,
      "rabitq's angle estimator serves l2/cosine stores; dot stores " +
        "should index with sq8/pq/opq")
    val rows = store.manifest().map(_.segments.map(_.rows).sum).getOrElse(0L)
    val n =
      if (nlist > 0) nlist
      else math.max(2, math.min(1024, (rows / 4096).toInt))
    val (v, ms) = timedOp(store.compactIndexed("vector", n,
      if (kind == "int4") 15 else levels, kind = idxKind, pqM = pqM))
    notifyObs(_.onMaintenance("buildIndex", ms, v))
    v
  }
  /** Incremental index maintenance: fold the unindexed tail segments into
    * the probed layout using the existing index's FROZEN model — one pass
    * over the NEW rows only, no k-means re-training, already-indexed
    * segments untouched (the vector-index analog of the per-segment
    * lexical deltas; vecgo's FreshVamana role of absorbing inserts without
    * a rebuild). Returns the committed version, or None when every segment
    * is already indexed.
    */
  def extendIndex(): Option[Long] = {
    requireWritable()
    require(metric != Metric.Hamming,
      "IVF indexes apply to float-vector metrics (l2/cosine/dot)")
    val (v, ms) = timedOp(store.extendIndexed())
    v.foreach(ver => notifyObs(_.onMaintenance("extendIndex", ms, ver)))
    v
  }

  /** Measured drift of the unindexed tail against the frozen index model
    * (one pass over the tail only): the out-of-train-radius fraction the
    * [[graft.index.IndexPolicy]] decides on. None when there is no tail.
    */
  def indexDrift(): Option[graft.index.IndexPolicy.Drift] = store.tailDrift()

  /** Policy-driven incremental index maintenance (the index analog of
    * [[compactWith]], closing the reference's retrain-on-compaction
    * property — vecgo re-runs k-means on every compaction merge,
    * `internal/engine/compaction.go:136-151`): measure the tail's drift,
    * then either FOLD it under the frozen model ([[extendIndex]] — the
    * cheap, common case) or RETRAIN the whole index ([[buildIndex]] at
    * the index's existing shape: same kind/levels/pqM, and same nlist
    * unless `retrainNlist` overrides — pass 0 to re-derive from the
    * grown corpus). Returns the action taken and the committed version;
    * None when every segment is already indexed.
    */
  def maintainIndex(
      policy: graft.index.IndexPolicy = graft.index.IndexPolicy.driftThreshold(),
      retrainNlist: Int = -1): Option[(graft.index.IndexPolicy.Action, Long)] = {
    import graft.index.IndexPolicy
    requireWritable()
    store.tailDrift() match {
      case None =>
        // no live tail — but a fully-deleted tail still needs dropping
        extendIndex().map(v => (IndexPolicy.Fold, v))
      case Some(d) => policy.decide(d) match {
        case IndexPolicy.Fold =>
          extendIndex().map(v => (IndexPolicy.Fold, v))
        case IndexPolicy.Retrain =>
          val meta = store.indexMeta().get
          val kind = meta.kind match {
            case "ivf_pq" => "pq"
            case "ivf_opq" => "opq"
            case "ivf_rabitq" => "rabitq"
            case _ => if (meta.levels == 15) "int4" else "sq8"
          }
          val n = if (retrainNlist >= 0) retrainNlist else meta.nlist
          val v = buildIndex(nlist = n, levels = meta.levels, kind = kind,
            pqM = meta.pqM)
          notifyObs(_.onMaintenance("maintainIndexRetrain", 0L, v))
          Some((IndexPolicy.Retrain, v))
      }
    }
  }

  /** Policy-driven partial compaction (vecgo W9). */
  def compactWith(policy: graft.store.CompactionPolicy): Option[Long] = {
    requireWritable(); store.maybeCompact(policy)
  }

  /** Roll the head back to `version`'s content as a NEW commit
    * ([[graft.store.SnapshotStore.restore]] — the recovery half of time
    * travel: undo a bad write without losing the chain; the rolled-back
    * versions stay time-travelable until vacuumed).
    */
  def restore(version: Long): Long = {
    requireWritable()
    val (v, ms) = timedOp(store.restore(version))
    notifyObs(_.onMaintenance("restore", ms, v))
    v
  }

  /** Per-dimension PSI drift between two versions of this store's
    * vectors ([[graft.stats.PsiDrift]]) — the distribution-shift report
    * read alongside [[indexDrift]] (which watches the IVF radii) before
    * trusting an index, threshold, or classifier across a corpus
    * update. Float metrics only; defaults cover the normalized range.
    */
  def psiDrift(fromVersion: Long, toVersion: Long = -1L,
      lo: Double = -1.0, hi: Double = 1.0,
      buckets: Int = 16): DataFrame = {
    require(metric != Metric.Hamming,
      "psiDrift reads float vectors — hamming stores pack codes")
    val to = if (toVersion >= 0) toVersion else effectiveVersion
    // read through the unpacking facade: the standard ingest path stores
    // vectors as packed binary blobs, which posexplode cannot address
    graft.stats.PsiDrift.perDim(
      read(fromVersion).select(col("vector")),
      read(to).select(col("vector")),
      "vector", config.dim, lo, hi, buckets)
  }

  /** Row-level change feed since `fromVersion`, up to the version this
    * handle reads ([[graft.store.SnapshotStore.diff]] — the lakehouse
    * `table_changes` verb): op='delete' ids then op='insert' rows;
    * applying them in that order to a copy of `fromVersion` reproduces
    * this version exactly. Between compactions the feed reads only the
    * window's new files — the incremental-consumer contract at 100 TB.
    * Works on read-only and pinned opens (a pinned handle diffs up to
    * its pin). An explicit `toVersion` pins the window's upper edge — a
    * follower ([[graft.streaming.ChangeFeed]]) reads the head version
    * once and diffs exactly to it, so a concurrent commit between the
    * two calls cannot tear the window.
    */
  def changes(fromVersion: Long, toVersion: Long = -1L): DataFrame =
    store.diff(fromVersion,
      if (toVersion >= 0) toVersion else effectiveVersion)

  /** Clone this engine's state at `version` (default: the version this
    * handle reads — so a pinned open clones its pinned cut) into a
    * fresh root: config + every referenced artifact copied, one
    * rebased manifest published through the destination's own commit
    * guard ([[graft.store.SnapshotStore.cloneAt]]). Backup, shipping a
    * frozen cut to another environment, or forking a dev store off
    * production; the clone opens independently with the same config
    * and continues its own version chain. A clone only READS the
    * source, so it is allowed on read-only and pinned opens.
    */
  def cloneAt(destRoot: String, version: Long = -1L): Long = {
    val v = if (version >= 0) version else effectiveVersion
    // config first: a clone with data but no db.json would open as an
    // unconfigured root; the reverse order fails loudly on open instead
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(root, "db.json")
    val dst = new Path(destRoot, "db.json")
    val dfs = dst.getFileSystem(conf)
    require(!dfs.exists(dst),
      s"destination $destRoot already holds a GraftDB — clone into a " +
        "fresh root")
    dfs.mkdirs(new Path(destRoot))
    if (!org.apache.hadoop.fs.FileUtil.copy(
        src.getFileSystem(conf), src, dfs, dst, false, conf))
      throw new java.io.IOException(s"clone copy failed: $src -> $dst")
    // a mid-clone failure must not strand the staged db.json: the
    // destination would then hold a config but no CURRENT/manifest, and
    // the `already holds a GraftDB` require above would refuse every
    // retry with nothing to resume (round-9 advice) — unstage it so a
    // failed clone is retryable as-is (orphaned data files under dest
    // are harmless: nothing references them and the retry re-copies)
    val out =
      try store.cloneAt(destRoot, v)
      catch { case e: Throwable =>
        try dfs.delete(dst, false)
        catch { case scala.util.control.NonFatal(_) => () }
        throw e
      }
    notifyObs(_.onMaintenance("cloneAt", 0L, out))
    out
  }
  def shouldCompact(maxSegments: Int = 4): Boolean = store.shouldCompact(maxSegments)
  def vacuum(keepVersions: Int): Unit = {
    requireWritable()
    val (_, ms) = timedOp(store.vacuum(keepVersions))
    notifyObs(_.onMaintenance("vacuum", ms, store.currentVersion))
  }
  /** Age-window retention (vecgo `RetentionPolicy.KeepDuration`). */
  def vacuum(keepVersions: Int, keepDurationMs: Long): Unit = {
    requireWritable()
    val (_, ms) = timedOp(store.vacuum(keepVersions, keepDurationMs))
    notifyObs(_.onMaintenance("vacuum", ms, store.currentVersion))
  }
  def currentVersion: Long = store.currentVersion

  // ------------------------------------------------------------- read path

  /** Current (or time-traveled) snapshot. */
  def read(version: Long = -1L): DataFrame =
    unpackView(store.read(if (version < 0) effectiveVersion else version))

  /** Timestamp time travel: newest snapshot committed at or before
    * `tsMillis` (vecgo asOf reads, `engine.go:499-536`).
    */
  def readAsOf(tsMillis: Long): DataFrame = unpackView(store.readAsOf(tsMillis))

  /** Stats-pruned filtered scan (vecgo R8 + segment pruning). */
  def scan(filters: Seq[Filter] = Nil, projectCols: Seq[String] = Nil): DataFrame = {
    val (df, _, _) = store.prunedRead(filters, effectiveVersion)
    val up = unpackView(df)
    if (projectCols.isEmpty) up else up.select(projectCols.map(col): _*)
  }

  /** Survivor id-set of a filter, bounded for serving-tier handoff: the
    * predicate runs engine-side (stats-pruned, pushed down) and at most
    * `cap` ids ever reach the driver — `limit(cap + 1)` bounds the collect
    * itself, so an unselective filter at corpus scale fails LOUDLY instead
    * of OOMing the process (the id-set analog of the replica's `maxRows`
    * export guard). Callers hitting the cap should route the query through
    * the distributed filtered search, or export the metadata columns and
    * evaluate the predicate replica-side
    * ([[graft.serve.LocalReplica.searchWhere]]).
    */
  def collectFilterIds(filters: Seq[Filter],
      cap: Int = GraftDB.DefaultFilterIdCap): Set[Long] = {
    require(cap > 0, s"cap must be positive, got $cap")
    val ids = scan(filters, Seq("id")).limit(cap + 1)
      .collect().map(_.getLong(0))
    require(ids.length <= cap,
      s"filter survivor set exceeds cap=$cap — the filter is too " +
        "unselective for a driver-materialized id-set; use the " +
        "distributed filtered search, or export metadata columns and " +
        "evaluate the predicate replica-side (LocalReplica.searchWhere)")
    ids.toSet
  }

  /** Point lookup (vecgo R7). */
  def get(id: Long): DataFrame = read().where(col("id") === id)

  /** k-NN search (vecgo R1/R3): query validated like inserts; Cosine
    * queries are normalized; metadata filter pre-applied.
    *
    * If the store carries a built index ([[buildIndex]]), the search
    * routes through it automatically: indexed segments are probed on
    * their `nprobe` nearest IVF lists (directory-pruned partition
    * filters), scored approximately on SQ8 codes, refined to
    * `k·refineFactor` candidates, and exact-reranked; segments written
    * AFTER the index build (the "memtable" tail) are brute-forced and
    * merged into the same global top-k — vecgo's memtable + indexed
    * segment fan-out (`internal/engine/search.go:120-1128`).
    *
    * Filtered searches on an indexed store are planned ADAPTIVELY (vecgo
    * `search.go:215-233`: cursor pre-filter below the selectivity cutoff,
    * graph search + post-filter above it): the manifest stats estimate the
    * filter's matching fraction ([[graft.stats.SegmentStats.estimateRows]]
    * — no scan), and when it falls at or below the cutoff the engine
    * skips the index and exact-scans the few filter survivors (pruned,
    * pushed-down) — cheaper than probing, and immune to the recall loss
    * of a filter that empties the probed lists. Above the cutoff the
    * probe-pruned quantized plan wins. Either route returns exact-reranked
    * results, so the estimate can only cost time, never correctness.
    *
    * @param nprobe       IVF lists probed per indexed segment; 0 → √nlist
    * @param refineFactor exact-rerank pool = k·refineFactor; 0 → 4
    * @param selectivityCutoff pre-filter below this matching fraction;
    *                     0 → [[GraftDB.DefaultSelectivityCutoff]] (vecgo
    *                     `WithSelectivityCutoff`)
    * @param preFilter    Some(true)/Some(false) forces the pre-filter /
    *                     indexed route (vecgo `WithPreFilter`); None →
    *                     adaptive
    */
  def search(query: Array[Float], k: Int,
      filter: FilterSet = FilterSet.empty,
      projectCols: Seq[String] = Nil,
      nprobe: Int = 0,
      refineFactor: Int = 0,
      selectivityCutoff: Double = 0.0,
      preFilter: Option[Boolean] = None): DataFrame =
    planSearch(query, k, filter, projectCols, nprobe, refineFactor,
      selectivityCutoff, preFilter).df

  /** A planned search: the frame plus the planner's own decisions, for
    * [[searchWithStats]] / [[explain]] (vecgo reports `strategy` in its
    * QueryStats, `model/types.go:137-249`).
    */
  private case class PlannedSearch(df: DataFrame, strategy: String,
      segmentsScanned: Int, segmentsPruned: Int)

  private def planSearch(query: Array[Float], k: Int,
      filter: FilterSet,
      projectCols: Seq[String] = Nil,
      nprobe: Int = 0,
      refineFactor: Int = 0,
      selectivityCutoff: Double = 0.0,
      preFilter: Option[Boolean] = None,
      orderKey: Column => Column = identity): PlannedSearch = {
    require(metric != Metric.Hamming,
      "hamming stores serve packed codes — use searchCodes(Array[Long], k)")
    require(query.length == config.dim, s"query dim ${query.length} != ${config.dim}")
    require(query.forall(f => !f.isNaN && !f.isInfinite), "query has NaN/Inf")
    val q = if (metric == Metric.Cosine) normalized(query) else query
    val m = store.manifest(effectiveVersion)
    if (m.exists(_.segments.exists(_.index.isDefined))) {
      val mf = m.get
      // adaptive pre/post-filter choice on filtered indexed searches —
      // selectivity comes from the manifest's histogram/top-k stats
      // (System-R defaults on stats-less segments); surfaced in the
      // strategy string so explainSearch shows WHY a route was taken
      val selOpt: Option[Double] =
        if (filter.filters.isEmpty) None
        else {
          val total = mf.segments.map(_.rows).sum
          val est = mf.segments.map(s =>
            graft.stats.SegmentStats.estimateRows(s.rows, s.stats,
              filter.filters)).sum
          Some(if (total > 0) est / total else 0.0)
        }
      val routePre = filter.filters.nonEmpty && {
        val cutoff =
          if (selectivityCutoff > 0) selectivityCutoff
          else GraftDB.DefaultSelectivityCutoff
        preFilter.getOrElse(selOpt.get <= cutoff)
      }
      val selNote = selOpt.fold("")(s => f", est_sel=$s%.4f")
      if (routePre) {
        val (src, scanned, pruned) = store.prunedRead(filter.filters, effectiveVersion)
        PlannedSearch(
          Search.knn(src, "vector", "id", lit(q), k, metric,
            lit(true), projectCols, orderKey),
          s"prefilter_exact(${scanned.size} of " +
            s"${scanned.size + pruned.size} segments$selNote)",
          scanned.size, pruned.size)
      } else {
        val nIdx = mf.segments.count(_.index.isDefined)
        val df = indexedSearch(mf, q, k, filter, nprobe, refineFactor,
          projectCols, orderKey)
        PlannedSearch(df,
          s"indexed(segments=$nIdx, tail=${mf.segments.size - nIdx}$selNote)",
          mf.segments.size, 0)
      }
    } else if (filter.filters.isEmpty) {
      PlannedSearch(
        Search.knn(read(), "vector", "id", lit(q), k, metric,
          lit(true), projectCols, orderKey),
        "brute_force", m.map(_.segments.size).getOrElse(0), 0)
    } else {
      // filtered searches route through manifest-stats pruning: whole
      // segments whose stats contradict the filter are never even listed
      val (src, scanned, pruned) = store.prunedRead(filter.filters, effectiveVersion)
      PlannedSearch(
        Search.knn(src, "vector", "id", lit(q), k, metric,
          lit(true), projectCols, orderKey),
        s"pruned_brute_force(${scanned.size} of ${scanned.size + pruned.size} segments)",
        scanned.size, pruned.size)
    }
  }

  /** Hamming k-NN over packed binary codes (vecgo serves Hamming directly
    * over stored codes, `distance/distance.go:36-38`): query is the packed
    * ceil(dim/32)-word form of a dim-bit code ([[graft.index.BQ.packCol]]
    * layout), score = popcount of XOR. Filtered searches route through
    * manifest-stats pruning like the float path.
    */
  def searchCodes(query: Array[Long], k: Int,
      filter: FilterSet = FilterSet.empty,
      projectCols: Seq[String] = Nil): DataFrame = {
    require(metric == Metric.Hamming,
      s"searchCodes requires the hamming metric (store is ${config.metric})")
    require(query.length == codeWords,
      s"query has ${query.length} words, store packs $codeWords")
    val src =
      if (filter.filters.isEmpty) read()
      else store.prunedRead(filter.filters, effectiveVersion)._1
    Search.knn(src, "vector", "id", lit(query), k, metric,
      lit(true), projectCols)
  }

  /** Batch Hamming search over packed-code queries (frame path). */
  def batchSearchCodes(queries: Seq[(Long, Array[Long])], k: Int,
      filter: FilterSet = FilterSet.empty): DataFrame = {
    require(metric == Metric.Hamming,
      s"batchSearchCodes requires the hamming metric (store is ${config.metric})")
    queries.foreach { case (qid, q) => require(q.length == codeWords,
      s"query $qid has ${q.length} words, store packs $codeWords") }
    import spark.implicits._
    val qf = queries.toDF("query_id", "qv")
    Search.batchSearch(read(), "vector", "id", qf, "query_id", "qv", k,
      metric, filter.toColumn)
  }

  private def normalized(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (n == 0) v else v.map(x => (x / n).toFloat)
  }

  private val indexMetaCache =
    scala.collection.mutable.Map.empty[String, graft.index.SegmentIndex.Meta]
  private def indexMeta(ref: graft.store.SnapshotStore.IndexRef) =
    indexMetaCache.getOrElseUpdate(ref.metaPath,
      graft.index.SegmentIndex.load(ref.metaPath,
        spark.sparkContext.hadoopConfiguration))

  /** Unindexed tail segments surviving manifest-stats pruning — the
    * pruning rule shared by every indexed read route.
    */
  private def unprunedPlain(
      plainSegs: Seq[graft.store.SnapshotStore.SegmentRef],
      filter: FilterSet): Seq[graft.store.SnapshotStore.SegmentRef] =
    plainSegs.filterNot(s => s.stats.exists(st =>
      graft.stats.SegmentStats.canPruneAll(st, filter.filters)))

  /** Probe-count default shared by every indexed route: the caller's
    * nprobe capped at nlist, else ceil(sqrt(nlist)).
    */
  private def effectiveNprobe(nprobe0: Int, nlist: Int): Int =
    if (nprobe0 > 0) math.min(nprobe0, nlist)
    else math.max(1, math.ceil(math.sqrt(nlist)).toInt)

  /** Probe-pruned quantized search over indexed segments, brute force over
    * the unindexed tail, one global exact top-k.
    */
  private def indexedSearch(m: graft.store.SnapshotStore.Manifest,
      q: Array[Float], k: Int, filter: FilterSet,
      nprobe0: Int, refine0: Int, projectCols: Seq[String],
      orderKey: Column => Column = identity): DataFrame = {
    import graft.index.SegmentIndex
    val refine = if (refine0 > 0) refine0 else 4
    val (idxSegs, plainSegs) = m.segments.partition(_.index.isDefined)
    // manifest-stats pruning still applies to the unindexed tail
    val keptPlain = unprunedPlain(plainSegs, filter)
    val poolCols = (("id" +: projectCols) :+ "vector").distinct.map(col)
    val pools = idxSegs.map { s =>
      val meta = indexMeta(s.index.get)
      val ivf = SegmentIndex.ivfModel(meta)
      val np = effectiveNprobe(nprobe0, ivf.k)
      val parts = ivf.probes(q, np)
      // approximate phase per index kind: SQ8 decodes per-dim codes and
      // scores the metric directly; PQ sums m ADC table lookups — an L2²
      // table for L2/Cosine (stored cosine rows are unit-normalized, so
      // ascending L2² IS descending cosine order) or an IP table for Dot
      val (approx, approxSort) = meta.kind match {
        case "ivf_pq" | "ivf_opq" =>
          // OPQ: rotate the query driver-side and score against the
          // rotated-space codebooks — L2 and inner product are invariant
          // under the orthonormal R, so ordering semantics are PQ's
          val (pq, q2) =
            if (meta.kind == "ivf_opq") {
              val o = SegmentIndex.opqModel(meta)
              (o.pq, o.rotate(q))
            } else (SegmentIndex.pqModel(meta), q)
          metric match {
            case Metric.Dot =>
              (pq.adcScoreColDot(col(SegmentIndex.PqCol), q2),
                (c: Column) => c.desc)
            case _ =>
              (pq.adcScoreCol(col(SegmentIndex.PqCol), q2),
                (c: Column) => c.asc)
          }
        case "ivf_rabitq" =>
          // estimated squared L2 from sign-bit Hamming (ascending serves
          // cosine too: stored cosine rows are unit vectors, so smaller
          // angle IS larger similarity)
          val rbq = SegmentIndex.rabitqModel(meta)
          (rbq.approxScoreCol(col(SegmentIndex.RbqCol), q),
            (c: Column) => c.asc)
        case _ =>
          val sq8 = SegmentIndex.sq8Model(meta)
          (metric.score(sq8.decodeCol(col(SegmentIndex.CodeCol)), lit(q)),
            (c: Column) => metric.sort(c))
      }
      store.visibleSegment(s, m)
        .where(col(SegmentIndex.PartCol).isin(parts: _*))
        .where(filter.toColumn)
        .withColumn("_approx", approx)
        .orderBy(approxSort(col("_approx")), col("id").asc)
        .limit(k * refine)
        .select(poolCols: _*)
    }
    val plains = keptPlain.map(s =>
      store.visibleSegment(s, m).where(filter.toColumn).select(poolCols: _*))
    val all = (pools ++ plains).reduce(_ unionByName _)
    Search.knn(all, "vector", "id", lit(q), k, metric, lit(true), projectCols,
      orderKey)
  }

  /** Query stats (vecgo R15 `QueryStats`, `model/types.go:137-249`):
    * executes the search eagerly and reports wall time, result count, the
    * planner's segment decisions, and the executed plan's cost counters —
    * rows scanned (≡ distance computations: each scanned row passes the
    * metric kernel exactly once), parquet files opened after pruning, and
    * exact-rerank pool size on the two-phase indexed path.
    */
  case class QueryStats(durationMs: Double, rowsReturned: Long,
      segmentsScanned: Int, segmentsPruned: Int,
      rowsScanned: Long, distanceComputations: Long,
      filesRead: Long, rerankPoolRows: Long, strategy: String)

  def searchWithStats(query: Array[Float], k: Int,
      filter: FilterSet = FilterSet.empty,
      nprobe: Int = 0,
      refineFactor: Int = 0,
      selectivityCutoff: Double = 0.0,
      preFilter: Option[Boolean] = None): (Array[org.apache.spark.sql.Row], QueryStats) = {
    val t0 = System.nanoTime()
    val planned = planSearch(query, k, filter, Nil, nprobe, refineFactor,
      selectivityCutoff, preFilter)
    val (rows, pm) = graft.query.QueryMetrics.collectWithMetrics(planned.df)
    val stats = QueryStats(
      durationMs = (System.nanoTime() - t0) / 1e6,
      rowsReturned = rows.length,
      segmentsScanned = planned.segmentsScanned,
      segmentsPruned = planned.segmentsPruned,
      rowsScanned = pm.rowsScanned,
      // every scanned row is scored once; rerank pool rows are scored a
      // second time with the exact kernel on the indexed path
      distanceComputations = pm.rowsScanned + pm.rerankPoolRows,
      filesRead = pm.filesRead,
      rerankPoolRows = pm.rerankPoolRows,
      strategy = planned.strategy)
    notifyObs(_.onSearch(stats.strategy, k, stats.rowsReturned, stats.durationMs))
    (rows, stats)
  }

  /** Session-wide running totals (queries run, rows scanned, files read)
    * via a registered `QueryExecutionListener` — the Spark-UI-style
    * counterpart of the per-query stats above. Async delivery; see
    * [[graft.query.QueryMetrics.Totals.awaitAtLeast]].
    */
  def sessionMetrics: graft.query.QueryMetrics.Totals =
    graft.query.QueryMetrics.totals(spark)

  private def manifest = store.manifest()

  /** Streaming-result variant (vecgo R2 `SearchIter`): results as a lazy
    * driver-side iterator instead of a collected frame.
    */
  def searchIter(query: Array[Float], k: Int,
      filter: FilterSet = FilterSet.empty): Iterator[org.apache.spark.sql.Row] = {
    import scala.jdk.CollectionConverters._
    search(query, k, filter).toLocalIterator().asScala
  }

  /** Range query (vecgo R5 `SearchThreshold`, routed like [[search]] —
    * vecgo sends threshold queries through the same pruned searcher,
    * `engine.go:1485-1532`):
    *
    *  - whole segments whose centroid/radius ball provably cannot reach
    *    the threshold are skipped before any file is listed
    *    ([[graft.stats.SegmentStats.canPruneByScore]], the metric-complete
    *    form of vecgo `CanPruneByDistance`, `manifest/stats.go:626-641`);
    *  - metadata-stats pruning applies to filtered calls like [[scan]];
    *  - surviving segments are visited best-possible-score first
    *    ([[graft.stats.SegmentStats.segmentPriorityByScore]], vecgo
    *    `SegmentPriority`, `manifest/stats.go:643-676`);
    *  - INDEXED segments gate rows on the SQ8 approximate score within a
    *    sound decode-error margin before the exact phase, so the exact
    *    kernel touches only near-threshold rows while results stay exact
    *    (the margin can only admit extra candidates, never drop one).
    */
  def searchThreshold(query: Array[Float], threshold: Double,
      maxResults: Int, filter: FilterSet = FilterSet.empty): DataFrame =
    planThreshold(query, threshold, maxResults, filter).df

  private def planThreshold(query: Array[Float], threshold: Double,
      maxResults: Int, filter: FilterSet): PlannedSearch = {
    require(metric != Metric.Hamming,
      "hamming stores serve packed codes — use searchThresholdCodes")
    require(query.length == config.dim, s"query dim ${query.length} != ${config.dim}")
    require(query.forall(f => !f.isNaN && !f.isInfinite), "query has NaN/Inf")
    val q = if (metric == Metric.Cosine) normalized(query) else query
    import graft.stats.SegmentStats
    val m = store.manifest(effectiveVersion).getOrElse(
      throw new IllegalStateException(s"no readable version at $root"))
    val (distPruned, rest) = m.segments.partition(s =>
      s.stats.flatMap(_.vec).exists(vs =>
        SegmentStats.canPruneByScore(vs, q, threshold, metric)))
    val (statsPruned, kept0) = rest.partition(s =>
      filter.filters.nonEmpty && s.stats.exists(st =>
        SegmentStats.canPruneAll(st, filter.filters)))
    val prunedCount = distPruned.size + statsPruned.size
    if (kept0.isEmpty) {
      import spark.implicits._
      return PlannedSearch(
        spark.emptyDataset[(Long, Double)].toDF("id", "score"),
        s"threshold_all_pruned(distance=${distPruned.size}, " +
          s"stats=${statsPruned.size})", 0, prunedCount)
    }
    val visit = SegmentStats.segmentPriorityByScore(
      kept0.map(s => s.seq -> s.stats.flatMap(_.vec)), q, metric)
    val kept = visit.flatMap(seq => kept0.find(_.seq == seq))
    var gated = 0
    var listsPruned = 0
    val frames = kept.map { s =>
      val base = store.visibleSegment(s, m).where(filter.toColumn)
      val pre = s.index match {
        case Some(ref) =>
          val meta = indexMeta(ref)
          // per-LIST ball pruning (the directory-level analog of segment
          // distance pruning): every member of IVF list i is within
          // listRadii(i) of its centroid, so a list whose best possible
          // score fails the threshold is never even listed — Parquet
          // partition filters drop its directory. Sidecars written before
          // listRadii existed carry none → pruning simply disabled.
          val listGated =
            if (meta.listRadii.size == meta.nlist && meta.nlist > 0) {
              val keptLists = (0 until meta.nlist).filter { i =>
                val vs = graft.stats.SegmentStats.VecStats(
                  meta.centroids(i).map(_.toDouble), meta.listRadii(i))
                !graft.stats.SegmentStats.canPruneByScore(vs, q, threshold, metric)
              }
              listsPruned += meta.nlist - keptLists.size
              if (keptLists.size == meta.nlist) base
              else base.where(col(graft.index.SegmentIndex.PartCol)
                .isin(keptLists: _*))
            } else base
          // recall-proof SQ8 pre-filter: |x̃ − x| ≤ eps bounds how far the
          // approximate score can sit from the exact one under each metric
          // (L2: euclid ±eps; Dot: ±eps·|q|; Cosine on unit vectors: ±2eps).
          // Only SQ8-coded segments carry the per-dim bounds this proof
          // needs — PQ segments keep the list-ball pruning and scan exact.
          if (meta.kind != "ivf_sq8") listGated
          else {
            gated += 1
            val sq8 = graft.index.SegmentIndex.sq8Model(meta)
            val eps = sq8.maxDecodeError
            val approx = metric.score(
              sq8.decodeCol(col(graft.index.SegmentIndex.CodeCol)), lit(q))
            val gate = metric match {
              case Metric.L2 =>
                val bound = math.sqrt(math.max(0.0, threshold)) + eps
                approx <= lit(bound * bound)
              case Metric.Dot =>
                approx >= lit(threshold - eps * math.sqrt(
                  q.foldLeft(0.0)((acc, x) => acc + x.toDouble * x)))
              case Metric.Cosine => approx >= lit(threshold - 2 * eps)
              case Metric.Hamming => lit(true) // unreachable (guarded above)
            }
            listGated.where(gate)
          }
        case None => base
      }
      pre.withColumn("score", metric.score(col("vector"), lit(q)))
        .select(col("id"), col("score"))
    }
    val scored = frames.reduce(_ unionByName _)
    val exact =
      if (metric.ascending) scored.where(col("score") <= threshold)
      else scored.where(col("score") >= threshold)
    PlannedSearch(
      exact.orderBy(metric.sort(col("score")), col("id").asc)
        .limit(maxResults),
      s"threshold(segments=${kept.size}, sq8_gated=$gated, " +
        s"ivf_lists_pruned=$listsPruned, " +
        s"pruned_distance=${distPruned.size}, pruned_stats=${statsPruned.size}, " +
        s"visit=${visit.mkString("[", ",", "]")})",
      kept.size, prunedCount)
  }

  /** Threshold-search explain: the planner's distance/stats pruning and
    * visit order above Catalyst's formatted physical plan.
    */
  def explainThreshold(query: Array[Float], threshold: Double,
      maxResults: Int, filter: FilterSet = FilterSet.empty): String = {
    val p = planThreshold(query, threshold, maxResults, filter)
    s"""GraftDB threshold plan (version ${store.currentVersion})
       |  strategy: ${p.strategy}
       |  segments scanned: ${p.segmentsScanned}, pruned: ${p.segmentsPruned}
       |${p.df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))}""".stripMargin
  }

  /** Range query over packed codes: all ids within `threshold` bits. */
  def searchThresholdCodes(query: Array[Long], threshold: Long,
      maxResults: Int, filter: FilterSet = FilterSet.empty): DataFrame = {
    require(metric == Metric.Hamming,
      s"searchThresholdCodes requires the hamming metric (store is ${config.metric})")
    require(query.length == codeWords,
      s"query has ${query.length} words, store packs $codeWords")
    Search.searchThreshold(read(), "vector", "id", lit(query),
      threshold.toDouble, maxResults, metric, filter.toColumn)
  }

  /** Batch search over a query matrix (vecgo R6). On an indexed store
    * every query routes through the probe-pruned quantized two-phase plan
    * (see [[indexedBatchSearch]]). Otherwise L2 and Cosine use the
    * MultiTopK matrix fast path — for Cosine both stored vectors and
    * queries are L2-normalized, and on normalized inputs squared-L2 order
    * is exactly inverse cosine order, so the top-k sets coincide. Other
    * metrics fall back to the frame-based path with the true metric.
    */
  def batchSearch(queries: Seq[(Long, Array[Float])], k: Int,
      filter: FilterSet = FilterSet.empty,
      nprobe: Int = 0, refineFactor: Int = 0): DataFrame = {
    if (metric == Metric.Hamming)
      throw new IllegalArgumentException(
        "hamming stores serve packed codes — use batchSearchCodes")
    val normed =
      if (metric == Metric.Cosine)
        queries.map { case (qid, v) => (qid, normalized(v)) }
      else queries
    val m = store.manifest(effectiveVersion)
    if (m.exists(_.segments.exists(_.index.isDefined)))
      indexedBatchSearch(m.get, normed, k, filter, nprobe, refineFactor)
    else metric match {
      case Metric.L2 =>
        Search.batchSearchMatrix(read(), "vector", "id", queries, k,
          filter.toColumn)
      case Metric.Cosine =>
        // report cosine similarity, not the internal squared-L2 ranking
        // key: on unit vectors cos = 1 - l2sq/2, so single-query search()
        // and the matrix path return scores on the same scale
        Search.batchSearchMatrix(read(), "vector", "id", normed, k,
          filter.toColumn)
          .withColumn("score", lit(1.0) - col("score") / 2)
      case other =>
        import spark.implicits._
        val qf = queries.toDF("query_id", "qv")
        Search.batchSearch(read(), "vector", "id", qf, "query_id", "qv", k,
          other, filter.toColumn)
    }
  }

  /** Distributed k-NN JOIN against this store: the top-k visible rows for
    * EVERY row of a table-sized `queries` frame. [[batchSearch]] takes a
    * driver-materialized query matrix (thousands of queries); this is the
    * two-large-sides shape — embed a whole table and link each row to its
    * store neighbors — that no reference operator serves and a cluster
    * must: per indexed segment, each query explodes to its `nprobe`
    * nearest cells ([[graft.index.IVF.Model.probeCol]]) and equi-joins the
    * segment on the persisted `_ivf_part` key (Parquet partition column,
    * so the shuffle join co-locates by cell); matches score EXACTLY on the
    * raw vector (packed blobs scored in place); unindexed tail segments
    * brute-join so results stay correct between compactions (their cost is
    * tail_rows × queries — compact before corpus-scale joins). One global
    * per-query bounded-heap top-k ([[Search.topKPerKey]]) fuses all pools.
    *
    * Exact when nprobe = nlist on every segment; the usual IVF recall
    * trade below it. Requires an IVF-partitioned index — without cells a
    * table-sized query side degenerates to a corpus cartesian, refused
    * loudly like the other unplannable routes.
    *
    * @return (queryIdCol, id, score, rank), rank 1..k per query
    */
  def knnJoin(queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, filter: FilterSet = FilterSet.empty,
      nprobe: Int = 0): DataFrame = {
    import graft.index.SegmentIndex
    require(metric == Metric.L2 || metric == Metric.Cosine,
      s"knnJoin supports L2/Cosine stores (IVF cell geometry); got $metric")
    val m = store.manifest(effectiveVersion).getOrElse(
      throw new IllegalStateException(s"no readable version at $root"))
    val (idxSegs, plainSegs) = m.segments.partition(_.index.isDefined)
    require(idxSegs.nonEmpty,
      "knnJoin needs an IVF-partitioned index (buildIndex) — without " +
        "cells a table-sized query side is a corpus cartesian; for " +
        "driver-sized query sets use batchSearch")
    require(queryIdCol != "id",
      "knnJoin: queryIdCol 'id' collides with the store's id column in " +
        "the output schema — alias the query id (e.g. 'query_id')")
    val qsel0 = queries.select(col(queryIdCol).as("_qid"),
      col(queryVecCol).as("_qv"))
    val qsel =
      if (metric == Metric.Cosine)
        qsel0.withColumn("_qv", graft.functions.vec_normalize(col("_qv")))
      else qsel0
    val keptPlain = unprunedPlain(plainSegs, filter)
    val score = metric.score(col("vector"), col("_qv"))
    val orderScore = if (metric.ascending) score else -score
    val pools = idxSegs.map { s =>
      val meta = indexMeta(s.index.get)
      val ivf = SegmentIndex.ivfModel(meta)
      val np = effectiveNprobe(nprobe, ivf.k)
      val probed = qsel.withColumn(SegmentIndex.PartCol,
        explode(ivf.probeCol(col("_qv"), np)))
      store.visibleSegment(s, m).where(filter.toColumn)
        .join(probed, SegmentIndex.PartCol)
        .select(col("_qid"), col("id"), orderScore.as("_os_in"))
    }
    val tails = keptPlain.map(s =>
      store.visibleSegment(s, m).where(filter.toColumn)
        .crossJoin(qsel)
        .select(col("_qid"), col("id"), orderScore.as("_os_in")))
    val all = (pools ++ tails).reduce(_ unionByName _)
    val restore = if (metric.ascending) col("_os") else -col("_os")
    Search.topKPerKey(all, "_qid", col("_os_in"), "id", k)
      .select(col("_qid").as(queryIdCol), col("id"), restore.as("score"),
        col("rank"))
  }

  /** Probe-pruned quantized BATCH search (vecgo fans BatchSearch out per
    * query over the same index, `engine.go:1303-1366`). The scan is
    * pruned ONCE with the union of all queries' probe lists (a literal
    * `isin` → Parquet partition filters); per-query membership then
    * refines via a broadcast join on `array_contains`; SQ8-approximate
    * per-query top-(k·refine) heaps carry only (os, id), and the
    * winners' raw vectors are late-materialized for the exact phase by
    * ONE broadcast-hash re-join against the pruned segment (the pool is
    * bounded by queries × k·refine, so the re-join cost scales with the
    * pool, not the scan); unindexed tail segments are brute-forced into
    * the same final per-query top-k.
    */
  private def indexedBatchSearch(m: graft.store.SnapshotStore.Manifest,
      queries: Seq[(Long, Array[Float])], k: Int, filter: FilterSet,
      nprobe0: Int, refine0: Int): DataFrame = {
    import graft.index.SegmentIndex
    import spark.implicits._
    val refine = math.max(1, if (refine0 > 0) refine0 else 4)
    val (idxSegs, plainSegs) = m.segments.partition(_.index.isDefined)
    val keptPlain = unprunedPlain(plainSegs, filter)
    val qids = queries.map(_._1)
    val pools = idxSegs.map { s =>
      val meta = indexMeta(s.index.get)
      val ivf = SegmentIndex.ivfModel(meta)
      val np = effectiveNprobe(nprobe0, ivf.k)
      val probed = queries.map { case (qid, q) => (qid, q, ivf.probes(q, np)) }
      val allParts = probed.flatMap(_._3).distinct
      val seg = store.visibleSegment(s, m)
        .where(col(SegmentIndex.PartCol).isin(allParts: _*))
        .where(filter.toColumn)
      // approximate phase per index kind (see indexedSearch): SQ8 decodes
      // against the query column; PQ ships each query's driver-built ADC
      // table in the broadcast pair frame and sums m lookups per row
      val (cand, approxAsc) = meta.kind match {
        case "ivf_pq" | "ivf_opq" =>
          val (pq, rotate) =
            if (meta.kind == "ivf_opq") {
              val o = SegmentIndex.opqModel(meta)
              (o.pq, (v: Array[Float]) => o.rotate(v))
            } else (SegmentIndex.pqModel(meta), identity[Array[Float]] _)
          val withTables = probed.map { case (qid, q, parts) =>
            val q2 = rotate(q)
            (qid, q, parts,
              if (metric == Metric.Dot) pq.adcTableDot(q2) else pq.adcTable(q2))
          }
          val pairs = withTables.toDF("query_id", "qv", "probes", "_adc")
          val c = seg.join(broadcast(pairs),
              array_contains(col("probes"), col(SegmentIndex.PartCol)))
            .withColumn("_approx", aggregate(
              transform(col(SegmentIndex.PqCol),
                (code, i) => element_at(col("_adc"), i * pq.ksub + code + 1)),
              lit(0.0), (acc, x) => acc + x))
          (c, metric != Metric.Dot)
        case "ivf_rabitq" =>
          // each query ships its packed sign bits; the estimator is the
          // same 2 − 2cos(πh/d) column as the single-query path
          val rbq = SegmentIndex.rabitqModel(meta)
          val withCodes = probed.map { case (qid, q, parts) =>
            (qid, q, parts, rbq.packQuery(q))
          }
          val pairs = withCodes.toDF("query_id", "qv", "probes", "_rbq_q")
          val h = vec_hamming(col(SegmentIndex.RbqCol), col("_rbq_q"))
          val c = seg.join(broadcast(pairs),
              array_contains(col("probes"), col(SegmentIndex.PartCol)))
            .withColumn("_approx", lit(2.0) - lit(2.0) *
              cos(lit(math.Pi) * h.cast("double") / lit(rbq.dim.toDouble)))
          (c, true)
        case _ =>
          val sq8 = SegmentIndex.sq8Model(meta)
          val pairs = probed.toDF("query_id", "qv", "probes")
          val c = seg.join(broadcast(pairs),
              array_contains(col("probes"), col(SegmentIndex.PartCol)))
            .withColumn("_approx",
              metric.score(sq8.decodeCol(col(SegmentIndex.CodeCol)), col("qv")))
          (c, metric.ascending)
      }
      val os = if (approxAsc) col("_approx") else -col("_approx")
      // bounded (os, id) heaps, then late-materialize the exact vectors
      // for the k*refine winners with one broadcast-hash re-join —
      // carrying `vector` through the heaps copies it per PROBED row, a
      // cost that scales with the scan (Search.poolWithVectors' note)
      val winners = Search.topKPerKey(cand, "query_id", os, "id",
          k * refine)
        .select(col("query_id"), col("id"))
      seg.select(col("id"), col("vector"))
        .join(broadcast(winners), Seq("id"))
        .select(col("query_id"), col("id"), col("vector"))
    }
    val tails = keptPlain.map { s =>
      store.visibleSegment(s, m).where(filter.toColumn)
        .crossJoin(broadcast(qids.toDF("query_id")))
        .select(col("query_id"), col("id"), col("vector"))
    }
    val qv = queries.toDF("query_id", "qv")
    val exact = (pools ++ tails).reduce(_ unionByName _)
      .join(broadcast(qv), "query_id")
      .withColumn("_score", metric.score(col("vector"), col("qv")))
    val os = if (metric.ascending) col("_score") else -col("_score")
    val restore = if (metric.ascending) col("_os") else -col("_os")
    Search.topKPerKey(exact, "query_id", os, "id", k)
      .select(col("query_id"), col("id"), restore.as("score"), col("rank"))
  }

  /** Hybrid RRF search (vecgo R9 `HybridSearch` with options,
    * `engine.go:1538-1545` incl. `WithFilter`): vector + BM25 pools of
    * max(2k,50), fused by reciprocal-rank.
    *
    * The vector pool routes through [[planSearch]] — the SAME planner as
    * [[search]] — so an indexed store serves its hybrid pool via
    * probe-pruned quantized two-phase rerank (or the adaptive exact
    * pre-filter route under a selective `filter`) instead of brute-forcing
    * the snapshot. Pool membership and ranks use the rounded-to-6 score
    * key (L2 reported as euclidean, not squared): boundary ties resolve by
    * id on every engine, so the pool is reproducible cross-engine.
    *
    * `filter` restricts BOTH pools: the vector side pre-filters inside the
    * planner; the lexical side left-semi joins postings against the filter
    * survivors before scoring, so no excluded doc can claim a pool slot.
    */
  def hybridSearch(query: Array[Float], textQuery: String, k: Int,
      rrfK: Int = RRF.DefaultRrfK,
      filter: FilterSet = FilterSet.empty,
      nprobe: Int = 0, refineFactor: Int = 0): DataFrame = {
    config.textCol.getOrElse(
      throw new IllegalStateException("no textCol configured for hybrid search"))
    val m = RRF.poolSize(k)
    val orderKey: Column => Column =
      if (metric == Metric.L2) c => round(sqrt(c), 6) else c => round(c, 6)
    val planned = planSearch(query, m, filter, Nil, nprobe, refineFactor,
      orderKey = orderKey)
    val vpool = planned.df.withColumn("score",
      if (metric == Metric.L2) sqrt(col("score")) else col("score"))
    val vranks = RRF.ranked(vpool, "id", "score", ascending = metric.ascending)
    val idx = lexicalIndex()
    val allowed =
      if (filter.filters.isEmpty) None
      else Some(read().where(filter.toColumn).select("id"))
    val bpool = BM25.search(idx, textQuery, m, allowed)
      .select(col("id"), col("score"))
    val branks = RRF.ranked(bpool, "id", "score", ascending = false)
    RRF.fuse(vranks, branks, k, rrfK)
  }

  /** Diversity-capped (grouped) search: the global top-`k` subject to at
    * most `perGroup` results per value of metadata column `groupCol` —
    * the facet/source cap (greedy-in-score-order with a per-group cap ≡
    * top-`perGroup` per group then global top-k). One filtered scan
    * (manifest-stats segment pruning applies) into
    * [[graft.query.Search.topKPerKey]] bounded per-group heaps — the
    * shuffle carries groups × cap structs, never the scored corpus — plus
    * a TakeOrderedAndProject cut; always exact regardless of how lopsided
    * the groups are (no candidate pool to flood). Returns (groupCol, id,
    * score, rank) with rank the 1-based position within the group;
    * score is in the store's native units (squared L2), like [[search]].
    */
  def searchGrouped(query: Array[Float], k: Int, groupCol: String,
      perGroup: Int, filter: FilterSet = FilterSet.empty): DataFrame = {
    require(k > 0 && perGroup > 0, s"bad grouped-search config: k=$k " +
      s"perGroup=$perGroup")
    require(metric != Metric.Hamming,
      "grouped search reads float vectors — use searchCodes paths on " +
        "hamming stores")
    require(query.length == config.dim,
      s"query dim ${query.length} != ${config.dim}")
    val q = if (metric == Metric.Cosine) normalized(query) else query
    val src =
      if (filter.filters.isEmpty) read()
      else store.prunedRead(filter.filters, effectiveVersion)._1
    val score = metric.score(col("vector"), lit(q))
    val orderScore = if (metric.ascending) score else -score
    val scored = src.withColumn("_os_in", orderScore)
    val restore = if (metric.ascending) col("_os") else -col("_os")
    graft.query.Search
      .topKPerKey(scored, groupCol, col("_os_in"), "id", perGroup)
      .orderBy(col("_os").asc, col("id").asc)
      .limit(k)
      .select(col(groupCol), col("id"), restore.as("score"), col("rank"))
  }

  /** MMR-diversified search — the facade of [[graft.query.Mmr]] (vecgo
    * has no diversity verb; this is part of the engine's LLM-pipeline
    * surface): a `fetchK`-candidate pool from the normal adaptive search
    * path (filters, stats routing, quantized rerank all apply), then the
    * greedy λ-trade of relevance against redundancy as ONE row-local
    * fold over the packed pool — the pool never leaves the driver-bound
    * aggregation as shuffled rows. Relevance enters the objective in the
    * metric's canonical units (an L2 pool surfaces √distance, negated so
    * higher = better); the redundancy penalty is the inner product of
    * STORED vectors (= cosine on a cosine store, which normalizes at
    * ingest). Returns (rank, id, score): 1-based selection order and the
    * MMR objective at selection time.
    */
  def searchMmr(query: Array[Float], k: Int, fetchK: Int, lambda: Double,
      filter: FilterSet = FilterSet.empty,
      nprobe: Int = 0, refineFactor: Int = 0): DataFrame = {
    require(fetchK >= k && k > 0, s"candidate pool $fetchK < k $k")
    val pool = search(query, fetchK, filter, projectCols = Seq("vector"),
      nprobe, refineFactor)
    val canonical =
      if (metric == Metric.L2) sqrt(col("score")) else col("score")
    val os = if (metric.ascending) canonical else -canonical
    val packed = pool
      .agg(array_sort(collect_list(struct(os.as("os"),
        col("id").as("_id"), col("vector").as("_v")))).as("cs"))
      .select(
        transform(col("cs"), c => c.getField("_id")).as("_ids"),
        transform(col("cs"), c => -c.getField("os")).as("_rels"),
        transform(col("cs"), c => c.getField("_v")).as("_vecs"))
    packed
      .select(col("_ids"), posexplode(
        graft.query.Mmr.selectCol(col("_rels"), col("_vecs"), k, lambda)))
      .select((col("pos") + 1).cast("int").as("rank"),
        element_at(col("_ids"), col("col.p")).as("id"),
        col("col.s").as("score"))
  }

  /** Hybrid RRF search for HAMMING stores — the packed-code twin of
    * [[hybridSearch]] (vecgo's `HybridSearch` is metric-agnostic,
    * `engine.go:1538`; only our query type differs, because Hamming
    * queries are packed words, not float vectors): popcount k-NN pool +
    * BM25 pool of max(2k,50), fused by reciprocal rank. Hamming scores
    * are exact integers, so the pool ranks need no rounding key — they
    * reproduce bit-identically on any engine — and ties resolve by id
    * like every other ranked surface.
    */
  def hybridSearchCodes(query: Array[Long], textQuery: String, k: Int,
      rrfK: Int = RRF.DefaultRrfK,
      filter: FilterSet = FilterSet.empty): DataFrame = {
    require(metric == Metric.Hamming,
      s"hybridSearchCodes requires the hamming metric (store is ${config.metric})")
    config.textCol.getOrElse(
      throw new IllegalStateException("no textCol configured for hybrid search"))
    val m = RRF.poolSize(k)
    val vpool = searchCodes(query, m, filter)
    val vranks = RRF.ranked(vpool, "id", "score", ascending = true)
    val idx = lexicalIndex()
    val allowed =
      if (filter.filters.isEmpty) None
      else Some(read().where(filter.toColumn).select("id"))
    val bpool = BM25.search(idx, textQuery, m, allowed)
      .select(col("id"), col("score"))
    val branks = RRF.ranked(bpool, "id", "score", ascending = false)
    RRF.fuse(vranks, branks, k, rrfK)
  }

  /** BM25-only lexical search (vecgo R10), over the persisted index. */
  def lexicalSearch(textQuery: String, k: Int): DataFrame =
    BM25.search(lexicalIndex(), textQuery, k)

  /** The snapshot's lexical index, resolved INCREMENTALLY from immutable
    * per-segment deltas (vecgo updates its inverted index on every
    * insert/delete, `lexical/bm25/bm25.go:180-278` `Add`/`Delete`; the
    * immutable-segment analog is one persisted postings/doclen delta per
    * segment under `root/lexdelta-<seq>-<token>/`, resolved as
    * union-of-deltas minus the manifest's tombstones). A new version
    * therefore tokenizes ONLY its new segments' docs — never the corpus —
    * so hybrid search on a frequently-mutating store (one version per
    * streaming micro-batch) pays per-batch work proportional to the
    * batch. Deletes cost nothing at build time: visibility is the same
    * LSN anti-join the data read uses. Compaction folds deltas naturally
    * (the merged segment gets one fresh delta; the old ones die with
    * their segments at vacuum/cleanOrphans).
    *
    * Corpus stats (doc count, total token count) merge ADDITIVELY from
    * per-segment sidecars when the version has no tombstones — zero jobs;
    * with tombstones, one aggregation over the resolved doc-length frame
    * (O(numDocs), not O(tokens)).
    *
    * Read-only / pinned opens never mutate the store root: they reuse any
    * persisted deltas and build missing ones IN MEMORY for this engine.
    *
    * The resolved Index is memoized per (engine, version) — versions are
    * immutable, so repeated lexical/hybrid queries on one engine reuse the
    * same Index object instead of re-running the resolve's stats actions.
    */
  def lexicalIndex(): BM25.Index =
    lexicalCache.computeIfAbsent(effectiveVersion, v => lexicalIndexAt(v))

  private val lexicalCache =
    new java.util.concurrent.ConcurrentHashMap[Long, BM25.Index]()

  /** Count of per-segment lexical delta BUILDS (persisted or in-memory)
    * this engine has run, and the total segment rows those builds
    * tokenized — the observability hook proving incremental maintenance:
    * after an append, exactly one delta build over exactly the new
    * segment's rows.
    */
  private[graft] val lexicalDeltaBuilds =
    new java.util.concurrent.atomic.AtomicLong()
  private[graft] val lexicalDeltaRowsTokenized =
    new java.util.concurrent.atomic.AtomicLong()

  /** One segment's resolved lexical delta: lazy postings/doclen frames
    * plus sidecar scalars (docs with ≥1 token, total token count).
    */
  private final case class SegLex(postings: DataFrame, docLen: DataFrame,
      nDocs: Long, totalLen: Long)

  /** Load one segment's lexical delta, building (and persisting, when
    * this engine may write) on first touch — the build reads ONLY this
    * segment's rows.
    */
  private def segLexDelta(s: graft.store.SnapshotStore.SegmentRef,
      textCol: String, canWrite: Boolean): SegLex = {
    val dir = store.lexDeltaDir(s.path)
    val marker = new Path(dir, "_STATS")
    val f = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def statsOf(dl: DataFrame): (Long, Long) = {
      val row = dl.agg(count(lit(1)).cast("long"),
        coalesce(sum(col("dlen")), lit(0.0)).cast("long")).collect()(0)
      (row.getLong(0), row.getLong(1))
    }
    if (f.exists(marker)) {
      val in = f.open(marker)
      val parts = try scala.io.Source.fromInputStream(in).mkString.trim.split(",")
      finally in.close()
      SegLex(spark.read.parquet(s"$dir/postings"),
        spark.read.parquet(s"$dir/doclen"), parts(0).toLong, parts(1).toLong)
    } else {
      val (post, dl) = BM25.buildFrames(spark.read.parquet(s.path), "id", textCol)
      lexicalDeltaBuilds.incrementAndGet()
      lexicalDeltaRowsTokenized.addAndGet(s.rows)
      if (canWrite) {
        // build into a UNIQUE hidden temp dir and publish with a
        // no-overwrite rename — two engines racing the first lexical
        // query on the same segment then can't write one dir
        // concurrently (mode("overwrite") into a shared path deletes
        // under the other writer); exactly one rename lands, the loser
        // discards its temp and reads the winner's delta. Same CAS
        // discipline as the store's segment/manifest writes.
        val tmp = s"${new Path(dir).getParent}/.lexdelta-tmp-" +
          java.util.UUID.randomUUID().toString.take(8)
        // postings persist SORTED by term with a term bloom: the query's
        // IN(term) predicate then prunes row groups at the scan, so a
        // lexical query reads its terms' posting ranges, not the corpus
        post.sort("term", "id")
          .write.mode("overwrite")
          .option("parquet.bloom.filter.enabled#term", "true")
          .parquet(s"$tmp/postings")
        dl.write.mode("overwrite").parquet(s"$tmp/doclen")
        val (n, len) = statsOf(spark.read.parquet(s"$tmp/doclen"))
        // _STATS is written INSIDE the temp before the publish rename, so
        // a visible delta dir is always complete (a crashed build leaves
        // only an unreferenced temp for cleanOrphans)
        val out = f.create(new Path(tmp, "_STATS"), true)
        try out.write(s"$n,$len".getBytes("UTF-8")) finally out.close()
        def publish(): Unit = {
          val fc = org.apache.hadoop.fs.FileContext.getFileContext(
            new Path(root).toUri, spark.sparkContext.hadoopConfiguration)
          fc.rename(f.makeQualified(new Path(tmp)),
            f.makeQualified(new Path(dir)),
            org.apache.hadoop.fs.Options.Rename.NONE)
        }
        // outcomes: our rename lands; a COMPLETE winner already sits at
        // dir (use it); a stale torn dir blocks (clear it, retry once);
        // or our temp vanished under us (a concurrent cleanOrphans raced
        // the age gate — serve this resolve from the in-memory frames).
        var published = false
        var attempt = 0
        var tmpLost = false
        while (!published && !tmpLost && attempt < 2) {
          attempt += 1
          try { publish(); published = true }
          catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException |
                 _: java.nio.file.FileAlreadyExistsException |
                 _: org.apache.hadoop.fs.ParentNotDirectoryException =>
              if (f.exists(marker)) {
                // lost the race to a COMPLETE delta: use the winner's
                try f.delete(new Path(tmp), true)
                catch { case scala.util.control.NonFatal(_) => () }
                published = true
              } else {
                // stale torn dir (crashed pre-rename writer): replace it
                f.delete(new Path(dir), true)
              }
            case _: java.io.FileNotFoundException =>
              if (f.exists(marker)) published = true
              else tmpLost = true
          }
        }
        if (published)
          SegLex(spark.read.parquet(s"$dir/postings"),
            spark.read.parquet(s"$dir/doclen"), n, len)
        else SegLex(post, dl, n, len)
      } else {
        // a read-only engine must not write derived tables under root
        // (and genuinely read-only storage would reject the attempt)
        val (n, len) = statsOf(dl)
        SegLex(post, dl, n, len)
      }
    }
  }

  private def lexicalIndexAt(v: Long): BM25.Index = {
    val textCol = config.textCol.getOrElse(
      throw new IllegalStateException("no textCol configured"))
    val m = store.manifest(v).getOrElse(
      throw new IllegalStateException(s"no version $v at $root"))
    require(m.segments.nonEmpty, s"version $v has no segments")
    val canWrite = !readOnly && pinnedVersion.isEmpty
    val parts = m.segments.map(s => s -> segLexDelta(s, textCol, canWrite))
    def resolve(side: SegLex => DataFrame): DataFrame = {
      val all = parts.map { case (s, lex) =>
        side(lex).withColumn("_seq", lit(s.seq))
      }.reduce(_ unionByName _)
      store.applyDeletes(all, m).drop("_seq")
    }
    val postings = resolve(_.postings)
    val docLen = resolve(_.docLen)
    val (nDocs, totalLen) =
      if (m.deletes.isEmpty)
        (parts.map(_._2.nDocs).sum, parts.map(_._2.totalLen).sum)
      else {
        val row = docLen.agg(count(lit(1)).cast("long"),
          coalesce(sum(col("dlen")), lit(0.0)).cast("long")).collect()(0)
        (row.getLong(0), row.getLong(1))
      }
    BM25.Index(postings, docLen, nDocs,
      if (nDocs == 0) 0.0 else totalLen.toDouble / nDocs)
  }

  // -------------------------------------------------------- introspection

  /** Engine stats (vecgo R14): version, segment/delete counts + rows. */
  def stats(): Map[String, Any] = {
    val m = store.manifest(effectiveVersion).getOrElse(
      return Map("version" -> -1L, "segments" -> 0, "rows" -> 0L))
    val idxKinds = m.segments.flatMap(_.index).map(_.kind)
    Map(
      "version" -> m.version,
      "segments" -> m.segments.size,
      "segment_rows" -> m.segments.map(_.rows).sum,
      "delete_rows" -> m.deletes.map(_.rows).sum,
      "dim" -> config.dim,
      "metric" -> config.metric,
      // introspection beyond the headline counters (vecgo DebugInfo /
      // SegmentInfo, `engine.go:2285-2311`)
      "indexed_segments" -> idxKinds.size,
      "index_kinds" -> idxKinds.distinct.sorted.mkString(","),
      "stats_segments" -> m.segments.count(_.stats.isDefined),
      "tombstone_files" -> m.deletes.size,
      "lexical_versions" -> store.lexicalDeltas.size)
  }

  /** Session-wide read/IO introspection (the batch analog of vecgo's
    * `CacheStats`, `internal/engine/engine.go:2285-2311`): running scan
    * totals off the session's [[graft.query.QueryMetrics.Totals]]
    * listener, plus a read-amplification ratio — rows produced by leaf
    * file scans per live stored row. In a lakehouse deployment the "cache
    * hit" question becomes "how much of the store did queries actually
    * scan": amplification ≈ queries × scan-fraction, and a value far
    * above the query count means pruning/probing is not engaging.
    * Listener delivery is async — totals are eventually consistent.
    */
  def readStats(): Map[String, Any] = {
    val t = graft.query.QueryMetrics.totals(spark).snapshot
    val live = store.manifest(effectiveVersion)
      .map(_.segments.map(_.rows).sum).getOrElse(0L)
    t ++ Map(
      "live_rows" -> live,
      "read_amplification" ->
        (if (live <= 0) 0.0 else t("rows_scanned").toDouble / live))
  }

  /** Per-segment introspection (vecgo `SegmentInfo`, `engine.go:2210-2223`):
    * seq, rows, physical path, whether manifest stats cover it, and the
    * index kind + layout width it carries (`none` when unindexed).
    */
  def segmentInfo(): Seq[Map[String, Any]] =
    store.manifest(effectiveVersion).map(_.segments.map { s =>
      Map[String, Any](
        "seq" -> s.seq,
        "rows" -> s.rows,
        "path" -> s.path,
        "has_stats" -> s.stats.isDefined,
        "index_kind" -> s.index.map(_.kind).getOrElse("none"),
        "nlist" -> s.index.map(_.nlist).getOrElse(0))
    }).getOrElse(Nil)

  /** Query explain (vecgo R15): our planner decisions (segment pruning)
    * plus Catalyst's formatted physical plan.
    */
  def explain(filters: Seq[Filter]): String = {
    val (df, scanned, pruned) = store.prunedRead(filters, effectiveVersion)
    // manifest-stats selectivity per surviving segment (histogram/top-k
    // when collected) — the same numbers the adaptive search routing reads
    val m = store.manifest(effectiveVersion)
    val est = m.map { mf =>
      val total = mf.segments.map(_.rows).sum
      val rows = mf.segments.map(s =>
        graft.stats.SegmentStats.estimateRows(s.rows, s.stats, filters)).sum
      if (total > 0) f"${rows / total}%.4f of $total%d rows" else "n/a"
    }.getOrElse("n/a")
    s"""GraftDB plan (version ${store.currentVersion})
       |  segments scanned: ${scanned.mkString("[", ",", "]")}
       |  segments pruned by manifest stats: ${pruned.mkString("[", ",", "]")}
       |  estimated selectivity: $est
       |${df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))}""".stripMargin
  }

  /** Search explain: the engine's strategy decision (index routing /
    * stats pruning) above Catalyst's formatted physical plan.
    */
  def explainSearch(query: Array[Float], k: Int,
      filter: FilterSet = FilterSet.empty,
      nprobe: Int = 0, refineFactor: Int = 0,
      selectivityCutoff: Double = 0.0,
      preFilter: Option[Boolean] = None): String = {
    val p = planSearch(query, k, filter, Nil, nprobe, refineFactor,
      selectivityCutoff, preFilter)
    s"""GraftDB search plan (version ${store.currentVersion})
       |  strategy: ${p.strategy}
       |  segments scanned: ${p.segmentsScanned}, pruned: ${p.segmentsPruned}
       |${p.df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))}""".stripMargin
  }
}

object GraftDB {
  private implicit val fmts: Formats = DefaultFormats

  /** Default [[GraftDB.collectFilterIds]] bound: 2M ids ≈ 100 MB of boxed
    * driver heap — generous for a serving handoff, far below OOM.
    */
  val DefaultFilterIdCap: Int = 2 * 1000 * 1000

  /** Id-list size at or below which [[GraftDB.delete]] writes the
    * tombstone file driver-side (no Spark job): 1M longs is ~8 MB — a
    * few-hundred-ms single-file write, still far cheaper than a job.
    */
  val SmallDeleteMaxIds: Int = 1000 * 1000

  /** Default pre-filter routing cutoff for filtered searches on indexed
    * stores. vecgo defaults to 0.30 (`search.go:215`) because its
    * tradeoff is bitmap-cursor overhead vs graph traversal; here the
    * pre-filter route is a full exact scan of the filter survivors, so
    * the break-even sits lower: at 0.10 the exact route scores ~10% of
    * the store — about what a probe-pruned scan touches at default
    * nprobe=√nlist on typical layouts — and below it the exact route is
    * strictly cheaper AND recall-proof. Override per query with
    * `selectivityCutoff`.
    */
  val DefaultSelectivityCutoff = 0.10

  /** Marker carried by inline-validation `raise_error` messages so the
    * driver can recognize (and re-type) them out of Spark's job-failure
    * wrapping. */
  private[graft] val ValidationTag = "GRAFT_INVALID: "

  /** Create or open an engine at `root`. On create, the config is written
    * to `root/db.json`; on open it is read back (config args ignored).
    *
    * Open modes (vecgo `vecgo.go`): `readOnly` rejects every mutation
    * (`ReadOnly()`, `:221`); `atVersion` / `asOfTimestampMs` pin the whole
    * read surface — search, scan, lexical index, stats — to a historical
    * snapshot (`WithVersion`/`WithTimestamp`, `:433-446`; pinned engines
    * are implicitly read-only). A read-only/pinned open never creates a
    * store.
    */
  def open(spark: SparkSession, root: String,
      dim: Int = 0, metric: String = "l2",
      schema: Map[String, String] = Map.empty,
      textCol: Option[String] = None,
      readOnly: Boolean = false,
      atVersion: Long = -1L,
      asOfTimestampMs: Long = -1L): GraftDB = {
    require(atVersion < 0 || asOfTimestampMs < 0,
      "pin by atVersion OR asOfTimestampMs, not both")
    val pinned = atVersion >= 0 || asOfTimestampMs >= 0
    val p = new Path(root, "db.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val config =
      if (fs.exists(p)) {
        val in = fs.open(p)
        val s = try scala.io.Source.fromInputStream(in).mkString finally in.close()
        JsonMethods.parse(s).extract[GraftConfig]
      } else {
        require(!readOnly && !pinned,
          s"no GraftDB at $root (read-only/pinned open cannot create one)")
        require(dim > 0, "dim required when creating a new GraftDB")
        val c = GraftConfig(dim, metric.toLowerCase, schema, textCol)
        val out = fs.create(p, true)
        try out.write(Serialization.write(c).getBytes("UTF-8")) finally out.close()
        c
      }
    new GraftDB(spark, root, config, readOnly, atVersion, asOfTimestampMs)
  }
}
