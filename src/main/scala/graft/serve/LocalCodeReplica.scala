package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.GraftDB
import graft.types.{Candidate, Metric}

/** The Hamming twin of [[LocalReplica]]: packed binary codes (array<long>
  * words, [[graft.index.BQ]] layout) exported into one flat word array and
  * served in-process with a popcount scan — vecgo serves Hamming directly
  * over stored codes the same way (`distance/distance.go:36-38`). No IVF
  * clustering: at 64-512 bits a code row is 8-64 bytes, so a full scan of
  * a per-shard replica is already cache-speed (and Hamming space has no
  * centroid structure worth k-means on uniform codes).
  *
  * Scores are popcount distances (ascending, ties by id) — identical to
  * `GraftDB.searchCodes` / `vec_hamming`, integer-exact in both kernels,
  * so replica results hash-match the engine and the DuckDB oracle with no
  * kernel-mode distinction.
  */
final class LocalCodeReplica private (
    val bits: Int,
    val words: Int,
    ids: Array[Long],
    flat: Array[Long]) {

  def size: Int = ids.length

  // ---------------------------------------------- incremental freshness
  // Same atomicity design as [[LocalReplica]]: tombstone bitmap + delta
  // code block live in ONE immutable snapshot behind a single volatile
  // reference; each mutation batch publishes exactly once, so lock-free
  // readers never observe a half-applied batch.
  @volatile private var mut: LocalCodeReplica.Mut = null

  @inline private def live(tomb: Array[Long], r: Int): Boolean =
    tomb == null || (tomb(r >>> 6) & (1L << (r & 63))) == 0L

  private lazy val idToRow: LocalReplica.LongIntMap = {
    val m = new LocalReplica.LongIntMap(size)
    var r = 0
    while (r < size) { m.put(ids(r), r); r += 1 }
    m
  }

  /** Rows currently visible (main minus tombstones plus delta). */
  def liveSize: Int = {
    val m = mut
    var dead = 0
    if (m != null && m.tombstones != null) {
      var w = 0
      while (w < m.tombstones.length) {
        dead += java.lang.Long.bitCount(m.tombstones(w)); w += 1
      }
    }
    size - dead + (if (m == null || m.deltaIds == null) 0 else m.deltaIds.length)
  }

  /** Appended-but-not-yet-reexported rows. */
  def deltaSize: Int = {
    val m = mut
    if (m == null || m.deltaIds == null) 0 else m.deltaIds.length
  }

  /** Dense (ids, flat packed codes) of every LIVE row — main minus
    * tombstones plus delta (the [[LocalReplica.liveRows]] twin, for
    * [[CodeReplicaSet.reshard]]'s row movement). Fresh copies.
    */
  private[serve] def liveRows(): (Array[Long], Array[Long]) = {
    val m0 = mut
    val tomb = if (m0 == null) null else m0.tombstones
    val dIds = if (m0 == null) null else m0.deltaIds
    val dFlat = if (m0 == null) null else m0.deltaFlat
    var nLive = 0
    var r = 0
    while (r < size) { if (live(tomb, r)) nLive += 1; r += 1 }
    val n = nLive + (if (dIds == null) 0 else dIds.length)
    val outIds = new Array[Long](n)
    val outFlat = new Array[Long](n * words)
    var w = 0
    r = 0
    while (r < size) {
      if (live(tomb, r)) {
        outIds(w) = ids(r)
        System.arraycopy(flat, r * words, outFlat, w * words, words)
        w += 1
      }
      r += 1
    }
    if (dIds != null) {
      System.arraycopy(dIds, 0, outIds, w, dIds.length)
      System.arraycopy(dFlat, 0, outFlat, w * words, dIds.length * words)
    }
    (outIds, outFlat)
  }

  /** Tombstone ids (vecgo delete on a Hamming serving tier): one bitmap
    * flip per id, idempotent, returns newly tombstoned count.
    */
  def delete(delIds: Array[Long]): Int = this.synchronized {
    val (m1, newly) = deleteInternal(mut, delIds)
    mut = m1
    newly
  }

  private def deleteInternal(m0: LocalCodeReplica.Mut,
      delIds: Array[Long]): (LocalCodeReplica.Mut, Int) = {
    if (delIds.isEmpty) return (m0, 0)
    val tomb0 = if (m0 == null) null else m0.tombstones
    val wordsArr =
      if (tomb0 == null) new Array[Long]((size + 63) >>> 6)
      else tomb0.clone()
    var newly = 0
    var i = 0
    while (i < delIds.length) {
      val r = idToRow.get(delIds(i))
      if (r >= 0 && (wordsArr(r >>> 6) & (1L << (r & 63))) == 0L) {
        wordsArr(r >>> 6) |= 1L << (r & 63)
        newly += 1
      }
      i += 1
    }
    var dIds = if (m0 == null) null else m0.deltaIds
    var dFlat = if (m0 == null) null else m0.deltaFlat
    if (dIds != null) {
      val dead = new java.util.HashSet[Long]()
      i = 0
      while (i < delIds.length) { dead.add(delIds(i)); i += 1 }
      if (dIds.exists(dead.contains)) {
        val keepI = new scala.collection.mutable.ArrayBuffer[Long](dIds.length)
        val keepF = new scala.collection.mutable.ArrayBuffer[Long](dFlat.length)
        i = 0
        while (i < dIds.length) {
          if (!dead.contains(dIds(i))) {
            keepI += dIds(i)
            var j = 0
            while (j < words) { keepF += dFlat(i * words + j); j += 1 }
          } else newly += 1
          i += 1
        }
        if (keepI.isEmpty) { dIds = null; dFlat = null }
        else { dIds = keepI.toArray; dFlat = keepF.toArray }
      }
    }
    (new LocalCodeReplica.Mut(wordsArr, dIds, dFlat), newly)
  }

  /** Append packed code rows, searchable immediately (the memtable-
    * segment analog). Ids must not collide with a live row.
    */
  def append(newIds: Array[Long], codes: Array[Array[Long]]): Unit =
    this.synchronized { mut = appendInternal(mut, newIds, codes) }

  private def appendInternal(m0: LocalCodeReplica.Mut, newIds: Array[Long],
      codes: Array[Array[Long]]): LocalCodeReplica.Mut = {
      require(newIds.length == codes.length,
        s"ids (${newIds.length}) and codes (${codes.length}) must align")
      if (newIds.isEmpty) return m0
      val tomb = if (m0 == null) null else m0.tombstones
      val d0Ids = if (m0 == null) null else m0.deltaIds
      val d0Flat = if (m0 == null) null else m0.deltaFlat
      val seen = new java.util.HashSet[Long]()
      if (d0Ids != null) d0Ids.foreach(seen.add(_))
      val addFlat = new Array[Long](newIds.length * words)
      var i = 0
      while (i < newIds.length) {
        val id = newIds(i)
        val mr = idToRow.get(id)
        require(mr < 0 || !live(tomb, mr),
          s"id $id is already live in the replica (delete/upsert first)")
        require(seen.add(id),
          s"id $id is already live in the replica delta or duplicated in " +
            "the batch (delete/upsert first)")
        val c = codes(i)
        require(c != null && c.length == words,
          s"code row for id $id has ${if (c == null) -1 else c.length} " +
            s"words, expected $words")
        System.arraycopy(c, 0, addFlat, i * words, words)
        i += 1
      }
      val (dIds, dFlat) =
        if (d0Ids == null) (newIds.clone(), addFlat)
        else {
          val mi = java.util.Arrays.copyOf(d0Ids, d0Ids.length + newIds.length)
          System.arraycopy(newIds, 0, mi, d0Ids.length, newIds.length)
          val mf = java.util.Arrays.copyOf(d0Flat, d0Flat.length + addFlat.length)
          System.arraycopy(addFlat, 0, mf, d0Flat.length, addFlat.length)
          (mi, mf)
        }
      new LocalCodeReplica.Mut(tomb, dIds, dFlat)
    }

  /** Delete-then-append published as ONE snapshot: a raced reader sees
    * the old code row or the new one, never a transient absence.
    */
  def upsert(upIds: Array[Long], codes: Array[Array[Long]]): Unit =
    this.synchronized {
      val (m1, _) = deleteInternal(mut, upIds)
      mut = appendInternal(m1, upIds, codes)
    }

  private[graft] def clearMutations(): Unit = this.synchronized { mut = null }

  // set by fromStore: what store state this replica was exported from
  @volatile private[serve] var origin: LocalReplica.Origin = null

  // set by CodeReplicaSet.fromStore on hash-cell shards: which store rows
  // BELONG to this shard (see LocalReplica.originCellFilter)
  @volatile private[serve] var originCellFilter: Long => Boolean = null

  /** Whether `id` is currently live here (the [[CodeReplicaSet]]
    * membership probe — no code-row copy).
    */
  private[serve] def hasLive(id: Long): Boolean = {
    val m0 = mut
    if (m0 != null && m0.deltaIds != null) {
      var i = 0
      while (i < m0.deltaIds.length) {
        if (m0.deltaIds(i) == id) return true
        i += 1
      }
    }
    val r = idToRow.get(id)
    r >= 0 && live(if (m0 == null) null else m0.tombstones, r)
  }

  /** Store version this replica was exported at. */
  def exportedVersion: Option[Long] = {
    val o = origin; if (o == null) None else Some(o.version)
  }

  /** Incremental pull-refresh from the exporting store: the Hamming twin
    * of [[LocalReplica.refreshFrom]] — replays the manifest diff (new
    * code segments / tombstone files) in LSN order into a LOCAL snapshot
    * chain, published with ONE volatile store; refuses rewrites
    * (compaction/vacuum → re-export). A failed replay publishes nothing.
    */
  def refreshFrom(db: GraftDB,
      maxNewRows: Long = 1000000L): LocalReplica.RefreshStats =
    this.synchronized {
      val o = origin
      require(o != null,
        "replica was not exported from a store (use fromStore) — nothing " +
          "to refresh from")
      require(db.store.root == o.root,
        s"refreshFrom a different store: ${db.store.root} vs ${o.root}")
      val v1 = db.effectiveVersion
      if (v1 == o.version)
        return LocalReplica.RefreshStats(0, 0, o.version, v1)
      val m1 = db.store.manifest(v1).getOrElse(
        throw new IllegalStateException(s"no manifest at version $v1"))
      val curSegs = m1.segments.map(_.path).toSet
      val curDels = m1.deletes.map(_.path).toSet
      require(o.segPaths.subsetOf(curSegs) && o.delPaths.subsetOf(curDels),
        "store was compacted/vacuumed since the export — a file-level " +
          "refresh cannot apply a rewrite; re-export the replica")
      val newSegs = m1.segments.filterNot(s => o.segPaths(s.path))
      val newDels = m1.deletes.filterNot(d => o.delPaths(d.path))
      require(newSegs.map(_.rows).sum <= maxNewRows,
        s"refresh would append ${newSegs.map(_.rows).sum} rows > " +
          s"maxNewRows=$maxNewRows — re-export instead")
      val events =
        (newSegs.map(sg => (sg.seq, Left(sg): Either[
            graft.store.SnapshotStore.SegmentRef,
            graft.store.SnapshotStore.DeleteRef])) ++
          newDels.map(d => (d.seq, Right(d): Either[
            graft.store.SnapshotStore.SegmentRef,
            graft.store.SnapshotStore.DeleteRef])))
          .sortBy { case (seq, e) => (seq, if (e.isRight) 0 else 1) }
      // phase 1 — READ everything first (abort applies nothing)
      val batches: Seq[Either[(Array[Long], Array[Array[Long]]), Array[Long]]] =
        events.map {
          case (_, Left(seg)) =>
            val cellF = originCellFilter
            val rows0 = db.spark.read.parquet(seg.path)
              .select(col("id"), col("vector")).collect()
            val rows =
              if (cellF == null) rows0
              else rows0.filter(r => cellF(r.getLong(0)))
            val rid = new Array[Long](rows.length)
            val rcodes = new Array[Array[Long]](rows.length)
            var i = 0
            while (i < rows.length) {
              rid(i) = rows(i).getLong(0)
              rcodes(i) = rows(i).getSeq[Long](1).toArray
              i += 1
            }
            Left((rid, rcodes))
          case (_, Right(del)) =>
            Right(db.spark.read.parquet(del.path)
              .select(col("id")).collect().map(_.getLong(0)))
        }
      // phase 2 — replay into a local chain, publish once
      var appended = 0
      var deleted = 0
      var m = mut
      try {
        batches.foreach {
          case Left((rid, rcodes)) =>
            m = appendInternal(m, rid, rcodes)
            appended += rid.length
          case Right(rid) =>
            val (m1b, nDel) = deleteInternal(m, rid)
            m = m1b
            deleted += nDel
        }
      } catch {
        case e: Throwable =>
          throw new IllegalStateException(
            s"refreshFrom replay failed — nothing applied (replica still " +
              s"serves origin v${o.version}): ${e.getMessage}", e)
      }
      mut = m
      origin = LocalReplica.Origin(o.root, v1, curSegs, curDels)
      LocalReplica.RefreshStats(appended, deleted, o.version, v1)
    }

  @inline private def distAt(base: Int, q: Array[Long]): Long = {
    var s = 0L
    var i = 0
    while (i < words) {
      s += java.lang.Long.bitCount(flat(base + i) ^ q(i))
      i += 1
    }
    s
  }

  @inline private def better(s1: Long, id1: Long, s2: Long, id2: Long): Boolean =
    if (s1 != s2) s1 < s2 else id1 < id2

  /** Point lookup by id (vecgo R7 `Get`): the live row's packed code,
    * delta rows included, tombstones respected.
    */
  def get(id: Long): Option[Array[Long]] = {
    val m0 = mut
    if (m0 != null && m0.deltaIds != null) {
      var i = m0.deltaIds.length - 1
      while (i >= 0) {
        if (m0.deltaIds(i) == id) {
          val out = new Array[Long](words)
          System.arraycopy(m0.deltaFlat, i * words, out, 0, words)
          return Some(out)
        }
        i -= 1
      }
    }
    val r = idToRow.get(id)
    if (r < 0 || !live(if (m0 == null) null else m0.tombstones, r)) None
    else {
      val out = new Array[Long](words)
      System.arraycopy(flat, r * words, out, 0, words)
      Some(out)
    }
  }

  /** Top-k nearest codes, best-first. */
  def search(q: Array[Long], k: Int): Seq[Candidate] =
    searchInternal(q, k, mut)

  private def searchInternal(q: Array[Long], k: Int,
      m0: LocalCodeReplica.Mut): Seq[Candidate] = {
    require(q.length == words, s"query has ${q.length} words, replica packs $words")
    val tomb = if (m0 == null) null else m0.tombstones
    val hs = new Array[Long](math.max(1, k))
    val hi = new Array[Long](math.max(1, k))
    var hn = 0
    @inline def worse(a: Int, b: Int): Boolean =
      !better(hs(a), hi(a), hs(b), hi(b))
    def siftDown(i0: Int): Unit = {
      var i = i0
      var go = true
      while (go) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < hn && worse(l, m)) m = l
        if (r < hn && worse(r, m)) m = r
        if (m == i) go = false
        else {
          val ts = hs(i); hs(i) = hs(m); hs(m) = ts
          val ti = hi(i); hi(i) = hi(m); hi(m) = ti
          i = m
        }
      }
    }
    @inline def offer(s: Long, id: Long): Unit = {
      if (hn < k) {
        hs(hn) = s; hi(hn) = id; hn += 1
        if (hn == k) {
          var i = hn / 2 - 1
          while (i >= 0) { siftDown(i); i -= 1 }
        }
      } else if (k > 0 && better(s, id, hs(0), hi(0))) {
        hs(0) = s; hi(0) = id; siftDown(0)
      }
    }
    var r = 0
    while (r < size) {
      if (live(tomb, r)) offer(distAt(r * words, q), ids(r))
      r += 1
    }
    if (m0 != null && m0.deltaIds != null) {
      var i = 0
      while (i < m0.deltaIds.length) {
        var s = 0L
        var w = 0
        while (w < words) {
          s += java.lang.Long.bitCount(m0.deltaFlat(i * words + w) ^ q(w))
          w += 1
        }
        offer(s, m0.deltaIds(i))
        i += 1
      }
    }
    (0 until hn).map(i => Candidate(hi(i), hs(i).toDouble))
      .sortWith((a, b) => better(a.score.toLong, a.id, b.score.toLong, b.id))
  }

  /** All codes within `threshold` bits, best-first, capped at `maxResults`
    * (the packed-code range query — `GraftDB.searchThresholdCodes`).
    */
  def searchThreshold(q: Array[Long], threshold: Long,
      maxResults: Int = Int.MaxValue): Seq[Candidate] = {
    require(q.length == words, s"query has ${q.length} words, replica packs $words")
    val m0 = mut
    val tomb = if (m0 == null) null else m0.tombstones
    val buf = scala.collection.mutable.ArrayBuffer.empty[Candidate]
    var r = 0
    while (r < size) {
      if (live(tomb, r)) {
        val s = distAt(r * words, q)
        if (s <= threshold) buf += Candidate(ids(r), s.toDouble)
      }
      r += 1
    }
    if (m0 != null && m0.deltaIds != null) {
      var i = 0
      while (i < m0.deltaIds.length) {
        var s = 0L
        var w = 0
        while (w < words) {
          s += java.lang.Long.bitCount(m0.deltaFlat(i * words + w) ^ q(w))
          w += 1
        }
        if (s <= threshold) buf += Candidate(m0.deltaIds(i), s.toDouble)
        i += 1
      }
    }
    buf.sortWith((a, b) => better(a.score.toLong, a.id, b.score.toLong, b.id))
      .take(maxResults).toSeq
  }

  /** Per-query top-k, parallel across the batch — every query sees ONE
    * mutation snapshot.
    */
  def batchSearch(queries: Seq[(Long, Array[Long])],
      k: Int): Seq[(Long, Seq[Candidate])] = {
    val arr = queries.toArray
    val out = new Array[(Long, Seq[Candidate])](arr.length)
    val m0 = mut
    java.util.stream.IntStream.range(0, arr.length).parallel().forEach { i =>
      out(i) = (arr(i)._1, searchInternal(arr(i)._2, k, m0))
    }
    out.toSeq
  }

  /** Persist as a single self-contained artifact (same contract as
    * [[LocalReplica.save]]: atomic temp+rename, refuses pending
    * mutations — fold by re-export, the production path).
    */
  def save(path: String,
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): Unit = this.synchronized {
    require(mut == null,
      "replica has pending deletes/appends — re-export from the store " +
        "before persisting")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(
      path + ".tmp-" + java.util.UUID.randomUUID().toString)
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(tmp, true), 1 << 20))
    try {
      out.writeInt(LocalCodeReplica.Magic)
      out.writeInt(LocalCodeReplica.FormatVersion)
      out.writeInt(bits)
      out.writeInt(words)
      out.writeInt(size)
      LocalReplica.writeLongs(out, ids)
      LocalReplica.writeLongs(out, flat)
    } finally out.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
      fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        if (fs.exists(p)) fs.delete(p, false)
        if (!fs.rename(tmp, p))
          throw new java.io.IOException(s"rename $tmp -> $p failed")
    }
  }
}

object LocalCodeReplica {

  private[serve] val Magic = 0x47524352 // "GRCR"
  private[serve] val FormatVersion = 1

  /** One immutable mutation snapshot (see [[LocalReplica.Mut]]). */
  private[serve] final class Mut(
      val tombstones: Array[Long],
      val deltaIds: Array[Long],
      val deltaFlat: Array[Long])

  /** Load a [[LocalCodeReplica#save]]d artifact; fails loudly on bad
    * magic/version or a truncated file.
    */
  def load(path: String,
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): LocalCodeReplica = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(fs.open(p), 1 << 20))
    try {
      val magic = in.readInt()
      require(magic == Magic,
        f"not a code-replica artifact: bad magic 0x$magic%08x at $path")
      val ver = in.readInt()
      require(ver == FormatVersion,
        s"code-replica format version $ver unsupported")
      val bits = in.readInt()
      val words = in.readInt()
      val n = in.readInt()
      require(bits > 0 && words == (bits + 31) / 32 && n > 0,
        s"corrupt code replica header: bits=$bits words=$words n=$n")
      val ids = LocalReplica.readLongs(in, n)
      val flat = LocalReplica.readLongs(in, n * words)
      new LocalCodeReplica(bits, words, ids, flat)
    } finally in.close()
  }

  /** Build a replica from raw JVM arrays — the no-Spark rebuild
    * [[CodeReplicaSet.reshard]] moves rows through (flat scan layout,
    * like every code replica — no clustering to rebuild).
    */
  private[serve] def fromArrays(bits: Int, words: Int, ids: Array[Long],
      flat: Array[Long]): LocalCodeReplica = {
    require(ids.nonEmpty, "fromArrays: no rows")
    require(flat.length == ids.length * words,
      s"fromArrays: flat has ${flat.length} words, " +
        s"expected ${ids.length * words}")
    new LocalCodeReplica(bits, words, ids, flat)
  }

  /** Export from any (id, array<long> codes) DataFrame. `bits` documents
    * the code width (= Hamming store `dim`); rows must pack
    * `ceil(bits/32)` words like [[graft.index.BQ.packCol]].
    */
  def fromDataFrame(df: DataFrame, codeCol: String, idCol: String, bits: Int,
      maxRows: Long = LocalReplica.DefaultMaxRows): LocalCodeReplica = {
    val rows = df.select(col(idCol).cast("long"), col(codeCol)).collect()
    require(rows.length <= maxRows,
      s"replica export of ${rows.length} rows exceeds maxRows=$maxRows — " +
        "export per shard or raise maxRows explicitly")
    require(rows.nonEmpty, "cannot build a replica from an empty frame")
    val words = rows(0).getSeq[Long](1).length
    val n = rows.length
    val ids = new Array[Long](n)
    val flat = new Array[Long](n * words)
    var r = 0
    while (r < n) {
      ids(r) = rows(r).getLong(0)
      val c = rows(r).getSeq[Long](1)
      require(c.length == words, s"ragged code column: ${c.length} != $words")
      var i = 0
      while (i < words) { flat(r * words + i) = c(i); i += 1 }
      r += 1
    }
    new LocalCodeReplica(bits, words, ids, flat)
  }

  /** Export from a Hamming engine snapshot. */
  def fromStore(db: GraftDB,
      maxRows: Long = LocalReplica.DefaultMaxRows): LocalCodeReplica = {
    require(db.metric == Metric.Hamming,
      s"LocalCodeReplica serves Hamming stores (store is ${db.config.metric}); " +
        "float metrics go through LocalReplica")
    val v = db.effectiveVersion
    val rep = fromDataFrame(db.store.read(v), "vector", "id",
      db.config.dim, maxRows)
    db.store.manifest(v).foreach { m =>
      rep.origin = LocalReplica.Origin(db.store.root, v,
        m.segments.map(_.path).toSet, m.deletes.map(_.path).toSet)
    }
    rep
  }
}
