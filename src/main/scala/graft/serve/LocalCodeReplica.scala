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
    flat: Array[Long],
    metaCols: Array[LocalReplica.MetaColumn] = Array.empty,
    lex: LocalReplica.LexData = null) {

  def size: Int = ids.length

  /** Metadata columns exported with the codes (format v2 trailer) —
    * group keys for [[searchGrouped]] and [[searchWhere]] predicates;
    * same export contract as the float tier's v3 trailer.
    */
  def metaColumns: Seq[String] = metaCols.map(_.name).toSeq

  /** Whether the replica carries a lexical postings section (format v3
    * trailer — export with `textCol` to serve BM25/hybrid in-process).
    */
  def lexical: Boolean = lex != null

  private[serve] def metaData: Array[LocalReplica.MetaColumn] = metaCols

  private[serve] def lexData: LocalReplica.LexData = lex

  /** This shard's document frequency for one term (0 when absent or no
    * lexical section) — the [[CodeReplicaSet]] global-idf sum input.
    */
  private[serve] def termDf(term: String): Int = {
    val l = lex
    if (l == null) return 0
    val ti = java.util.Arrays.binarySearch(
      l.terms.asInstanceOf[Array[AnyRef]], term)
    if (ti < 0) 0 else l.postStart(ti + 1) - l.postStart(ti)
  }

  private lazy val metaByName: Map[String, LocalReplica.MetaColumn] =
    metaCols.map(c => c.name -> c).toMap

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

  /** Dense (ids, flat packed codes, metadata) of every LIVE row — main
    * minus tombstones plus delta (the [[LocalReplica.liveRows]] twin, for
    * [[CodeReplicaSet.reshard]]'s row movement). Fresh copies. A delta
    * row's metadata resolves from its tombstoned MAIN row when the id
    * previously existed (the [[groupKeyOf]] contract — an upserted id
    * keeps its group key through a reshard); brand-new delta ids carry
    * none (null entries, the freshness contract).
    */
  private[serve] def liveRows(): (Array[Long], Array[Long], Array[Int],
      Array[LocalReplica.MetaColumn]) = {
    val m0 = mut
    val tomb = if (m0 == null) null else m0.tombstones
    val dIds = if (m0 == null) null else m0.deltaIds
    val dFlat = if (m0 == null) null else m0.deltaFlat
    var nLive = 0
    var r = 0
    while (r < size) { if (live(tomb, r)) nLive += 1; r += 1 }
    val nDelta = if (dIds == null) 0 else dIds.length
    val n = nLive + nDelta
    val outIds = new Array[Long](n)
    val outFlat = new Array[Long](n * words)
    val keep = new Array[Int](nLive) // main-row index per surviving slot
    // old MAIN row index per output slot, -1 for delta rows — the lex
    // re-split key [[CodeReplicaSet.reshard]] remaps postings through
    val mainOldOf = new Array[Int](n)
    java.util.Arrays.fill(mainOldOf, -1)
    var w = 0
    r = 0
    while (r < size) {
      if (live(tomb, r)) {
        outIds(w) = ids(r)
        System.arraycopy(flat, r * words, outFlat, w * words, words)
        keep(w) = r
        mainOldOf(w) = r
        w += 1
      }
      r += 1
    }
    if (dIds != null) {
      System.arraycopy(dIds, 0, outIds, w, dIds.length)
      System.arraycopy(dFlat, 0, outFlat, w * words, dIds.length * words)
    }
    val outMeta = metaCols.map { c =>
      val nulls = new Array[Boolean](n)
      val longs =
        if (c.kind == LocalReplica.MetaLong) new Array[Long](n) else null
      val doubles =
        if (c.kind == LocalReplica.MetaDouble) new Array[Double](n) else null
      val strings =
        if (c.kind == LocalReplica.MetaString) new Array[String](n) else null
      @inline def copyFrom(i: Int, src: Int): Unit = {
        nulls(i) = c.nulls(src)
        c.kind match {
          case LocalReplica.MetaString => strings(i) = c.strings(src)
          case LocalReplica.MetaDouble => doubles(i) = c.doubles(src)
          case _ => longs(i) = c.longs(src)
        }
      }
      var i = 0
      while (i < nLive) { copyFrom(i, keep(i)); i += 1 }
      while (i < n) { // delta rows: tombstoned-main metadata if the id
        val src = idToRow.get(outIds(i)) // previously existed, else null
        if (src >= 0) copyFrom(i, src) else nulls(i) = true
        i += 1
      }
      new LocalReplica.MetaColumn(c.name, c.kind, longs, doubles, strings,
        nulls)
    }
    (outIds, outFlat, mainOldOf, outMeta)
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
      LocalReplica.refreshDiff(db, o, maxNewRows) match {
        case None => LocalReplica.RefreshStats(0, 0, o.version, o.version)
        case Some(d) =>
          // phase 1 — READ everything first (abort applies nothing)
          val batches =
            LocalCodeReplica.readRefreshBatches(db, d.events,
              originCellFilter)
          applyRefreshBatches(o, d, batches)
      }
    }

  /** Phase 2 of a refresh — replay pre-read code batches into a local
    * chain, publish once (the Hamming twin of
    * [[LocalReplica.applyRefreshBatches]]; same moved-baseline guard for
    * the set-level shared-read path).
    */
  private[serve] def applyRefreshBatches(expected: LocalReplica.Origin,
      d: LocalReplica.RefreshDiff,
      batches: Seq[Either[(Array[Long], Array[Array[Long]]), Array[Long]]])
      : LocalReplica.RefreshStats =
    this.synchronized {
      val o = origin
      require(o == expected,
        "replica origin moved between the diff read and the apply " +
          "(concurrent refresh?) — nothing applied, retry the refresh")
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
      origin = LocalReplica.Origin(o.root, d.toVersion, d.curSegs, d.curDels)
      LocalReplica.RefreshStats(appended, deleted, o.version, d.toVersion)
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

  private[serve] def snapshotMut: LocalCodeReplica.Mut = mut

  private[serve] def searchSnap(q: Array[Long], k: Int,
      m0: LocalCodeReplica.Mut): Seq[Candidate] = searchInternal(q, k, m0)

  /** Filtered top-k with typed predicates evaluated REPLICA-side against
    * the exported metadata columns — the Hamming twin of
    * [[LocalReplica.searchWhere]] (vecgo evaluates typed filters inside
    * the engine for any metric, `metadata/filter.go:122-216`;
    * `internal/engine/search.go:295-307` applies them on the Hamming
    * path too). Pre-filter semantics, exact over survivors, same
    * (distance asc, id asc) ordering as [[search]]. Delta rows carry no
    * metadata → every column is NULL → no predicate matches (three-valued
    * semantics), so the delta block is not scanned — the float tier's
    * freshness contract.
    */
  def searchWhere(q: Array[Long], k: Int,
      filters: Seq[graft.types.Filter]): Seq[Candidate] = {
    if (filters.isEmpty) return search(q, k)
    searchWhereInternal(q, k, compilePreds(filters),
      { val m0 = mut; if (m0 == null) null else m0.tombstones })
  }

  private def compilePreds(
      filters: Seq[graft.types.Filter]): Array[Int => Boolean] =
    filters.map(f => LocalReplica.compileFilter(f, metaByName,
      metaCols.map(_.name).mkString(", "))).toArray

  private def searchWhereInternal(q: Array[Long], k: Int,
      preds: Array[Int => Boolean], tomb: Array[Long]): Seq[Candidate] = {
    require(q.length == words,
      s"query has ${q.length} words, replica packs $words")
    val buf = scala.collection.mutable.ArrayBuffer.empty[Candidate]
    var r = 0
    while (r < size) {
      var ok = live(tomb, r)
      var i = 0
      while (ok && i < preds.length) { ok = preds(i)(r); i += 1 }
      if (ok) buf += Candidate(ids(r), distAt(r * words, q).toDouble)
      r += 1
    }
    buf.sortWith((a, b) => better(a.score.toLong, a.id, b.score.toLong, b.id))
      .take(k).toSeq
  }

  // per-thread lexical accumulator, generation-stamped so a query never
  // zeroes the O(size) arrays (the same thread-local-scratch move the
  // float tier's coded scan got in r11: allocating+zeroing ~90 KB per
  // query dominated the in-process hybrid's lexical side)
  private val lexScratch =
    new ThreadLocal[LocalCodeReplica.LexScratch]() {
      override def initialValue(): LocalCodeReplica.LexScratch =
        new LocalCodeReplica.LexScratch(size)
    }

  /** BM25 scores of every live doc containing ≥1 query term, best-first
    * by the engine's (rounded score desc, id asc) rank order, capped at
    * `m` — the Hamming tier's lexical pool over the exported postings
    * CSR. Unlike the float tier's latency-tuned DAAT walk this is a
    * plain per-row accumulation (term order per row matches the DAAT
    * sum order, so scores are bit-identical); code replicas are bounded
    * per-shard artifacts, so the O(size) accumulator is fine. Corpus
    * stats are FROZEN at export; tombstoned rows are excluded from
    * scoring but not the frozen stats; delta rows carry no text — the
    * same freshness contract as the float tier. With `global` set (the
    * [[CodeReplicaSet]] cross-shard path) per-posting scores compute on
    * the fly from tf/doclen under the CALLER's idf/avgdl — the exact
    * expression `LexData.impact` freezes, so a shard scoring under
    * global stats is bit-identical to a single global replica.
    */
  private def lexicalPool(textQuery: String, m: Int,
      tomb: Array[Long], pred: Int => Boolean = null,
      global: LocalReplica.GlobalLex = null): Seq[(Long, Double)] = {
    val l = lex
    require(l != null,
      "replica carries no lexical section — export with textCol to serve " +
        "BM25/hybrid in-process")
    val termsIn = graft.lexical.BM25.tokenizeQuery(textQuery)
    val sc = lexScratch.get()
    val cur = sc.nextGen()
    val acc = sc.acc
    val gen = sc.gen
    var nTouched = 0
    termsIn.foreach { t =>
      val ti = java.util.Arrays.binarySearch(
        l.terms.asInstanceOf[Array[AnyRef]], t)
      if (ti >= 0) {
        val idf = if (global == null) 0.0 else global.idf(t)
        var i = l.postStart(ti)
        val hi = l.postStart(ti + 1)
        while (i < hi) {
          val row = l.postRow(i)
          if (live(tomb, row) && (pred == null || pred(row))) {
            val s =
              if (global == null) l.impact(i)
              else {
                import graft.lexical.BM25.{K1, B}
                val tf = l.postTf(i).toDouble
                val lenNorm = K1 * ((1.0 - B) +
                  B * l.docLen(row).toDouble / global.avgdl)
                idf * (tf * (K1 + 1.0)) / (tf + lenNorm)
              }
            if (gen(row) != cur) {
              gen(row) = cur
              acc(row) = s
              nTouched = sc.touch(nTouched, row)
            } else acc(row) += s
          }
          i += 1
        }
      }
    }
    if (nTouched == 0) return Nil
    // bounded worst-at-root top-m heap on the (rounded score desc, id
    // asc) rank key — exact with no margin machinery (unlike the float
    // DAAT, every candidate's score here is already FINAL when offered),
    // and O(T log m) instead of sorting all T touched rows (a tie-heavy
    // corpus touches thousands)
    val touched = sc.touched
    val hm = math.min(m, nTouched)
    val hk = new Array[Double](math.max(1, hm))
    val hid = new Array[Long](hk.length)
    val hraw = new Array[Double](hk.length)
    var hn = 0
    @inline def worse(a: Int, b: Int): Boolean =
      if (hk(a) != hk(b)) hk(a) < hk(b) else hid(a) > hid(b)
    def siftDown(i0: Int): Unit = {
      var i = i0
      var go = true
      while (go) {
        val lc = 2 * i + 1; val rc = lc + 1
        var mx = i
        if (lc < hn && worse(lc, mx)) mx = lc
        if (rc < hn && worse(rc, mx)) mx = rc
        if (mx == i) go = false
        else {
          val tk = hk(i); hk(i) = hk(mx); hk(mx) = tk
          val ti = hid(i); hid(i) = hid(mx); hid(mx) = ti
          val tr = hraw(i); hraw(i) = hraw(mx); hraw(mx) = tr
          i = mx
        }
      }
    }
    var i = 0
    while (i < nTouched) {
      val row = touched(i)
      val k2 = LocalReplica.round6(acc(row))
      val id = ids(row)
      if (hn < hm) {
        hk(hn) = k2; hid(hn) = id; hraw(hn) = acc(row); hn += 1
        if (hn == hm) {
          var j = hn / 2 - 1
          while (j >= 0) { siftDown(j); j -= 1 }
        }
      } else if (k2 > hk(0) || (k2 == hk(0) && id < hid(0))) {
        hk(0) = k2; hid(0) = id; hraw(0) = acc(row); siftDown(0)
      }
      i += 1
    }
    LocalReplica.sortRank(hk, hid, hraw, hn, asc = false)
    val out = new Array[(Long, Double)](hn)
    i = 0
    while (i < hn) { out(i) = (hid(i), hraw(i)); i += 1 }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  private[serve] def lexicalPoolSnap(textQuery: String, m: Int,
      m0: LocalCodeReplica.Mut,
      global: LocalReplica.GlobalLex): Seq[(Long, Double)] =
    lexicalPool(textQuery, m,
      if (m0 == null) null else m0.tombstones, null, global)

  /** Compile typed predicates against THIS shard's metadata columns —
    * the router compiles once per shard per query and feeds BOTH pools.
    */
  private[serve] def compiledPredsOf(
      filters: Seq[graft.types.Filter]): Array[Int => Boolean] =
    compilePreds(filters)

  /** [[lexicalPoolSnap]] with precompiled predicates gating pool
    * admission — the sharded FILTERED hybrid's lexical side.
    */
  private[serve] def lexicalPoolSnapWhere(textQuery: String, m: Int,
      m0: LocalCodeReplica.Mut, global: LocalReplica.GlobalLex,
      preds: Array[Int => Boolean]): Seq[(Long, Double)] =
    lexicalPool(textQuery, m,
      if (m0 == null) null else m0.tombstones,
      LocalReplica.allOf(preds), global)

  /** [[searchWhere]] against a pinned snapshot with precompiled
    * predicates — the sharded filtered hybrid's vector side.
    */
  private[serve] def searchWhereSnap(q: Array[Long], k: Int,
      preds: Array[Int => Boolean],
      m0: LocalCodeReplica.Mut): Seq[Candidate] =
    searchWhereInternal(q, k, preds,
      if (m0 == null) null else m0.tombstones)

  /** In-process BM25 top-k on the code tier (vecgo R10 served embedded —
    * lexical search is metric-agnostic): same scores and (rounded score
    * desc, id asc) ordering as `GraftDB.lexicalSearch` over the exported
    * snapshot.
    */
  def lexicalSearch(textQuery: String, k: Int): Seq[Candidate] = {
    val m0 = mut
    lexicalPool(textQuery, k,
      if (m0 == null) null else m0.tombstones).map { case (id, s) =>
      Candidate(id, s)
    }
  }

  /** In-process hybrid RRF on the code tier — the Hamming twin of
    * [[LocalReplica.hybridSearch]] (vecgo's `HybridSearch` is
    * metric-agnostic, `engine.go:1538-1635`): popcount top-m pool
    * (m = max(2k, 50)) fused with the BM25 top-m pool by reciprocal
    * rank. Hamming distances are exact integers, so the vector pool
    * needs no rounded-rank recut or tie deepening — (distance asc,
    * id asc) is already the engine's total pool order — and the result
    * matches `GraftDB.hybridSearchCodes` bit-for-bit. The lexical pool
    * overlaps the popcount scan on a ForkJoin task (same snapshot, pure
    * reads), the float tier's latency structure.
    */
  def hybridSearch(q: Array[Long], textQuery: String, k: Int,
      rrfK: Int = 60): Seq[Candidate] = {
    require(lex != null,
      "replica carries no lexical section — export with textCol to serve " +
        "BM25/hybrid in-process")
    val m0 = mut // ONE snapshot for both pools
    val tomb = if (m0 == null) null else m0.tombstones
    val m = math.max(2 * k, 50)
    val lexTask = LocalReplica.overlap(lexicalPool(textQuery, m, tomb))
    val vPool = LocalReplica.joinedWithOverlap(lexTask) {
      searchInternal(q, m, m0).map(c => (c.id, c.score))
    }
    LocalReplica.rrfFuse(vPool, LocalReplica.joinOverlap(lexTask), k, rrfK)
  }

  /** FILTERED in-process hybrid on the code tier (vecgo `HybridSearch` +
    * `WithFilter` over any metric, `engine.go:1538-1545`): typed
    * predicates restrict BOTH pools — the popcount pool scores only
    * predicate survivors (pre-filter semantics, exact over the allowed
    * set) and the lexical accumulation skips non-matching rows before
    * they can claim a pool slot, while df/avgdl/N stay corpus-level
    * exactly like the engine's semi-join-after-df shape. Delta rows
    * carry neither metadata nor text, so they are absent from both
    * pools (the standing freshness contract).
    */
  def hybridSearchWhere(q: Array[Long], textQuery: String, k: Int,
      filters: Seq[graft.types.Filter],
      rrfK: Int = 60): Seq[Candidate] = {
    if (filters.isEmpty) return hybridSearch(q, textQuery, k, rrfK)
    require(lex != null,
      "replica carries no lexical section — export with textCol to serve " +
        "BM25/hybrid in-process")
    val preds = compilePreds(filters)
    @inline def pred(r: Int): Boolean = {
      var i = 0
      while (i < preds.length) { if (!preds(i)(r)) return false; i += 1 }
      true
    }
    val m0 = mut
    val tomb = if (m0 == null) null else m0.tombstones
    val m = math.max(2 * k, 50)
    val lexTask = LocalReplica.overlap(lexicalPool(textQuery, m, tomb, pred))
    val vPool = LocalReplica.joinedWithOverlap(lexTask) {
      searchWhereInternal(q, m, preds, tomb).map(c => (c.id, c.score))
    }
    LocalReplica.rrfFuse(vPool, LocalReplica.joinOverlap(lexTask), k, rrfK)
  }

  /** Group key of a live id under metadata column `groupCol` (the
    * [[LocalReplica.groupKeyOf]] twin): None when the row is gone,
    * carries no metadata (delta rows), or the column is NULL — grouped
    * consumers treat None as ONE null group, matching SQL window
    * semantics.
    */
  private[serve] def groupKeyOf(groupCol: String): Long => Option[Any] = {
    val c = metaByName.getOrElse(groupCol,
      throw new IllegalArgumentException(
        s"replica carries no metadata column `$groupCol` (have: " +
          s"${metaCols.map(_.name).mkString(", ")}) — export it via metaCols"))
    id => {
      val r = idToRow.get(id)
      if (r < 0 || c.nulls(r)) None
      else c.kind match {
        case LocalReplica.MetaString => Some(c.strings(r))
        case LocalReplica.MetaDouble => Some(c.doubles(r))
        case _ => Some(c.longs(r))
      }
    }
  }

  /** Diversity-capped (grouped) top-k on the code tier — the Hamming
    * twin of [[LocalReplica.searchGrouped]]: the global top-`k` subject
    * to at most `perGroup` results per value of metadata column
    * `groupCol` (NULL groups — including delta rows — share one null
    * group). Same adaptive pool deepening: a short page with the pool
    * exhausted at its bound quadruples the bound and retries (worst case
    * one full scan).
    */
  def searchGrouped(q: Array[Long], k: Int, groupCol: String,
      perGroup: Int): Seq[Candidate] =
    LocalReplica.groupedDeepen(fetchK => search(q, fetchK),
      groupKeyOf(groupCol), k, perGroup)

  /** MMR-diversified top-k on the code tier — the Hamming twin of
    * [[LocalReplica.searchMmr]]: a `fetchK` popcount pool, then the
    * greedy λ-trade with POPCOUNT similarity as the redundancy term.
    * Relevance is the canonical Hamming score oriented higher-better
    * (−distance) and the penalty is −hamming(cᵢ, cⱼ) between stored
    * codes — every objective term is an exact small integer scaled by
    * λ/μ, so selection decisions replay bit-exact in the DuckDB mirror
    * ([[graft.query.Mmr.oracleSql]] with the sign-bit similarity).
    */
  def searchMmr(q: Array[Long], k: Int, fetchK: Int,
      lambda: Double): Seq[Candidate] = {
    val pool = search(q, fetchK)
    LocalCodeReplica.mmrGreedyCodes(pool, get, k, fetchK, lambda)
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
      // v2 trailer: typed metadata columns (row-aligned with ids — the
      // float tier's v3 trailer format)
      out.writeInt(metaCols.length)
      metaCols.foreach { c =>
        out.writeUTF(c.name)
        out.writeByte(c.kind)
        var i = 0
        while (i < size) { out.writeBoolean(c.nulls(i)); i += 1 }
        c.kind match {
          case LocalReplica.MetaString =>
            i = 0
            while (i < size) {
              out.writeUTF(if (c.nulls(i)) "" else c.strings(i)); i += 1
            }
          case LocalReplica.MetaDouble =>
            i = 0
            while (i < size) { out.writeDouble(c.doubles(i)); i += 1 }
          case _ =>
            LocalReplica.writeLongs(out, c.longs)
        }
      }
      // v3 trailer: compact lexical postings (sorted vocab + CSR
      // (row, tf) + doc lengths + frozen corpus stats — the code-tier
      // twin of the float artifact's v5 section)
      out.writeBoolean(lex != null)
      if (lex != null) {
        val v = lex.terms.length
        out.writeInt(v)
        var t = 0
        while (t < v) { out.writeUTF(lex.terms(t)); t += 1 }
        t = 0
        while (t <= v) { out.writeInt(lex.postStart(t)); t += 1 }
        val nPost = lex.postStart(v)
        var i = 0
        while (i < nPost) { out.writeInt(lex.postRow(i)); i += 1 }
        i = 0
        while (i < nPost) { out.writeFloat(lex.postTf(i)); i += 1 }
        i = 0
        while (i < size) { out.writeInt(lex.docLen(i)); i += 1 }
        out.writeLong(lex.numDocs)
        out.writeDouble(lex.avgdl)
      }
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
  // v2: typed metadata trailer; v3: lexical postings trailer
  private[serve] val FormatVersion = 3

  /** Phase 1 of a Hamming-tier refresh: READ every diff event into
    * driver arrays (codes are array<long> words). `cellF` keeps only a
    * hash-cell shard's own rows; null keeps all (the set-level shared
    * read routes rows afterwards).
    */
  private[serve] def readRefreshBatches(db: GraftDB,
      events: Seq[(Long, Either[graft.store.SnapshotStore.SegmentRef,
        graft.store.SnapshotStore.DeleteRef])],
      cellF: Long => Boolean)
      : Seq[Either[(Array[Long], Array[Array[Long]]), Array[Long]]] =
    events.map {
      case (_, Left(seg)) =>
        val rows0 = db.spark.read.parquet(seg.path)
          .select(org.apache.spark.sql.functions.col("id"),
            org.apache.spark.sql.functions.col("vector")).collect()
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
          .select(org.apache.spark.sql.functions.col("id"))
          .collect().map(_.getLong(0)))
    }

  /** Greedy MMR over a best-first popcount pool — shared by
    * [[LocalCodeReplica.searchMmr]] and [[CodeReplicaSet.searchMmr]].
    * The code-tier twin of [[LocalReplica.mmrGreedy]]: relevance is the
    * pool's Hamming distance negated (higher-better canonical units) and
    * the redundancy term is −hamming(cᵢ, cⱼ) between stored codes, kept
    * as a running max per candidate — O(k·fetchK) popcount rows total.
    * Strict-`>` argmax keeps the FIRST pool index on ties (the pool is
    * (distance asc, id asc) sorted), matching the distributed fold's
    * `array_position`. `fetchCode` resolves a candidate's stored code
    * (None → vanished under a concurrent mutation; dropped).
    */
  private[serve] def mmrGreedyCodes(pool: Seq[Candidate],
      fetchCode: Long => Option[Array[Long]], k: Int, fetchK: Int,
      lambda: Double): Seq[Candidate] = {
    require(fetchK >= k && k > 0, s"candidate pool $fetchK < k $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda out of [0,1]: $lambda")
    val src = pool.toArray
    val ids = new Array[Long](src.length)
    val rels = new Array[Double](src.length)
    val codes = new Array[Array[Long]](src.length)
    var n = 0
    var i = 0
    while (i < src.length) {
      fetchCode(src(i).id) match {
        case Some(c) =>
          ids(n) = src(i).id
          rels(n) = -src(i).score // popcount distance, exact in double
          codes(n) = c
          n += 1
        case None => ()
      }
      i += 1
    }
    if (n == 0) return Nil
    val mu = 1.0 - lambda
    val maxSim = new Array[Double](n)
    val taken = new Array[Boolean](n)
    val out = new Array[Candidate](math.min(k, n))
    var t = 0
    while (t < out.length) {
      var bestI = -1
      var best = Double.NegativeInfinity
      i = 0
      while (i < n) {
        if (!taken(i)) {
          val s = lambda * rels(i) - (if (t == 0) 0.0 else mu * maxSim(i))
          if (s > best) { best = s; bestI = i }
        }
        i += 1
      }
      taken(bestI) = true
      out(t) = Candidate(ids(bestI), best)
      val c = codes(bestI)
      i = 0
      while (i < n) {
        if (!taken(i)) {
          var d = 0L
          var w = 0
          while (w < c.length) {
            d += java.lang.Long.bitCount(codes(i)(w) ^ c(w)); w += 1
          }
          val sim = -d.toDouble
          if (t == 0 || sim > maxSim(i)) maxSim(i) = sim
        }
        i += 1
      }
      t += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  /** One immutable mutation snapshot (see [[LocalReplica.Mut]]). */
  private[serve] final class Mut(
      val tombstones: Array[Long],
      val deltaIds: Array[Long],
      val deltaFlat: Array[Long])

  /** Per-thread lexical accumulator: `acc(row)` is valid iff
    * `gen(row) == ` the current generation — bumping the generation
    * "clears" both O(size) arrays in O(1). `touched` grows on demand and
    * holds the rows this query scored.
    */
  private[serve] final class LexScratch(n: Int) {
    val acc = new Array[Double](n)
    val gen = new Array[Int](n)
    var touched = new Array[Int](256)
    private var g = 0
    def nextGen(): Int = {
      // wrap guard: after 2^31-1 generations the counter would revisit
      // stamps still present in gen() (0 especially — the never-touched
      // default), silently corrupting pools; one real fill restores the
      // invariant
      if (g == Int.MaxValue) { java.util.Arrays.fill(gen, 0); g = 0 }
      g += 1; g
    }
    /** Append `row` at slot `i`, growing if needed; returns i+1. */
    def touch(i: Int, row: Int): Int = {
      if (i == touched.length)
        touched = java.util.Arrays.copyOf(touched, i * 2)
      touched(i) = row
      i + 1
    }
  }

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
      require(ver >= 1 && ver <= FormatVersion,
        s"code-replica format version $ver unsupported")
      val bits = in.readInt()
      val words = in.readInt()
      val n = in.readInt()
      require(bits > 0 && words == (bits + 31) / 32 && n > 0,
        s"corrupt code replica header: bits=$bits words=$words n=$n")
      val ids = LocalReplica.readLongs(in, n)
      val flat = LocalReplica.readLongs(in, n * words)
      val meta: Array[LocalReplica.MetaColumn] =
        if (ver < 2) Array.empty
        else {
          val count = in.readInt()
          require(count >= 0 && count <= 4096,
            s"corrupt code replica: metadata column count $count")
          Array.fill(count) {
            val name = in.readUTF()
            val kind = in.readByte()
            require(kind >= LocalReplica.MetaLong &&
              kind <= LocalReplica.MetaString,
              s"corrupt code replica: metadata column `$name` kind $kind")
            val nulls = new Array[Boolean](n)
            var i = 0
            while (i < n) { nulls(i) = in.readBoolean(); i += 1 }
            kind match {
              case LocalReplica.MetaString =>
                val ss = new Array[String](n)
                i = 0
                while (i < n) {
                  val s = in.readUTF()
                  ss(i) = if (nulls(i)) null else s
                  i += 1
                }
                new LocalReplica.MetaColumn(name, kind, null, null, ss, nulls)
              case LocalReplica.MetaDouble =>
                val ds = new Array[Double](n)
                i = 0
                while (i < n) { ds(i) = in.readDouble(); i += 1 }
                new LocalReplica.MetaColumn(name, kind, null, ds, null, nulls)
              case _ =>
                val ls = LocalReplica.readLongs(in, n)
                new LocalReplica.MetaColumn(name, kind, ls, null, null, nulls)
            }
          }
        }
      val lex: LocalReplica.LexData =
        if (ver < 3 || !in.readBoolean()) null
        else {
          val v = in.readInt()
          require(v >= 0 && v <= 100000000,
            s"corrupt code replica: vocab size $v")
          val terms = Array.fill(v)(in.readUTF())
          val postStart = new Array[Int](v + 1)
          var t = 0
          while (t <= v) { postStart(t) = in.readInt(); t += 1 }
          val nPost = postStart(v)
          require(nPost >= 0, s"corrupt code replica: $nPost postings")
          val postRow = new Array[Int](nPost)
          var i = 0
          while (i < nPost) { postRow(i) = in.readInt(); i += 1 }
          val postTf = new Array[Float](nPost)
          i = 0
          while (i < nPost) { postTf(i) = in.readFloat(); i += 1 }
          val docLen = new Array[Int](n)
          i = 0
          while (i < n) { docLen(i) = in.readInt(); i += 1 }
          val numDocs = in.readLong()
          val avgdl = in.readDouble()
          new LocalReplica.LexData(terms, postStart, postRow, postTf,
            docLen, numDocs, avgdl)
        }
      new LocalCodeReplica(bits, words, ids, flat, meta, lex)
    } finally in.close()
  }

  /** Build a replica from raw JVM arrays — the no-Spark rebuild
    * [[CodeReplicaSet.reshard]] moves rows through (flat scan layout,
    * like every code replica — no clustering to rebuild).
    */
  private[serve] def fromArrays(bits: Int, words: Int, ids: Array[Long],
      flat: Array[Long],
      meta: Array[LocalReplica.MetaColumn] = Array.empty,
      lexCarry: LocalReplica.LexCarry = null): LocalCodeReplica = {
    require(ids.nonEmpty, "fromArrays: no rows")
    require(flat.length == ids.length * words,
      s"fromArrays: flat has ${flat.length} words, " +
        s"expected ${ids.length * words}")
    new LocalCodeReplica(bits, words, ids, flat, meta,
      LocalReplica.lexOf(lexCarry, null, ids.length))
  }

  /** Export from any (id, array<long> codes) DataFrame. `bits` documents
    * the code width (= Hamming store `dim`); rows must pack
    * `ceil(bits/32)` words like [[graft.index.BQ.packCol]]. `metaCols`
    * ships typed metadata columns (normalized long/double/string, the
    * float tier's contract) as group keys for
    * [[LocalCodeReplica#searchGrouped]] and [[LocalCodeReplica#searchWhere]]
    * predicates; `textCol` ships a compact lexical postings section for
    * [[LocalCodeReplica#lexicalSearch]]/[[LocalCodeReplica#hybridSearch]].
    */
  def fromDataFrame(df: DataFrame, codeCol: String, idCol: String, bits: Int,
      maxRows: Long = LocalReplica.DefaultMaxRows,
      metaCols: Seq[String] = Nil,
      textCol: Option[String] = None): LocalCodeReplica = {
    import org.apache.spark.sql.types._
    val metaKinds: Array[Byte] = metaCols.map { name =>
      df.schema(name).dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          LocalReplica.MetaLong
        case FloatType | DoubleType => LocalReplica.MetaDouble
        case StringType => LocalReplica.MetaString
        case other => throw new IllegalArgumentException(
          s"metadata column `$name` has unsupported type $other " +
            "(integral, float, or string)")
      }
    }.toArray
    val metaExprs = metaCols.zip(metaKinds).map { case (name, kind) =>
      (kind match {
        case LocalReplica.MetaString => col(name).cast("string")
        case LocalReplica.MetaDouble => col(name).cast("double")
        case _ => col(name).cast("long")
      }).as(name)
    }
    val textExpr = textCol.map(tc => col(tc).cast("string").as(tc)).toSeq
    val rows = df.select(
      col(idCol).cast("long") +: col(codeCol) +: (metaExprs ++ textExpr): _*)
      .collect()
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
    val meta: Array[LocalReplica.MetaColumn] =
      metaCols.zipWithIndex.map { case (name, j) =>
        val kind = metaKinds(j)
        val fld = 2 + j
        val nulls = new Array[Boolean](n)
        val longs =
          if (kind == LocalReplica.MetaLong) new Array[Long](n) else null
        val doubles =
          if (kind == LocalReplica.MetaDouble) new Array[Double](n) else null
        val strings =
          if (kind == LocalReplica.MetaString) new Array[String](n) else null
        var i = 0
        while (i < n) {
          val row = rows(i)
          if (row.isNullAt(fld)) nulls(i) = true
          else kind match {
            case LocalReplica.MetaString => strings(i) = row.getString(fld)
            case LocalReplica.MetaDouble => doubles(i) = row.getDouble(fld)
            case _ => longs(i) = row.getLong(fld)
          }
          i += 1
        }
        new LocalReplica.MetaColumn(name, kind, longs, doubles, strings,
          nulls)
      }.toArray
    val lex: LocalReplica.LexData = textCol match {
      case None => null
      case Some(_) =>
        val fld = 2 + metaCols.length
        val texts = new Array[String](n)
        var i = 0
        while (i < n) {
          if (!rows(i).isNullAt(fld)) texts(i) = rows(i).getString(fld)
          i += 1
        }
        LocalReplica.buildLexFromTexts(texts)
    }
    new LocalCodeReplica(bits, words, ids, flat, meta, lex)
  }

  /** Export from a Hamming engine snapshot. */
  def fromStore(db: GraftDB,
      maxRows: Long = LocalReplica.DefaultMaxRows,
      metaCols: Seq[String] = Nil,
      textCol: Option[String] = None): LocalCodeReplica = {
    require(db.metric == Metric.Hamming,
      s"LocalCodeReplica serves Hamming stores (store is ${db.config.metric}); " +
        "float metrics go through LocalReplica")
    val v = db.effectiveVersion
    val rep = fromDataFrame(db.store.read(v), "vector", "id",
      db.config.dim, maxRows, metaCols, textCol)
    db.store.manifest(v).foreach { m =>
      rep.origin = LocalReplica.Origin(db.store.root, v,
        m.segments.map(_.path).toSet, m.deletes.map(_.path).toSet)
    }
    rep
  }
}
