package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}

import graft.GraftDB
import graft.types.{Candidate, Metric}

/** The Hamming twin of [[ReplicaSet]]: a shard router over per-shard
  * [[LocalCodeReplica]]s. Popcount distances are integers, so the merge
  * contract is even simpler than the float router's — per-shard top-k
  * pools merged under (distance asc, id asc) are EXACTLY the global
  * ranking for any partitioning of the rows. Same mutation discipline
  * (whole-batch validation before any shard mutates, broadcast deletes,
  * cell-aligned appends, two-phase upsert), same set-level CDC
  * ([[refreshFrom]] partitions the store diff by hash cell), same
  * directory persistence.
  */
final class CodeReplicaSet private (val shards: IndexedSeq[LocalCodeReplica]) {
  require(shards.nonEmpty, "a CodeReplicaSet needs at least one shard")
  val bits: Int = shards.head.bits
  val words: Int = shards.head.words
  require(shards.forall(s => s.bits == bits && s.words == words),
    "all shards must share one code width")

  // hash-cell layout when built by fromDataFrame/fromStore (see
  // ReplicaSet.cellsTotal)
  private[serve] var cellsTotal: Int = 0
  private[serve] var cellOfShard: IndexedSeq[Int] = null

  private lazy val cellToShard: Array[Int] = {
    val m = Array.fill(cellsTotal)(-1)
    cellOfShard.zipWithIndex.foreach { case (c, i) => m(c) = i }
    m
  }

  def numShards: Int = shards.length
  def size: Int = shards.map(_.size).sum
  def liveSize: Int = shards.map(_.liveSize).sum

  private def mergeK(pools: Array[Seq[Candidate]], k: Int): Seq[Candidate] = {
    // primitive (score, id) arrays + the shared rank sort (Hamming is
    // ascending) — the boxed sortWith twin of ReplicaSet.mergeK
    var n = 0
    var p = 0
    while (p < pools.length) { n += pools(p).length; p += 1 }
    val sc = new Array[Double](n)
    val ids = new Array[Long](n)
    var i = 0
    p = 0
    while (p < pools.length) {
      val it = pools(p).iterator
      while (it.hasNext) {
        val c = it.next()
        sc(i) = c.score; ids(i) = c.id; i += 1
      }
      p += 1
    }
    LocalReplica.sortRank(sc, ids, null, n, asc = true)
    val out = new Array[Candidate](math.min(k, n))
    i = 0
    while (i < out.length) { out(i) = Candidate(ids(i), sc(i)); i += 1 }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  /** Top-k nearest codes across every shard. */
  def search(q: Array[Long], k: Int): Seq[Candidate] = {
    if (shards.length == 1) return shards(0).search(q, k)
    val pools = new Array[Seq[Candidate]](shards.length)
    java.util.stream.IntStream.range(0, shards.length).parallel()
      .forEach(i => pools(i) = shards(i).search(q, k))
    mergeK(pools, k)
  }

  /** All codes within `threshold` bits across shards, best-first, capped
    * at `maxResults`.
    */
  def searchThreshold(q: Array[Long], threshold: Long,
      maxResults: Int = Int.MaxValue): Seq[Candidate] = {
    val pools = new Array[Seq[Candidate]](shards.length)
    java.util.stream.IntStream.range(0, shards.length).parallel()
      .forEach(i => pools(i) = shards(i).searchThreshold(q, threshold,
        maxResults))
    mergeK(pools, if (maxResults == Int.MaxValue) Int.MaxValue else maxResults)
  }

  /** Typed-predicate top-k ([[LocalCodeReplica.searchWhere]] per shard —
    * shards must carry the referenced metadata columns; integer scores
    * make the merged page exactly the global filtered ranking).
    */
  def searchWhere(q: Array[Long], k: Int,
      filters: Seq[graft.types.Filter]): Seq[Candidate] = {
    val pools = new Array[Seq[Candidate]](shards.length)
    java.util.stream.IntStream.range(0, shards.length).parallel()
      .forEach(i => pools(i) = shards(i).searchWhere(q, k, filters))
    mergeK(pools, k)
  }

  /** Diversity-capped (grouped) top-k across shards — the Hamming twin
    * of [[ReplicaSet.searchGrouped]]: the pool is the normal
    * scatter-gather merge, the per-group cap runs ONCE at the router
    * with group keys resolved through the shard owning each id, so a
    * group split across shards is capped globally, not per shard. Pool
    * deepening mirrors the single-replica rule.
    */
  def searchGrouped(q: Array[Long], k: Int, groupCol: String,
      perGroup: Int): Seq[Candidate] =
    LocalReplica.groupedDeepen(fetchK => search(q, fetchK),
      LocalReplica.firstKeyOf(shards.map(_.groupKeyOf(groupCol))),
      k, perGroup)

  /** MMR-diversified top-k across shards — the Hamming twin of
    * [[ReplicaSet.searchMmr]]: the `fetchK` pool is the normal
    * scatter-gather merge, the popcount-similarity greedy then runs once
    * at the router with codes resolved through the shard owning each id.
    * Identical semantics to [[LocalCodeReplica.searchMmr]].
    */
  def searchMmr(q: Array[Long], k: Int, fetchK: Int,
      lambda: Double): Seq[Candidate] = {
    val pool = search(q, fetchK)
    LocalCodeReplica.mmrGreedyCodes(pool, get, k, fetchK, lambda)
  }

  /** Per-query top-k for a batch — positional merge of per-shard batches
    * (each shard answers under ONE snapshot).
    */
  def batchSearch(queries: Seq[(Long, Array[Long])],
      k: Int): Seq[(Long, Seq[Candidate])] = {
    val perShard: IndexedSeq[IndexedSeq[(Long, Seq[Candidate])]] =
      shards.map(_.batchSearch(queries, k).toIndexedSeq)
    val qs = queries.toIndexedSeq
    qs.indices.map { i =>
      qs(i)._1 ->
        mergeK(Array.tabulate(shards.length)(s => perShard(s)(i)._2), k)
    }
  }

  /** Point lookup by id across shards. */
  def get(id: Long): Option[Array[Long]] = {
    var i = 0
    while (i < shards.length) {
      val v = shards(i).get(id)
      if (v.isDefined) return v
      i += 1
    }
    None
  }

  def delete(delIds: Array[Long]): Int = this.synchronized {
    shards.map(_.delete(delIds)).sum
  }

  @inline private def shardOf(id: Long): Int = {
    if (cellsTotal > 0) {
      val s = cellToShard(ReplicaSet.cellOf(id, cellsTotal))
      if (s >= 0) return s
    }
    var h = id
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    (((h % shards.length) + shards.length) % shards.length).toInt
  }

  /** Whole-batch validation before any shard mutates (see
    * [[ReplicaSet]]): alignment, duplicates, membership, code width.
    */
  private def validateBatch(newIds: Array[Long], codes: Array[Array[Long]],
      requireAbsent: Boolean): Unit = {
    require(newIds.length == codes.length,
      s"ids (${newIds.length}) and codes (${codes.length}) must align")
    val seen = new java.util.HashSet[Long]()
    var i = 0
    while (i < newIds.length) {
      val id = newIds(i)
      require(seen.add(id), s"duplicate id $id in batch")
      if (requireAbsent)
        require(!shards.exists(_.hasLive(id)),
          s"id $id is already live in the set (delete/upsert first)")
      val c = codes(i)
      require(c != null && c.length == words,
        s"code row for id $id has ${if (c == null) -1 else c.length} " +
          s"words, expected $words")
      i += 1
    }
  }

  /** Append code rows searchable immediately, cell-routed. */
  def append(newIds: Array[Long], codes: Array[Array[Long]]): Unit =
    this.synchronized {
      validateBatch(newIds, codes, requireAbsent = true)
      appendRouted(newIds, codes)
    }

  private def appendRouted(newIds: Array[Long],
      codes: Array[Array[Long]]): Unit = {
    val byShard = Array.fill(shards.length)(
      new scala.collection.mutable.ArrayBuffer[Int]())
    var i = 0
    while (i < newIds.length) { byShard(shardOf(newIds(i))) += i; i += 1 }
    var s = 0
    while (s < shards.length) {
      val idx = byShard(s)
      if (idx.nonEmpty)
        shards(s).append(idx.map(newIds).toArray, idx.map(codes).toArray)
      s += 1
    }
  }

  /** Broadcast-delete + routed-append (validated first — see
    * [[ReplicaSet.upsert]] for the cross-shard atomicity contract).
    */
  def upsert(upIds: Array[Long], codes: Array[Array[Long]]): Unit =
    this.synchronized {
      if (shards.length == 1) { shards(0).upsert(upIds, codes); return }
      validateBatch(upIds, codes, requireAbsent = false)
      delete(upIds)
      appendRouted(upIds, codes)
    }

  /** Per-shard manifest-diff CDC with each shard's cell filter (see
    * [[ReplicaSet.refreshFrom]]).
    */
  def refreshFrom(db: GraftDB,
      maxNewRows: Long = 1000000L): LocalReplica.RefreshStats =
    this.synchronized {
      require(cellsTotal == shards.length,
        "set is not refresh-capable: it was assembled directly or an " +
          "export hash cell was empty (tiny corpus) — re-export via " +
          "CodeReplicaSet.fromStore on a corpus that populates every cell")
      // Shared-read refresh (see [[ReplicaSet.refreshFrom]]): one read of
      // each new file, rows routed to shards by their hash-cell filters;
      // per-shard refreshes (S reads of the same parquet) only when the
      // shards' baselines diverged.
      val o0 = shards(0).origin
      val oneCut = o0 != null && shards.forall(_.origin == o0) &&
        (shards.length == 1 || shards.forall(_.originCellFilter != null))
      val stats =
        if (oneCut) {
          LocalReplica.refreshDiff(db, o0, maxNewRows) match {
            case None =>
              return LocalReplica.RefreshStats(0, 0, o0.version, o0.version)
            case Some(d) =>
              val all = LocalCodeReplica.readRefreshBatches(db, d.events, null)
              shards.map { s =>
                val f = s.originCellFilter
                val mine = all.map {
                  case Left((ids, codes)) if f != null =>
                    val keep = Array.newBuilder[Int]
                    var i = 0
                    while (i < ids.length) {
                      if (f(ids(i))) keep += i
                      i += 1
                    }
                    val idx = keep.result()
                    Left((idx.map(ids), idx.map(codes)))
                  case other => other
                }
                s.applyRefreshBatches(o0, d, mine)
              }
          }
        } else shards.map(_.refreshFrom(db, maxNewRows))
      var app = 0
      var del = 0
      var from = Long.MaxValue
      var to = Long.MinValue
      stats.foreach { st =>
        app += st.appended
        del += st.deleted
        from = math.min(from, st.fromVersion)
        to = math.max(to, st.toVersion)
      }
      LocalReplica.RefreshStats(app, del, from, to)
    }

  /** Re-partition the LIVE set into `newShards` hash-cell shards — the
    * Hamming twin of [[ReplicaSet.reshard]]: every shard's live rows
    * (mutations folded) re-route by `cellOf(id, newShards)` into fresh
    * flat replicas (no clustering to rebuild at 8-64 bytes/row), so the
    * new set answers identically, appends route by the new cells, and
    * the refresh baseline survives a single-snapshot-cut set.
    */
  def reshard(newShards: Int): CodeReplicaSet = this.synchronized {
    require(newShards >= 1, s"newShards must be >= 1, got $newShards")
    val extracted = shards.map(_.liveRows())
    // metadata schema must agree across shards (one export produced them)
    val metaSchema = extracted.head._4.map(c => (c.name, c.kind)).toSeq
    require(extracted.forall(_._4.map(c => (c.name, c.kind)).toSeq
      == metaSchema),
      "reshard: shards disagree on exported metadata columns")
    // lexical carries through only when EVERY shard serves it (the
    // same all-or-nothing rule as ReplicaSet.reshard)
    val carryLex = shards.forall(_.lexical)
    val counts = new Array[Int](newShards)
    extracted.foreach { case (ids, _, _, _) =>
      var i = 0
      while (i < ids.length) {
        counts(ReplicaSet.cellOf(ids(i), newShards)) += 1
        i += 1
      }
    }
    val pIds = Array.tabulate(newShards)(c => new Array[Long](counts(c)))
    val pFlat =
      Array.tabulate(newShards)(c => new Array[Long](counts(c) * words))
    // per-cell metadata columns, moved in the same pass as the codes
    val pMeta: Array[Array[LocalReplica.MetaColumn]] =
      Array.tabulate(newShards) { c =>
        metaSchema.map { case (name, kind) =>
          val n = counts(c)
          new LocalReplica.MetaColumn(name, kind,
            if (kind == LocalReplica.MetaLong) new Array[Long](n) else null,
            if (kind == LocalReplica.MetaDouble) new Array[Double](n)
            else null,
            if (kind == LocalReplica.MetaString) new Array[String](n)
            else null,
            new Array[Boolean](n))
        }.toArray
      }
    val pDocLen =
      if (!carryLex) null
      else Array.tabulate(newShards)(c => new Array[Int](counts(c)))
    val pNumDocs = new Array[Long](newShards)
    val pPost =
      if (!carryLex) null
      else Array.fill(newShards)(new java.util.TreeMap[String,
        scala.collection.mutable.ArrayBuffer[(Int, Float)]]())
    val w = new Array[Int](newShards)
    extracted.zip(shards).foreach { case ((ids, flat, mainOldOf, meta), sh) =>
      val lex = if (carryLex) sh.lexData else null
      // old MAIN row -> (cell, new input index) for the postings re-split
      val cellOfOld = if (carryLex) new Array[Int](lex.docLen.length) else null
      val idxOfOld = if (carryLex) new Array[Int](lex.docLen.length) else null
      if (carryLex) java.util.Arrays.fill(cellOfOld, -1)
      var i = 0
      while (i < ids.length) {
        val c = ReplicaSet.cellOf(ids(i), newShards)
        pIds(c)(w(c)) = ids(i)
        System.arraycopy(flat, i * words, pFlat(c), w(c) * words, words)
        if (carryLex && mainOldOf(i) >= 0 && lex.docLen(mainOldOf(i)) > 0) {
          pDocLen(c)(w(c)) = lex.docLen(mainOldOf(i))
          pNumDocs(c) += 1
          cellOfOld(mainOldOf(i)) = c
          idxOfOld(mainOldOf(i)) = w(c)
        }
        var m = 0
        while (m < meta.length) {
          val srcC = meta(m); val dstC = pMeta(c)(m)
          dstC.nulls(w(c)) = srcC.nulls(i)
          srcC.kind match {
            case LocalReplica.MetaString =>
              dstC.strings(w(c)) = srcC.strings(i)
            case LocalReplica.MetaDouble =>
              dstC.doubles(w(c)) = srcC.doubles(i)
            case _ => dstC.longs(w(c)) = srcC.longs(i)
          }
          m += 1
        }
        w(c) += 1
        i += 1
      }
      if (carryLex) {
        // re-split this shard's postings by the rows' new cells (dead
        // rows have cellOfOld == -1 and drop out)
        var t = 0
        while (t < lex.terms.length) {
          val term = lex.terms(t)
          var p = lex.postStart(t)
          val hi = lex.postStart(t + 1)
          while (p < hi) {
            val r = lex.postRow(p)
            val c = cellOfOld(r)
            if (c >= 0) {
              var buf = pPost(c).get(term)
              if (buf == null) {
                buf = new scala.collection.mutable.ArrayBuffer[(Int, Float)]()
                pPost(c).put(term, buf)
              }
              buf += ((idxOfOld(r), lex.postTf(p)))
            }
            p += 1
          }
          t += 1
        }
      }
    }
    val present = (0 until newShards).filter(counts(_) > 0)
    require(present.nonEmpty, "reshard: the set has no live rows")
    val reps = present.map { c =>
      // a cell with zero texted docs still carries an (empty) section:
      // `lexical` survives the reshard, matching a fresh export
      val carry =
        if (!carryLex) null
        else new LocalReplica.LexCarry(pDocLen(c), pPost(c), pNumDocs(c))
      LocalCodeReplica.fromArrays(bits, words, pIds(c), pFlat(c), pMeta(c),
        lexCarry = carry)
    }
    val set = new CodeReplicaSet(reps.toIndexedSeq)
    set.cellsTotal = newShards
    set.cellOfShard = present.toIndexedSeq
    val origins = shards.map(_.origin)
    if (origins.forall(_ != null) && origins.distinct.size == 1) {
      reps.indices.foreach { i =>
        val c = present(i)
        reps(i).origin = origins.head
        reps(i).originCellFilter =
          id => ReplicaSet.cellOf(id, newShards) == c
      }
    }
    set
  }

  // ------------------------------------------ cross-shard lexical / hybrid
  // The Hamming twins of [[ReplicaSet]]'s global-stats exchange: document
  // counts, total token length, and per-query-term df sum EXACTLY across
  // shards, so every shard scores BM25 under corpus-level idf/avgdl and
  // the merged pools are bit-identical to a single global replica's.

  /** Whether every shard carries a lexical postings section. */
  def lexical: Boolean = shards.forall(_.lexical)

  private lazy val globalLexStats: (Long, Double) = {
    require(lexical,
      "a shard carries no lexical section — export with textCol to serve " +
        "sharded BM25/hybrid")
    LocalReplica.lexCorpusStats(shards.map(_.lexData))
  }

  private def globalFor(terms: Seq[String]): LocalReplica.GlobalLex = {
    val (nd, avgdl) = globalLexStats
    LocalReplica.globalLexFor(terms, t => {
      var df = 0.0
      shards.foreach(s => df += s.termDf(t))
      df
    }, nd, avgdl)
  }

  private def mergeLex(pools: Seq[Seq[(Long, Double)]],
      m: Int): Seq[(Long, Double)] = LocalReplica.mergeLexPools(pools, m)

  /** Cross-shard BM25 top-k — identical scores and order to a single
    * code replica over the whole corpus (global-stats exchange, not a
    * naive per-shard-idf merge).
    */
  def lexicalSearch(textQuery: String, k: Int): Seq[Candidate] = {
    if (shards.length == 1) return shards(0).lexicalSearch(textQuery, k)
    val g = globalFor(graft.lexical.BM25.tokenizeQuery(textQuery))
    val pools = new Array[Seq[(Long, Double)]](shards.length)
    java.util.stream.IntStream.range(0, shards.length).parallel()
      .forEach { i =>
        pools(i) = shards(i).lexicalPoolSnap(textQuery, k,
          shards(i).snapshotMut, g)
      }
    mergeLex(pools.toIndexedSeq, k).map { case (id, s) => Candidate(id, s) }
  }

  /** The plain and filtered hybrids' shared skeleton: snapshots pinned
    * per shard, the lexical side (global exchange + per-shard pools +
    * merge) overlapping the popcount fan-out on a ForkJoin task, shared
    * RRF fuse. The callers differ only in the two per-shard pool
    * functions — ONE copy of the overlap/exchange structure, so a fix to
    * it cannot fork across the verbs.
    */
  private def hybridFused(textQuery: String, k: Int, rrfK: Int,
      lexPool: (Int, LocalCodeReplica.Mut, Int,
        LocalReplica.GlobalLex) => Seq[(Long, Double)],
      vecPool: (Int, LocalCodeReplica.Mut, Int) => Seq[Candidate])
      : Seq[Candidate] = {
    require(lexical,
      "a shard carries no lexical section — export with textCol to serve " +
        "sharded BM25/hybrid")
    val m = math.max(2 * k, 50)
    val snaps = shards.map(_.snapshotMut)
    val lexTask = LocalReplica.overlap {
      val g = globalFor(graft.lexical.BM25.tokenizeQuery(textQuery))
      val lPools = new Array[Seq[(Long, Double)]](shards.length)
      java.util.stream.IntStream.range(0, shards.length).parallel()
        .forEach(i => lPools(i) = lexPool(i, snaps(i), m, g))
      mergeLex(lPools.toIndexedSeq, m)
    }
    val vPool = LocalReplica.joinedWithOverlap(lexTask) {
      val vPools = new Array[Seq[Candidate]](shards.length)
      java.util.stream.IntStream.range(0, shards.length).parallel()
        .forEach(i => vPools(i) = vecPool(i, snaps(i), m))
      mergeK(vPools, m).map(c => (c.id, c.score))
    }
    LocalReplica.rrfFuse(vPool, LocalReplica.joinOverlap(lexTask), k, rrfK)
  }

  /** Cross-shard hybrid RRF on the code tier — the Hamming twin of
    * [[ReplicaSet.hybridSearch]]: the vector pool is the exact global
    * popcount top-m (integer scores — per-shard top-m merged under the
    * total (distance asc, id asc) order IS the global top-m, no rounded
    * ties to deepen), the lexical pool is the global-stats BM25 top-m,
    * and the fuse is the shared RRF math. One mutation snapshot is
    * pinned per shard for both pools.
    */
  def hybridSearch(q: Array[Long], textQuery: String, k: Int,
      rrfK: Int = 60): Seq[Candidate] = {
    if (shards.length == 1)
      return shards(0).hybridSearch(q, textQuery, k, rrfK)
    hybridFused(textQuery, k, rrfK,
      (i, snap, m, g) => shards(i).lexicalPoolSnap(textQuery, m, snap, g),
      (i, snap, m) => shards(i).searchSnap(q, m, snap))
  }

  /** Cross-shard FILTERED Hamming hybrid
    * ([[LocalCodeReplica.hybridSearchWhere]] lifted to the router):
    * typed predicates restrict both pools on every shard (compiled ONCE
    * per shard, fed to both), corpus stats stay global, integer vector
    * scores make the merged filtered top-m exactly the global one.
    */
  def hybridSearchWhere(q: Array[Long], textQuery: String, k: Int,
      filters: Seq[graft.types.Filter],
      rrfK: Int = 60): Seq[Candidate] = {
    if (filters.isEmpty) return hybridSearch(q, textQuery, k, rrfK)
    if (shards.length == 1)
      return shards(0).hybridSearchWhere(q, textQuery, k, filters, rrfK)
    val preds = shards.map(_.compiledPredsOf(filters))
    hybridFused(textQuery, k, rrfK,
      (i, snap, m, g) =>
        shards(i).lexicalPoolSnapWhere(textQuery, m, snap, g, preds(i)),
      (i, snap, m) => shards(i).searchWhereSnap(q, m, preds(i), snap))
  }

  /** Persist as per-shard GRCR artifacts + a routing manifest (see
    * [[ReplicaSet.save]]).
    */
  def save(dir: String,
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    fs.mkdirs(p)
    shards.indices.foreach(i => shards(i).save(s"$dir/shard-$i.grcr", conf))
    val cells =
      if (cellOfShard == null) Seq.fill(shards.length)(-1) else cellOfShard
    val json = s"""{"shards":${shards.length},"cellsTotal":$cellsTotal,""" +
      s""""cells":[${cells.mkString(",")}]}"""
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/set.json"), true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}

object CodeReplicaSet {

  def apply(shards: Seq[LocalCodeReplica]): CodeReplicaSet =
    new CodeReplicaSet(shards.toIndexedSeq)

  /** Load a set saved by [[CodeReplicaSet#save]]. */
  def load(dir: String,
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): CodeReplicaSet = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/set.json")
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val json = try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var r = in.read(buf)
      while (r >= 0) { bos.write(buf, 0, r); r = in.read(buf) }
      new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val parsed = org.json4s.jackson.JsonMethods.parse(json)
    val n = (parsed \ "shards").extract[Int]
    val cellsTotal = (parsed \ "cellsTotal").extract[Int]
    val cells = (parsed \ "cells").extract[Seq[Int]]
    require(n >= 1 && cells.length == n,
      s"corrupt set manifest: shards=$n cells=${cells.length}")
    val set = new CodeReplicaSet(
      (0 until n).map(i => LocalCodeReplica.load(s"$dir/shard-$i.grcr", conf)))
    if (cellsTotal > 0 && cells.forall(_ >= 0)) {
      set.cellsTotal = cellsTotal
      set.cellOfShard = cells.toIndexedSeq
    }
    set
  }

  /** Export one code replica per xxhash64 cell (see
    * [[ReplicaSet.fromDataFrame]] — one counts pass + cached per-cell
    * collects; empty cells are skipped).
    */
  def fromDataFrame(df: DataFrame, codeCol: String, idCol: String,
      bits: Int, shards: Int,
      maxRows: Long = LocalReplica.DefaultMaxRows,
      metaCols: Seq[String] = Nil,
      textCol: Option[String] = None): CodeReplicaSet = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val cell = pmod(xxhash64(col(idCol)), lit(shards))
    val cached = df.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val present = cached.groupBy(cell.as("cell")).count()
        .collect().map(_.getLong(0)).sorted
      require(present.nonEmpty,
        "cannot build a CodeReplicaSet from an empty frame")
      val reps = present.toIndexedSeq.map { s =>
        LocalCodeReplica.fromDataFrame(cached.where(cell === lit(s)),
          codeCol, idCol, bits, maxRows, metaCols, textCol)
      }
      val set = new CodeReplicaSet(reps)
      set.cellsTotal = shards
      set.cellOfShard = present.toIndexedSeq.map(_.toInt)
      set
    } finally { cached.unpersist(); () }
  }

  /** Export a sharded Hamming serving set from an engine snapshot; on
    * full cell coverage each shard records the exported file set plus
    * its cell, enabling [[CodeReplicaSet#refreshFrom]].
    */
  def fromStore(db: GraftDB, shards: Int,
      maxRows: Long = LocalReplica.DefaultMaxRows,
      metaCols: Seq[String] = Nil,
      textCol: Option[String] = None): CodeReplicaSet = {
    require(db.metric == Metric.Hamming,
      s"CodeReplicaSet serves Hamming stores (store is ${db.config.metric}); " +
        "float metrics go through ReplicaSet")
    val v = db.effectiveVersion
    val set = fromDataFrame(db.store.read(v), "vector", "id",
      db.config.dim, shards, maxRows, metaCols, textCol)
    if (set.shards.length == shards) {
      db.store.manifest(v).foreach { m =>
        val segs = m.segments.map(_.path).toSet
        val dels = m.deletes.map(_.path).toSet
        set.shards.indices.foreach { i =>
          val c = set.cellOfShard(i)
          set.shards(i).origin =
            LocalReplica.Origin(db.store.root, v, segs, dels)
          set.shards(i).originCellFilter =
            id => ReplicaSet.cellOf(id, shards) == c
        }
      }
    }
    set
  }
}
