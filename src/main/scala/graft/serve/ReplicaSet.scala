package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}

import graft.GraftDB
import graft.types.{Candidate, Metric}

/** Shard router over per-shard [[LocalReplica]] artifacts — the code for
  * the 100 TB serving story the single replica only documents: "export one
  * replica per shard/tenant/partition and route queries shard-side". A
  * query fans out to every shard (each shard's scan stays sequential —
  * the cross-shard fan-out is the parallel level), and the per-shard
  * top-k pools merge under the SAME (score, id) ordering every other
  * surface uses, so a ReplicaSet over any partitioning of the rows
  * answers IDENTICALLY to one replica holding them all (gated in
  * `ReplicaSetSpec` and the `graftdb_local_sharded` oracle row).
  *
  * In production the shards of a 100 TB corpus live in many processes
  * and the fan-out is an RPC scatter-gather; this class is the
  * single-process twin that fixes the merge semantics (and serves the
  * fits-on-one-box multi-tenant case directly). It deliberately has no
  * opinion about WHERE a row lives: ids must be unique across shards
  * (the exporters partition by id hash), but mutations preserve that
  * invariant for ANY placement — deletes broadcast (tombstone flips are
  * cheap), appends route by id hash, and upsert is broadcast-delete +
  * routed-append, so a re-appended row never ends up live in two shards.
  *
  * Lexical/hybrid fan-out does a GLOBAL-STATS EXCHANGE first (the
  * distributed-IR move naive scatter-gather skips): document counts,
  * total token length, and per-query-term df sum exactly across shards,
  * so every shard scores BM25 under the corpus-level idf/avgdl and the
  * merged pools are bit-identical to a single global replica's — not
  * merely rank-comparable. Filtered hybrid stays engine-side
  * (`GraftDB.hybridSearch` + pushdown).
  */
final class ReplicaSet private (val shards: IndexedSeq[LocalReplica]) {
  require(shards.nonEmpty, "a ReplicaSet needs at least one shard")
  val metric: Metric = shards.head.metric
  val dim: Int = shards.head.dim
  require(shards.forall(s => s.metric == metric && s.dim == dim),
    "all shards must share one metric and dimension")

  // hash-cell layout when built by fromDataFrame/fromStore: the export
  // partitioned ids into `cellsTotal` cells via Spark's xxhash64 and
  // shard i holds cell cellOfShard(i); 0/null on directly-assembled sets
  private[serve] var cellsTotal: Int = 0
  private[serve] var cellOfShard: IndexedSeq[Int] = null

  private lazy val cellToShard: Array[Int] = {
    val m = Array.fill(cellsTotal)(-1)
    cellOfShard.zipWithIndex.foreach { case (c, i) => m(c) = i }
    m
  }

  def numShards: Int = shards.length
  /** Total exported rows across shards (mutations not reflected — same
    * contract as [[LocalReplica.size]]).
    */
  def size: Int = shards.map(_.size).sum

  private def mergeK(pools: Array[Seq[Candidate]], k: Int): Seq[Candidate] = {
    // primitive (score, id) arrays + the shared rank sort — the boxed
    // sortWith version re-boxed every shard candidate on each merge (on
    // tie-deepened hybrid fetches the pools span thousands of rows)
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
    LocalReplica.sortRank(sc, ids, null, n, metric.ascending)
    val out = new Array[Candidate](math.min(k, n))
    i = 0
    while (i < out.length) { out(i) = Candidate(ids(i), sc(i)); i += 1 }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  /** Top-k nearest across every shard. `nprobe` applies per shard (each
    * shard probes its own IVF layout).
    */
  def search(q: Array[Float], k: Int, nprobe: Int = 0): Seq[Candidate] = {
    if (shards.length == 1) return shards(0).search(q, k, nprobe)
    val pools = new Array[Seq[Candidate]](shards.length)
    java.util.stream.IntStream.range(0, shards.length).parallel()
      .forEach(i => pools(i) = shards(i).searchSeq(q, k, nprobe))
    mergeK(pools, k)
  }

  /** Filtered top-k over the allowed id set (pre-filter semantics, exact
    * over survivors — [[LocalReplica.searchFiltered]] per shard).
    */
  def searchFiltered(q: Array[Float], k: Int, allowed: Long => Boolean,
      nprobe: Int = 0): Seq[Candidate] = {
    val pools = new Array[Seq[Candidate]](shards.length)
    java.util.stream.IntStream.range(0, shards.length).parallel()
      .forEach(i => pools(i) = shards(i).searchFiltered(q, k, allowed, nprobe))
    mergeK(pools, k)
  }

  /** Typed-predicate top-k ([[LocalReplica.searchWhere]] per shard —
    * shards must carry the referenced metadata columns).
    */
  def searchWhere(q: Array[Float], k: Int, filters: Seq[graft.types.Filter],
      nprobe: Int = 0): Seq[Candidate] = {
    val pools = new Array[Seq[Candidate]](shards.length)
    java.util.stream.IntStream.range(0, shards.length).parallel()
      .forEach(i => pools(i) = shards(i).searchWhere(q, k, filters, nprobe))
    mergeK(pools, k)
  }

  /** Diversity-capped (grouped) top-k across shards: the pool is the
    * normal scatter-gather merge; the per-group cap runs once at the
    * router with group keys resolved through the shard owning each id
    * ([[LocalReplica.groupedGreedy]]), so a group split across shards is
    * capped globally, not per shard. Pool deepening mirrors the
    * single-replica rule.
    */
  def searchGrouped(q: Array[Float], k: Int, groupCol: String,
      perGroup: Int, nprobe: Int = 0): Seq[Candidate] =
    LocalReplica.groupedDeepen(fetchK => search(q, fetchK, nprobe),
      LocalReplica.firstKeyOf(shards.map(_.groupKeyOf(groupCol))),
      k, perGroup)

  /** MMR-diversified top-k across shards: the `fetchK` pool is the
    * normal scatter-gather merge (each shard's probed scan, best-first
    * merge), the greedy selection then runs once at the router over the
    * merged pool — [[LocalReplica.mmrGreedy]] with vectors resolved
    * through the shard owning each id. Identical semantics to the
    * single-replica [[LocalReplica.searchMmr]].
    */
  def searchMmr(q: Array[Float], k: Int, fetchK: Int, lambda: Double,
      nprobe: Int = 0): Seq[Candidate] = {
    val pool = search(q, fetchK, nprobe)
    LocalReplica.mmrGreedy(pool, get, shards(0).metric.ascending,
      k, fetchK, lambda)
  }

  /** All rows at or better than `threshold` across shards, best-first,
    * capped at `maxResults`.
    */
  def searchThreshold(q: Array[Float], threshold: Double,
      maxResults: Int = Int.MaxValue, nprobe: Int = 0): Seq[Candidate] = {
    val pools = new Array[Seq[Candidate]](shards.length)
    java.util.stream.IntStream.range(0, shards.length).parallel()
      .forEach(i =>
        pools(i) = shards(i).searchThreshold(q, threshold, maxResults, nprobe))
    mergeK(pools, if (maxResults == Int.MaxValue) Int.MaxValue else maxResults)
  }

  /** Per-query top-k for a batch: each shard answers the whole batch
    * under ONE mutation snapshot ([[LocalReplica.batchSearch]] — queries
    * parallel, scans sequential), then the per-shard pools merge per
    * query. Shards run sequentially here: the per-shard batch already
    * saturates the cores.
    */
  def batchSearch(queries: Seq[(Long, Array[Float])], k: Int,
      nprobe: Int = 0): Seq[(Long, Seq[Candidate])] = {
    // positional merge, not a qid-keyed map: query ids may repeat with
    // different vectors, and each position must get ITS vector's answer
    // (the single replica's batchSearch is positional too)
    val perShard: IndexedSeq[IndexedSeq[(Long, Seq[Candidate])]] =
      shards.map(_.batchSearch(queries, k, nprobe).toIndexedSeq)
    val qs = queries.toIndexedSeq
    qs.indices.map { i =>
      qs(i)._1 -> mergeK(Array.tabulate(shards.length)(s => perShard(s)(i)._2), k)
    }
  }

  /** Point lookup by id — checks every shard (ids are unique across
    * shards, so at most one answers).
    */
  def get(id: Long): Option[Array[Float]] = {
    var i = 0
    while (i < shards.length) {
      val v = shards(i).get(id)
      if (v.isDefined) return v
      i += 1
    }
    None
  }

  /** Tombstone-delete ids wherever they live (broadcast — a bitmap flip
    * per shard is cheaper than tracking placement). Returns how many rows
    * were newly tombstoned across shards.
    */
  def delete(delIds: Array[Long]): Int = this.synchronized {
    // set-level mutators serialize on the set (reentrant from upsert), so
    // a delete cannot interleave with append's validate→apply window
    shards.map(_.delete(delIds)).sum
  }

  /** Route an id to its append shard. Exported sets route by the SAME
    * xxhash64 cell the export partitioned on, so a directly-appended row
    * lands in the shard whose [[refreshFrom]] cell filter would later
    * claim it (an append/CDC id collision then fails loudly in that one
    * shard, exactly like the single replica, instead of silently going
    * live twice). Directly-assembled sets fall back to a splitmix64
    * spread — placement is then only deterministic and balanced, and the
    * membership validation enforces uniqueness.
    */
  @inline private def shardOf(id: Long): Int = {
    if (cellsTotal > 0) {
      val s = cellToShard(ReplicaSet.cellOf(id, cellsTotal))
      if (s >= 0) return s
      // the id's cell was empty at export (dropped shard) — spread below
    }
    var h = id
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    (((h % shards.length) + shards.length) % shards.length).toInt
  }

  /** The whole-batch validation every set-level mutation runs BEFORE any
    * shard mutates: id/vector alignment, within-batch duplicates, and the
    * per-vector checks [[LocalReplica.append]] would apply (dim, NaN/Inf,
    * cosine norm). With it, a batch that would fail mid-way is rejected
    * up front instead of leaving earlier shards' appends applied — the
    * set-level twin of the single replica's all-or-nothing snapshot
    * publish (modulo mutators bypassing the set to touch shards
    * directly, which this class does not arbitrate).
    */
  private def validateBatch(newIds: Array[Long],
      vecs: Array[Array[Float]], requireAbsent: Boolean): Unit = {
    require(newIds.length == vecs.length,
      s"ids (${newIds.length}) and vectors (${vecs.length}) must align")
    val seen = new java.util.HashSet[Long]()
    var i = 0
    while (i < newIds.length) {
      val id = newIds(i)
      require(seen.add(id), s"duplicate id $id in batch")
      if (requireAbsent)
        require(!shards.exists(_.hasLive(id)),
          s"id $id is already live in the set (delete/upsert first)")
      val v = vecs(i)
      require(v != null && v.length == dim,
        s"vector for id $id has dim ${if (v == null) -1 else v.length}, " +
          s"expected $dim")
      var norm = 0.0
      var j = 0
      while (j < dim) {
        val x = v(j)
        require(!x.isNaN && !x.isInfinite, s"vector for id $id has NaN/Inf")
        norm += x.toDouble * x
        j += 1
      }
      require(metric != Metric.Cosine || norm > 0.0,
        s"zero-norm vector for id $id under cosine")
      i += 1
    }
  }

  /** Append rows searchable immediately, routed by id hash. The batch is
    * validated against EVERY shard first (the routing hash is independent
    * of export placement, so without the membership check an id already
    * live in another shard would silently go live twice); only a fully
    * valid batch mutates any shard.
    */
  def append(newIds: Array[Long], vecs: Array[Array[Float]]): Unit =
    this.synchronized {
      validateBatch(newIds, vecs, requireAbsent = true)
      appendRouted(newIds, vecs)
    }

  private def appendRouted(newIds: Array[Long],
      vecs: Array[Array[Float]]): Unit = {
    val byShard = Array.fill(shards.length)(
      new scala.collection.mutable.ArrayBuffer[Int]())
    var i = 0
    while (i < newIds.length) { byShard(shardOf(newIds(i))) += i; i += 1 }
    var s = 0
    while (s < shards.length) {
      val idx = byShard(s)
      if (idx.nonEmpty)
        shards(s).append(idx.map(newIds).toArray, idx.map(vecs).toArray)
      s += 1
    }
  }

  /** Broadcast-delete + routed-append: replaces each row wherever its old
    * version lives, so an id is never live in two shards. The batch is
    * fully validated BEFORE the delete, so the delete+append pair cannot
    * fail half-way on bad input. Not atomic ACROSS shards (each shard's
    * snapshot publish is atomic — a concurrent reader may briefly see a
    * row deleted); single-shard sets keep [[LocalReplica.upsert]]'s full
    * atomicity.
    */
  def upsert(upIds: Array[Long], vecs: Array[Array[Float]]): Unit =
    this.synchronized {
      if (shards.length == 1) { shards(0).upsert(upIds, vecs); return }
      validateBatch(upIds, vecs, requireAbsent = false)
      delete(upIds)
      appendRouted(upIds, vecs)
    }

  /** Incremental pull-refresh of every shard from the store the set was
    * exported from ([[LocalReplica.refreshFrom]] with each shard's hash
    * cell filter, so the shards PARTITION the store diff: new rows land
    * only in the shard whose cell claims them, tombstones apply wherever
    * the rows live). Each shard's replay is individually atomic
    * (publish-once with rollback); the set refreshes shard-by-shard, so
    * a concurrent reader can briefly see some shards at the new version
    * and some at the old — the cross-shard analog of upsert's
    * non-atomicity, re-export for a frozen cut.
    */
  def refreshFrom(db: GraftDB,
      maxNewRows: Long = 1000000L): LocalReplica.RefreshStats =
    this.synchronized {
      require(cellsTotal == shards.length,
        "set is not refresh-capable: it was assembled directly or an " +
          "export hash cell was empty (tiny corpus) — re-export via " +
          "ReplicaSet.fromStore on a corpus that populates every cell")
      // Shared-read refresh (guide §2.3 — move the bytes once): every
      // shard's diff is the SAME new files (one fromStore cut exports all
      // shards at one version), so the set reads each new segment /
      // tombstone list ONCE and routes rows to shards by their hash-cell
      // filters — the per-shard refresh re-read the same parquet S times
      // (S Spark collects per ingest window). Falls back to concurrent
      // per-shard refreshes (guide §2.6) when the shards' baselines
      // diverged (a direct per-shard refresh moved one independently).
      val o0 = shards(0).origin
      val oneCut = o0 != null && shards.forall(_.origin == o0) &&
        (shards.length == 1 || shards.forall(_.originCellFilter != null))
      val stats =
        if (oneCut) {
          LocalReplica.refreshDiff(db, o0, maxNewRows) match {
            case None =>
              return LocalReplica.RefreshStats(0, 0, o0.version, o0.version)
            case Some(d) =>
              val all = LocalReplica.readRefreshBatches(db, d.events, null)
              shards.map { s =>
                val f = s.originCellFilter
                val mine = all.map {
                  case Left((ids, vecs)) if f != null =>
                    val keep = Array.newBuilder[Int]
                    var i = 0
                    while (i < ids.length) {
                      if (f(ids(i))) keep += i
                      i += 1
                    }
                    val idx = keep.result()
                    Left((idx.map(ids), idx.map(vecs)))
                  case other => other
                }
                s.applyRefreshBatches(o0, d, mine)
              }
          }
        } else
          shards.map { s =>
            scala.concurrent.Future(s.refreshFrom(db, maxNewRows))(
              scala.concurrent.ExecutionContext.global)
          }.map(f => scala.concurrent.Await.result(f,
            scala.concurrent.duration.Duration.Inf))
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

  /** Re-partition the LIVE set (mutations folded) into `newShards`
    * hash-cell shards — the serving-ops move the CDC refresh started
    * (round-8 verdict, ask 8): split a hot set finer, or merge an
    * over-sharded one, without going back to Spark. Every shard's live
    * rows (main minus tombstones plus delta) are extracted once and
    * re-routed by `cellOf(id, newShards)`, so the new set answers
    * IDENTICALLY to the old one (gated in `ReplicaSetSpec`) and appends
    * keep routing to the shard whose cell claims them.
    *
    * `nlist > 0` rebuilds a per-shard IVF layout with a deterministic
    * in-process k-means ([[LocalReplica.fromArrays]]); `nlist = 0`
    * serves brute-force exact. The SQ8 coded mirror is REBUILT per
    * shard over the moved rows (fresh bounds), and when EVERY shard
    * serves a lexical section the postings re-split with the rows
    * (frozen tf/doclen, per-shard stats recomputed — fresh-export
    * semantics; the set-level global-stats exchange then keeps sharded
    * BM25/hybrid bit-identical to a single global replica), so a
    * resharded set keeps the coded first pass AND hybrid serving.
    * Metadata columns move with their rows too (same schema across
    * shards; rows appended after the export stay all-NULL for
    * predicates — the existing delta contract), so [[searchWhere]]
    * keeps working. Coded mirrors REBUILD under the sources' shared
    * models — PQ/OPQ re-encodes against the shared codebooks
    * (+rotation), INT4 re-quantizes under fresh per-shard bounds,
    * RaBitQ re-packs under the shared seed (every encode is a
    * deterministic function of row and model, so the result is exactly
    * a fresh export's) — a reshard therefore needs NO Spark re-export
    * for any serving section; [[save]] the result to move the shard
    * artifacts.
    *
    * When every old shard exported the SAME store snapshot (one
    * [[ReplicaSet.fromStore]] cut), the new shards keep the refresh
    * baseline with re-partitioned cell filters, so [[refreshFrom]]
    * keeps working across a reshard.
    */
  def reshard(newShards: Int, nlist: Int = 0): ReplicaSet =
    this.synchronized {
      require(newShards >= 1, s"newShards must be >= 1, got $newShards")
      val extracted = shards.map(_.liveRowsFull())
      // lexical carries through only when EVERY shard serves it (the
      // same all-or-nothing rule as ReplicaSet.lexical)
      val carryLex = shards.forall(_.lexical)
      // metadata columns carry when every shard agrees on the schema
      val metaSchema = shards.head.metaData.map(c => (c.name, c.kind))
      val carryMeta = metaSchema.nonEmpty && shards.forall(
        _.metaData.map(c => (c.name, c.kind)).sameElements(metaSchema))
      // coded mirrors REBUILD under the sources' shared models: PQ/OPQ
      // when every shard codes with identical books (+rotation), INT4
      // when every shard is int4 (fresh per-shard bounds), RaBitQ rides
      // along on a shared seed; otherwise the SQ8 default
      val headPq = shards.head.pqData
      val carryPq = headPq != null && shards.forall { s =>
        val p = s.pqData
        p != null && p.m == headPq.m && p.ksub == headPq.ksub &&
          p.subDim == headPq.subDim &&
          java.util.Arrays.equals(p.books, headPq.books) &&
          ((p.rot == null && headPq.rot == null) ||
            (p.rot != null && headPq.rot != null &&
              java.util.Arrays.equals(p.rot, headPq.rot)))
      }
      val carryInt4 = !carryPq && shards.forall(_.int4Coded)
      val headRbq = shards.head.rbqSection
      val carryRbq = headRbq != null &&
        shards.forall(s => s.rbqSection != null &&
          s.rbqSection.seed == headRbq.seed)
      val mirrors =
        if (!carryPq && !carryInt4 && !carryRbq) null
        else new LocalReplica.MirrorSpec(
          if (carryPq) headPq.books else null,
          if (carryPq) headPq.m else 0,
          if (carryPq) headPq.ksub else 0,
          if (carryPq) headPq.subDim else 0,
          if (carryPq) headPq.rot else null,
          if (carryPq) headPq.rotDefect else 0.0,
          carryInt4,
          if (carryRbq) headRbq.seed else -1L)
      // two passes: count per cell, then fill primitive arrays (no boxing)
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
        Array.tabulate(newShards)(c => new Array[Float](counts(c) * dim))
      val pDocLen =
        if (!carryLex) null
        else Array.tabulate(newShards)(c => new Array[Int](counts(c)))
      val pNumDocs = new Array[Long](newShards)
      val pPost =
        if (!carryLex) null
        else Array.fill(newShards)(new java.util.TreeMap[String,
          scala.collection.mutable.ArrayBuffer[(Int, Float)]]())
      val pMeta: Array[Array[LocalReplica.MetaColumn]] =
        if (!carryMeta) null
        else Array.tabulate(newShards) { c =>
          metaSchema.map { case (nm, kind) =>
            new LocalReplica.MetaColumn(nm, kind,
              if (kind != LocalReplica.MetaDouble &&
                  kind != LocalReplica.MetaString)
                new Array[Long](counts(c)) else null,
              if (kind == LocalReplica.MetaDouble)
                new Array[Double](counts(c)) else null,
              if (kind == LocalReplica.MetaString)
                new Array[String](counts(c)) else null,
              new Array[Boolean](counts(c)))
          }
        }
      val w = new Array[Int](newShards)
      extracted.zip(shards).foreach { case ((ids, flat, mainOldOf, lex), sh) =>
        // old MAIN row -> (cell, new input index) for the postings pass
        val cellOfOld =
          if (carryLex) new Array[Int](lex.docLen.length) else null
        val idxOfOld =
          if (carryLex) new Array[Int](lex.docLen.length) else null
        if (carryLex) java.util.Arrays.fill(cellOfOld, -1)
        val srcMeta = if (carryMeta) sh.metaData else null
        var i = 0
        while (i < ids.length) {
          val c = ReplicaSet.cellOf(ids(i), newShards)
          pIds(c)(w(c)) = ids(i)
          System.arraycopy(flat, i * dim, pFlat(c), w(c) * dim, dim)
          // docLen == 0 marks a row with no text: it must not count into
          // numDocs (fresh-export semantics freeze stats over docs with
          // tokens only — counting it would deflate avgdl post-reshard)
          if (carryLex && mainOldOf(i) >= 0 && lex.docLen(mainOldOf(i)) > 0) {
            pDocLen(c)(w(c)) = lex.docLen(mainOldOf(i))
            pNumDocs(c) += 1
            cellOfOld(mainOldOf(i)) = c
            idxOfOld(mainOldOf(i)) = w(c)
          }
          if (carryMeta) {
            var k = 0
            while (k < metaSchema.length) {
              val dst = pMeta(c)(k)
              val r = mainOldOf(i)
              if (r >= 0) {
                val src = srcMeta(k)
                dst.nulls(w(c)) = src.nulls(r)
                if (dst.longs != null) dst.longs(w(c)) = src.longs(r)
                if (dst.doubles != null) dst.doubles(w(c)) = src.doubles(r)
                if (dst.strings != null) dst.strings(w(c)) = src.strings(r)
              } else dst.nulls(w(c)) = true // delta rows: all-NULL meta
              k += 1
            }
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
        LocalReplica.fromArrays(metric, dim, pIds(c), pFlat(c), nlist,
          lexCarry = carry, metaIn = if (carryMeta) pMeta(c) else null,
          mirrors = mirrors)
      }
      val set = new ReplicaSet(reps.toIndexedSeq)
      set.cellsTotal = newShards
      set.cellOfShard = present.toIndexedSeq
      // refresh capability survives when all shards share one origin cut
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

  /** Persist the set as a directory of per-shard replica artifacts plus
    * a tiny manifest (`set.json`: shard count + hash-cell layout). Same
    * constraints as [[LocalReplica.save]] (fold pending mutations
    * first); like the single artifact, the saved form serves and mutates
    * but does not carry the store origin — re-export to refresh.
    */
  def save(dir: String,
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    fs.mkdirs(p)
    shards.indices.foreach(i => shards(i).save(s"$dir/shard-$i.grlr", conf))
    val cells =
      if (cellOfShard == null) Seq.fill(shards.length)(-1) else cellOfShard
    val json = s"""{"shards":${shards.length},"cellsTotal":$cellsTotal,""" +
      s""""cells":[${cells.mkString(",")}]}"""
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/set.json"), true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  // ------------------------------------------ cross-shard lexical / hybrid

  /** Whether every shard carries a lexical postings section. */
  def lexical: Boolean = shards.forall(_.lexical)

  /** Global (numDocs, avgdl) recovered EXACTLY from the shards: doc
    * counts and total token length are integer sums over the per-shard
    * frozen stats (`docLen` is stored per row), so the derived doubles
    * are bit-identical to what a single global export would compute —
    * the reason sharded BM25 can match an unsharded replica exactly
    * rather than approximately (naive distributed IR scores with
    * per-shard idf and merges incomparable pools).
    */
  private lazy val globalLexStats: (Long, Double) = {
    require(lexical,
      "a shard carries no lexical section — export with textCol to serve " +
        "sharded BM25/hybrid")
    LocalReplica.lexCorpusStats(shards.map(_.lexData))
  }

  /** Per-query global idf: df sums across shards (a term's postings are
    * per-doc, and a doc lives in exactly one shard).
    */
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
    * replica over the whole corpus (global-stats exchange, not a naive
    * per-shard-idf merge).
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

  /** Cross-shard hybrid RRF: the vector pool is the exact global
    * rounded-rank top-m (per-shard fetches merged, boundary ties
    * deepened iteratively like [[LocalReplica.hybridSearch]]), the
    * lexical pool is the global-stats BM25 top-m, and the fuse is the
    * shared RRF math — answers match a single replica over the whole
    * corpus when each shard's probe covers its lists (`nprobe` applies
    * per shard). One mutation snapshot is pinned per shard for both
    * pools and every deepened fetch.
    */
  /** The lexical side of a sharded hybrid (global-stats exchange +
    * per-shard pools + merge) as a ForkJoin overlap task — the single
    * replica's pool-overlap structure lifted to the router, so sharded
    * hybrid latency is max(vector, lexical) + fuse too. Pure reads of
    * the pinned snapshots. ONE copy for the plain and filtered verbs.
    */
  private def lexTaskFor(textQuery: String, m: Int,
      lexPool: (Int, LocalReplica.GlobalLex) => Seq[(Long, Double)])
      : java.util.concurrent.ForkJoinTask[
        Either[Throwable, Seq[(Long, Double)]]] =
    LocalReplica.overlap {
      val g = globalFor(graft.lexical.BM25.tokenizeQuery(textQuery))
      val lPools = new Array[Seq[(Long, Double)]](shards.length)
      java.util.stream.IntStream.range(0, shards.length).parallel()
        .forEach(i => lPools(i) = lexPool(i, g))
      mergeLex(lPools.toIndexedSeq, m)
    }

  def hybridSearch(q: Array[Float], textQuery: String, k: Int,
      rrfK: Int = 60, nprobe: Int = 0): Seq[Candidate] = {
    if (shards.length == 1)
      return shards(0).hybridSearch(q, textQuery, k, rrfK, nprobe)
    require(lexical,
      "a shard carries no lexical section — export with textCol to serve " +
        "sharded BM25/hybrid")
    val head = shards.head
    val m = math.max(2 * k, 50)
    val snaps = shards.map(_.snapshotMut)
    val totals = shards.indices.map(i => shards(i).totalRowsSnap(snaps(i)))
    val total = totals.sum
    val lexTask = lexTaskFor(textQuery, m,
      (i, g) => shards(i).lexicalPoolSnap(textQuery, m, snaps(i), g))
    val vRaw = LocalReplica.joinedWithOverlap(lexTask) {
      var depth = math.min(m + 1, total)
      def fetch(d: Int): Seq[Candidate] = {
        val pools = new Array[Seq[Candidate]](shards.length)
        java.util.stream.IntStream.range(0, shards.length).parallel()
          .forEach { i =>
            pools(i) =
              shards(i).searchSnap(q, math.min(d, totals(i)), nprobe, snaps(i))
          }
        // exact global top-d: every shard contributed min(d, its rows)
        mergeK(pools, d)
      }
      var raw = fetch(depth)
      @inline def r6(c: Candidate): Double =
        head.round6(head.displayScore(c.score))
      def tieUnresolved: Boolean =
        raw.length > m && raw.length == depth && depth < total && {
          val c = r6(raw(m - 1))
          r6(raw(m)) == c && r6(raw.last) == c
        }
      while (tieUnresolved) {
        depth = math.min(total, depth * 4)
        raw = fetch(depth)
      }
      raw
    }
    head.rrfFuse(head.roundedCut(vRaw, m),
      LocalReplica.joinOverlap(lexTask), k, rrfK)
  }

  /** Cross-shard FILTERED hybrid ([[LocalReplica.hybridSearchWhere]]
    * lifted to the router): typed predicates restrict BOTH pools on
    * every shard while corpus stats stay global (the exchange) — the
    * vector side fetches EVERY predicate survivor per shard (same
    * any-tie-width exactness as the single replica's filtered scan) and
    * the merged recut/fuse reproduces a single global replica's filtered
    * hybrid exactly. Lexical side overlaps the vector fan-out.
    */
  def hybridSearchWhere(q: Array[Float], textQuery: String, k: Int,
      filters: Seq[graft.types.Filter], rrfK: Int = 60,
      nprobe: Int = 0): Seq[Candidate] = {
    if (filters.isEmpty) return hybridSearch(q, textQuery, k, rrfK, nprobe)
    if (shards.length == 1)
      return shards(0).hybridSearchWhere(q, textQuery, k, filters, rrfK,
        nprobe)
    require(lexical,
      "a shard carries no lexical section — export with textCol to serve " +
        "sharded BM25/hybrid")
    val head = shards.head
    val m = math.max(2 * k, 50)
    val snaps = shards.map(_.snapshotMut)
    // predicates compile ONCE per shard and feed both pools
    val preds = shards.map(_.compiledPredsOf(filters))
    val lexTask = lexTaskFor(textQuery, m,
      (i, g) => shards(i).lexicalPoolSnapWhere(textQuery, m, snaps(i), g,
        preds(i)))
    val vRaw = LocalReplica.joinedWithOverlap(lexTask) {
      val pools = new Array[Seq[Candidate]](shards.length)
      java.util.stream.IntStream.range(0, shards.length).parallel()
        .forEach { i =>
          pools(i) = shards(i).searchWhereSnap(q, Int.MaxValue, preds(i),
            nprobe, snaps(i))
        }
      mergeK(pools, Int.MaxValue)
    }
    head.rrfFuse(head.roundedCut(vRaw, m),
      LocalReplica.joinOverlap(lexTask), k, rrfK)
  }
}

object ReplicaSet {

  def apply(shards: Seq[LocalReplica]): ReplicaSet =
    new ReplicaSet(shards.toIndexedSeq)

  /** The JVM-side twin of the export partitioner
    * `pmod(xxhash64(id), total)` — Spark's `xxhash64` over one LongType
    * column is XXH64 of the 8-byte value at seed 42 (gated against a
    * real Spark evaluation in `ReplicaSetSpec`), so append routing and
    * refresh cell filters agree with where the export put each id.
    */
  private[serve] def cellOf(id: Long, total: Int): Int =
    java.lang.Math.floorMod(
      org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(id, 42L),
      total.toLong).toInt

  /** Load a set saved by [[ReplicaSet.save]]. */
  def load(dir: String,
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): ReplicaSet = {
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
    val set = new ReplicaSet(
      (0 until n).map(i => LocalReplica.load(s"$dir/shard-$i.grlr", conf)))
    if (cellsTotal > 0 && cells.forall(_ >= 0)) {
      set.cellsTotal = cellsTotal
      set.cellOfShard = cells.toIndexedSeq
    }
    set
  }

  /** Export one replica per shard from any (id, vector) DataFrame,
    * partitioned by id hash (`pmod(xxhash64(id), shards)` — evaluated
    * Spark-side, so each shard's collect is bounded by ~n/shards).
    * Options pass through to [[LocalReplica.fromDataFrame]]; a PQ model
    * (codebooks are partitioning-independent) is shared across shards.
    */
  def fromDataFrame(df: DataFrame, vecCol: String, idCol: String,
      metric: Metric, shards: Int, nlist: Int = 0,
      maxRows: Long = LocalReplica.DefaultMaxRows,
      metaCols: Seq[String] = Nil,
      pqModel: Option[graft.index.PQ.Model] = None,
      textCol: Option[String] = None,
      int4: Boolean = false): ReplicaSet = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    // one pass decides which hash cells are populated (a cell can be
    // empty on small corpora — skipped, placement is not load-bearing),
    // and the input is cached across the per-cell export collects so a
    // shards-N export does not rescan the source N times
    val cell = pmod(xxhash64(col(idCol)), lit(shards))
    val cached = df.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val present = cached.groupBy(cell.as("cell")).count()
        .collect().map(_.getLong(0)).sorted
      require(present.nonEmpty, "cannot build a ReplicaSet from an empty frame")
      val reps = present.toIndexedSeq.map { s =>
        LocalReplica.fromDataFrame(cached.where(cell === lit(s)),
          vecCol, idCol, metric, nlist, maxRows, metaCols, pqModel,
          textCol, int4 = int4)
      }
      val set = new ReplicaSet(reps)
      set.cellsTotal = shards
      set.cellOfShard = present.toIndexedSeq.map(_.toInt)
      set
    } finally { cached.unpersist(); () }
  }

  /** Export a sharded serving set from an engine snapshot (the per-shard
    * twin of [[LocalReplica.fromStore]]; one MVCC version pins every
    * shard, so the set is a consistent frozen view).
    */
  def fromStore(db: GraftDB, shards: Int, nlist: Int = 0,
      maxRows: Long = LocalReplica.DefaultMaxRows,
      metaCols: Seq[String] = Nil,
      pqModel: Option[graft.index.PQ.Model] = None,
      textCol: Option[String] = None,
      int4: Boolean = false): ReplicaSet = {
    val v = db.effectiveVersion
    val set = fromDataFrame(db.store.read(v), "vector", "id", db.metric,
      shards, nlist, maxRows, metaCols, pqModel, textCol, int4)
    // refresh capability needs every cell to have a shard (a diff row in
    // an unrepresented cell would silently never land anywhere) — on
    // full coverage, each shard remembers the exported file set plus ITS
    // cell, so refreshFrom partitions the store diff across shards
    if (set.shards.length == shards) {
      db.store.manifest(v).foreach { m =>
        val segs = m.segments.map(_.path).toSet
        val dels = m.deletes.map(_.path).toSet
        set.shards.indices.foreach { i =>
          val c = set.cellOfShard(i)
          set.shards(i).origin =
            LocalReplica.Origin(db.store.root, v, segs, dels)
          set.shards(i).originCellFilter = id => cellOf(id, shards) == c
        }
      }
    }
    set
  }
}
