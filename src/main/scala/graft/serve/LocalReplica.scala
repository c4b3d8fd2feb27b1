package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.GraftDB
import graft.functions.{KernelMode, SimdKernels}
import graft.index.IVF
import graft.types.{Candidate, Metric}

/** In-process serving replica: the engine's answer to the reference's
  * embedded single-query latency (BASELINE.md: 92.9 µs/query — vecgo is an
  * in-process library, `internal/engine/search.go:1133`, so a query costs
  * a graph walk, not a scheduled job). A distributed Spark scan cannot
  * meet that bar: local-mode job overhead alone is tens of milliseconds.
  * The replica closes the gap the way real lakehouse + serving stacks do:
  * **Spark builds at scale, a compact exported artifact serves point
  * queries in-process.**
  *
  * Shape: ids + vectors collected ONCE from a snapshot (or any DataFrame)
  * into primitive row-major arrays, optionally IVF-clustered into CSR
  * list ranges, scored with the same kernels as the distributed path
  * ([[graft.functions.DistanceKernels]] exact double / Panama SIMD fast —
  * [[KernelMode]] resolves which, so verify paths stay bit-exact with the
  * DuckDB oracle while production serves SIMD).
  *
  * 100 TB story: a replica is a SERVING-TIER EXPORT, not the store. The
  * `maxRows` guard refuses to collect more than fits one process; at
  * corpus scale you export one replica per shard/tenant/partition from
  * the Spark-built store (the same pattern as FAISS/ScaNN index export
  * jobs) and route queries shard-side. The distributed `GraftDB.search`
  * path — probe-pruned, quantized, pushed down — remains the batch/recall
  * surface over the full corpus.
  *
  * Semantics match `GraftDB.search` exactly: same metric score
  * definitions (squared L2 ascending / cosine similarity / dot product
  * descending, `types.Metric`), same cosine query normalization, same
  * (score, id) tie-break. With every list probed (or `nlist = 0`) and the
  * exact kernel pinned, results are bit-identical to the distributed
  * brute-force scan — gated in `LocalReplicaSpec` and the
  * `graftdb_local_knn` oracle query.
  */
final class LocalReplica private (
    val metric: Metric,
    val dim: Int,
    ids: Array[Long],
    flat: Array[Float],
    centroids: Array[Array[Float]],
    listStart: Array[Int]) {

  require(metric != Metric.Hamming,
    "LocalReplica serves float metrics; Hamming stores serve packed codes " +
      "through GraftDB.searchCodes")

  def size: Int = ids.length
  def nlist: Int = centroids.length
  private val ivfModel: Option[IVF.Model] =
    if (centroids.isEmpty) None else Some(IVF.Model(centroids))

  /** Row norms for the fast cosine path (exact cosine recomputes both
    * norms in-loop to stay bit-identical with `DistanceKernels.cosineQ`).
    */
  private lazy val rowNorms: Array[Double] = {
    val out = new Array[Double](size)
    var r = 0
    while (r < size) {
      val base = r * dim
      var s = 0.0
      var i = 0
      while (i < dim) { val x = flat(base + i).toDouble; s += x * x; i += 1 }
      out(r) = math.sqrt(s)
      r += 1
    }
    out
  }

  // --- kernels over one packed row (exact = same accumulation order as
  // DistanceKernels.l2sqFF/dotQ/cosineQ on the row slice → same bits) ---

  private def l2sqExact(base: Int, q: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < dim) {
      val d = flat(base + i).toDouble - q(i).toDouble
      s += d * d; i += 1
    }
    s
  }

  private def dotExact(base: Int, q: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < dim) { s += flat(base + i).toDouble * q(i).toDouble; i += 1 }
    s
  }

  private def cosExact(base: Int, q: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < dim) {
      val x = flat(base + i).toDouble
      val y = q(i).toDouble
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else d / (math.sqrt(na) * math.sqrt(nb))
  }

  private def scoreRow(fast: Boolean, base: Int, q: Array[Float],
      qNorm: Double): Double = metric match {
    case Metric.L2 =>
      if (fast) SimdKernels.l2sqAt(flat, base, q) else l2sqExact(base, q)
    case Metric.Dot =>
      if (fast) SimdKernels.dotAt(flat, base, q) else dotExact(base, q)
    case Metric.Cosine =>
      if (fast) {
        val denom = rowNorms(base / dim) * qNorm
        if (denom == 0.0) 0.0 else SimdKernels.dotAt(flat, base, q) / denom
      } else cosExact(base, q)
    case Metric.Hamming => throw new IllegalStateException("unreachable")
  }

  /** Cosine scores the RAW query (the kernel normalizes internally, same
    * as `vec_cos`) — bit-identical to the operator-level scan; the
    * engine's query-side pre-normalization only perturbs low bits of a
    * scale-invariant score, so rounded results agree with the facade too.
    */
  private def prepQuery(q: Array[Float]): Array[Float] = {
    require(q.length == dim, s"query dim ${q.length} != $dim")
    q
  }

  /** true if candidate (s1, id1) ranks strictly better than (s2, id2). */
  @inline private def better(s1: Double, id1: Long, s2: Double,
      id2: Long): Boolean =
    if (s1 != s2) { if (metric.ascending) s1 < s2 else s1 > s2 }
    else id1 < id2

  /** Row ranges to scan: the `nprobe` nearest IVF lists, or everything
    * when unclustered / `nprobe` covers all lists. `nprobe = 0` defaults
    * to √nlist like the distributed planner.
    */
  private def probeRanges(q: Array[Float], nprobe: Int): Seq[(Int, Int)] =
    ivfModel match {
      case None => Seq((0, size))
      case Some(m) =>
        val np0 = if (nprobe > 0) nprobe
          else math.max(1, math.ceil(math.sqrt(m.k)).toInt)
        val np = math.min(np0, m.k)
        if (np >= m.k) Seq((0, size))
        else m.probes(q, np).sorted.map(l => (listStart(l), listStart(l + 1)))
    }

  /** [[search]] plus the serving twin of the engine's QueryStats (vecgo
    * `WithStats`): wall time, rows actually scanned (≡ distance
    * computations), lists probed of the layout total.
    */
  def searchWithStats(q0: Array[Float], k: Int,
      nprobe: Int = 0): (Seq[Candidate], LocalReplica.Stats) = {
    val t0 = System.nanoTime()
    val ranges = probeRanges(prepQuery(q0), nprobe)
    val out = search(q0, k, nprobe)
    (out, LocalReplica.Stats(
      durationNanos = System.nanoTime() - t0,
      rowsScanned = ranges.map { case (lo, hi) => hi - lo }.sum,
      listsProbed = if (centroids.isEmpty) 1 else ranges.length,
      listsTotal = math.max(1, nlist)))
  }

  /** Top-k nearest, best-first — in-process, no Spark job. */
  // fast path requires Panama (the scalar-unrolled fallback kernels take
  // slice copies — at replica latencies the copy dominates, so non-Panama
  // JVMs serve the exact kernels instead)
  @inline private def fastMode: Boolean =
    KernelMode.fast && KernelMode.simdAvailable

  /** Scan `[lo, hi)`, returning the (unsorted) top-k candidates via a
    * bounded worst-at-root binary heap.
    */
  private def scanTopK(lo: Int, hi0: Int, q: Array[Float], k: Int,
      fast: Boolean, qNorm: Double): IndexedSeq[Candidate] = {
    val hs = new Array[Double](math.max(1, k))
    val hi = new Array[Long](math.max(1, k))
    var hn = 0
    @inline def worse(a: Int, b: Int): Boolean = // heap order: root = worst
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
    var r = lo
    while (r < hi0) {
      val s = scoreRow(fast, r * dim, q, qNorm)
      val id = ids(r)
      if (hn < k) {
        hs(hn) = s; hi(hn) = id; hn += 1
        if (hn == k) { // heapify once full
          var i = hn / 2 - 1
          while (i >= 0) { siftDown(i); i -= 1 }
        }
      } else if (k > 0 && better(s, id, hs(0), hi(0))) {
        hs(0) = s; hi(0) = id; siftDown(0)
      }
      r += 1
    }
    (0 until hn).map(i => Candidate(hi(i), hs(i)))
  }

  def search(q0: Array[Float], k: Int, nprobe: Int = 0): Seq[Candidate] = {
    val q = prepQuery(q0)
    val fast = fastMode
    val qNorm =
      if (metric == Metric.Cosine && fast)
        math.sqrt(q.foldLeft(0.0)((a, x) => a + x.toDouble * x)) else 0.0
    val ranges = probeRanges(q, nprobe)
    val total = ranges.map { case (lo, hi) => hi - lo }.sum
    // large scans fan out across cores in fixed-size chunks, each keeping
    // its own bounded heap; the global top-k of the merged per-chunk
    // top-ks is EXACTLY the sequential result (every row is scored
    // independently), so parallelism never changes answers — skipped when
    // already inside a FJ worker (batchSearch parallelizes across queries)
    val cands: IndexedSeq[Candidate] =
      if (total >= LocalReplica.ParallelScanRows &&
          !java.util.concurrent.ForkJoinTask.inForkJoinPool()) {
        val step = LocalReplica.ChunkRows
        val chunks = ranges.flatMap { case (lo, hi) =>
          (lo until hi by step).map(c => (c, math.min(hi, c + step)))
        }.toIndexedSeq
        val out = new Array[IndexedSeq[Candidate]](chunks.length)
        java.util.stream.IntStream.range(0, chunks.length).parallel()
          .forEach { i =>
            out(i) = scanTopK(chunks(i)._1, chunks(i)._2, q, k, fast, qNorm)
          }
        out.toIndexedSeq.flatten
      } else {
        ranges.toIndexedSeq.flatMap { case (lo, hi) =>
          scanTopK(lo, hi, q, k, fast, qNorm)
        }
      }
    cands.sortWith((a, b) => better(a.score, a.id, b.score, b.id)).take(k)
  }

  /** Filtered top-k (vecgo `WithFilter` on the embedded path): `allowed`
    * is the id-set of filter survivors — in the intended deployment the
    * metadata predicate runs Spark-side (pushed down, stats-pruned) and
    * only the surviving ids ship to the serving tier; the replica skips
    * the kernel entirely for everything else (pre-filter semantics, so
    * results are exact over the allowed set, never recall-lossy).
    */
  def searchFiltered(q0: Array[Float], k: Int, allowed: Long => Boolean,
      nprobe: Int = 0): Seq[Candidate] = {
    val q = prepQuery(q0)
    val fast = fastMode
    val qNorm =
      if (metric == Metric.Cosine && fast)
        math.sqrt(q.foldLeft(0.0)((a, x) => a + x.toDouble * x)) else 0.0
    val buf = scala.collection.mutable.ArrayBuffer.empty[Candidate]
    probeRanges(q, nprobe).foreach { case (lo, hi0) =>
      var r = lo
      while (r < hi0) {
        val id = ids(r)
        if (allowed(id)) buf += Candidate(id, scoreRow(fast, r * dim, q, qNorm))
        r += 1
      }
    }
    buf.sortWith((a, b) => better(a.score, a.id, b.score, b.id))
      .take(k).toSeq
  }

  /** All rows at or better than `threshold`, best-first, capped at
    * `maxResults` (vecgo `SearchThreshold`, `engine.go:1485`). Scans the
    * probed ranges (all rows when unclustered) — threshold semantics over
    * a pruned replica are "within the probed lists", same recall contract
    * as probed top-k.
    */
  def searchThreshold(q0: Array[Float], threshold: Double,
      maxResults: Int = Int.MaxValue, nprobe: Int = 0): Seq[Candidate] = {
    val q = prepQuery(q0)
    val fast = fastMode
    val qNorm =
      if (metric == Metric.Cosine && fast)
        math.sqrt(q.foldLeft(0.0)((a, x) => a + x.toDouble * x)) else 0.0
    val buf = scala.collection.mutable.ArrayBuffer.empty[Candidate]
    probeRanges(q, nprobe).foreach { case (lo, hi0) =>
      var r = lo
      while (r < hi0) {
        val s = scoreRow(fast, r * dim, q, qNorm)
        val keep = if (metric.ascending) s <= threshold else s >= threshold
        if (keep) buf += Candidate(ids(r), s)
        r += 1
      }
    }
    buf.sortWith((a, b) => better(a.score, a.id, b.score, b.id))
      .take(maxResults).toSeq
  }

  /** Per-query top-k for a query batch; parallel across queries (common
    * FJ pool — each query is an independent read of shared immutable
    * arrays).
    */
  def batchSearch(queries: Seq[(Long, Array[Float])], k: Int,
      nprobe: Int = 0): Seq[(Long, Seq[Candidate])] = {
    val arr = queries.toArray
    val out = new Array[(Long, Seq[Candidate])](arr.length)
    java.util.stream.IntStream.range(0, arr.length).parallel().forEach { i =>
      out(i) = (arr(i)._1, search(arr(i)._2, k, nprobe))
    }
    out.toSeq
  }

  /** Persist the replica as a single self-contained artifact (any Hadoop
    * FS scheme — the export job writes it next to the store, serving
    * hosts pull it like any other build artifact). Atomic: temp + rename,
    * same discipline as the store's manifest commits.
    */
  def save(path: String,
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(
      path + ".tmp-" + java.util.UUID.randomUUID().toString)
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(tmp, true), 1 << 20))
    try {
      out.writeInt(LocalReplica.Magic)
      out.writeInt(LocalReplica.FormatVersion)
      out.writeUTF(metric match {
        case Metric.L2 => "l2"
        case Metric.Cosine => "cosine"
        case Metric.Dot => "dot"
        case Metric.Hamming => "hamming"
      })
      out.writeInt(dim)
      out.writeInt(size)
      out.writeInt(nlist)
      var i = 0
      while (i < size) { out.writeLong(ids(i)); i += 1 }
      i = 0
      while (i < flat.length) { out.writeFloat(flat(i)); i += 1 }
      centroids.foreach { c =>
        var j = 0
        while (j < dim) { out.writeFloat(c(j)); j += 1 }
      }
      listStart.foreach(out.writeInt)
    } finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"rename $tmp -> $p failed")
  }
}

object LocalReplica {

  /** Default collect guard: 4M rows × 128d ≈ 2 GiB of floats. */
  val DefaultMaxRows: Long = 4L * 1000 * 1000

  /** Scans at or above this many rows fan out across cores. */
  val ParallelScanRows: Int = 8192

  /** Rows per parallel chunk (~80 µs of 128d kernel work: small enough to
    * load-balance a skewed probe set, big enough to amortize task
    * dispatch).
    */
  val ChunkRows: Int = 2048

  /** Per-query cost counters (serving twin of `GraftDB.QueryStats`). */
  final case class Stats(durationNanos: Long, rowsScanned: Int,
      listsProbed: Int, listsTotal: Int) {
    def scanFraction: Double = listsProbed.toDouble / listsTotal
  }

  private[serve] val Magic = 0x47524c52 // "GRLR"
  private[serve] val FormatVersion = 1

  /** Load a [[save]]d artifact. Fails loudly on a bad magic/version or a
    * truncated file — a serving host must never come up on a torn pull.
    */
  def load(path: String,
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): LocalReplica = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(fs.open(p), 1 << 20))
    try {
      val magic = in.readInt()
      require(magic == Magic,
        f"not a replica artifact: bad magic 0x$magic%08x at $path")
      val ver = in.readInt()
      require(ver == FormatVersion,
        s"replica format version $ver unsupported (expected $FormatVersion)")
      val metric = Metric.fromString(in.readUTF())
      val dim = in.readInt()
      val n = in.readInt()
      val lists = in.readInt()
      require(dim > 0 && n > 0 && lists >= 0,
        s"corrupt replica header: dim=$dim n=$n nlist=$lists")
      val ids = new Array[Long](n)
      var i = 0
      while (i < n) { ids(i) = in.readLong(); i += 1 }
      val flat = new Array[Float](n * dim)
      i = 0
      while (i < flat.length) { flat(i) = in.readFloat(); i += 1 }
      val centroids = Array.fill(lists) {
        val c = new Array[Float](dim)
        var j = 0
        while (j < dim) { c(j) = in.readFloat(); j += 1 }
        c
      }
      val listStart = new Array[Int](math.max(1, lists) + 1)
      i = 0
      while (i < listStart.length) { listStart(i) = in.readInt(); i += 1 }
      require(listStart(listStart.length - 1) == n,
        s"corrupt replica: CSR end ${listStart(listStart.length - 1)} != $n")
      new LocalReplica(metric, dim, ids, flat, centroids, listStart)
    } finally in.close()
  }

  /** Export a replica from any (id, vector) DataFrame. `nlist > 0`
    * clusters rows into IVF lists (MLlib k-means on a bounded sample —
    * the Spark-side build) so point queries scan ~nprobe/nlist of the
    * replica; `nlist = 0` serves brute-force exact.
    */
  def fromDataFrame(df: DataFrame, vecCol: String, idCol: String,
      metric: Metric, nlist: Int = 0,
      maxRows: Long = DefaultMaxRows): LocalReplica = {
    val rows = df.select(col(idCol).cast("long"), col(vecCol)).collect()
    require(rows.length <= maxRows,
      s"replica export of ${rows.length} rows exceeds maxRows=$maxRows — " +
        "a LocalReplica is a per-shard serving artifact, not the store; " +
        "export per shard or raise maxRows explicitly")
    require(rows.nonEmpty, "cannot build a replica from an empty frame")
    val dim = rows(0).getSeq[Float](1).length

    val model: Option[IVF.Model] =
      if (nlist <= 0 || rows.length <= nlist) None
      else {
        val frac = math.min(1.0, 20000.0 / rows.length)
        val sample =
          if (frac >= 1.0) df else df.sample(withReplacement = false, frac, 42L)
        // bounded sample + bounded iterations: the export is a build-time
        // op but shouldn't cost more k-means than the layout is worth
        Some(IVF.train(sample, vecCol, k = nlist, maxIter = 10))
      }

    // assign each row to its nearest centroid (exact kernel: layout is
    // deterministic), then pack rows CSR-ordered by (list, id)
    def assignOf(v: Array[Float]): Int = model match {
      case None => 0
      case Some(m) =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < m.k) {
          val cent = m.centroids(c)
          var s = 0.0; var i = 0
          while (i < dim) {
            val d = v(i).toDouble - cent(i).toDouble
            s += d * d; i += 1
          }
          if (s < bestD) { bestD = s; best = c }
          c += 1
        }
        best
    }

    val lists = model.map(_.k).getOrElse(1)
    val tagged = rows.map { r =>
      val v = r.getSeq[Float](1).toArray
      require(v.length == dim,
        s"ragged vector column: ${v.length} != $dim")
      (assignOf(v), r.getLong(0), v)
    }.sortBy(t => (t._1, t._2))

    val n = tagged.length
    val ids = new Array[Long](n)
    val flat = new Array[Float](n * dim)
    val counts = new Array[Int](lists)
    var r = 0
    while (r < n) {
      ids(r) = tagged(r)._2
      System.arraycopy(tagged(r)._3, 0, flat, r * dim, dim)
      counts(tagged(r)._1) += 1
      r += 1
    }
    val listStart = new Array[Int](lists + 1)
    var l = 0
    while (l < lists) { listStart(l + 1) = listStart(l) + counts(l); l += 1 }

    new LocalReplica(metric, dim, ids, flat,
      model.map(_.centroids).getOrElse(Array.empty), listStart)
  }

  /** Export a replica from an engine snapshot (current or pinned version —
    * the read is MVCC-consistent, so the replica is a faithful frozen view
    * of one committed version).
    */
  def fromStore(db: GraftDB, nlist: Int = 0,
      maxRows: Long = DefaultMaxRows): LocalReplica =
    fromDataFrame(db.read(), "vector", "id", db.metric, nlist, maxRows)
}
