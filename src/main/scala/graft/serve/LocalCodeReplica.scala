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

  /** Top-k nearest codes, best-first. */
  def search(q: Array[Long], k: Int): Seq[Candidate] = {
    require(q.length == words, s"query has ${q.length} words, replica packs $words")
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
    var r = 0
    while (r < size) {
      val s = distAt(r * words, q)
      val id = ids(r)
      if (hn < k) {
        hs(hn) = s; hi(hn) = id; hn += 1
        if (hn == k) {
          var i = hn / 2 - 1
          while (i >= 0) { siftDown(i); i -= 1 }
        }
      } else if (k > 0 && better(s, id, hs(0), hi(0))) {
        hs(0) = s; hi(0) = id; siftDown(0)
      }
      r += 1
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
    val buf = scala.collection.mutable.ArrayBuffer.empty[Candidate]
    var r = 0
    while (r < size) {
      val s = distAt(r * words, q)
      if (s <= threshold) buf += Candidate(ids(r), s.toDouble)
      r += 1
    }
    buf.sortWith((a, b) => better(a.score.toLong, a.id, b.score.toLong, b.id))
      .take(maxResults).toSeq
  }

  /** Per-query top-k, parallel across the batch. */
  def batchSearch(queries: Seq[(Long, Array[Long])],
      k: Int): Seq[(Long, Seq[Candidate])] = {
    val arr = queries.toArray
    val out = new Array[(Long, Seq[Candidate])](arr.length)
    java.util.stream.IntStream.range(0, arr.length).parallel().forEach { i =>
      out(i) = (arr(i)._1, search(arr(i)._2, k))
    }
    out.toSeq
  }
}

object LocalCodeReplica {

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
    fromDataFrame(db.read(), "vector", "id", db.config.dim, maxRows)
  }
}
