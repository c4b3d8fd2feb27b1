package graft.index

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._
import graft.types.Metric

/** IVF (inverted-file) partitioned vector layout — the Spark-native analog
  * of vecgo's flat-segment IVF lists (SURVEY.md I4: k-means with
  * k = rows/8192, probe NProbes nearest centroids at query;
  * `internal/kmeans/kmeans.go`, probe `flat/segment.go:727-749`).
  *
  * Build: MLlib KMeans on (a sample of) the vectors → per-row partition id
  * → data written/bucketed by `ivf_part`. Query: the driver computes
  * query→centroid distances (k is small), picks the nprobe nearest
  * partitions, and synthesizes `ivf_part IN (...)` — dynamic partition
  * pruning by hand (SURVEY.md §4 "IVF probe pruning"): at 100 TB only
  * nprobe/k of the data is scanned, and the partition filter prunes
  * Parquet directories before listing.
  */
object IVF {

  final case class Model(centroids: Array[Array[Float]]) {
    def k: Int = centroids.length

    /** Column: index of the nearest centroid (L2). */
    def assignCol(vec: Column): Column = {
      val dists = array(centroids.map(c => vec_l2sq(vec, lit(c))): _*)
      // array_position is 1-based
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }

    /** Column: the `nprobe` nearest centroid indices, nearest first — the
      * distributed twin of [[probes]] for a whole query COLUMN (every row
      * gets its own probe list, no driver round-trip). Ties break by
      * centroid index ascending: `array_sort` over (distance, index)
      * structs orders by field position, matching [[probes]]'
      * (dist, idx) comparator. All built-in functions → whole-stage
      * codegen, k centroid literals ride in as constants.
      */
    def probeCol(vec: Column, nprobe: Int): Column = {
      val pairs = array(centroids.zipWithIndex.map { case (c, i) =>
        struct(vec_l2sq(vec, lit(c)).as("d"), lit(i).as("i"))
      }: _*)
      transform(slice(array_sort(pairs), 1, math.min(math.max(nprobe, 1), k)),
        p => p.getField("i"))
    }

    /** Vertical-lane packed centroids for the SIMD probe pass: block `b`
      * holds centroids `b·L … b·L+L-1` with dims contiguous per block
      * (`packed((b·dim + d)·L + l)`), padded lanes zero. Built once,
      * ~k·dim·8 bytes — trivially resident.
      */
    private lazy val vertPacked: Array[Double] = {
      val L = graft.functions.SimdKernels.doubleLanes
      val dim = if (k == 0) 0 else centroids(0).length
      val blocks = (k + L - 1) / L
      val out = new Array[Double](blocks * dim * L)
      var c = 0
      while (c < k) {
        val b = c / L; val l = c % L
        var d = 0
        while (d < dim) {
          out((b * dim + d) * L + l) = centroids(c)(d).toDouble
          d += 1
        }
        c += 1
      }
      out
    }

    /** Probe order: the `nprobe` centroid indices nearest the query, by
      * (distance, index). Scoring is ALWAYS exact-double-deterministic:
      * the scalar path is `DistanceKernels.l2sqFF`, and when Panama is
      * available the vertical-lane kernel computes the SAME bits
      * (each lane accumulates its own centroid in dim order, separate
      * mul+add — see [[graft.functions.SimdKernels.l2sqVerticalBlock]]),
      * so the probed list set — hence approximate results and recall —
      * is machine-deterministic either way (gated in `IndexSpec`).
      * Bounded insertion selection over primitive arrays: the old boxed
      * sortBy cost more than the probed scan itself at serving-replica
      * latencies. (Early-abandonment was tried and reverted: at 128d,
      * distance concentration means partial sums rarely exceed the bound
      * before the last few dims, and the blocked loop defeats JIT
      * unrolling — measured 2.5× slower.)
      */
    def probes(query: Array[Float], nprobe: Int): Seq[Int] = {
      require(k == 0 || query.length == centroids(0).length,
        s"query dim ${query.length} != centroid dim ${centroids(0).length}")
      val np = math.min(math.max(1, nprobe), k)
      val bestD = Array.fill(np)(Double.MaxValue)
      val bestI = Array.fill(np)(Int.MaxValue)
      val simd = graft.functions.KernelMode.simdAvailable && k >= 16
      var dists: Array[Double] = null
      if (simd) {
        val L = graft.functions.SimdKernels.doubleLanes
        val dim = query.length
        val blocks = (k + L - 1) / L
        dists = new Array[Double](blocks * L)
        var b = 0
        while (b < blocks) {
          graft.functions.SimdKernels.l2sqVerticalBlock(
            vertPacked, b * dim, query, dists, b * L)
          b += 1
        }
      }
      var i = 0
      while (i < k) {
        val di =
          if (simd) dists(i) else DistanceKernels.l2sqFF(centroids(i), query)
        val last = np - 1
        if (di < bestD(last) || (di == bestD(last) && i < bestI(last))) {
          var j = last
          while (j > 0 &&
              (bestD(j - 1) > di || (bestD(j - 1) == di && bestI(j - 1) > i))) {
            bestD(j) = bestD(j - 1); bestI(j) = bestI(j - 1); j -= 1
          }
          bestD(j) = di; bestI(j) = i
        }
        i += 1
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(bestI)
    }
  }

  /** Rows the driver-local trainer will collect at most: beyond this the
    * input is (deterministically, seeded) down-sampled first. 20k × dim
    * floats is ≤ ~10 MB at 128d / ~60 MB at 768d — k-means only needs a
    * representative sample (vecgo caps its stats sampling the same way,
    * and [[graft.serve.LocalReplica.fromDataFrame]] has always trained
    * its layout on the same 20k bound).
    */
  val MaxTrainRows = 20000L

  /** Train centroids with MLlib KMeans (seeded, deterministic given fixed
    * input). For 100 TB inputs pass a sampled frame — k-means only needs a
    * representative sample (vecgo caps its stats sampling the same way).
    *
    * This stays the trainer for every layout that SERVES partial-probe
    * queries (replica exports, engine `buildIndex`): a layout family
    * change silently shifts every fixed-nprobe row's recall/cost
    * operating point (measured r12, `tools/RecallProbe`: a driver-local
    * k-means++ layout probed 2.2× fewer rows at nprobe=8 — faster AND
    * lower recall — while a local k-means|| reduce probed 1.3× more).
    * Use [[trainLocal]] only where the model provably cannot affect the
    * result OR the work (all cells probed).
    */
  def train(df: DataFrame, vecCol: String, k: Int, seed: Long = 42L,
      maxIter: Int = 20): Model = {
    val feats = df.select(array_to_vector(col(vecCol)).as("features"))
    val km = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
    val model = km.fit(feats)
    Model(model.clusterCenters.map(_.toArray.map(_.toFloat)))
  }

  /** Driver-local seeded k-means++ / Lloyd's over a bounded sample (r12
    * optimization): MLlib `KMeans.fit` spends a dozen driver jobs
    * (k-means|| init rounds + one aggregate per iteration) — ~1 s of pure
    * scheduling per declared query that trains, measured at sf0.1. This
    * path is one count + one collect (plus a seeded `sample` above
    * [[MaxTrainRows]]) + in-process Lloyd's on primitive arrays.
    * Deterministic given fixed input. Centroids differ from [[train]]'s,
    * so this is ONLY for callers whose result and work are provably
    * model-independent — the all-probe exact queries (`knn_join`,
    * `mmr_join`, `ivf_knn`: every cell scanned regardless of layout) —
    * never for serving exports or engine indexes (see [[train]]).
    */
  def trainLocal(df: DataFrame, vecCol: String, k: Int, seed: Long = 42L,
      maxIter: Int = 20): Model = {
    val src = df.select(col(vecCol))
    val n0 = src.count()
    val sampled =
      if (n0 > MaxTrainRows)
        src.sample(withReplacement = false,
          math.min(1.0, MaxTrainRows.toDouble / n0), seed)
      else src
    val rows = sampled.collect()
    require(rows.nonEmpty, "IVF.trainLocal: no training rows")
    val dim = rows(0).getSeq[Float](0).length
    val n = rows.length
    val flat = new Array[Float](n * dim)
    var r = 0
    while (r < n) {
      val v = rows(r).getSeq[Float](0)
      var i = 0
      while (i < dim) { flat(r * dim + i) = v(i); i += 1 }
      r += 1
    }
    Model(trainFlat(flat, n, dim, k, seed, maxIter))
  }

  @inline private def rowOf(flat: Array[Float], r: Int,
      dim: Int): Array[Float] =
    java.util.Arrays.copyOfRange(flat, r * dim, r * dim + dim)

  /** Seeded k-means++ init + Lloyd's over a row-major float buffer.
    * Kernel dispatch mirrors the serving replica (SIMD when available,
    * scalar otherwise); determinism holds within a mode — and no declared
    * result depends on the centroid values at all.
    */
  private[index] def trainFlat(flat: Array[Float], n: Int, dim: Int,
      k: Int, seed: Long, maxIter: Int): Array[Array[Float]] = {
    import graft.functions.{KernelMode, SimdKernels, DistanceKernels}
    @inline def dist(base: Int, q: Array[Float]): Double =
      if (KernelMode.fast) SimdKernels.l2sqAt(flat, base, q)
      else {
        var s = 0.0
        var i = 0
        while (i < dim) {
          val d = flat(base + i).toDouble - q(i)
          s += d * d
          i += 1
        }
        s
      }
    val rng = new java.util.Random(seed)
    // seeded k-means++ init: first center uniform, then D²-weighted; a
    // zero total (all points coincide) cycles rows instead. Produces a
    // well-balanced layout — fine for the all-probe callers this trainer
    // is restricted to (see [[trainLocal]]'s scope note).
    val centers = new Array[Array[Float]](k)
    val first = rng.nextInt(n)
    centers(0) = rowOf(flat, first, dim)
    val d2 = new Array[Double](n)
    java.util.Arrays.fill(d2, Double.MaxValue)
    var c = 1
    while (c < k) {
      val prev = centers(c - 1)
      var r = 0
      var total = 0.0
      while (r < n) {
        val d = dist(r * dim, prev)
        if (d < d2(r)) d2(r) = d
        total += d2(r)
        r += 1
      }
      val pick =
        if (total <= 0.0) c % n
        else {
          var target = rng.nextDouble() * total
          var i = 0
          while (i < n - 1 && target > d2(i)) { target -= d2(i); i += 1 }
          i
        }
      centers(c) = rowOf(flat, pick, dim)
      c += 1
    }
    // Lloyd's, stopping at the assignment fixed point
    val assign = new Array[Int](n)
    java.util.Arrays.fill(assign, -1)
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      moved = false
      var r = 0
      while (r < n) {
        var best = 0
        var bestD = Double.MaxValue
        var ci = 0
        while (ci < k) {
          val d = dist(r * dim, centers(ci))
          if (d < bestD) { bestD = d; best = ci }
          ci += 1
        }
        if (assign(r) != best) { assign(r) = best; moved = true }
        r += 1
      }
      if (moved) {
        val sums = Array.ofDim[Double](k, dim)
        val counts = new Array[Int](k)
        r = 0
        while (r < n) {
          val ci = assign(r)
          counts(ci) += 1
          var i = 0
          while (i < dim) { sums(ci)(i) += flat(r * dim + i); i += 1 }
          r += 1
        }
        var ci = 0
        while (ci < k) {
          if (counts(ci) > 0) {
            var i = 0
            while (i < dim) {
              centers(ci)(i) = (sums(ci)(i) / counts(ci)).toFloat
              i += 1
            }
          } // emptied cluster keeps its old center (MLlib's rule)
          ci += 1
        }
      }
      iter += 1
    }
    centers
  }

  /** Tag every row with its IVF partition. */
  def assign(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn("ivf_part", model.assignCol(col(vecCol)))

  /** Persist the assigned frame partitioned by `ivf_part` so probe-time
    * partition filters prune whole directories.
    */
  def writeLayout(assigned: DataFrame, path: String): Unit =
    assigned.write.mode("overwrite")
      // entropy-dense float vectors: uncompressed, like the store segments
      .option("compression", "uncompressed")
      .partitionBy("ivf_part").parquet(path)

  /** Probe-pruned k-NN: scan only the nprobe nearest partitions, then
    * exact top-k within them.
    */
  def search(assigned: DataFrame, vecCol: String, idCol: String,
      model: Model, query: Array[Float], k: Int, nprobe: Int,
      metric: Metric = Metric.L2): DataFrame = {
    val parts = model.probes(query, nprobe)
    val pruned = assigned.where(col("ivf_part").isin(parts: _*))
    pruned
      .withColumn("score", metric.score(col(vecCol), lit(query)))
      .orderBy(metric.sort(col("score")), col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("score"))
  }
}
