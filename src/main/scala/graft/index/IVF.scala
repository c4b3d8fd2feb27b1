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

  /** Train centroids with MLlib KMeans (seeded, deterministic given fixed
    * input). For 100 TB inputs pass a sampled frame — k-means only needs a
    * representative sample (vecgo caps its stats sampling the same way).
    */
  def train(df: DataFrame, vecCol: String, k: Int, seed: Long = 42L,
      maxIter: Int = 20): Model = {
    val feats = df.select(array_to_vector(col(vecCol)).as("features"))
    val km = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
    val model = km.fit(feats)
    Model(model.clusterCenters.map(_.toArray.map(_.toFloat)))
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
