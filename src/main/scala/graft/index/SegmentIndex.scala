package graft.index

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/** The per-segment vector index the engine builds INTO segments at
  * compaction and consults automatically at search — the Spark-native
  * analog of vecgo writing IVF flat segments during compaction
  * (`internal/engine/compaction.go:136-151`) and probing them with
  * two-phase quantized rerank at query time
  * (`internal/segment/flat/segment.go:447-752`).
  *
  * Physical layout: the segment parquet is partitioned by [[PartCol]]
  * (IVF list id → one directory per list, so probe-time `IN` filters
  * prune directories before listing), and every row carries [[CodeCol]]
  * (SQ8 codes) for the cheap approximate phase. Raw vectors stay in the
  * same rows for the exact rerank — Parquet column pruning means the
  * approximate phase never reads them.
  *
  * The model parameters (k-means centroids + per-dimension SQ8 bounds)
  * live in a small sidecar JSON next to the segment, referenced from the
  * manifest — the driver loads it once per open store.
  */
object SegmentIndex {

  /** Internal column names; hidden from all plain read paths. */
  val PartCol = "_ivf_part"
  val CodeCol = "_sq8"
  val InternalCols: Seq[String] = Seq(PartCol, CodeCol)

  /** Sidecar index metadata (JSON-serializable; Lists for json4s).
    * `vecCol` makes the sidecar self-describing, so a later `compact()`
    * can rebuild the same index without the caller re-supplying params.
    * `listRadii(i)` = max L2 distance of any member of list i to its
    * centroid — the per-list ball that lets threshold search prune whole
    * IVF directories (empty on sidecars written before this field
    * existed, which simply disables the pruning).
    */
  case class Meta(
      kind: String,
      nlist: Int,
      levels: Int,
      centroids: List[List[Float]],
      mins: List[Double],
      maxs: List[Double],
      vecCol: String = "vector",
      listRadii: List[Double] = Nil)

  def ivfModel(meta: Meta): IVF.Model =
    IVF.Model(meta.centroids.map(_.toArray).toArray)

  def sq8Model(meta: Meta): SQ8.Model =
    SQ8.Model(meta.mins.toArray, meta.maxs.toArray, meta.levels)

  /** Train IVF + SQ8 on the live rows and write the indexed segment at
    * `dir`. K-means trains on a bounded sample (`trainSampleCap` rows of
    * the estimated `totalRows`) — at 100 TB the centroids only need a
    * representative fraction, not a full pass; SQ8 bounds come from one
    * full min/max aggregation (map-side combinable).
    */
  def build(live: DataFrame, vecCol: String, dir: String, nlist: Int,
      levels: Int = 255, totalRows: Long = 0L,
      trainSampleCap: Long = 200000L, seed: Long = 42L): Meta = {
    val trainDf =
      if (totalRows > trainSampleCap && trainSampleCap > 0)
        live.select(col(vecCol)).sample(withReplacement = false,
          math.min(1.0, trainSampleCap.toDouble / totalRows), seed)
      else live
    val ivf = IVF.train(trainDf, vecCol, k = nlist, seed = seed)
    val sq8 = SQ8.train(live, vecCol, levels)
    live
      .withColumn(CodeCol, sq8.encodeCol(col(vecCol)))
      .withColumn(PartCol, ivf.assignCol(col(vecCol)))
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#id", "true")
      // raw-bytes segments, like SnapshotStore.writeSegment: float vectors
      // and SQ8 codes are entropy-dense, snappy is all cost no win
      .option("compression", "uncompressed")
      .partitionBy(PartCol)
      .parquet(dir)
    // per-list radius: one agg over the WRITTEN layout (vecgo keeps
    // per-partition stats in its flat-segment block stats) — enables
    // sound per-directory pruning for threshold queries
    val back = live.sparkSession.read.parquet(dir)
    val centroidLit = org.apache.spark.sql.functions.typedlit(
      ivf.centroids.map(_.toSeq).toSeq)
    val radiusRows = back
      .select(col(PartCol).cast("int").as("p"),
        graft.functions.vec_l2(col(vecCol),
          org.apache.spark.sql.functions.element_at(
            centroidLit, col(PartCol).cast("int") + 1)).as("r"))
      .groupBy("p").agg(org.apache.spark.sql.functions.max("r").as("rmax"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val radii = List.tabulate(ivf.k)(i => radiusRows.getOrElse(i, 0.0))
    Meta("ivf_sq8", ivf.k, levels,
      ivf.centroids.map(_.toList).toList,
      sq8.mins.toList, sq8.maxs.toList, vecCol, radii)
  }

  private implicit val fmts: Formats = DefaultFormats

  def save(meta: Meta, path: String, conf: Configuration): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(Serialization.write(meta).getBytes("UTF-8"))
    finally out.close()
  }

  def load(path: String, conf: Configuration): Meta = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val s = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    JsonMethods.parse(s).extract[Meta]
  }
}
