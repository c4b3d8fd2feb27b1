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
  val PqCol = "_pq"
  val RbqCol = "_rbq"
  val InternalCols: Seq[String] = Seq(PartCol, CodeCol, PqCol, RbqCol)

  /** Sidecar index metadata (JSON-serializable; Lists for json4s).
    * `vecCol` makes the sidecar self-describing, so a later `compact()`
    * can rebuild the same index without the caller re-supplying params.
    * `listRadii(i)` = max L2 distance of any member of list i to its
    * centroid — the per-list ball that lets threshold search prune whole
    * IVF directories (empty on sidecars written before this field
    * existed, which simply disables the pruning). `kind` picks the coded
    * first pass: `ivf_sq8` (per-dim scalar codes, default) or `ivf_pq`
    * (product codes + ADC — `pqM` sub-codebooks of `pqKsub` centroids;
    * at 768–1536d the PQ codes are 6–12× smaller than SQ8, the layout a
    * 100 TB corpus wants).
    */
  case class Meta(
      kind: String,
      nlist: Int,
      levels: Int,
      centroids: List[List[Float]],
      mins: List[Double],
      maxs: List[Double],
      vecCol: String = "vector",
      listRadii: List[Double] = Nil,
      pqM: Int = 0,
      pqKsub: Int = 0,
      pqCodebooks: List[List[List[Float]]] = Nil,
      // learned orthonormal rotation (kind = ivf_opq): codes are PQ over
      // R·x, queries rotate driver-side; L2 is rotation-invariant so the
      // ADC scoring and ordering are unchanged
      opqRotation: List[List[Float]] = Nil,
      // kind = ivf_rabitq: the rotation is DATA-INDEPENDENT (seeded
      // Gram-Schmidt on a Gaussian draw), so the sidecar stores only the
      // seed and rebuilds the model at load — 1 bit/dim codes
      rabitqSeed: Long = 0L,
      // per-list q95 member distance at TRAIN time — the drift baseline.
      // Unlike listRadii (which each extend refreshes for ITS segment),
      // this is frozen when the model is trained and copied unchanged
      // through extends, so `tailDrift` always compares new rows against
      // the distribution the centroids were actually fit to. Empty on
      // pre-upgrade sidecars (drift then falls back to listRadii with a
      // 0.0 baseline).
      trainRadiiQ: List[Double] = Nil)

  def ivfModel(meta: Meta): IVF.Model =
    IVF.Model(meta.centroids.map(_.toArray).toArray)

  def sq8Model(meta: Meta): SQ8.Model =
    SQ8.Model(meta.mins.toArray, meta.maxs.toArray, meta.levels)

  def pqModel(meta: Meta): PQ.Model = {
    require((meta.kind == "ivf_pq" || meta.kind == "ivf_opq") && meta.pqM > 0,
      s"segment index kind ${meta.kind} carries no PQ codebooks")
    val books = meta.pqCodebooks.map(_.map(_.toArray).toArray).toArray
    PQ.Model(meta.pqM, meta.pqKsub, books(0)(0).length, books)
  }

  def opqModel(meta: Meta): OPQ.Model = {
    require(meta.kind == "ivf_opq" && meta.opqRotation.nonEmpty,
      s"segment index kind ${meta.kind} carries no OPQ rotation")
    OPQ.Model(meta.opqRotation.map(_.toArray).toArray, pqModel(meta))
  }

  def rabitqModel(meta: Meta): RaBitQ.Model = {
    require(meta.kind == "ivf_rabitq",
      s"segment index kind ${meta.kind} carries no RaBitQ rotation seed")
    RaBitQ.train(meta.centroids.head.length, meta.rabitqSeed)
  }

  /** Train IVF + SQ8 on the live rows and write the indexed segment at
    * `dir`. K-means trains on a bounded sample (`trainSampleCap` rows of
    * the estimated `totalRows`) — at 100 TB the centroids only need a
    * representative fraction, not a full pass; SQ8 bounds come from one
    * full min/max aggregation (map-side combinable).
    */
  def build(live: DataFrame, vecCol: String, dir: String, nlist: Int,
      levels: Int = 255, totalRows: Long = 0L,
      trainSampleCap: Long = 200000L, seed: Long = 42L,
      kind: String = "ivf_sq8", pqM: Int = 0): (Meta, Long) = {
    require(kind == "ivf_sq8" || kind == "ivf_pq" || kind == "ivf_opq" ||
        kind == "ivf_rabitq",
      s"unknown index kind `$kind` (ivf_sq8 | ivf_pq | ivf_opq | ivf_rabitq)")
    // packed segment layout: vectors at rest are LE float32 blobs. The
    // WRITTEN segment keeps the packed column untouched (pass-through);
    // only the train/encode/assign inputs go through a float view.
    val isPacked = live.schema(vecCol).dataType ==
      org.apache.spark.sql.types.BinaryType
    val vecF =
      if (isPacked) graft.functions.vec_unpack_f32(col(vecCol)) else col(vecCol)
    val liveF = if (isPacked) live.withColumn(vecCol, vecF) else live
    val trainDf =
      if (totalRows > trainSampleCap && trainSampleCap > 0)
        liveF.select(col(vecCol)).sample(withReplacement = false,
          math.min(1.0, trainSampleCap.toDouble / totalRows), seed)
      else liveF
    val ivf = IVF.train(trainDf, vecCol, k = nlist, seed = seed)
    // the coded first pass: per-dim SQ8 codes, PQ product codes + ADC, or
    // OPQ (learned rotation + PQ — same code column, rotated encode)
    val sq8 = if (kind == "ivf_sq8") Some(SQ8.train(liveF, vecCol, levels)) else None
    def codedDim: Int =
      liveF.select(size(col(vecCol))).limit(1).collect()(0).getInt(0)
    def pqSubM(dim: Int): Int = {
      val m = if (pqM > 0) pqM else math.max(1, dim / 4)
      require(dim % m == 0, s"dim $dim not divisible by pq m=$m")
      m
    }
    val pq =
      if (kind == "ivf_pq") Some(PQ.train(liveF, vecCol, pqSubM(codedDim), seed = seed))
      else None
    val opq =
      if (kind == "ivf_opq") Some(OPQ.train(liveF, vecCol, pqSubM(codedDim), seed = seed))
      else None
    val rbq =
      if (kind == "ivf_rabitq") Some(RaBitQ.train(codedDim, seed)) else None
    val coded = (sq8, pq, opq, rbq) match {
      case (Some(s), _, _, _) => live.withColumn(CodeCol, s.encodeCol(vecF))
      case (_, Some(p), _, _) => live.withColumn(PqCol, p.encodeCol(vecF))
      case (_, _, Some(o), _) => live.withColumn(PqCol, o.encodeCol(vecF))
      case (_, _, _, Some(r)) => live.withColumn(RbqCol, r.encodeCol(vecF))
      case _ => live
    }
    coded
      .withColumn(PartCol, ivf.assignCol(vecF))
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#id", "true")
      // raw-bytes segments, like SnapshotStore.writeSegment: float vectors
      // and SQ8 codes are entropy-dense, snappy is all cost no win
      .option("compression", "uncompressed")
      .option(s"parquet.enable.dictionary#$vecCol", "false")
      .partitionBy(PartCol)
      .parquet(dir)
    val (radii, radiiQ, rowsOut) = radiiOf(live, dir, vecCol, ivf)
    (Meta(kind, ivf.k, levels,
      ivf.centroids.map(_.toList).toList,
      sq8.map(_.mins.toList).getOrElse(Nil),
      sq8.map(_.maxs.toList).getOrElse(Nil),
      vecCol, radii,
      trainRadiiQ = radiiQ,
      pqM = pq.orElse(opq.map(_.pq)).map(_.m).getOrElse(0),
      pqKsub = pq.orElse(opq.map(_.pq)).map(_.ksub).getOrElse(0),
      pqCodebooks = pq.orElse(opq.map(_.pq))
        .map(_.codebooks.map(_.map(_.toList).toList).toList).getOrElse(Nil),
      opqRotation = opq.map(_.rotation.map(_.toList).toList).getOrElse(Nil),
      rabitqSeed = if (kind == "ivf_rabitq") seed else 0L), rowsOut)
  }

  /** Per-list radius: one agg over the WRITTEN layout (vecgo keeps
    * per-partition stats in its flat-segment block stats) — enables
    * sound per-directory pruning for threshold queries. The packed
    * layout reads back as binary; `vec_l2` scores blobs in place.
    * The segment's TOTAL row count rides the same agg (every row carries
    * a cell, so the per-cell counts sum to it) — callers that need it
    * (manifest `SegmentRef.rows`) used to pay a dedicated count job over
    * the files this agg had just scanned.
    */
  private def radiiOf(live: DataFrame, dir: String, vecCol: String,
      ivf: IVF.Model): (List[Double], List[Double], Long) = {
    import org.apache.spark.sql.functions.{count, element_at, lit, max,
      percentile_approx, typedlit}
    val back = live.sparkSession.read.parquet(dir)
    val centroidLit = typedlit(ivf.centroids.map(_.toSeq).toSeq)
    val rows = back
      .select(col(PartCol).cast("int").as("p"),
        graft.functions.vec_l2(col(vecCol),
          element_at(centroidLit, col(PartCol).cast("int") + 1)).as("r"))
      .groupBy("p").agg(max("r").as("rmax"),
        percentile_approx(col("r"), lit(0.95), lit(1000)).as("rq"),
        count(lit(1)).as("n"))
      .collect()
    val radiusRows = rows
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    (List.tabulate(ivf.k)(i => radiusRows.get(i).map(_._1).getOrElse(0.0)),
      List.tabulate(ivf.k)(i => radiusRows.get(i).map(_._2).getOrElse(0.0)),
      rows.iterator.map(_.getLong(3)).sum)
  }

  /** Extend an EXISTING trained index over NEW rows: encode + assign with
    * the sidecar's frozen model (centroids, bounds, codebooks, rotation —
    * NO re-training, NO touch of the already-indexed segments) and write
    * another indexed segment at `dir` with its own per-list radii. This is
    * the incremental index-maintenance path — streaming appends land as
    * plain segments and `extendIndex` folds them into the probed layout
    * for the cost of ONE pass over the new rows (the vector-index analog
    * of the per-segment lexical deltas; FAISS's add-with-frozen-quantizer
    * move). Rows outside the frozen SQ8 bounds clamp — the coded first
    * pass is recall-gated oversample-and-rerank engine-side, so clamping
    * costs recall margin, never correctness of the exact rerank.
    */
  def extend(live: DataFrame, meta: Meta, dir: String): (Meta, Long) = {
    val vecCol = meta.vecCol
    val isPacked = live.schema(vecCol).dataType ==
      org.apache.spark.sql.types.BinaryType
    val vecF =
      if (isPacked) graft.functions.vec_unpack_f32(col(vecCol)) else col(vecCol)
    val ivf = ivfModel(meta)
    val coded = meta.kind match {
      case "ivf_sq8" => live.withColumn(CodeCol, sq8Model(meta).encodeCol(vecF))
      case "ivf_pq" => live.withColumn(PqCol, pqModel(meta).encodeCol(vecF))
      case "ivf_opq" => live.withColumn(PqCol, opqModel(meta).encodeCol(vecF))
      case "ivf_rabitq" =>
        live.withColumn(RbqCol, rabitqModel(meta).encodeCol(vecF))
      case other => throw new IllegalArgumentException(
        s"segment index kind `$other` cannot extend")
    }
    coded
      .withColumn(PartCol, ivf.assignCol(vecF))
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#id", "true")
      .option("compression", "uncompressed")
      .option(s"parquet.enable.dictionary#$vecCol", "false")
      .partitionBy(PartCol)
      .parquet(dir)
    // listRadii refresh for THIS segment; trainRadiiQ (the drift
    // baseline) carries through unchanged — it describes the training
    // distribution, not this delta
    val (radii, _, rows) = radiiOf(live, dir, vecCol, ivf)
    (meta.copy(listRadii = radii), rows)
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
