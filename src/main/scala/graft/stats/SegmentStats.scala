package graft.stats

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.types.Filter

/** Per-segment statistics + manifest-level pruning — the analog of vecgo's
  * stats collector and segment pruning (SURVEY.md I13
  * `internal/manifest/stats_collector.go:86-640`, pruning
  * `internal/engine/segment_pruning.go:15-121`).
  *
  * One `agg` pass per written segment collects per-column min/max/ndv/null
  * counts plus (optionally) the vector centroid and max radius. The driver
  * consults these BEFORE Spark lists files: a pruned segment costs zero
  * I/O — this is file-LIST pruning, one level above Parquet's footer
  * min/max (which still applies inside surviving segments).
  */
object SegmentStats {

  /** One frequent value with its exact count (vecgo keeps top-k values
    * per column in its segment stats, `stats_collector.go`).
    */
  case class TopV(v: String, n: Long)

  /** JSON-friendly per-column stats. Numerics use doubles; strings use
    * lexicographic bounds. `hist` = [[HistBins]] equi-width non-null
    * counts over [minN, maxN] (numeric columns); `topk` = up to
    * [[TopK]] most frequent values with exact counts (string columns,
    * ndv-gated). Both Optional — absent in pre-upgrade manifests, and
    * the estimator falls back to the System-R defaults without them.
    */
  case class ColStats(
      num: Boolean,
      minN: Option[Double], maxN: Option[Double],
      minS: Option[String], maxS: Option[String],
      nulls: Long, ndv: Long,
      bloom: Option[String] = None,
      hist: Option[List[Long]] = None,
      topk: Option[List[TopV]] = None)

  /** Equi-width histogram bins per numeric column (vecgo uses 16-bin
    * log-scaled histograms; equi-width over the known [min,max] keeps
    * the estimator's interpolation exact-in-bounds).
    */
  val HistBins = 16
  /** Frequent values kept per string column. */
  val TopK = 16

  case class VecStats(centroid: List[Double], radiusMax: Double)

  case class Stats(rows: Long, cols: Map[String, ColStats],
      vec: Option[VecStats],
      shape: Option[ShapeStats] = None)

  /** Time-ordered segment shape (vecgo `ShapeStats`, `internal/manifest/
    * stats.go:184-191`): whether the segment is sorted by its timestamp
    * column — sorted-by-time segments allow range pruning and merge-style
    * time joins without a sort.
    */
  case class ShapeStats(tsField: String, sortedByTs: Boolean,
      minTs: Long, maxTs: Long)

  /** Collect stats in two jobs: one wide agg for scalars, one pass for
    * vector centroid+radius (if vecCol given).
    */
  /** Detect the time shape of a segment in one distributed pass:
    * sortedness = every partition internally non-descending AND partition
    * boundaries non-descending in partition order, plus epoch-micro
    * bounds. Each task streams its own rows (no global window — a
    * `Window.orderBy` with no partitionBy would drag the whole segment
    * through ONE task); the driver merges one small tuple per partition.
    * NULL timestamps are ignored, matching the old lag-compare semantics.
    */
  def collectShape(df: DataFrame, tsCol: String): ShapeStats = {
    val parts = df.select(unix_micros(col(tsCol)).as("_ts"))
      .rdd.mapPartitionsWithIndex { (idx, it) =>
        var first = Long.MinValue
        var prev = Long.MinValue
        var mn = Long.MaxValue
        var mx = Long.MinValue
        var sorted = true
        var seen = false
        while (it.hasNext) {
          val row = it.next()
          if (!row.isNullAt(0)) {
            val v = row.getLong(0)
            if (!seen) { first = v; seen = true }
            else if (v < prev) sorted = false
            if (v < mn) mn = v
            if (v > mx) mx = v
            prev = v
          }
        }
        if (seen) Iterator.single((idx, first, prev, mn, mx, sorted))
        else Iterator.empty
      }.collect().sortBy(_._1)
    require(parts.nonEmpty, s"no non-null `$tsCol` values to shape-detect")
    val sortedWithin = parts.forall(_._6)
    val boundariesOk = parts.iterator.sliding(2).withPartial(false).forall {
      case Seq(a, b) => a._3 <= b._2 // last of partition i <= first of i+1
      case _ => true
    }
    ShapeStats(tsCol, sortedWithin && boundariesOk,
      parts.iterator.map(_._4).min, parts.iterator.map(_._5).max)
  }

  /** The scalar (bounds-collectable) fields of a segment schema. */
  private def scalarFields(schema: StructType): Array[StructField] =
    schema.fields.filter {
      case StructField(_, _: NumericType, _, _) => true
      case StructField(_, StringType, _, _) => true
      case _ => false
    }

  /** Pass-1 aggregate columns for a segment frame with this `schema`: the
    * wide per-column bounds/ndv/null counts, the row count, and — with a
    * `dimHint` — the centroid sum (without one, vector-dim discovery).
    * A segment WRITER can ride these on the write job itself via
    * `observe`, so steady-state stats cost ONE extra pass (the
    * bloom/hist/radius agg) instead of two; [[collect]] runs them as its
    * own first job when no writer metrics are in hand. A packed (binary)
    * vector column is unpacked inside the expression, so the aggs bind
    * against the stored layout directly. vec_sum_double is a narrow
    * partial aggregate (one double[d] buffer per task) — the old
    * posexplode+groupBy alternative shuffled d rows per input vector.
    */
  def pass1Aggs(schema: StructType, vecCol: Option[String] = None,
      dimHint: Option[Int] = None): Seq[org.apache.spark.sql.Column] = {
    val scalarCols = scalarFields(schema)
    scalarCols.toSeq.flatMap { f =>
      val c = col(f.name)
      val isNum = f.dataType.isInstanceOf[NumericType]
      Seq(
        (if (isNum) min(c.cast("double")) else lit(null).cast("double"))
          .as(s"${f.name}__minN"),
        (if (isNum) max(c.cast("double")) else lit(null).cast("double"))
          .as(s"${f.name}__maxN"),
        (if (!isNum) min(c) else lit(null).cast("string")).as(s"${f.name}__minS"),
        (if (!isNum) max(c) else lit(null).cast("string")).as(s"${f.name}__maxS"),
        count(when(c.isNull, 1)).as(s"${f.name}__nulls"),
        approx_count_distinct(c).as(s"${f.name}__ndv"))
    } ++ vecCol.map { vc =>
      val ve =
        if (schema.fieldNames.contains(vc) && schema(vc).dataType == BinaryType)
          graft.functions.vec_unpack_f32(col(vc))
        else col(vc)
      dimHint match {
        case Some(d) => graft.functions.vec_sum_double(ve, d).as("__vecsum")
        case None => max(size(ve)).as("__vecdim")
      }
    } :+ count(lit(1)).as("__rows")
  }

  /** `dimHint`: the vector dimensionality when the CALLER already knows it
    * (a store's later inserts/compactions — the head manifest's vec stats
    * carry it). With the hint the centroid sum rides the FIRST agg and the
    * radius rides the second, so a steady-state stats collect is 2 jobs;
    * without it, dim discovery rides pass 1, the sum pass 2, the radius
    * pass 3 (first-ever insert only). Values are identical either way.
    */
  def collect(df0: DataFrame, vecCol: Option[String] = None,
      dimHint: Option[Int] = None): Stats = {
    val aggs = pass1Aggs(df0.schema, vecCol, dimHint)
    val row = df0.agg(aggs.head, aggs.tail: _*).collect()(0)
    collectFromPass1(df0, vecCol, dimHint,
      row.getValuesMap[Any](row.schema.fieldNames.toSeq))
  }

  /** Pass 2+ of [[collect]], given the pass-1 values (from [[pass1Aggs]] —
    * either [[collect]]'s own first job, or a writer's `observe` metrics
    * riding the segment-write job, which is the same expressions over the
    * same rows): blooms/histograms (+ centroid sum or radius), exact
    * top-k, assembled into [[Stats]].
    */
  def collectFromPass1(df0: DataFrame, vecCol: Option[String],
      dimHint: Option[Int], p1: Map[String, Any]): Stats = {
    // packed segment layout: the vector column arrives as an LE float32
    // blob — unpack once here so the centroid/radius aggregates below see
    // array<float> (stats collection is a build-time pass, not the scan
    // hot path)
    val df = vecCol match {
      case Some(vc) if df0.columns.contains(vc) &&
          df0.schema(vc).dataType == org.apache.spark.sql.types.BinaryType =>
        df0.withColumn(vc, graft.functions.vec_unpack_f32(col(vc)))
      case _ => df0
    }
    val scalarCols = scalarFields(df.schema)
    // Fields with types we don't collect bounds for (bool/timestamp/array/
    // binary/...) still get a presence marker: a ColStats with no bounds.
    // canPrune must distinguish "field absent from the segment schema"
    // (prunable — matches nothing) from "field present, no usable stats"
    // (never prunable) — vecgo only prunes on genuinely-missing fields
    // (`segment_pruning.go`).
    val presenceOnly = df.schema.fields.filterNot(scalarCols.contains).map { f =>
      f.name -> ColStats(num = false, None, None, None, None, 0L, 0L)
    }.toMap
    def anyAt(k: String): Option[Any] = p1.get(k).flatMap(Option(_))
    val vecDim = vecCol.flatMap { _ =>
      dimHint.orElse(
        anyAt("__vecdim").map(_.asInstanceOf[Number].intValue))
    }
    val vecSum1: Option[Seq[Double]] =
      if (vecCol.isDefined && dimHint.isDefined)
        anyAt("__vecsum").map(
          _.asInstanceOf[scala.collection.Seq[Double]].toSeq)
      else None
    val cols = scalarCols.map { f =>
      val isNum = f.dataType.isInstanceOf[NumericType]
      def d(n: String): Option[Double] =
        anyAt(s"${f.name}__$n").map(_.asInstanceOf[Number].doubleValue)
      def s(n: String): Option[String] =
        anyAt(s"${f.name}__$n").map(_.asInstanceOf[String])
      def l(n: String): Long =
        anyAt(s"${f.name}__$n").map(_.asInstanceOf[Number].longValue)
          .getOrElse(0L)
      f.name -> ColStats(isNum, d("minN"), d("maxN"), s("minS"), s("maxS"),
        l("nulls"), l("ndv"))
    }.toMap ++ presenceOnly
    val rows =
      anyAt("__rows").map(_.asInstanceOf[Number].longValue).getOrElse(0L)
    // categorical blooms: one extra pass collecting the exact distinct set
    // of every LOW-cardinality string column (approx ndv ≤ CatBloom.MaxNdv
    // — the sets are bounded, so collect_set is driver-safe), folded into
    // fixed-size bloom bits for mid-range Eq/In miss pruning
    val bloomCols = scalarCols.collect {
      case StructField(n, StringType, _, _)
        if rows > 0 && cols(n).ndv > 0 && cols(n).ndv <= CatBloom.MaxNdv => n
    }
    // equi-width histograms for numeric columns with known non-degenerate
    // bounds — they ride in ONE extra agg together with the bloom sets
    // (bounds come from the first pass, so this pass was needed anyway)
    val histCols = scalarCols.collect {
      case StructField(n, _: NumericType, _, _)
        if rows > 0 && cols(n).minN.exists(lo =>
          cols(n).maxN.exists(_ > lo)) => n
    }
    // without a dim hint the centroid sum joins this pass (needs the dim
    // from pass 1); WITH one (steady-state inserts) the centroid is
    // already in hand and the RADIUS rides here instead — either way a
    // schema with any non-degenerate numeric column pays this pass anyway
    val vecSumAgg = vecCol.zip(vecDim).collect {
      case (vc, d) if rows > 0 && vecSum1.isEmpty =>
        graft.functions.vec_sum_double(col(vc), d).as("__vecsum")
    }
    val centroid1: Option[Array[Double]] =
      vecSum1.map(_.map(_ / rows).toArray)
    val radiusAgg = vecCol.zip(centroid1).collect {
      case (vc, c) if rows > 0 =>
        max(graft.functions.vec_l2(col(vc),
          lit(c.map(_.toFloat)))).as("__radius")
    }
    val (colsB, vecSumRow, radius2) =
      if (bloomCols.isEmpty && histCols.isEmpty && vecSumAgg.isEmpty &&
          radiusAgg.isEmpty)
        (cols, None, None)
      else {
        val aggsB: Seq[org.apache.spark.sql.Column] =
          bloomCols.toSeq.map(n => collect_set(col(n)).as(s"__set_$n")) ++
            histCols.toSeq.flatMap { n =>
              val lo = cols(n).minN.get; val hi = cols(n).maxN.get
              val w = (hi - lo) / HistBins
              val bin = least(lit(HistBins - 1),
                floor((col(n).cast("double") - lo) / w).cast("int"))
              (0 until HistBins).map(b =>
                count(when(col(n).isNotNull && bin === b, 1))
                  .as(s"__hist_${n}__$b"))
            } ++ vecSumAgg ++ radiusAgg
        val rowB = df.agg(aggsB.head, aggsB.tail: _*).collect()(0)
        val withBloom = cols ++ bloomCols.map { n =>
          val vs = rowB.getSeq[String](rowB.fieldIndex(s"__set_$n"))
          // the exact distinct set is in hand — pin ndv to its size.
          // approx_count_distinct's HLL error otherwise leaks into
          // eqFrac's "full coverage: absent → 0.0" branch, which treats
          // ndv as exact: an HLL under-count could zero the estimated
          // selectivity of a genuinely present tail value and skew the
          // pre/post-filter routing (estimation only — canPrune uses the
          // bloom itself, never ndv).
          n -> cols(n).copy(bloom = Some(CatBloom.build(vs)),
            ndv = vs.distinct.size.toLong)
        }
        (withBloom ++ histCols.map { n =>
          val bins = (0 until HistBins).map(b =>
            rowB.getLong(rowB.fieldIndex(s"__hist_${n}__$b"))).toList
          n -> withBloom(n).copy(hist = Some(bins))
        },
          if (vecSumAgg.isEmpty) None
          else Some(rowB.getSeq[Double](rowB.fieldIndex("__vecsum"))),
          if (radiusAgg.isEmpty) None
          else Some(rowB.getDouble(rowB.fieldIndex("__radius"))))
      }
    // exact top-k frequent values for bounded-cardinality string columns:
    // one tiny groupBy job per eligible column (stats collection is a
    // build-time pass; eligibility is the same MaxNdv gate as the bloom)
    val colsT = colsB ++ scalarCols.collect {
      case StructField(n, StringType, _, _)
        if rows > 0 && colsB(n).ndv > 0 &&
          colsB(n).ndv <= CatBloom.MaxNdv => n
    }.map { n =>
      val tops = df.where(col(n).isNotNull)
        .groupBy(col(n)).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col(n).asc)
        .limit(TopK).collect()
        .map(r => TopV(r.getString(0), r.getLong(1))).toList
      n -> colsB(n).copy(topk = Some(tops))
    }
    val vec =
      if (rows == 0) None // empty segment: no vector stats to collect
      else vecCol.map { vc =>
        val centroid = centroid1.orElse(vecSumRow.map(_.map(_ / rows).toArray))
          .getOrElse(throw new IllegalStateException(
            "vector stats requested but no centroid sum was aggregated"))
        val radius = radius2.getOrElse(df
          .select(graft.functions.vec_l2(col(vc),
            lit(centroid.map(_.toFloat))).as("r"))
          .agg(max("r")).collect()(0).getDouble(0))
        VecStats(centroid.toList, radius)
      }
    Stats(rows, colsT, vec)
  }

  /** Can this segment be skipped for this predicate? Conservative: prune
    * only on provable no-match, mirroring vecgo's rules: missing field ⇒
    * prune (a missing field matches nothing); eq/in outside [min,max] ⇒
    * prune; range predicates with disjoint ranges ⇒ prune; `ne` and
    * `contains` never prune (`segment_pruning.go:44-50`).
    */
  def canPrune(stats: Stats, f: Filter): Boolean = {
    def cs(field: String): Option[ColStats] = stats.cols.get(field)
    def numVal(v: Any): Option[Double] = v match {
      case n: Number => Some(n.doubleValue())
      case _ => None
    }
    f match {
      case Filter.Eq(field, v) => cs(field) match {
        case None => true
        case Some(c) if c.num =>
          numVal(v).exists(x => c.minN.exists(x < _) || c.maxN.exists(x > _))
        case Some(c) =>
          v.isInstanceOf[String] && {
            val s = v.asInstanceOf[String]
            c.minS.exists(s < _) || c.maxS.exists(s > _) ||
              // mid-range miss: bounds can't prune but the bloom can
              c.bloom.exists(b => !CatBloom.mightContain(b, s))
          }
      }
      case Filter.In(field, vs) => cs(field) match {
        case None => true
        case Some(c) if c.num =>
          vs.flatMap(numVal).nonEmpty &&
            vs.flatMap(numVal).forall(x => c.minN.exists(x < _) || c.maxN.exists(x > _))
        case Some(c) =>
          vs.forall {
            case s: String =>
              c.minS.exists(s < _) || c.maxS.exists(s > _) ||
                c.bloom.exists(b => !CatBloom.mightContain(b, s))
            case _ => false
          }
      }
      case Filter.Gt(field, v) => cs(field) match {
        case None => true
        case Some(c) => numVal(v).exists(x => c.maxN.exists(_ <= x))
      }
      case Filter.Gte(field, v) => cs(field) match {
        case None => true
        case Some(c) => numVal(v).exists(x => c.maxN.exists(_ < x))
      }
      case Filter.Lt(field, v) => cs(field) match {
        case None => true
        case Some(c) => numVal(v).exists(x => c.minN.exists(_ >= x))
      }
      case Filter.Lte(field, v) => cs(field) match {
        case None => true
        case Some(c) => numVal(v).exists(x => c.minN.exists(_ > x))
      }
      case _ => false // ne / contains: conservative, never prune
    }
  }

  /** AND semantics: a segment is prunable if ANY conjunct proves no-match. */
  def canPruneAll(stats: Stats, filters: Seq[Filter]): Boolean =
    filters.exists(f => canPrune(stats, f))

  /** Manifest-only selectivity estimate for one predicate over one
    * segment: the matching FRACTION of the segment's rows, from stats
    * alone (no scan). Classic System-R defaults — uniform values within
    * [min,max], eq ≈ 1/ndv — with 1.0 (no information) wherever stats
    * can't speak (contains, string ranges, missing column stats). The
    * estimate only steers the pre/post-filter STRATEGY choice (vecgo
    * `search.go:215-233` EstimateCardinality/selectivityCutoff); either
    * strategy returns exact results, so a bad estimate costs time, never
    * correctness.
    */
  def estimateFraction(stats: Stats, f: Filter): Double = {
    def cs(field: String): Option[ColStats] = stats.cols.get(field)
    def numVal(v: Any): Option[Double] = v match {
      case n: Number => Some(n.doubleValue())
      case _ => None
    }
    // fraction of the SEGMENT's rows below x: histogram interpolation
    // when collected (bins count non-null rows, so nulls — which match
    // no predicate — fall out of the numerator naturally), else the
    // uniform [min,max] assumption over non-null rows; None = unknown
    def belowFrac(c: ColStats, x: Double): Option[Double] = c.hist match {
      case Some(bins) if stats.rows > 0 =>
        for (lo <- c.minN; hi <- c.maxN) yield {
          if (x <= lo) 0.0
          else if (x >= hi) bins.sum.toDouble / stats.rows
          else {
            val w = (hi - lo) / bins.length
            val idx = math.min(bins.length - 1, ((x - lo) / w).toInt)
            val below = bins.take(idx).sum +
              bins(idx) * ((x - lo - idx * w) / w)
            below / stats.rows
          }
        }
      case _ =>
        for (lo <- c.minN; hi <- c.maxN)
          yield if (hi <= lo) (if (x >= lo) 1.0 else 0.0)
          else math.min(1.0, math.max(0.0, (x - lo) / (hi - lo)))
    }
    // eq fraction of one value: exact when the value sits in the
    // collected top-k (or provably absent from a FULLY covered column),
    // remainder-uniform when the column has a top-k but the value is in
    // its tail, 1/ndv otherwise (System-R)
    def eqFrac(c: ColStats, v: Any): Double = (v, c.topk) match {
      case (s: String, Some(tops)) if stats.rows > 0 =>
        tops.find(_.v == s) match {
          case Some(t) => t.n.toDouble / stats.rows
          case None if c.ndv <= tops.size => 0.0 // full coverage: absent
          case None =>
            val rest = math.max(0L,
              stats.rows - c.nulls - tops.map(_.n).sum).toDouble
            rest / math.max(1L, c.ndv - tops.size) / stats.rows
        }
      case _ => if (c.ndv > 0) 1.0 / c.ndv else 1.0
    }
    if (canPrune(stats, f)) return 0.0
    f match {
      case Filter.Eq(field, v) =>
        cs(field).map(eqFrac(_, v)).getOrElse(1.0)
      case Filter.In(field, vs) =>
        cs(field).map { c =>
          if (c.topk.isDefined || c.ndv > 0)
            math.min(1.0, vs.distinct.map(eqFrac(c, _)).sum)
          else 1.0
        }.getOrElse(1.0)
      case Filter.Ne(field, v) =>
        cs(field).collect { case c if c.ndv > 0 || c.topk.isDefined =>
          math.max(0.0, 1.0 - eqFrac(c, v)) }.getOrElse(1.0)
      case Filter.Gt(field, v) =>
        (for (c <- cs(field); x <- numVal(v); b <- belowFrac(c, x))
          yield 1.0 - b).getOrElse(1.0)
      case Filter.Gte(field, v) =>
        (for (c <- cs(field); x <- numVal(v); b <- belowFrac(c, x))
          yield 1.0 - b).getOrElse(1.0)
      case Filter.Lt(field, v) =>
        (for (c <- cs(field); x <- numVal(v); b <- belowFrac(c, x))
          yield b).getOrElse(1.0)
      case Filter.Lte(field, v) =>
        (for (c <- cs(field); x <- numVal(v); b <- belowFrac(c, x))
          yield b).getOrElse(1.0)
      case Filter.Contains(_, _) => 1.0
    }
  }

  /** Estimated matching rows of a segment under an AND filter set:
    * rows × Π fraction(conjunct) — the independence assumption. A
    * stats-less segment estimates at full row count (no information).
    */
  def estimateRows(rows: Long, stats: Option[Stats],
      filters: Seq[Filter]): Double = stats match {
    case None => rows.toDouble
    case Some(st) =>
      if (canPruneAll(st, filters)) 0.0
      else rows * filters.map(estimateFraction(st, _)).product
  }

  /** Triangle-inequality distance pruning (vecgo `manifest/stats.go:
    * 626-641` CanPruneByDistance): every vector in the segment is within
    * `radiusMax` of the centroid, so the closest possible point to q is at
    * distance |q − centroid| − radiusMax. If that exceeds the search
    * threshold, skip the segment.
    */
  def canPruneByDistance(vs: VecStats, query: Array[Float],
      threshold: Double): Boolean =
    centroidL2(vs, query) - vs.radiusMax > threshold

  private def centroidL2(vs: VecStats, query: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < vs.centroid.length) {
      val d = query(i).toDouble - vs.centroid(i); s += d * d; i += 1
    }
    math.sqrt(s)
  }

  private def centroidDot(vs: VecStats, query: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < vs.centroid.length) { s += query(i).toDouble * vs.centroid(i); i += 1 }
    s
  }

  private def norm(query: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < query.length) { s += query(i).toDouble * query(i); i += 1 }
    math.sqrt(s)
  }

  /** The BEST score any vector inside the segment's (centroid, radiusMax)
    * ball could achieve against `query`, in the engine's native score
    * units — the metric-complete form of vecgo's `SegmentPriority` /
    * `CanPruneByDistance` (`internal/manifest/stats.go:626-676`):
    *
    *  - L2: min possible SQUARED distance, (max(0, |q−c| − r))² —
    *    triangle inequality.
    *  - Dot: max possible inner product, ⟨q,c⟩ + r·|q| — Cauchy-Schwarz
    *    over the ball.
    *  - Cosine: max possible cosine. The engine L2-normalizes stored
    *    vectors at write time under Cosine, so every x in the segment is
    *    on the unit sphere within r of c: cos(q,x) = ⟨q̂,x⟩ ≤
    *    (⟨q,c⟩ + r·|q|)/|q|, clamped to 1.
    */
  def bestScore(vs: VecStats, query: Array[Float],
      metric: graft.types.Metric): Double = metric match {
    case graft.types.Metric.L2 =>
      val d = math.max(0.0, centroidL2(vs, query) - vs.radiusMax)
      d * d
    case graft.types.Metric.Dot =>
      centroidDot(vs, query) + vs.radiusMax * norm(query)
    case graft.types.Metric.Cosine =>
      val qn = norm(query)
      if (qn == 0.0) 1.0
      else math.min(1.0, (centroidDot(vs, query) + vs.radiusMax * qn) / qn)
    case graft.types.Metric.Hamming =>
      throw new IllegalArgumentException(
        "hamming stores carry packed codes — no float centroid stats")
  }

  /** Can the whole segment be skipped for a threshold (range) search in
    * native score units? Prune when even the segment's best possible score
    * fails the threshold — sound under all three float metrics, so pruning
    * can never drop a qualifying row.
    */
  def canPruneByScore(vs: VecStats, query: Array[Float], threshold: Double,
      metric: graft.types.Metric): Boolean =
    if (metric.ascending) bestScore(vs, query, metric) > threshold
    else bestScore(vs, query, metric) < threshold

  /** Segment visit priority for unfiltered k-NN: ascending centroid
    * distance (vecgo `SegmentPriority`, `manifest/stats.go:643-676`).
    */
  def segmentPriority(segs: Seq[(Long, VecStats)], query: Array[Float]): Seq[Long] =
    segs.sortBy { case (seq, vs) =>
      val d = centroidL2(vs, query)
      (d * d, seq)
    }.map(_._1)

  /** Metric-aware segment visit order: best possible score first (vecgo
    * `SegmentPriority` covers Dot/Cosine via per-metric bounds,
    * `manifest/stats.go:643-676`). Stats-less segments sort last in seq
    * order.
    */
  def segmentPriorityByScore(segs: Seq[(Long, Option[VecStats])],
      query: Array[Float], metric: graft.types.Metric): Seq[Long] =
    segs.sortBy { case (seq, vs) =>
      val best = vs.map(bestScore(_, query, metric))
        .getOrElse(if (metric.ascending) Double.MaxValue else Double.MinValue)
      (if (metric.ascending) best else -best, seq)
    }.map(_._1)
}
