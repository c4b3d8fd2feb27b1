package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions._

/** Column-level entry points for the native vector expressions, plus SQL
  * registration so `spark.sql("... vec_l2sq(a, b) ...")` works too.
  */
package object functions {

  private def expr(c: Column) = ColumnBridge.expression(c)
  private def asCol(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnBridge.column(e)

  /** Round-robin-widen a SMALL input to the session's parallelism before a
    * CPU-heavy row-local pass (explode, per-token md5, native encode): a
    * bench-scale table is one ~MB parquet file = ONE scan task, so the
    * expensive projection runs single-threaded while every other core
    * idles (r12 OptProbe: windowGrams 2.8 s → 0.3 s, BPE encode 2.3 s →
    * 1.0 s at sf0.1/32 cores). Self-adapting at scale: real corpora scan
    * as >= parallelism splits already, so this is a no-op there — the
    * repartition only fires when the scan is narrower than the cluster,
    * and then it moves only the small input's bytes. Round-robin keeps
    * Spark's sort-before-repartition determinism; row SETS are unchanged.
    */
  def spread_input(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    if (df.isStreaming) return df // micro-batch width is the source's
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (scanWidth(df).exists(_ < p)) df.repartition(p) else df
  }

  /** Planned scan width of a batch frame WITHOUT instantiating its full
    * RDD lineage: the old `.rdd.getNumPartitions` probe compiled codegen
    * and built every operator's RDD chain just to read a partition count
    * — pure driver overhead on wide plans (r12 verdict What's-wrong 4).
    * File scans answer from the scan node's planned splits (a driver-side
    * file-packing computation, no job); other leaf shapes (cached/local/
    * range relations) answer from the leaf's own RDD, which is cheap to
    * build. A plan that already contains an exchange reports None — its
    * downstream width is decided by the shuffle, never the scan, so the
    * caller must leave it alone (matches the old probe: a post-shuffle
    * frame is `spark.sql.shuffle.partitions` wide, never narrower than
    * the session's configured width).
    */
  private[graft] def scanWidth(df: org.apache.spark.sql.DataFrame)
      : Option[Int] = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val plan = df.queryExecution.sparkPlan
    if (plan.exists(_.isInstanceOf[ShuffleExchangeLike])) None
    else {
      val widths = plan.collectLeaves().map {
        case f: FileSourceScanExec => f.inputRDD.getNumPartitions
        case leaf => leaf.execute().getNumPartitions
      }
      // sum matches how unions concatenate their inputs; every call site
      // feeds a single scan-rooted chain, where sum == that scan's width
      if (widths.isEmpty) None else Some(widths.sum)
    }
  }

  /** Squared L2 distance (ascending = closer), double. */
  def vec_l2sq(a: Column, b: Column): Column = asCol(VecL2Sq(expr(a), expr(b)))

  /** Euclidean (root) L2 distance, double. */
  def vec_l2(a: Column, b: Column): Column = sqrt(vec_l2sq(a, b))

  /** Inner product (descending = closer), double. */
  def vec_dot(a: Column, b: Column): Column = asCol(VecDot(expr(a), expr(b)))

  /** Cosine similarity (descending = closer), double. */
  def vec_cos(a: Column, b: Column): Column = asCol(VecCosine(expr(a), expr(b)))

  /** L2 norm of a vector, double. */
  def vec_norm(a: Column): Column = asCol(VecNorm(expr(a)))

  /** Bucket of `id` among sorted `bounds` (#bounds < id) — codegen'd
    * width_bucket analog for arbitrary bounds.
    */
  def lower_bound_bucket(id: Column, bounds: Array[Long]): Column =
    asCol(LowerBoundBucket(expr(id), bounds))

  /** Bucket of double `v` among sorted double `bounds` (#bounds < v). */
  def lower_bound_bucket_d(v: Column, bounds: Array[Double]): Column =
    asCol(LowerBoundBucketD(expr(v), bounds))

  /** Native BPE encode of `text` under a frozen merge list. */
  def bpe_encode(text: Column, merges: Array[Array[String]]): Column =
    asCol(BpeEncode(expr(text), merges))

  /** Exact Jaccard of two sorted distinct array<long> sets when it
    * reaches `minJ`, else -1 — allocation-free sorted-merge with
    * early-exit on the threshold bound (the dedup verify kernel).
    */
  def jaccard_ge_sorted(a: Column, b: Column, minJ: Double): Column =
    asCol(JaccardGeSorted(expr(a), expr(b), minJ))

  /** Hamming distance over packed array<long> binary codes. */
  def vec_hamming(a: Column, b: Column): Column = asCol(VecHamming(expr(a), expr(b)))

  /** Squared L2 distances to a constant query matrix, as array<double> —
    * one tight kernel call per row for batch search.
    */
  def vec_l2sq_multi(a: Column, queries: Array[Array[Float]]): Column =
    asCol(VecL2SqMulti(expr(a), queries))

  /** Rotate by a constant matrix (rows = output dims). */
  def vec_matmul(a: Column, matrix: Array[Array[Float]]): Column =
    asCol(VecMatMul(expr(a), matrix))

  /** PQ encode against constant codebooks (`books(s)` = flat ksub·subDim
    * floats of subspace s) → array<int> of m codes.
    */
  def vec_pq_encode(a: Column, books: Array[Array[Float]],
      ksub: Int, subDim: Int): Column =
    asCol(VecPqEncode(expr(a), books, ksub, subDim))

  /** ADC score of a PQ codes row against a constant per-query table. */
  def vec_pq_adc(codes: Column, table: Array[Double], ksub: Int): Column =
    asCol(VecPqAdc(expr(codes), table, ksub))

  /** All SRP band keys (one matmul per row shared across every sign bit),
    * array<struct<band:int, key:string>>.
    */
  def vec_srp_keys(a: Column, planes: Array[Array[Float]],
      offsets: Array[Double], nbits: Int): Column =
    asCol(VecSrpKeys(expr(a), planes, offsets, nbits))

  /** Pack array<float> → one little-endian float32 blob (binary): the
    * segment storage layout. Parquet writes one value per ROW instead of
    * one per element — 1.7× on segment encode (tools/PackProbe).
    */
  def vec_pack_f32(a: Column): Column = asCol(VecPackF32(expr(a)))

  /** Unpack a packed float32 blob back to array<float> (the public read
    * boundary; the distance expressions accept packed binary directly).
    */
  def vec_unpack_f32(a: Column): Column = asCol(VecUnpackF32(expr(a)))

  /** L2-normalize an array<float> vector (write-time Cosine normalization,
    * mirroring vecgo `hnsw.go:799+` prepareVector). Zero vectors pass
    * through unchanged instead of producing NaN (vecgo refuses the
    * normalize outright, `distance.go:42-53`); one codegen'd kernel pass.
    */
  def vec_normalize(a: Column): Column = asCol(VecNormalizeExpr(expr(a)))

  /** One-pass ingest validation: 0 ok, 2 wrong length, 3 null/NaN/Inf
    * element, 4 zero norm under cosine (float vectors or packed long
    * codes).
    */
  def vec_check(a: Column, expectLen: Int, zeroNormBad: Boolean): Column =
    asCol(VecCheck(expr(a), expectLen, zeroNormBad))

  /** Element-wise sum aggregate over fixed-length array<long> columns
    * (partial-aggregated long[n] buffers — see [[VecSumLong]]).
    */
  def vec_sum_long(a: Column, n: Int): Column =
    asCol(VecSumLong(expr(a), n).toAggregateExpression())

  /** Element-wise sum aggregate over fixed-length array<float|double>
    * columns (partial-aggregated double[n] buffers — see [[VecSumDouble]]).
    */
  def vec_sum_double(a: Column, n: Int): Column =
    asCol(VecSumDouble(expr(a), n).toAggregateExpression())

  /** Register all vector functions for SQL use in this session (temp
    * functions). For cluster-wide registration use
    * `spark.sql.extensions=graft.GraftExtensions` — both paths share the
    * [[SqlFunctions]] builder table.
    */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    SqlFunctions.all.foreach(fn =>
      reg.createOrReplaceTempFunction(fn.name, fn.builder, "built-in"))
  }
}
