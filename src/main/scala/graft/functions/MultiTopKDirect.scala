package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._


/** Fused batch-search aggregate: distance computation + bounded top-k in
  * ONE update call. [[MultiTopK]] consumes a pre-computed distances
  * array, which costs one 100-double `GenericArrayData` allocation plus
  * m megamorphic `getDouble` calls per input row (TypedImperativeAggregate
  * updates are interpreted, outside whole-stage codegen — that
  * materialization is pure overhead). Here the query matrix rides in the
  * aggregate itself: update bulk-copies the row's vector once and runs the
  * primitive kernel per query straight into the heaps — no intermediate
  * array, no boxing, and the kernel honors [[KernelMode]].
  *
  * Buffer/serialize/eval semantics are identical to [[MultiTopK]] (same
  * MultiTopKBuffer, same output shape).
  */
case class MultiTopKDirect(
    vec: Expression,
    id: Expression,
    queries: Array[Array[Float]],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MultiTopKBuffer] {

  private val m = queries.length

  override def children: Seq[Expression] = Seq(vec, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    ArrayType(StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false),
    containsNull = false)

  override def createAggregationBuffer(): MultiTopKBuffer =
    new MultiTopKBuffer(m, k)

  override def update(buf: MultiTopKBuffer, row: InternalRow): MultiTopKBuffer = {
    val v = vec.eval(row)
    if (v != null) {
      // segments store vectors packed (binary) or as array<float>
      val af = v match {
        case b: Array[Byte] => DistanceKernels.bytesToFloats(b)
        case a: ArrayData => a.toFloatArray()
      }
      val idv = id.eval(row).asInstanceOf[Long]
      val fast = KernelMode.fast
      // NOTE: a query-vertical multi-query kernel (one accumulator lane
      // per query, no reduceLanes — SimdKernels.l2sqMultiVertical) was
      // built and measured as the alternative here: single-thread it is
      // within noise of these per-query horizontal calls (~68 vs 60
      // Mdist/s, tools/BatchKernelProbe) and inside the aggregate it
      // REGRESSED knn_dist_per_sec_big ~20% (254-309M vs 359-384M across
      // runs). This box's double-pumped AVX-512 (~2.9 G vec-FMA/s/thread
      // ceiling, tools/FmaCeiling) makes the extra broadcast+pad ops cost
      // more than the saved reductions. Kept unwired; revisit on
      // hardware with full-width FMA units.
      var q = 0
      while (q < m) {
        val d =
          if (fast) DistanceKernels.l2sqFFfast(af, queries(q))
          else DistanceKernels.l2sqFF(af, queries(q))
        buf.insert(q, d, idv)
        q += 1
      }
    }
    buf
  }

  override def merge(a: MultiTopKBuffer, b: MultiTopKBuffer): MultiTopKBuffer = {
    a.mergeFrom(b); a
  }

  override def eval(buf: MultiTopKBuffer): Any = reuse.eval(buf)
  override def serialize(buf: MultiTopKBuffer): Array[Byte] = reuse.serialize(buf)
  override def deserialize(bytes: Array[Byte]): MultiTopKBuffer = reuse.deserialize(bytes)
  // delegate the buffer plumbing to MultiTopK so the formats stay in sync
  private lazy val reuse = MultiTopK(vec, id, m, k)

  override def withNewMutableAggBufferOffset(o: Int): MultiTopKDirect =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MultiTopKDirect =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(vec = cs(0), id = cs(1))
  override def prettyName: String = "multi_top_k_direct"
}
