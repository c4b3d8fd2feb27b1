package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-query bounded top-k state: for each of m queries, the best k
  * (score, id) pairs kept insertion-sorted ascending by (score, id).
  */
final class MultiTopKBuffer(val m: Int, val k: Int) {
  val scores: Array[Array[Double]] = Array.ofDim[Double](m, k)
  val ids: Array[Array[Long]] = Array.ofDim[Long](m, k)
  val sizes: Array[Int] = new Array[Int](m)

  def insert(q: Int, d: Double, id: Long): Unit = {
    val n = sizes(q)
    val ss = scores(q); val ii = ids(q)
    if (n == k && (d > ss(k - 1) || (d == ss(k - 1) && id >= ii(k - 1)))) return
    var pos = math.min(n, k - 1)
    while (pos > 0 && (ss(pos - 1) > d || (ss(pos - 1) == d && ii(pos - 1) > id))) {
      ss(pos) = ss(pos - 1); ii(pos) = ii(pos - 1); pos -= 1
    }
    ss(pos) = d; ii(pos) = id
    if (n < k) sizes(q) = n + 1
  }

  def mergeFrom(o: MultiTopKBuffer): Unit = {
    var q = 0
    while (q < m) {
      var j = 0
      while (j < o.sizes(q)) { insert(q, o.scores(q)(j), o.ids(q)(j)); j += 1 }
      q += 1
    }
  }
}

/** Batch-search top-k as ONE native aggregate: input rows are
  * (distances array<double>, id), one per data vector; the buffer keeps m
  * bounded heaps of size k — vecgo's per-segment bounded heaps
  * (`internal/searcher/queue.go:190-219` TryPushBounded) as a Catalyst
  * TypedImperativeAggregate. Compared to explode+groupBy this moves
  * m× fewer rows through the aggregate machinery: the per-row cost is one
  * primitive compare per query (plus a shift only on improvement), and the
  * shuffle carries one serialized buffer per partition.
  *
  * Output: array over queries of array<struct<score double, id long>>,
  * each inner array sorted ascending (best first).
  */
case class MultiTopK(
    distances: Expression,
    id: Expression,
    m: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MultiTopKBuffer] {

  override def children: Seq[Expression] = Seq(distances, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    ArrayType(StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false),
    containsNull = false)

  override def createAggregationBuffer(): MultiTopKBuffer =
    new MultiTopKBuffer(m, k)

  override def update(buf: MultiTopKBuffer, row: InternalRow): MultiTopKBuffer = {
    val ds = distances.eval(row)
    if (ds != null) {
      val arr = ds.asInstanceOf[ArrayData]
      val idv = id.eval(row).asInstanceOf[Long]
      var q = 0
      while (q < m) { buf.insert(q, arr.getDouble(q), idv); q += 1 }
    }
    buf
  }

  override def merge(a: MultiTopKBuffer, b: MultiTopKBuffer): MultiTopKBuffer = {
    a.mergeFrom(b); a
  }

  override def eval(buf: MultiTopKBuffer): Any = {
    val out = new Array[Any](m)
    var q = 0
    while (q < m) {
      val inner = new Array[Any](buf.sizes(q))
      var j = 0
      while (j < buf.sizes(q)) {
        inner(j) = InternalRow(buf.scores(q)(j), buf.ids(q)(j))
        j += 1
      }
      out(q) = new GenericArrayData(inner)
      q += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: MultiTopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.m * 4 + buf.m * buf.k * 16)
    bb.putInt(buf.m); bb.putInt(buf.k)
    var q = 0
    while (q < buf.m) {
      bb.putInt(buf.sizes(q))
      var j = 0
      while (j < buf.sizes(q)) {
        bb.putDouble(buf.scores(q)(j)); bb.putLong(buf.ids(q)(j)); j += 1
      }
      q += 1
    }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  override def deserialize(bytes: Array[Byte]): MultiTopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val mm = bb.getInt; val kk = bb.getInt
    val buf = new MultiTopKBuffer(mm, kk)
    var q = 0
    while (q < mm) {
      val n = bb.getInt
      buf.sizes(q) = n
      var j = 0
      while (j < n) {
        buf.scores(q)(j) = bb.getDouble; buf.ids(q)(j) = bb.getLong; j += 1
      }
      q += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MultiTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MultiTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(distances = cs(0), id = cs(1))
  override def prettyName: String = "multi_top_k"
}
