package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise sum of fixed-length `array<float>` (or `array<double>`)
  * inputs as ONE native aggregate with true partial aggregation — the
  * float twin of [[VecSumLong]]. Each task folds its rows into a single
  * double[n] buffer, so a segment centroid costs one narrow scan with a
  * d-double record per partition on the wire, instead of the
  * posexplode+groupBy alternative that shuffles d rows per input vector
  * (a 128× row blowup at embedding dims — the shape that collapses at
  * 100 TB). Null rows and null elements are skipped (caller decides what
  * nulls mean; the ingest path has already rejected them).
  */
case class VecSumDouble(
    child: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  // lazy: the child's dataType is unknowable while the plan is unresolved
  // (construction happens before analysis)
  private lazy val fromFloat =
    child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): Array[Double] = new Array[Double](n)

  override def update(buf: Array[Double], row: InternalRow): Array[Double] = {
    val v = child.eval(row)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      if (fromFloat) while (i < n) { buf(i) += arr.getFloat(i); i += 1 }
      else while (i < n) { buf(i) += arr.getDouble(i); i += 1 }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < n) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getDouble; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): VecSumDouble =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumDouble =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0))
  override def prettyName: String = "vec_sum_double"
}
