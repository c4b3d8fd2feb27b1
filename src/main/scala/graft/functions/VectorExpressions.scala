package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector distances. These stay inside
  * whole-stage codegen (the generated Java calls the static kernel
  * forwarders in [[DistanceKernels]]), avoiding the per-row boxing an
  * `Array[Float]` Scala UDF would incur — the main perf lever identified in
  * SURVEY.md §7.3 for the 100 TB k-NN scan path.
  */
private[functions] trait VecBinaryChecks { self: BinaryExpression =>
  protected def expectedElem: DataType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _))
          if l == expectedElem && r == expectedElem =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"${self.prettyName} expects two array<${expectedElem.simpleString}> arguments, got " +
            s"${l.simpleString} and ${r.simpleString}")
    }
}

/** Base for float-vector distances with a constant-query fast path: when
  * the right child is foldable (a literal query vector), it is evaluated
  * ONCE into a primitive float[] and baked into the generated code as a
  * reference object — the hot scan loop then never touches the boxed
  * GenericArrayData a literal would otherwise produce per row (the
  * difference is ~2 orders of magnitude on a 100 TB-shaped scan).
  *
  * Either side may be `array<float>` OR a packed little-endian float32
  * blob (`binary`, the segment storage layout — see
  * [[DistanceKernels.bytesToFloats]]): both materialize to a primitive
  * float[] (one bulk copy, same cost as ArrayData.toFloatArray) before
  * the same kernel, so the scan path runs directly on packed segments
  * with no unpack column in the plan.
  */
private[functions] abstract class VecDistanceBase extends BinaryExpression {
  override def dataType: DataType = DoubleType

  /** base kernel name in [[DistanceKernels]]: `<base>FF` is the exact
    * two-vector kernel, `<base>QF` the const-query KernelMode-dispatching
    * one (matching the pre-packed-layout exact/fast split).
    */
  protected def kernelBase: String
  protected def applyFF(a: Array[Float], b: Array[Float]): Double
  protected def applyQF(a: Array[Float], q: Array[Float]): Double

  private def okSide(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | BinaryType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okSide(left.dataType) && okSide(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float> or packed-binary arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  @inline private def toF(v: Any): Array[Float] = v match {
    case b: Array[Byte] => DistanceKernels.bytesToFloats(b)
    case a: ArrayData => a.toFloatArray()
  }

  @transient protected lazy val constQ: Array[Float] =
    if (right.foldable) {
      val v = right.eval(null)
      if (v == null) null else toF(v)
    } else null

  override def nullSafeEval(a: Any, b: Any): Any =
    if (constQ != null) applyQF(toF(a), constQ)
    else applyFF(toF(a), toF(b))

  // asFloats has ArrayData and byte[] overloads; the generated value's
  // declared Java type (ArrayData vs byte[]) picks the right one
  private val conv = "graft.functions.DistanceKernels.asFloats"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (constQ != null) {
      val ref = ctx.addReferenceObj("qvec", constQ, "float[]")
      val leftGen = left.genCode(ctx)
      val k = s"graft.functions.DistanceKernels.${kernelBase}QF"
      ev.copy(code = code"""
        ${leftGen.code}
        boolean ${ev.isNull} = ${leftGen.isNull};
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) { ${ev.value} = $k($conv(${leftGen.value}), $ref); }""")
    } else {
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.DistanceKernels.${kernelBase}FF($conv($a), $conv($b))")
    }
}

/** Squared L2 distance between two array<float> vectors (double result). */
case class VecL2Sq(left: Expression, right: Expression) extends VecDistanceBase {
  override def prettyName: String = "vec_l2sq"
  protected def kernelBase: String = "l2sq"
  protected def applyFF(a: Array[Float], b: Array[Float]): Double = DistanceKernels.l2sqFF(a, b)
  protected def applyQF(a: Array[Float], q: Array[Float]): Double = DistanceKernels.l2sqQF(a, q)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Inner product between two array<float> vectors (double result). */
case class VecDot(left: Expression, right: Expression) extends VecDistanceBase {
  override def prettyName: String = "vec_dot"
  protected def kernelBase: String = "dot"
  protected def applyFF(a: Array[Float], b: Array[Float]): Double = DistanceKernels.dotFF(a, b)
  protected def applyQF(a: Array[Float], q: Array[Float]): Double = DistanceKernels.dotQF(a, q)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity between two array<float> vectors (double result). */
case class VecCosine(left: Expression, right: Expression) extends VecDistanceBase {
  override def prettyName: String = "vec_cos"
  protected def kernelBase: String = "cosine"
  protected def applyFF(a: Array[Float], b: Array[Float]): Double = DistanceKernels.cosineFF(a, b)
  protected def applyQF(a: Array[Float], q: Array[Float]): Double = DistanceKernels.cosineQF(a, q)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** L2 norm of one array<float> vector (or packed-binary blob). */
case class VecNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"
  private lazy val packed: Boolean = child.dataType == BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_norm expects array<float> or packed binary, got ${t.simpleString}")
  }
  override def nullSafeEval(a: Any): Any = a match {
    case b: Array[Byte] => DistanceKernels.normF(DistanceKernels.bytesToFloats(b))
    case d: ArrayData => DistanceKernels.norm(d)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (packed)
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.DistanceKernels.normF(graft.functions.DistanceKernels.asFloats($a))")
    else defineCodeGen(ctx, ev, a => s"graft.functions.DistanceKernels.norm($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Pack an array<float> vector into the segment storage layout: one
  * little-endian float32 blob (binary). See
  * [[DistanceKernels.floatsToBytes]] for why (parquet encodes one value
  * per row instead of one per element).
  */
case class VecPackF32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "vec_pack_f32"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case BinaryType => TypeCheckResult.TypeCheckFailure(
      "vec_pack_f32: input is already packed binary")
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_pack_f32 expects array<float>, got ${t.simpleString}")
  }
  override def nullSafeEval(a: Any): Any =
    DistanceKernels.packF32(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.DistanceKernels.packF32($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Unpack a packed little-endian float32 blob back to array<float> — the
  * public-read boundary of the packed segment layout.
  */
case class VecUnpackF32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "vec_unpack_f32"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_unpack_f32 expects binary, got ${t.simpleString}")
  }
  override def nullSafeEval(a: Any): Any =
    DistanceKernels.unpackF32(a.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.DistanceKernels.unpackF32($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Lower-bound bucket assignment over a driver-small sorted bounds
  * array: bucket(id) = #bounds strictly below id — the `width_bucket`
  * analog for ARBITRARY (quantile-derived) bounds, as a native codegen'd
  * expression instead of a Scala UDF (a UDF boxes every input and walls
  * off whole-stage codegen; this stays inside the generated loop and
  * calls one static binary search). Used by the sequence-packing
  * exclusive prefix sum ([[graft.pipeline.Packing.packByBudget]]).
  */
case class LowerBoundBucket(child: Expression, bounds: Array[Long])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lower_bound_bucket"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lower_bound_bucket expects an integral id, got ${t.simpleString}")
  }
  override def nullSafeEval(a: Any): Any =
    BucketSearch.bucket(bounds, a.asInstanceOf[Number].longValue)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketBounds", bounds, "long[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.BucketSearch.bucket($ref, (long)$a)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Native BPE encode under a frozen merge list ([[graft.text.Bpe]]): the
  * whole tokenize → code-point-space → merge-fold pipeline as ONE
  * codegen'd call into [[graft.text.BpeRuntime]], instead of the
  * composed Column chain that materializes the char-spaced document
  * once per merge (24 full-string scans/copies per row at the frozen
  * list's size). Byte-identical output by construction — the runtime
  * reuses the exact symbol-array loop the column chain's semantics are
  * pinned to (and `BpeSpec` proves equal on real corpora). NULL for
  * documents with no tokens.
  */
case class BpeEncode(child: Expression, merges: Array[Array[String]])
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_encode"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects a string, got ${t.simpleString}")
  }
  override def nullSafeEval(t: Any): Any =
    graft.text.BpeRuntime.encode(
      t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], merges)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeMerges", merges, "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      UTF8String ${ev.value}Tmp = graft.text.BpeRuntime.encode($c, $m);
      if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Tmp; }
    """)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** [[LowerBoundBucket]] over DOUBLE bounds — the continuous-column twin
  * (quantile bounds of a price/score/timestamp column), used by the
  * Z-order clustering key ([[graft.store.ZOrder]]).
  */
case class LowerBoundBucketD(child: Expression, bounds: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lower_bound_bucket_d"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lower_bound_bucket_d expects a double, got ${t.simpleString}")
  }
  override def nullSafeEval(a: Any): Any =
    BucketSearch.bucketD(bounds, a.asInstanceOf[Number].doubleValue)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketBoundsD", bounds, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.BucketSearch.bucketD($ref, (double)$a)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Hamming (popcount) distance over packed binary codes (array<long>). */
case class VecHamming(left: Expression, right: Expression)
    extends BinaryExpression with VecBinaryChecks {
  protected def expectedElem: DataType = LongType
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_hamming"
  override def nullSafeEval(a: Any, b: Any): Any =
    DistanceKernels.hammingLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DistanceKernels.hammingLong($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Multi-query squared L2: distances from one vector to a CONSTANT matrix
  * of query vectors, as array<double> — the batch-search kernel. The
  * matrix is a codegen reference object (primitive float[][]), so a
  * batch-100 scan does all 100 distances in one tight call per row.
  */
case class VecL2SqMulti(child: Expression, queries: Array[Array[Float]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_l2sq_multi"
  private lazy val packed: Boolean = child.dataType == BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_l2sq_multi expects array<float> or packed binary, got ${t.simpleString}")
  }
  override def nullSafeEval(a: Any): Any = a match {
    case b: Array[Byte] =>
      DistanceKernels.l2sqMultiF(DistanceKernels.bytesToFloats(b), queries)
    case d: ArrayData => DistanceKernels.l2sqMulti(d, queries)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qmat", queries, "float[][]")
    if (packed)
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.DistanceKernels.l2sqMultiF(graft.functions.DistanceKernels.asFloats($a), $ref)")
    else defineCodeGen(ctx, ev, a => s"graft.functions.DistanceKernels.l2sqMulti($a, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** All SRP (sign-random-projection) band keys of a vector against a
  * constant plane matrix, as array<struct<band:int, key:string>> — ONE
  * matmul per row shared across every bit. Composing this from
  * `when(element_at(vec_matmul(...), i) > off)` per bit re-evaluates the
  * matmul per BIT (no cross-branch CSE in Catalyst): quadratic in key
  * width. planes.length must be a multiple of nbits; band b's key is the
  * sign pattern of planes [b*nbits, (b+1)*nbits).
  */
case class VecSrpKeys(child: Expression, planes: Array[Array[Float]],
    offsets: Array[Double], nbits: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("band", IntegerType, nullable = false),
      StructField("key", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "vec_srp_keys"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if planes.nonEmpty &&
        planes.length % nbits == 0 && offsets.length == planes.length =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"vec_srp_keys: planes(${planes.length})/offsets(${offsets.length}) " +
        s"must be a non-empty multiple of nbits=$nbits")
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_srp_keys expects array<float>, got ${t.simpleString}")
  }
  override def nullSafeEval(a: Any): Any =
    DistanceKernels.srpKeys(a.asInstanceOf[ArrayData], planes, offsets, nbits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("srpPlanes", planes, "float[][]")
    val oRef = ctx.addReferenceObj("srpOffsets", offsets, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.DistanceKernels.srpKeys($a, $pRef, $oRef, $nbits)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One-pass ingest validation (0 ok / 2 wrong length / 3 bad element /
  * 4 zero-norm-under-cosine) over array<float> vectors or array<long>
  * packed codes — the codegen'd replacement for the interpreted
  * `exists(vector, λ)` formulation on the write hot path.
  */
case class VecCheck(child: Expression, expectLen: Int, zeroNormBad: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "vec_check"
  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_check expects array<float> or array<long>, got ${t.simpleString}")
  }
  override def nullSafeEval(a: Any): Any =
    if (isFloat)
      DistanceKernels.vecCheckFloat(a.asInstanceOf[ArrayData], expectLen, zeroNormBad)
    else DistanceKernels.vecCheckLong(a.asInstanceOf[ArrayData], expectLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (isFloat)
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.DistanceKernels.vecCheckFloat($a, $expectLen, $zeroNormBad)")
    else defineCodeGen(ctx, ev, a =>
      s"graft.functions.DistanceKernels.vecCheckLong($a, $expectLen)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One-pass L2 normalization (zero-norm rows pass through) — the
  * codegen'd replacement for `transform(a, x / vec_norm(a))`, which ran
  * interpreted and re-evaluated the norm subtree per element.
  */
case class VecNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "vec_normalize"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_normalize expects array<float>, got ${t.simpleString}")
  }
  override def nullSafeEval(a: Any): Any =
    DistanceKernels.normalize(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.DistanceKernels.normalize($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** PQ encode against constant codebooks (`books(s)` = flat ksub·subDim
  * floats of subspace s) → array<int> of m codes. The codebooks ride into
  * generated code as ONE reference object; composing this from per-
  * centroid distance sub-expressions embeds m·ksub·subDim literals — 80+
  * MB task binaries and a 64KB method blowout at real PQ shapes.
  */
case class VecPqEncode(child: Expression, books: Array[Array[Float]],
    ksub: Int, subDim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "vec_pq_encode"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if books.nonEmpty && ksub >= 1 && subDim >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"vec_pq_encode: empty codebooks or bad shape ksub=$ksub subDim=$subDim")
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_pq_encode expects array<float>, got ${t.simpleString}")
  }
  override def nullSafeEval(a: Any): Any =
    DistanceKernels.pqEncode(a.asInstanceOf[ArrayData], books, ksub, subDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", books, "float[][]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.DistanceKernels.pqEncode($a, $ref, $ksub, $subDim)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ADC score of a PQ codes row against a constant per-query table
  * (`table(s·ksub + code)`), L2 or dot depending on how the table was
  * built — m primitive lookups in codegen, replacing the
  * transform+aggregate formulation (boxed lambda eval per element).
  */
case class VecPqAdc(child: Expression, table: Array[Double], ksub: Int)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_pq_adc"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) if table.nonEmpty && ksub >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckFailure(
      s"vec_pq_adc: empty table or bad ksub=$ksub")
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_pq_adc expects array<int> codes, got ${t.simpleString}")
  }
  override def nullSafeEval(a: Any): Any =
    DistanceKernels.pqAdc(a.asInstanceOf[ArrayData], table, ksub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcTable", table, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.DistanceKernels.pqAdc($a, $ref, $ksub)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Dense rotation by a constant matrix (rows = output dims): the OPQ /
  * RaBitQ preprocessing step as a codegen expression.
  */
case class VecMatMul(child: Expression, matrix: Array[Array[Float]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "vec_matmul"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_matmul expects array<float>, got ${t.simpleString}")
  }
  override def nullSafeEval(a: Any): Any =
    DistanceKernels.matMul(a.asInstanceOf[ArrayData], matrix)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rot", matrix, "float[][]")
    defineCodeGen(ctx, ev, a => s"graft.functions.DistanceKernels.matMul($a, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Exact Jaccard of two sorted distinct array<long> sets when it reaches
  * the constant threshold `minJ`, else -1.0 (see
  * [[DistanceKernels.jaccardGeSorted]] — the dedup candidate-verification
  * kernel: one allocation-free sorted-merge pass with early exit, where
  * `size(array_intersect(...))` materialized a hash set + intersection
  * array per candidate pair).
  */
case class JaccardGeSorted(left: Expression, right: Expression, minJ: Double)
    extends BinaryExpression with VecBinaryChecks {
  protected def expectedElem: DataType = LongType
  override def prettyName: String = "jaccard_ge_sorted"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    DistanceKernels.jaccardGeSorted(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], minJ)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DistanceKernels.jaccardGeSorted($a, $b, " +
        s"${java.lang.Double.toString(minJ)}D)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
