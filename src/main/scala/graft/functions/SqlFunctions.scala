package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Sqrt}
import org.apache.spark.sql.types.{BooleanType, IntegerType}

/** The SQL-callable slice of the vector expression library: one table of
  * (name, arity, usage, builder) shared by both registration paths —
  * per-session temp functions ([[graft.functions.registerAll]]) and the
  * cluster-wide `spark.sql.extensions=graft.GraftExtensions` injection
  * ([[graft.GraftExtensions]]). Only expressions whose every parameter is
  * expressible as a SQL argument appear here; the constant-matrix
  * expressions (PQ/SRP/matmul/multi-query) need driver-built model arrays
  * and stay Column-API-only.
  */
object SqlFunctions {

  final case class Fn(
      name: String,
      arity: Int,
      usage: String,
      builder: Seq[Expression] => Expression)

  private def check(name: String, arity: Int)(es: Seq[Expression]): Unit =
    if (es.length != arity)
      throw new IllegalArgumentException(
        s"$name expects $arity argument(s), got ${es.length}")

  /** Evaluate a foldable literal argument at resolution time (`vec_check`'s
    * config params are scalars of the call site, not per-row data).
    */
  private def lit[T](name: String, arg: String, e: Expression): T = {
    if (!e.foldable)
      throw new IllegalArgumentException(s"$name: $arg must be a literal")
    e.eval(null).asInstanceOf[T]
  }

  val all: Seq[Fn] = Seq(
    Fn("vec_l2sq", 2, "vec_l2sq(a, b) - squared L2 distance between two array<float> vectors",
      es => { check("vec_l2sq", 2)(es); VecL2Sq(es(0), es(1)) }),
    Fn("vec_l2", 2, "vec_l2(a, b) - Euclidean distance between two array<float> vectors",
      es => { check("vec_l2", 2)(es); Sqrt(VecL2Sq(es(0), es(1))) }),
    Fn("vec_dot", 2, "vec_dot(a, b) - inner product of two array<float> vectors",
      es => { check("vec_dot", 2)(es); VecDot(es(0), es(1)) }),
    Fn("vec_cos", 2, "vec_cos(a, b) - cosine similarity of two array<float> vectors",
      es => { check("vec_cos", 2)(es); VecCosine(es(0), es(1)) }),
    Fn("vec_norm", 1, "vec_norm(a) - L2 norm of an array<float> vector",
      es => { check("vec_norm", 1)(es); VecNorm(es(0)) }),
    Fn("vec_hamming", 2, "vec_hamming(a, b) - Hamming distance over packed array<bigint> codes",
      es => { check("vec_hamming", 2)(es); VecHamming(es(0), es(1)) }),
    Fn("vec_normalize", 1, "vec_normalize(a) - L2-normalize an array<float> vector (zero vectors pass through)",
      es => { check("vec_normalize", 1)(es); VecNormalizeExpr(es(0)) }),
    Fn("vec_pack_f32", 1, "vec_pack_f32(a) - pack array<float> into a little-endian float32 blob (segment layout)",
      es => { check("vec_pack_f32", 1)(es); VecPackF32(es(0)) }),
    Fn("vec_unpack_f32", 1, "vec_unpack_f32(b) - unpack a little-endian float32 blob back to array<float>",
      es => { check("vec_unpack_f32", 1)(es); VecUnpackF32(es(0)) }),
    Fn("vec_check", 3, "vec_check(a, expect_len, zero_norm_bad) - ingest validation code (0 ok, 2 bad length, 3 non-finite, 4 zero norm)",
      es => {
        check("vec_check", 3)(es)
        VecCheck(es(0),
          lit[Int]("vec_check", "expect_len", es(1)),
          lit[Boolean]("vec_check", "zero_norm_bad", es(2)))
      })
  )
}
