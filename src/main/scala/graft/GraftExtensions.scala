package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.SqlFunctions

/** Cluster-wide SQL registration of the vector function library:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * makes `vec_l2sq`/`vec_l2`/`vec_dot`/`vec_cos`/`vec_norm`/`vec_hamming`/
  * `vec_normalize`/`vec_check` available to every session on the cluster —
  * including SQL-only clients (Thrift/Connect) that never touch the Scala
  * Column API. The same builder table backs the per-session
  * [[graft.functions.registerAll]] path, so SQL and Column calls resolve to
  * the identical codegen'd Catalyst expressions (vecgo's distance surface,
  * `distance.go:17-60`, exposed as SQL functions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    SqlFunctions.all.foreach { fn =>
      ext.injectFunction((
        FunctionIdentifier(fn.name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, fn.name,
          fn.usage, "", "", "", "", "", "", "built-in"),
        fn.builder))
    }
}
