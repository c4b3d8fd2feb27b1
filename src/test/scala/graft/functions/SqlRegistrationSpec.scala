package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The SQL surface: registered vector functions usable from spark.sql. */
class SqlRegistrationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("vec_* functions register and run from SQL") {
    graft.functions.registerAll(spark)
    Seq((1L, Array(1f, 0f), Array(0f, 1f))).toDF("id", "a", "b")
      .createOrReplaceTempView("vecs")
    val r = spark.sql(
      """SELECT vec_l2sq(a, b) AS l2, vec_dot(a, b) AS d,
        |       vec_cos(a, a) AS c, vec_norm(a) AS n
        |FROM vecs""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 2.0)
    assert(r.getDouble(1) == 0.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(r.getDouble(3) == 1.0)
    val h = spark.sql(
      "SELECT vec_hamming(array(0L, 255L), array(0L, 0L)) AS h").collect()(0)
    assert(h.getLong(0) == 8L)
  }
}
