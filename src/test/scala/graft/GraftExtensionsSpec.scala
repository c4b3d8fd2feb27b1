package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions=graft.GraftExtensions` path: a session built
  * with only that conf (no Scala-side registerAll call) must resolve every
  * SQL vector function, and resolve it to the same codegen'd expressions
  * the Column API uses.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  /** Build a session that applies the extension class. `spark.sql
    * .extensions` is a STATIC conf read when the SparkContext is created —
    * the shared test context is already running, so the conf-string path
    * can't be exercised in-process; `builder.withExtensions` feeds the
    * identical injection hook. Temporarily clear the default/active session
    * so getOrCreate builds a NEW SparkSession (reusing the context —
    * stopping it would kill every other suite).
    */
  private def withExtensionSession[A](f: SparkSession => A): A = {
    val prev = SparkTestSession.spark // ensure the context exists
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("conf-injected functions resolve and agree with the Column API") {
    withExtensionSession { s =>
      val row = s.sql(
        """SELECT vec_l2sq(array(1.0f, 2.0f), array(4.0f, 6.0f)) AS l2sq,
          |       vec_l2(array(3.0f, 4.0f), array(0.0f, 0.0f))   AS l2,
          |       vec_dot(array(1.0f, 2.0f), array(3.0f, 4.0f))  AS dot,
          |       vec_cos(array(1.0f, 0.0f), array(1.0f, 0.0f))  AS cos,
          |       vec_norm(array(3.0f, 4.0f))                    AS nrm,
          |       vec_hamming(array(1L, 0L), array(3L, 0L))      AS ham,
          |       vec_normalize(array(3.0f, 4.0f))               AS unit,
          |       vec_check(array(1.0f, 2.0f), 2, false)         AS ok,
          |       vec_check(array(1.0f), 2, false)               AS badlen
          |""".stripMargin).head()
      assert(row.getDouble(0) === 25.0)
      assert(row.getDouble(1) === 5.0)
      assert(row.getDouble(2) === 11.0)
      assert(row.getDouble(3) === 1.0)
      assert(row.getDouble(4) === 5.0)
      assert(row.getLong(5) === 1L)
      assert(row.getSeq[Float](6) === Seq(0.6f, 0.8f))
      assert(row.getInt(7) === 0)
      assert(row.getInt(8) === 2)
    }
  }

  test("wrong arity and non-literal config args fail analysis loudly") {
    withExtensionSession { s =>
      val e1 = intercept[Exception](s.sql("SELECT vec_l2sq(array(1.0f))").head())
      assert(e1.getMessage.contains("2 argument"))
      val e2 = intercept[Exception](
        s.sql("SELECT vec_check(array(1.0f), cast(rand() * 4 as int), false)").head())
      assert(e2.getMessage.contains("literal"))
    }
  }

  test("DESCRIBE FUNCTION surfaces usage docs") {
    withExtensionSession { s =>
      val desc = s.sql("DESCRIBE FUNCTION vec_cos").collect().map(_.getString(0)).mkString("\n")
      assert(desc.contains("cosine similarity"))
    }
  }

  test("GraftSession.builder: recommended defaults, caller overrides win") {
    val prev = SparkTestSession.spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = GraftSession.builder(shufflePartitions = 6)
        .master("local[4]")
        .config("spark.sql.session.timeZone", "America/New_York") // override
        .getOrCreate()
      assert(s.conf.get("spark.sql.shuffle.partitions") == "6")
      assert(s.conf.get("spark.sql.inMemoryColumnarStorage.compressed") == "false")
      assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
      assert(s.conf.get("spark.sql.session.timeZone") == "America/New_York")
      // the extensions conf took effect: SQL vector functions resolve
      assert(s.sql("SELECT vec_l2sq(array(1.0f, 2.0f), array(1.0f, 4.0f)) AS d")
        .head().getDouble(0) == 4.0)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
