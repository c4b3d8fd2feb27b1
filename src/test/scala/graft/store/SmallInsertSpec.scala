package graft.store

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The driver-side small-batch segment writer (r13): a LOCAL batch under
  * the row cap must commit WITHOUT a Spark job (stats off), keep the
  * validation contract, and be indistinguishable on every read path from
  * a Spark-written segment.
  */
class SmallInsertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshDb(dim: Int = 4, metric: String = "l2") = {
    val root = java.nio.file.Files.createTempDirectory("small-ins").toString
    graft.GraftDB.open(spark, root, dim = dim, metric = metric)
  }

  private def localBatch(n: Int, dim: Int = 4, off: Long = 0L) = {
    val rows = (0 until n).map { i =>
      (i.toLong + off, Array.tabulate(dim)(d => (i + d + 1).toFloat), s"l$i")
    }
    spark.createDataFrame(rows).toDF("id", "vector", "label")
  }

  test("a small local insert (stats off) runs zero Spark jobs") {
    val db = freshDb()
    val jobs = new AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    db.insertBatch(localBatch(100), collectStats = false)
    spark.sparkContext.addSparkListener(l)
    try {
      db.insertBatch(localBatch(100, off = 100), collectStats = false)
      // listener delivery is async
      Thread.sleep(500)
      assert(jobs.get() === 0, "small local insert must not schedule a job")
    } finally spark.sparkContext.removeSparkListener(l)
    assert(db.read().count() === 200)
  }

  test("fast-path segments read back exactly like Spark-written ones") {
    val db = freshDb()
    db.insertBatch(localBatch(50), collectStats = true)
    // a distributed batch (spark.range is NOT a LocalRelation → Spark path)
    val dist = spark.range(50, 100, 1, 2).select(
      col("id"),
      transform(sequence(lit(0), lit(3)),
        i => (col("id") + i + 1).cast("float")).as("vector"),
      concat(lit("l"), col("id")).as("label"))
    db.insertBatch(dist, collectStats = true)
    val all = db.read().orderBy("id").collect()
    assert(all.length === 100)
    assert(all.map(_.getLong(0)).toSeq === (0L until 100L))
    // vectors identical across both write paths
    assert(all(0).getSeq[Float](1) === Seq(1f, 2f, 3f, 4f))
    assert(all(99).getSeq[Float](1) === Seq(100f, 101f, 102f, 103f))
    // a stats-gated pruned scan over both segments still answers exactly
    val pruned = db.scan(
      Seq(graft.types.Filter.Gt("id", 95L)), Seq("id")).collect()
    assert(pruned.map(_.getLong(0)).sorted.toSeq === Seq(96L, 97L, 98L, 99L))
  }

  test("validation still raises on a bad local row (driver evaluation)") {
    val db = freshDb()
    val bad = spark.createDataFrame(Seq(
      (1L, Array(1f, 2f, 3f), "short"))).toDF("id", "vector", "label")
    val e = intercept[IllegalArgumentException] {
      db.insertBatch(bad, collectStats = false)
    }
    assert(e.getMessage.contains("invalid vectors"))
    // nothing was committed: the store has no readable version
    intercept[IllegalStateException] { db.read() }
  }

  test("hamming (array<long> codes) local batches take the fast path too") {
    val db = freshDb(dim = 64, metric = "hamming")
    val rows = (0 until 30).map(i => (i.toLong, Array(i.toLong, ~i.toLong)))
    db.insertBatch(
      spark.createDataFrame(rows).toDF("id", "vector"), collectStats = true)
    assert(db.read().count() === 30)
    val got = db.read().where(col("id") === 7L).collect()(0).getSeq[Long](1)
    assert(got === Seq(7L, ~7L))
  }

  test("deletes and compaction see fast-path segments (lifecycle parity)") {
    val db = freshDb()
    db.insertBatch(localBatch(200), collectStats = true)
    db.delete((0L until 50L))
    assert(db.read().count() === 150)
    db.compact()
    assert(db.read().count() === 150)
    assert(db.read().orderBy("id").collect().head.getLong(0) === 50L)
  }

  test("a large local batch falls back to the Spark writer") {
    val db = freshDb()
    val n = SnapshotStore.SmallInsertMaxRows + 1
    val rows = (0 until n).map { i =>
      (i.toLong, Array(1f, 2f, 3f, 4f), "x")
    }
    db.insertBatch(spark.createDataFrame(rows).toDF("id", "vector", "label"),
      collectStats = false)
    assert(db.read().count() === n)
  }
}
