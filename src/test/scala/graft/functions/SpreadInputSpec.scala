package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** `spread_input` widens narrow scans without instantiating the frame's
  * full RDD lineage (r13: the width probe moved from `.rdd` onto the scan
  * node itself — these tests pin the decision semantics of the new probe).
  */
class SpreadInputSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private def p = spark.sparkContext.defaultParallelism

  test("a single-file parquet scan is widened to defaultParallelism") {
    val dir = java.nio.file.Files.createTempDirectory("spread-one").toString
    spark.range(0, 1000, 1, 1).select(col("id"), (col("id") * 2).as("v"))
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    assert(graft.functions.scanWidth(df).contains(1))
    val out = graft.functions.spread_input(df)
    assert(out.rdd.getNumPartitions === p)
    // row set unchanged
    assert(out.agg(sum("v")).head.getLong(0) ===
      df.agg(sum("v")).head.getLong(0))
  }

  test("filters and projections above the scan do not hide its width") {
    val dir = java.nio.file.Files.createTempDirectory("spread-proj").toString
    spark.range(0, 1000, 1, 1).select(col("id"), (col("id") * 3).as("v"))
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).where(col("id") < 500).select("v")
    assert(graft.functions.scanWidth(df).contains(1))
    assert(graft.functions.spread_input(df).rdd.getNumPartitions === p)
  }

  test("a frame at or above parallelism is returned unchanged (same plan)") {
    val dir = java.nio.file.Files.createTempDirectory("spread-wide").toString
    spark.range(0, 1000, 1, 8).write.mode("overwrite").parquet(dir)
    // 8 part files >= local[4] parallelism: probe must report >= p and
    // spread_input must return the SAME frame, not a repartitioned copy
    val df = spark.read.parquet(dir)
    assert(graft.functions.scanWidth(df).exists(_ >= p))
    assert(graft.functions.spread_input(df) eq df)
  }

  test("a plan that already contains an exchange is left alone") {
    val dir = java.nio.file.Files.createTempDirectory("spread-exch").toString
    spark.range(0, 100, 1, 1).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).repartition(2)
    assert(graft.functions.scanWidth(df).isEmpty)
    assert(graft.functions.spread_input(df) eq df)
    // idempotence: spreading a spread frame is a no-op
    val once = graft.functions.spread_input(spark.read.parquet(dir))
    assert(graft.functions.spread_input(once) eq once)
  }

  test("cached (in-memory) relations answer from the cached leaf") {
    val df = spark.range(0, 100, 1, 1).toDF("id").cache()
    try {
      df.count()
      assert(graft.functions.scanWidth(df).contains(1))
      assert(graft.functions.spread_input(df).rdd.getNumPartitions === p)
    } finally df.unpersist()
  }
}
