package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposition probe for the deferred bulk-load gap (round-6 verdict,
  * ask 6: ~607 k vec/s vs the reference's 2.06 M): times each layer of
  * the 500k engine write separately — raw cached-scan, plain parquet
  * write (dict on/off), validated write, full engine insert — so the gap
  * attributes to encode vs validation vs commit instead of guesswork.
  */
object BulkLoadProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 500000L
    val dim = 128
    val big = graft.Bench.synthVectors(spark, n, dim).cache()
    big.count()
    val input = big.select(col("id"), col("vec").as("vector"), col("label"))
    val tmp = sys.props("java.io.tmpdir")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def report(name: String, sec: Double): Unit =
      println(f"$name%-28s ${sec}%.3f s  ${n / sec / 1000}%.0f k vec/s")
    // warm-up
    input.write.format("noop").mode("overwrite").save()
    for (round <- 1 to 3) {
      println(s"--- round $round")
      report("noop_scan", time(
        input.write.format("noop").mode("overwrite").save()))
      report("parquet_plain", time(
        input.write.mode("overwrite")
          .option("compression", "uncompressed").parquet(s"$tmp/blp_plain")))
      report("parquet_nodict", time(
        input.write.mode("overwrite")
          .option("compression", "uncompressed")
          .option("parquet.enable.dictionary", "false")
          .parquet(s"$tmp/blp_nodict")))
      report("parquet_nodict_bloom", time(
        input.write.mode("overwrite")
          .option("compression", "uncompressed")
          .option("parquet.enable.dictionary", "false")
          .option("parquet.bloom.filter.enabled#id", "true")
          .parquet(s"$tmp/blp_ndb")))
      report("parquet_dict_bloom", time(
        input.write.mode("overwrite")
          .option("compression", "uncompressed")
          .option("parquet.bloom.filter.enabled#id", "true")
          .parquet(s"$tmp/blp_db")))
      // full engine path (fresh store each time so seq/commit cost is flat)
      val bulkDir = s"$tmp/blp_store_$round"
      val fs = new org.apache.hadoop.fs.Path(bulkDir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(bulkDir), true)
      val db = graft.GraftDB.open(spark, bulkDir, dim = dim, metric = "l2")
      report("engine_insert_nostats", time(
        db.insertBatch(input, collectStats = false)))
    }
    spark.stop()
  }
}
