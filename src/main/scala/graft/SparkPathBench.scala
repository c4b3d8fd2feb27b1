package graft
// scratch profiling main (not part of the public API): bulk-load write-path
// codec / layout experiments
object SparkPathBench {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 50000L
    val tmp = sys.props("java.io.tmpdir")
    def time(name: String)(f: => Unit): Unit = {
      f; val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name: $s%.3f s  (${n / s / 1000}%.0f k vec/s)")
    }
    val src = Bench.synthVectors(spark, n, 128)
    time("write_snappy")(src.write.mode("overwrite")
      .parquet(s"$tmp/bp_snappy"))
    time("write_uncompressed")(src.write.mode("overwrite")
      .option("compression", "uncompressed").parquet(s"$tmp/bp_unc"))
    time("write_zstd")(src.write.mode("overwrite")
      .option("compression", "zstd").parquet(s"$tmp/bp_zstd"))
    // how much is the synthesis itself?
    time("noop_synth")(src.write.format("noop").mode("overwrite").save())
    // cached source → write isolates the writer cost
    val cached = src.cache(); cached.count()
    time("write_snappy_cached")(cached.write.mode("overwrite")
      .parquet(s"$tmp/bp_snappy2"))
    time("write_unc_cached")(cached.write.mode("overwrite")
      .option("compression", "uncompressed").parquet(s"$tmp/bp_unc2"))
    spark.stop()
  }
}
