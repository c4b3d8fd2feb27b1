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
    time("write_uncompressed")(src.write.mode("overwrite")
      .option("compression", "uncompressed").parquet(s"$tmp/bp_unc"))
    // how much is the synthesis itself?
    time("noop_synth")(src.write.format("noop").mode("overwrite").save())
    // cached source → write isolates the writer cost
    val cached = src.cache(); cached.count()
    time("write_unc_cached")(cached.write.mode("overwrite")
      .option("compression", "uncompressed").parquet(s"$tmp/bp_unc2"))
    // engine deferred bulk load (single-pass inline validation)
    import org.apache.spark.sql.functions._
    val fs = new org.apache.hadoop.fs.Path(s"$tmp/bp_db").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$tmp/bp_db"), true)
    val db = GraftDB.open(spark, s"$tmp/bp_db", dim = 128, metric = "l2")
    val input = cached.select(col("id"), col("vec").as("vector"), col("label"))
    time("engine_insert_nostats")(db.insertBatch(input, collectStats = false))
    time("engine_insert_stats")(db.insertBatch(input, collectStats = true))
    // where does the non-write time go?
    val prepared = input.cache(); prepared.count()
    time("write_prepared_direct")(prepared.write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#id", "true")
      .option("compression", "uncompressed").parquet(s"$tmp/bp_unc3"))
    time("footer_count")(spark.read.parquet(s"$tmp/bp_unc3").count())
    time("validated_noop") {
      val v = input.withColumn("vector",
        when(col("vector").isNull, raise_error(lit("x")).cast("array<float>"))
          .otherwise(col("vector")))
      v.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
