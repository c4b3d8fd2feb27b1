package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Is parquet's LIST<FLOAT> element-at-a-time encode the bulk-load floor?
  * Times the same 500k×128d write as array<float> vs a packed binary blob
  * (one 512-byte value per row, no per-element repetition/definition
  * levels) — the layout decision behind the reference's raw-bytes segment
  * files. Also times the read-back scan of each layout into a distance
  * kernel pass, so the write win isn't bought with a scan loss.
  */
object PackProbe {
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
    val tmp = sys.props("java.io.tmpdir")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def report(name: String, sec: Double): Unit =
      println(f"$name%-24s ${sec}%.3f s  ${n / sec / 1000}%.0f k vec/s")
    // pack float[] -> binary via built-in expressions would be interpreted;
    // use a cheap UDF here JUST for the probe (layout cost is what's timed)
    val pack = udf((v: Seq[Float]) => {
      val bb = java.nio.ByteBuffer.allocate(v.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      v.foreach(bb.putFloat); bb.array()
    })
    val listDf = big.select(col("id"), col("vec").as("vector"), col("label"))
    val binDf = big.select(col("id"), pack(col("vec")).as("vector"), col("label"))
      .cache()
    binDf.count()
    for (round <- 1 to 3) {
      println(s"--- round $round")
      report("write_list", time(
        listDf.write.mode("overwrite")
          .option("compression", "uncompressed").parquet(s"$tmp/pp_list")))
      report("write_binary", time(
        binDf.write.mode("overwrite")
          .option("compression", "uncompressed").parquet(s"$tmp/pp_bin")))
      report("write_binary_nodict", time(
        binDf.write.mode("overwrite")
          .option("compression", "uncompressed")
          .option("parquet.enable.dictionary", "false")
          .parquet(s"$tmp/pp_bin_nd")))
      val q = new Array[Float](dim)
      report("scan_list_l2", time {
        val back = spark.read.parquet(s"$tmp/pp_list")
        back.select(sum(graft.functions.vec_l2sq(col("vector"),
          lit(q))).as("s")).head()
      })
      report("scan_binary_len", time {
        val back = spark.read.parquet(s"$tmp/pp_bin")
        back.select(sum(length(col("vector"))).as("s")).head()
      })
    }
    spark.stop()
  }
}
