package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Is the 100-query batch kernel scan bound by the compressed in-memory
  * columnar cache? Times the same MultiTopKDirect batch over: compressed
  * cache (default), uncompressed cache, and raw parquet (page cache).
  */
object CacheCodecProbe {
  def main(args: Array[String]): Unit = {
    val n = 500000L
    def run(compressed: Boolean): Unit = {
      val spark = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.inMemoryColumnarStorage.compressed",
          compressed.toString)
        .config("spark.ui.enabled", "false")
        .appName(s"codec_$compressed")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val dir = s"${sys.props("java.io.tmpdir")}/ccp_synth"
      graft.Bench.synthVectors(spark, n, 128).write.mode("overwrite")
        .parquet(dir)
      val cached = spark.read.parquet(dir).cache()
      cached.count()
      val plain = spark.read.parquet(dir)
      val queries = (0 until 100).map { s =>
        (s.toLong, Array.tabulate(128)(i =>
          (((s * 131 + i * 7919) % 1000) / 500.0 - 1.0).toFloat))
      }
      def time(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
        def once(): Double = {
          val t0 = System.nanoTime()
          graft.query.Search.batchSearchMatrix(df, "vec", "id", queries, 10)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once() // warm
        val t = Seq(once(), once(), once()).min
        println(f"compressed=$compressed $name: $t%.3f s  ${100 * n / t / 1e6}%.0f M dist/s")
      }
      time("cached", cached)
      time("parquet", plain)
      spark.stop()
    }
    run(compressed = true)
    run(compressed = false)
  }
}
