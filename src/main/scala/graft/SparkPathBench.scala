package graft

import org.apache.spark.sql.SparkSession
import graft.query.Search

object SparkPathBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dim = 128
    val rnd = new java.util.Random(7L)
    val queries: Seq[(Long, Array[Float])] = (0 until 100).map(i =>
      i.toLong -> Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    graft.functions.KernelMode.fast = true
    for (n <- Seq(500000, 500000, 1000000, 2000000, 4000000)) {
      val df = Bench.synthVectors(spark, n, dim).cache()
      df.count()
      def run(): Double = {
        val t0 = System.nanoTime()
        Search.batchSearchMatrix(df, "vec", "id", queries, k = 10)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run()
      val t = math.min(run(), run())
      println(f"PATHBENCH n=$n%d t=$t%.3f rate=${100.0 * n / t / 1e6}%.1f M/s")
      df.unpersist()
    }
    spark.stop()
  }
}
