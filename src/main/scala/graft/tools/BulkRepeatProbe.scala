package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Does a repeated 500k insert into the SAME store degrade (manifest
  * growth / version accumulation), or is the bench's flat ~1.05 s a
  * warmup artifact? Runs 6 consecutive inserts into one store vs a fresh
  * store each time, same process.
  */
object BulkRepeatProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 500000L
    val big = graft.Bench.synthVectors(spark, n, 128).cache()
    big.count()
    val input = big.select(col("id"), col("vec").as("vector"), col("label"))
    val tmp = sys.props("java.io.tmpdir")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def freshDb(name: String) = {
      val dir = s"$tmp/brp_$name"
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      graft.GraftDB.open(spark, dir, dim = 128, metric = "l2")
    }
    val same = freshDb("same")
    for (i <- 1 to 6)
      println(f"same-store insert $i: ${time(same.insertBatch(input, collectStats = false))}%.3f s")
    for (i <- 1 to 3)
      println(f"fresh-store insert $i: ${time(freshDb(s"f$i").insertBatch(input, collectStats = false))}%.3f s")
    spark.stop()
  }
}
