package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off wall-clock probe for a single SparkEntry query (warm-up run
  * + 2 timed runs) — cheaper than a full Bench cycle when iterating on
  * one operator's plan.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val name = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).collect() // warm
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).collect()
      println(f"[qtime] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
