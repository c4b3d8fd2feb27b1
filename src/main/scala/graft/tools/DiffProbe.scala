package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.SnapshotStore

/** Measures the change feed's delta-bound cost claim
  * ([[SnapshotStore.diff]] fast path): a FIXED 50k-row delta diffed out
  * of corpora of growing size. If the feed reads only the window's new
  * files, the time is flat in corpus size; a corpus-proportional slope
  * would falsify the incremental-consumer story. Prints one line per
  * corpus size; run with `sbt "runMain graft.tools.DiffProbe [sizes]"`.
  */
object DiffProbe {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args(0).split(",").map(_.trim.toLong).toSeq
      else Seq(500000L, 2000000L, 5000000L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val delta = 50000L
    for (n <- sizes) {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-diffprobe-$n").toString
      val store = new SnapshotStore(spark, root)
      val base = spark.range(0, n, 1, 8)
        .select(col("id"), (col("id") % 97).as("v"))
      store.insert(base)                                     // v0
      val upd = spark.range(n, n + delta, 1, 8)
        .select(col("id"), (col("id") % 97).as("v"))
      store.insert(upd)                                      // v1
      store.delete(spark.range(0, 1000, 1, 4).toDF("id"))    // v2
      // warm (file listing, codegen), then measure
      store.diff(0, 2).count()
      val runs = Seq.fill(3) {
        val t0 = System.nanoTime()
        val c = store.diff(0, 2).count()
        (System.nanoTime() - t0, c)
      }
      val best = runs.map(_._1).min / 1e9
      println(f"corpus=$n%d delta=$delta feed_rows=${runs.head._2}%d " +
        f"diff_sec=$best%.3f")
      org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(root), true)
    }
    spark.stop()
  }
}
