package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftDB
import graft.streaming.ChangeFeed

/** Scale point for the store-to-store CDC CONSUMER (round-11 ask 5):
  * [[ChangeFeed.catchUpStore]] — the FULL apply+commit, not just the
  * diff read — at growing corpus sizes with a FIXED 50k-row window.
  * The O(delta) claim: each fast-path window costs one `writeBatch`
  * (tombstone union + one appended segment), so the apply time is flat
  * in corpus size. One window per size additionally spans a COMPACTION
  * of the source — the documented two-scan content-diff fallback, priced
  * honestly (it is corpus-proportional by design; a consumer that can't
  * afford it re-seeds via `initStoreMirror` instead).
  *
  * Prints one line per corpus size; run with
  * `sbt "runMain graft.tools.CdcApplyProbe [sizes]"` (DiffProbe's sibling
  * — that probe prices the diff READ, this one the consumer's end-to-end
  * window).
  */
object CdcApplyProbe {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args(0).split(",").map(_.trim.toLong).toSeq
      else Seq(500000L, 2000000L, 5000000L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val delta = 50000L
    val dim = 8
    def vecs(lo: Long, hi: Long) =
      spark.range(lo, hi, 1, 8).select(
        col("id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => (pmod(xxhash64(col("id") * lit(131) + i), lit(1000))
            .cast("double") / lit(500.0) - lit(1.0)).cast("float"))
          .as("vector"))
    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val fsLocal = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    for (n <- sizes) {
      val srcRoot = java.nio.file.Files
        .createTempDirectory(s"graft-cdcapply-src-$n").toString
      val destRoot = s"${java.nio.file.Files
        .createTempDirectory(s"graft-cdcapply-dst-$n")}/dest"
      val src = GraftDB.open(spark, srcRoot, dim = dim, metric = "l2")
      src.insertBatch(vecs(0, n))
      val dest = ChangeFeed.initStoreMirror(src, destRoot)
      // three consecutive FAST-PATH windows: 50k inserts + 1k deletes each
      val fast = (1 to 3).map { w =>
        val lo = n + (w - 1) * delta
        src.insertBatch(vecs(lo, lo + delta))
        src.delete((0L until 1000L).map(_ + (w - 1) * 1000L))
        timeIt { ChangeFeed.catchUpStore(src, dest); () }
      }
      // one window spanning a source COMPACTION: the content-diff
      // fallback — corpus-proportional, priced honestly
      src.compact()
      val lo = n + 3 * delta
      src.insertBatch(vecs(lo, lo + delta))
      val tFallback = timeIt { ChangeFeed.catchUpStore(src, dest); () }
      // the destination must converge exactly (cheap count gate)
      val srcRows = src.read().count()
      val dstRows = dest.read().count()
      require(srcRows == dstRows,
        s"consumer diverged: src=$srcRows dest=$dstRows")
      println(f"corpus=$n%d window=$delta " +
        f"fast_sec=${fast.map(t => f"$t%.2f").mkString("/")} " +
        f"fallback_sec=$tFallback%.2f rows=$dstRows%d")
      fsLocal.delete(new org.apache.hadoop.fs.Path(srcRoot), true)
      fsLocal.delete(new org.apache.hadoop.fs.Path(destRoot).getParent, true)
    }
    spark.stop()
  }
}
