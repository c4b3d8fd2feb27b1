package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.IVF
import graft.query.{Mmr, Search}
import graft.types.Metric

/** Scale check for the joined-MMR shape: at each corpus size, time the
  * plain IVF cell-routed k-NN join (1k queries, fetchK per query) and
  * [[Mmr.diversifyJoin]] over the SAME candidates. If MMR's greedy fold
  * is genuinely row-local, the delta stays a small constant factor of
  * the join itself at every size — a corpus-proportional divergence
  * would falsify the "pool never re-shuffles" claim.
  * Run: `sbt "runMain graft.tools.MmrScaleProbe [sizes]"`.
  */
object MmrScaleProbe {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args(0).split(",").map(_.trim.toLong).toSeq
      else Seq(500000L, 5000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dim = 64
    for (n <- sizes) {
      val corpus = spark.range(0, n, 1, 32).select(
        col("id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => (pmod(xxhash64(col("id") * lit(131) + i), lit(1000))
            .cast("double") / lit(500.0) - lit(1.0)).cast("float")).as("v"))
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-mmrscale-$n").toString
      corpus.write.mode("overwrite").parquet(dir)
      val df = spark.read.parquet(dir)
      val model = IVF.train(df.limit(100000), "v", k = 32, maxIter = 8)
      val qs = df.where(col("id") % (n / 1000) === 0)
        .select(col("id").as("qid"), col("v").as("qv"))
      def timed(f: => Long): (Double, Long) = {
        f // warm
        val t0 = System.nanoTime(); val c = f
        ((System.nanoTime() - t0) / 1e9, c)
      }
      val (tJoin, cJoin) = timed(Search.knnJoinIvf(df, "v", "id", qs,
        "qid", "qv", k = 20, model, nprobe = 2, Metric.L2,
        broadcastQueries = true).count())
      val (tMmr, cMmr) = timed(Mmr.diversifyJoin(df, "v", "id", qs,
        "qid", "qv", k = 5, fetchK = 20, lambda = 0.7, model, nprobe = 2,
        Metric.L2, broadcastQueries = true).count())
      println(f"corpus=$n%d join_sec=$tJoin%.2f join_rows=$cJoin%d " +
        f"mmr_sec=$tMmr%.2f mmr_rows=$cMmr%d ratio=${tMmr / tJoin}%.2f")
      org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(dir), true)
    }
    spark.stop()
  }
}
