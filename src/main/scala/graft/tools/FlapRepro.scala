package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.KernelMode
import graft.query.Search

/** Reproduction harness for the bimodal `synth_knn_batch100_big_fast`
  * bench row (round-6 verdict, What's wrong 3): runs the `big` and
  * `big_fast` twins interleaved in one JVM and prints per-run timings, so
  * a fresh-JVM loop can show whether the `KernelMode.withFast(true)`
  * wrapper ever lands in a slow state while the default-mode twin stays
  * fast.
  */
object FlapRepro {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 50000L
    val nBig = 10 * n
    val big = graft.Bench.synthVectors(spark, nBig, 128).cache()
    big.count()
    val queries = graft.Bench.synthVectors(spark, n, 128)
      .where(col("id") < 100).select(col("id"), col("vec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def runDefault(): Double = {
      val t0 = System.nanoTime()
      noop(Search.batchSearchMatrix(big, "vec", "id", queries, k = 10))
      (System.nanoTime() - t0) / 1e9
    }
    def runFast(): Double = KernelMode.withFast(true) {
      val t0 = System.nanoTime()
      noop(Search.batchSearchMatrix(big, "vec", "id", queries, k = 10))
      (System.nanoTime() - t0) / 1e9
    }
    println(s"simdAvailable=${KernelMode.simdAvailable} fast=${KernelMode.fast}")
    // warm-up like Bench: one discarded pass of each
    runDefault(); runFast()
    for (i <- 1 to 4) {
      val d = runDefault(); val f = runFast()
      println(f"round $i: default=$d%.3f s  withFast=$f%.3f s  ratio=${f / d}%.2f")
    }
    spark.stop()
  }
}
