package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.KernelMode
import graft.query.Search
import graft.types.Metric

/** A/B harness for the r4→r5 `filtered_knn_qps` / `knn_single_qps` drop
  * (round-6 verdict, What's wrong 4): r4 measured these benches with the
  * exact kernel default, r5 flipped the default to the Panama fast path.
  * This times both shapes under both kernel modes in one JVM to show
  * which kernel the regression tracks.
  */
object QpsBisect {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 50000L
    val dim = 128
    val synthDir = s"${sys.props("java.io.tmpdir")}/graft_qps_synth"
    graft.Bench.synthVectors(spark, n, dim).write.mode("overwrite").parquet(synthDir)
    val stored = spark.read.parquet(synthDir).cache()
    stored.count()
    val queries = stored.where(col("id") < 100)
      .select(col("id"), col("vec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val q0 = queries.head._2
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def filteredKnn(): Unit =
      noop(Search.batchSearchMatrix(stored, "vec", "id", queries, k = 10,
        filter = col("label") === 3))
    def knnSingle(): Unit =
      noop(Search.knn(stored, "vec", "id", lit(q0), 10, Metric.L2))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both modes before timing
    for (_ <- 1 to 2; m <- Seq(true, false)) KernelMode.withFast(m) {
      filteredKnn(); knnSingle()
    }
    for (round <- 1 to 3) {
      val fFast = KernelMode.withFast(true)(time(filteredKnn()))
      val fExact = KernelMode.withFast(false)(time(filteredKnn()))
      val sFast = KernelMode.withFast(true)(time(knnSingle()))
      val sExact = KernelMode.withFast(false)(time(knnSingle()))
      println(f"round $round: filtered fast=${100 / fFast}%.0f qps exact=${100 / fExact}%.0f qps | single fast=${1 / sFast}%.1f qps exact=${1 / sExact}%.1f qps")
    }
    spark.stop()
  }
}
