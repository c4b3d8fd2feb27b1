package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.types.Metric

/** Attribute the probed-replica query latency: a 3125-row unclustered
  * replica isolates the pure coded scan+admit+rerank at exactly the row
  * count a 50k/nlist=256/nprobe=16 probe visits, so
  * (probed 50k) − (flat 3125) = probe selection + range plumbing.
  */
object ReplicaLatencyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.Bench.synthVectors(spark, 50000, 128).cache()
    df.count()
    val queries = df.where(col("id") < 100)
      .select(col("id"), col("vec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val probed = graft.serve.LocalReplica.fromDataFrame(
      df, "vec", "id", Metric.L2, nlist = 256)
    val small = graft.serve.LocalReplica.fromDataFrame(
      df.where(col("id") % 16 === 0), "vec", "id", Metric.L2) // 3125 rows
    val probed10k = graft.serve.LocalReplica.fromDataFrame(
      df.where(col("id") % 5 === 0), "vec", "id", Metric.L2, nlist = 64)
    val smallPlain = small.withoutCodes
    require(small.size == 3125, s"small=${small.size}")
    def timeUs(name: String, iters: Int)(f: Int => Unit): Unit = {
      var i = 0
      while (i < iters) { f(i); i += 1 }
      val t0 = System.nanoTime()
      i = 0
      while (i < iters) { f(i); i += 1 }
      println(f"$name: ${(System.nanoTime() - t0) / 1e3 / iters}%.1f us/query")
    }
    // in-session probe-selection cost on a model with the bench shape
    val model = graft.index.IVF.train(
      df.sample(withReplacement = false, 0.4, 42L), "vec", k = 256,
      maxIter = 5)
    for (r <- 1 to 3) {
      println(s"--- round $r")
      if (sys.env.contains("RLP_ALL")) timeUs("probed50k_np16", 3000)(i =>
        probed.search(queries(i % queries.length)._2, 10, nprobe = 16))
      if (sys.env.contains("RLP_ALL")) timeUs("flat3125_coded", 3000)(i =>
        small.search(queries(i % queries.length)._2, 10))
      if (sys.env.contains("RLP_ALL")) timeUs("flat3125_float", 3000)(i =>
        smallPlain.search(queries(i % queries.length)._2, 10))
      timeUs("model_probes_np16", 3000) { i =>
        model.probes(queries(i % queries.length)._2, 16); ()
      }
      timeUs("model_probes_1q", 3000) { _ =>
        model.probes(queries(0)._2, 16); ()
      }
      if (sys.env.contains("RLP_ALL")) timeUs("probed50k_np1", 3000)(i =>
        probed.search(queries(i % queries.length)._2, 10, nprobe = 1))
      val probedPlain = probed.withoutCodes
      if (sys.env.contains("RLP_ALL")) timeUs("probed50k_np16_float", 3000)(i =>
        probedPlain.search(queries(i % queries.length)._2, 10, nprobe = 16))
      // the reference's single-query headline is a 10k-row corpus
      // (BASELINE.md: 92.9 us HNSW @ 10k): measure OUR 10k serving shape
      if (sys.env.contains("RLP_ALL")) timeUs("probed10k_np8", 3000)(i =>
        probed10k.search(queries(i % queries.length)._2, 10, nprobe = 8))
    }
    spark.stop()
  }
}
