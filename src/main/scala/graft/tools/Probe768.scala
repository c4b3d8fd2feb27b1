package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.types.Metric

/** Repro probe for the 768d replica coded-pass ordering (round-7 verdict
  * What's wrong 2: PQ-vs-SQ8 latency order flips between JVMs). Builds
  * the EXACT bench fixture (synthClustered 50k × 768d, centers=256,
  * spread=0.15; PQ m=96 trained on 5k rows; nlist=64) and interleaves
  * repeated timed loops of both passes in one process, reporting per-loop
  * latency AND the admission sizes (exact-rerank rows) of each pass — the
  * two candidate mechanisms are C2 compilation state (latency varies,
  * admissions constant) vs margin-driven rerank width (admissions differ
  * between the codings).
  *
  * Usage: runMain graft.tools.Probe768 [rounds] [queriesPerLoop]
  */
object Probe768 {
  def main(args: Array[String]): Unit = {
    val rounds = if (args.length > 0) args(0).toInt else 6
    val perLoop = if (args.length > 1) args(1).toInt else 200
    val nArg = if (args.length > 2) args(2).toLong else 50000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n768 = nArg
    val dim768 = 768
    val corpus768 = graft.Bench.synthClustered(spark, n768, dim768,
      centers = 256, spread = 0.15).select("id", "vec").cache()
    corpus768.count()
    val pq768 = graft.index.PQ.train(
      corpus768.limit(5000), "vec", m = 96, iters = 4)
    val sq8 = graft.serve.LocalReplica.fromDataFrame(
      corpus768, "vec", "id", Metric.L2, nlist = 64)
    val pq = graft.serve.LocalReplica.fromDataFrame(
      corpus768, "vec", "id", Metric.L2, nlist = 64, pqModel = Some(pq768))
    val int4 = graft.serve.LocalReplica.fromDataFrame(
      corpus768, "vec", "id", Metric.L2, nlist = 64, int4 = true)
    val queries = corpus768.where(col("id") < 100)
      .select(col("id"), col("vec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    corpus768.unpersist()

    def loop(rep: graft.serve.LocalReplica): (Double, Double) = {
      var admitSum = 0L
      val t0 = System.nanoTime()
      var i = 0
      while (i < perLoop) {
        rep.search(queries(i % queries.length)._2, 10, nprobe = 16)
        admitSum += rep.lastAdmitted
        i += 1
      }
      ((System.nanoTime() - t0) / 1e3 / perLoop, admitSum.toDouble / perLoop)
    }

    println(s"# jvm=${System.getProperty("java.vm.version")} cpus=$cpus " +
      s"panama=${graft.functions.KernelMode.simdAvailable} n=$n768 " +
      s"sq8_bytes_per_probe=${(n768 * 16 / 64) * dim768} " +
      s"pq_bytes_per_probe=${(n768 * 16 / 64) * 96}")
    // warm all paths once (discarded)
    loop(sq8); loop(pq); loop(int4)
    for (r <- 1 to rounds) {
      val (sqUs, sqAdm) = loop(sq8)
      val (pqUs, pqAdm) = loop(pq)
      val (i4Us, i4Adm) = loop(int4)
      println(f"round=$r sq8_us=$sqUs%.1f sq8_admit=$sqAdm%.1f " +
        f"pq_us=$pqUs%.1f pq_admit=$pqAdm%.1f " +
        f"int4_us=$i4Us%.1f int4_admit=$i4Adm%.1f " +
        f"order=${if (pqUs <= sqUs) "PQ_WINS" else "SQ8_WINS"}")
    }
    spark.stop()
  }
}
