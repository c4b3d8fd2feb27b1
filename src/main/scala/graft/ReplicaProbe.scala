package graft
// scratch profiling main (not part of the public API): serving-replica
// latency, coded vs uncoded first pass
object ReplicaProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val df = Bench.synthVectors(spark, 50000, 128).cache()
    df.count()
    val queries = df.where(col("id") < 100)
      .select(col("id"), col("vec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val probed = graft.serve.LocalReplica.fromDataFrame(
      df, "vec", "id", graft.types.Metric.L2, nlist = 256)
    val brute = graft.serve.LocalReplica.fromDataFrame(
      df, "vec", "id", graft.types.Metric.L2)
    val probedPlain = probed.withoutCodes
    val brutePlain = brute.withoutCodes
    def timeUs(name: String, iters: Int)(f: Int => Unit): Unit = {
      var i = 0
      while (i < iters) { f(i); i += 1 } // warm
      val t0 = System.nanoTime()
      i = 0
      while (i < iters) { f(i); i += 1 }
      println(f"$name: ${(System.nanoTime() - t0) / 1e3 / iters}%.1f us/query")
    }
    for (rounds <- 1 to 3) {
      println(s"--- round $rounds")
      timeUs("probed_coded", 2000)(i =>
        probed.search(queries(i % queries.length)._2, 10, nprobe = 16))
      // attribution: centroid selection alone (256 exact 128d distances)
      val fakeModel = graft.index.IVF.Model(
        (0 until probed.nlist).map(c => queries(c % queries.length)._2).toArray)
      timeUs("probe_select_only", 2000) { i =>
        fakeModel.probes(queries(i % queries.length)._2, 16); ()
      }
      timeUs("probed_uncoded", 2000)(i =>
        probedPlain.search(queries(i % queries.length)._2, 10, nprobe = 16))
      timeUs("brute_coded", 300)(i =>
        brute.search(queries(i % queries.length)._2, 10))
      timeUs("brute_uncoded", 300)(i =>
        brutePlain.search(queries(i % queries.length)._2, 10))
      val qs = (0 until 1000).map(i => (i.toLong, queries(i % queries.length)._2))
      val t0 = System.nanoTime()
      brute.batchSearch(qs, 10)
      println(f"batch_brute_coded: ${(System.nanoTime() - t0) / 1e3 / 1000}%.1f us/query")
    }
    spark.stop()
  }
}
