package graft
// scratch profiling main (not part of the public API)
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      f; val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("minhash_lsh")(noop(PipelineQueries.dedupMinhashLsh(spark, dir)))
    time("neardup_cosine")(noop(PipelineQueries.neardupCosine(spark, dir)))
    val plan = PipelineQueries.dedupMinhashLsh(spark, dir)
      .queryExecution.executedPlan.toString
    println("minhash ReusedExchange nodes: " +
      plan.linesIterator.count(_.contains("ReusedExchange")))
    val plan2 = PipelineQueries.neardupCosine(spark, dir)
      .queryExecution.executedPlan.toString
    println("srp ReusedExchange nodes: " +
      plan2.linesIterator.count(_.contains("ReusedExchange")))
    spark.stop()
  }
}
