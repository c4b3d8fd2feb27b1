package graft
// scratch profiling main (not part of the public API)
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.functions._
    val df = Bench.synthVectors(spark, 50000, 128).cache()
    df.count()
    val q0 = df.where(col("id") === 0).select("vec").collect()(0).getSeq[Float](0).toArray
    def time(name: String)(f: => Unit): Unit = {
      f; val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    // 1. pure kernel: 100 distances per row via literal matrix, no join
    val qs = df.where(col("id") < 100).select("vec").collect().map(_.getSeq[Float](0).toArray)
    val multi = qs.map(q => vec_l2sq(col("vec"), lit(q))).reduce(_ + _)
    time("kernel100_sum")(df.select(sum(multi)).collect())
    // 2. single distance agg
    time("kernel1_sum")(df.select(sum(vec_l2sq(col("vec"), lit(q0)))).collect())
    // 3. crossJoin count only (no scoring)
    val queries = df.where(col("id") < 100).select(col("id").as("qid"), col("vec").as("qv"))
    time("crossjoin_count")(println(df.crossJoin(broadcast(queries)).count()))
    // 4. crossJoin + score + topk
    time("crossjoin_score_topk")(
      graft.query.Search.batchSearch(df, "vec", "id", queries, "qid", "qv", 10)
        .write.format("noop").mode("overwrite").save())
    // 5. literal-matrix multi kernel + topk
    val qpairs = qs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
    time("matrix_multi_topk")(
      graft.query.Search.batchSearchMatrix(df, "vec", "id", qpairs, 10)
        .write.format("noop").mode("overwrite").save())
    // 6. single-query knn with literal (const-folded) query
    time("knn_single_lit")(
      graft.query.Search.knn(df, "vec", "id", lit(q0), 10)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
