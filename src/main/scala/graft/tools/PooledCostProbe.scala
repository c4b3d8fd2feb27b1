package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.IVF
import graft.query.Search
import graft.types.Metric

/** Isolates where the joined-MMR slowdown lives: plain (os,id) heaps vs
  * heaps carrying the vector payload vs payload + the greedy fold.
  */
object PooledCostProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 500000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dim = 64
    val corpus = spark.range(0, n, 1, 32).select(
      col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("id") * lit(131) + i), lit(1000))
          .cast("double") / lit(500.0) - lit(1.0)).cast("float")).as("v"))
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft-poolcost-$n").toString
    corpus.write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val model = IVF.train(df.limit(100000), "v", k = 32, maxIter = 8)
    val qs = df.where(col("id") % (n / 1000) === 0)
      .select(col("id").as("qid"), col("v").as("qv"))
    def timed(tag: String)(f: => Long): Unit = {
      f
      val t0 = System.nanoTime(); val c = f
      println(f"$tag%s sec=${(System.nanoTime() - t0) / 1e9}%.2f rows=$c%d")
    }
    timed("plain_topk") {
      Search.knnJoinIvf(df, "v", "id", qs, "qid", "qv", 20, model, 2,
        Metric.L2, broadcastQueries = true).count()
    }
    timed("pooled_payload") {
      Search.knnJoinIvfPooled(df, "v", "id", qs, "qid", "qv", 20, model, 2,
        Metric.L2, broadcastQueries = true).count()
    }
    timed("mmr_full") {
      graft.query.Mmr.diversifyJoin(df, "v", "id", qs, "qid", "qv",
        k = 5, fetchK = 20, lambda = 0.7, model, 2, Metric.L2,
        broadcastQueries = true).count()
    }
    // fold in isolation: pool pinned behind a checkpoint barrier
    val pooled = Search.knnJoinIvfPooled(df, "v", "id", qs, "qid", "qv",
      20, model, 2, Metric.L2, broadcastQueries = true).localCheckpoint()
    pooled.count()
    timed("fold_only") {
      val rel = (os: org.apache.spark.sql.Column) => -sqrt(os)
      pooled.select(col("qid"),
          transform(col("cs"), c => c.getField("_id")).as("_ids"),
          transform(col("cs"), c => rel(c.getField("os"))).as("_rels"),
          transform(col("cs"), c => c.getField("_payload")).as("_vecs"))
        .select(col("qid"), col("_ids"),
          posexplode(graft.query.Mmr.selectCol(col("_rels"), col("_vecs"),
            5, 0.7)))
        .count()
    }
    timed("fold_live") {
      val p = Search.knnJoinIvfPooled(df, "v", "id", qs, "qid", "qv",
        20, model, 2, Metric.L2, broadcastQueries = true)
      p.select(col("qid"),
          transform(col("cs"), c => c.getField("_id")).as("_ids"),
          transform(col("cs"), c => -sqrt(c.getField("os"))).as("_rels"),
          transform(col("cs"), c => c.getField("_payload")).as("_vecs"))
        .select(col("qid"), col("_ids"),
          posexplode(graft.query.Mmr.selectCol(col("_rels"), col("_vecs"),
            5, 0.7)))
        .count()
    }
    locally {
      val p = Search.knnJoinIvfPooled(df, "v", "id", qs, "qid", "qv",
        20, model, 2, Metric.L2, broadcastQueries = true)
      val d = p.select(col("qid"),
          transform(col("cs"), c => c.getField("_id")).as("_ids"),
          transform(col("cs"), c => -sqrt(c.getField("os"))).as("_rels"),
          transform(col("cs"), c => c.getField("_payload")).as("_vecs"))
        .select(col("qid"), col("_ids"),
          posexplode(graft.query.Mmr.selectCol(col("_rels"), col("_vecs"),
            5, 0.7)))
      println("=== fold_live OPTIMIZED (truncated) ===")
      val s = d.queryExecution.optimizedPlan.toString
      println(s.split("\n").take(12).mkString("\n"))
      println(s"[plan length chars: ${s.length}]")
    }
    timed("fold_live_barrier") {
      val p = Search.knnJoinIvfPooled(df, "v", "id", qs, "qid", "qv",
        20, model, 2, Metric.L2, broadcastQueries = true)
        .repartition(8)
      p.select(col("qid"),
          transform(col("cs"), c => c.getField("_id")).as("_ids"),
          transform(col("cs"), c => -sqrt(c.getField("os"))).as("_rels"),
          transform(col("cs"), c => c.getField("_payload")).as("_vecs"))
        .select(col("qid"), col("_ids"),
          posexplode(graft.query.Mmr.selectCol(col("_rels"), col("_vecs"),
            5, 0.7)))
        .count()
    }
    spark.stop()
  }
}
