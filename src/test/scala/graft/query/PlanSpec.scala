package graft.query

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions._
import graft.types.Metric

/** Physical-plan shape assertions — the 100 TB design invariants
  * (SURVEY.md §4 / brief "explain the plan and iterate"):
  *  - k-NN plans as TakeOrderedAndProject (per-partition bounded top-k,
  *    merge on driver — no global sort)
  *  - filters and column pruning reach the Parquet scan
  *  - aggregations are partial (map-side combine) before the shuffle
  *  - small-side joins broadcast
  *  - the distance expression runs inside WholeStageCodegen
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft-plan").toString
    (0 until 1000).map(i => (i.toLong, Array.fill(8)(i * 0.01f), i % 7, s"s$i"))
      .toDF("id", "vec", "label", "name")
      .write.mode("overwrite").parquet(d)
    d
  }
  private lazy val df = spark.read.parquet(dir)

  private def plan(d: org.apache.spark.sql.DataFrame): String =
    d.queryExecution.executedPlan.toString

  test("knn plans as TakeOrderedAndProject inside codegen") {
    val p = plan(Search.knn(df, "vec", "id", lit(Array.fill(8)(0.5f)), 10, Metric.L2))
    assert(p.contains("TakeOrderedAndProject"), p)
    // "*(1)" prefixes are WholeStageCodegen stage markers: the distance
    // projection must sit inside a codegen stage
    assert(p.contains("*(1) Project") && p.contains("vec_l2sq"), p)
    assert(!p.contains("Exchange rangepartitioning"), "global sort must not appear\n" + p)
  }

  test("filter + projection push down to the parquet scan") {
    val d = df.where(col("label") === 3).select("id", "label")
    val p = plan(d)
    assert(p.contains("PushedFilters: [") && p.contains("EqualTo(label,3)"), p)
    assert(p.contains("ReadSchema: struct<id:bigint,label:int>"),
      "column pruning must drop vec/name\n" + p)
  }

  test("groupBy aggregates partially before the shuffle") {
    val p = plan(df.groupBy("label").agg(sum("id")))
    val firstAgg = p.indexOf("HashAggregate")
    val exchange = p.indexOf("Exchange")
    val lastAgg = p.lastIndexOf("HashAggregate")
    assert(firstAgg >= 0 && exchange > firstAgg && lastAgg > exchange,
      "expect partial agg -> exchange -> final agg\n" + p)
  }

  test("small dimension joins broadcast (no shuffled join)") {
    val dim = Seq((0, "a"), (1, "b")).toDF("label", "tag")
    val p = plan(df.join(broadcast(dim), "label"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("grouped diversity-capped knn: bounded per-group heaps + " +
      "TakeOrderedAndProject, no window, no global sort") {
    val q = typedlit(Array.fill(8)(0.5f))
    val scored = df.withColumn("s", vec_l2(col("vec"), q))
    val d = Search.topKPerKey(scored, "label", col("s"), "id", 3)
      .orderBy(col("_os").asc, col("id").asc).limit(12)
    val p = plan(d)
    // the per-group cap runs as CollectTopK partial aggregation: heaps
    // combine map-side, the shuffle carries groups x cap structs
    assert(p.contains("ObjectHashAggregate"), p)
    assert("collect_top_k".r.findAllIn(p).size >= 2, "partial+final agg\n" + p)
    assert(!p.contains("Window"), "window leaked into the plan\n" + p)
    // the global cut is a bounded top-k merge, never a full sort
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("batchSearchMatrix shuffles only heap buffers (single exchange, partial agg)") {
    val qs = Seq((0L, Array.fill(8)(0.1f)), (1L, Array.fill(8)(0.9f)))
    val d = Search.batchSearchMatrix(df, "vec", "id", qs, 5)
    val p = plan(d)
    // ObjectHashAggregate partial + final around one exchange for the agg
    assert(p.contains("ObjectHashAggregate"), p)
    assert("multi_top_k".r.findAllIn(p).size >= 2, "partial+final agg\n" + p)
  }
}
