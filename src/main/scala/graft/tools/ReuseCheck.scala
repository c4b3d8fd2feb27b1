package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan probe: asserts [[graft.text.Features.hashedTfIdf]] scans the
  * corpus exactly once. Guards the regression where a
  * tf→groupBy(bucket) df branch stops canonicalizing equal to the tf
  * subtree (Catalyst prunes the unused count) and the corpus gets
  * tokenized twice — at 100 TB that doubles the dominant cost.
  */
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val out = graft.text.Features.hashedTfIdf(docs, "doc_id", "text", 64,
      docs.count())
    out.collect()
    // AQE's toString repeats the tree under "== Initial Plan ==" — count
    // scans in the final plan only
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val scans = "FileScan parquet".r.findAllIn(plan).size
    println(plan)
    println(s"corpus FileScans in hashedTfIdf plan: $scans")
    assert(scans == 1, s"hashedTfIdf must scan the corpus once, saw $scans")
    spark.stop()
  }
}
