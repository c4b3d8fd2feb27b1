package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan probe: asserts [[graft.text.Features.hashedTfIdf]] tokenizes the
  * corpus exactly once. Guards the regression where a
  * tf→groupBy(bucket) df branch stops canonicalizing equal to the tf
  * subtree (Catalyst prunes the unused count) and the corpus gets
  * tokenized twice — at 100 TB that doubles the dominant cost. The
  * in-plan N count is an empty-schema scan and deliberately not
  * counted. `FeaturesSpec` enforces the same invariant in the suite;
  * this tool is the interactive form (`args(0)` = sf dir, default
  * sf0.01, like `graft.Plans`).
  */
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val out = graft.text.Features.hashedTfIdf(docs, "doc_id", "text", 64)
    out.collect()
    // AQE's toString repeats the tree under "== Initial Plan ==" — count
    // scans in the final plan only, and only scans whose output contains
    // the text attribute ("text#<exprId>"; a bare "text" would also match
    // the Location path of any sf dir containing that substring — the
    // ride-along N count scans an empty schema and must not count)
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val textScans = plan.linesIterator
      .count(l => l.contains("FileScan parquet") && l.contains("text#"))
    println(plan)
    println(s"text-reading FileScans in hashedTfIdf plan: $textScans")
    assert(textScans == 1,
      s"hashedTfIdf must tokenize the corpus once, saw $textScans")
    spark.stop()
  }
}
