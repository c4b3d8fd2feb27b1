package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the BPE merges learned from a testdata documents table — used
  * once to pin the frozen merge list in the `text_bpe_tokens` oracle row
  * (the learned-model freeze step, like the quality model's weights).
  *
  * usage: runMain graft.tools.BpeProbe /root/testdata/sf0.01 24
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = if (args.length > 1) args(1).toInt else 24
    val spark = SparkSession.builder()
      .master("local[8]").appName("bpe-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val docs = graft.Tables.load(spark, dir, "documents")
    val m = graft.text.Bpe.train(docs, "text", numMerges = n)
    m.merges.zipWithIndex.foreach { case ((a, b), i) =>
      println(s"""$i\t("$a", "$b")""")
    }
    spark.stop()
  }
}
