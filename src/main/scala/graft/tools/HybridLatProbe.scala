package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.types.Metric

object HybridLatProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 10000; val dim = 128
    val words = typedLit(Seq("apple", "banana", "cherry", "date",
      "elderberry", "fig", "grape", "honeydew"))
    val corpus = spark.range(0, n, 1, 8).select(
      col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("id") * lit(131) + i), lit(1000))
          .cast("double") / lit(500.0) - lit(1.0)).cast("float")).as("vec"),
      concat_ws(" ",
        element_at(words, (pmod(xxhash64(col("id") * 7), lit(8)) + 1).cast("int")),
        element_at(words, (pmod(xxhash64(col("id") * 13), lit(8)) + 1).cast("int"))).as("text"))
    val rep = graft.serve.LocalReplica.fromDataFrame(corpus, "vec", "id",
      Metric.L2, nlist = 64, textCol = Some("text"))
    val qs = corpus.where(col("id") < 100).select("id", "vec").collect()
      .map(r => r.getSeq[Float](1).toArray)
    // warm
    var i = 0
    while (i < 200) { rep.hybridSearch(qs(i % 100), "apple banana", 10, nprobe = 8); i += 1 }
    // admitted-count attribution: how many rows does the coded margin
    // admit to exact rerank at each pool depth?
    for (kk <- Seq(10, 51, 100)) {
      var adm = 0L
      i = 0
      while (i < 100) {
        rep.search(qs(i), kk, nprobe = 8)
        adm += rep.lastAdmitted
        i += 1
      }
      println(s"k=$kk mean admitted=${adm / 100}")
    }
    for (round <- 1 to 3) {
      // vector-only twin
      var t0 = System.nanoTime(); i = 0
      while (i < 500) { rep.search(qs(i % 100), 100, nprobe = 8); i += 1 }
      val vUs = (System.nanoTime() - t0) / 1e3 / 500
      t0 = System.nanoTime(); i = 0
      while (i < 500) { rep.search(qs(i % 100), 50, nprobe = 8); i += 1 }
      val v50Us = (System.nanoTime() - t0) / 1e3 / 500
      t0 = System.nanoTime(); i = 0
      while (i < 500) { rep.search(qs(i % 100), 10, nprobe = 8); i += 1 }
      val v10Us = (System.nanoTime() - t0) / 1e3 / 500
      print(f"vec50_us=$v50Us%.1f vec10_us=$v10Us%.1f ")
      // lexical-only twin
      t0 = System.nanoTime(); i = 0
      while (i < 500) { rep.lexicalSearch("apple banana", 100); i += 1 }
      val lUs = (System.nanoTime() - t0) / 1e3 / 500
      t0 = System.nanoTime(); i = 0
      while (i < 500) { rep.hybridSearch(qs(i % 100), "apple banana", 10, nprobe = 8); i += 1 }
      val hUs = (System.nanoTime() - t0) / 1e3 / 500
      println(f"round=$round vec100_us=$vUs%.1f lex_us=$lUs%.1f hybrid_us=$hUs%.1f")
    }
    spark.stop()
  }
}
