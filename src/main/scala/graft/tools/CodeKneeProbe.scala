package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The Hamming serving tier's shard-size knee ([[ShardKneeProbe]]'s code
  * twin): the popcount scan is flat over the whole replica (no IVF — at
  * 256 bits a row is 32 bytes, [[graft.serve.LocalCodeReplica]] scans it
  * all), so latency is LINEAR in rows-per-replica by construction and
  * the knee is simply where n × 32 B outruns the µs class / the cache.
  * This probe measures the constant: single-replica popcount top-10 and
  * the hybrid verb at 10k/50k/200k/1M rows, then [[graft.serve.
  * CodeReplicaSet]] at 4/8/16 shards at the largest size showing the
  * fan-out restoring the latency class — the number that sizes a
  * binary-embedding deployment's shards. Prints a markdown table for
  * BASELINE.md.
  *
  * Run: `sbt "runMain graft.tools.CodeKneeProbe [sizes] [shardCounts]"`.
  */
object CodeKneeProbe {

  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("10000,50000,200000,1000000")
      .split(",").map(_.trim.toLong).toSeq
    val shardCounts = args.drop(1).headOption.getOrElse("4,8,16")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.driver.maxResultSize", "8g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bits = 256
    val words = typedLit(Seq("apple", "banana", "cherry", "date",
      "elderberry", "fig", "grape", "honeydew"))

    def corpus(n: Long) = spark.range(0, n, 1, 32).select(
      col("id"),
      graft.index.BQ.packCol(
        transform(sequence(lit(0), lit(bits - 1)),
          i => (pmod(xxhash64(col("id") * lit(131) + i), lit(1000))
            .cast("double") / lit(500.0) - lit(1.0)).cast("float")),
        bits).as("code"),
      concat_ws(" ",
        element_at(words, (pmod(xxhash64(col("id") * 7), lit(8)) + 1).cast("int")),
        element_at(words, (pmod(xxhash64(col("id") * 13), lit(8)) + 1).cast("int"))).as("text"))

    val queries: Array[Array[Long]] = corpus(512).select("code").collect()
      .map(_.getSeq[Long](0).toArray)

    case class Pt(label: String, rows: Long, shards: Int, usMean: Double,
        usP95: Double)
    val pts = scala.collection.mutable.ArrayBuffer[Pt]()

    def measure(label: String, rows: Long, shards: Int, iters: Int)(
        f: Array[Long] => Unit): Unit = {
      var i = 0
      while (i < iters / 2) { f(queries(i % queries.length)); i += 1 }
      val lat = new Array[Long](iters)
      i = 0
      while (i < iters) {
        val t0 = System.nanoTime()
        f(queries(i % queries.length))
        lat(i) = System.nanoTime() - t0
        i += 1
      }
      java.util.Arrays.sort(lat)
      val mean = lat.sum / 1e3 / iters
      val p95 = lat((iters * 0.95).toInt) / 1e3
      pts += Pt(label, rows, shards, mean, p95)
      System.err.println(f"[code-knee] $label%-24s $mean%8.1f us (p95 $p95%.1f)")
    }

    sizes.foreach { n =>
      val df = corpus(n).cache()
      df.count()
      val rep = graft.serve.LocalCodeReplica.fromDataFrame(df, "code", "id",
        bits, maxRows = n + 1, textCol = Some("text"))
      val iters = math.max(200, math.min(2000, (2e9 / (n + 1)).toInt))
      measure(s"code_replica_$n", n, 1, iters)(q => rep.search(q, 10))
      measure(s"code_hybrid_$n", n, 1, iters)(q =>
        rep.hybridSearch(q, "apple banana", 10))
      df.unpersist()
    }

    val nMax = sizes.max
    val big = corpus(nMax).cache()
    big.count()
    shardCounts.foreach { s =>
      val set = graft.serve.CodeReplicaSet.fromDataFrame(big, "code", "id",
        bits, shards = s, maxRows = nMax + 1, textCol = Some("text"))
      measure(s"code_set_${nMax}_x$s", nMax, s, 500)(q => set.search(q, 10))
      measure(s"code_set_hyb_${nMax}_x$s", nMax, s, 500)(q =>
        set.hybridSearch(q, "apple banana", 10))
    }
    big.unpersist()

    println("| deployment | rows | shards | mean us | p95 us |")
    println("|---|---|---|---|---|")
    pts.foreach { p =>
      println(f"| ${p.label} | ${p.rows}%,d | ${p.shards} " +
        f"| ${p.usMean}%.1f | ${p.usP95}%.1f |")
    }
    spark.stop()
  }
}
