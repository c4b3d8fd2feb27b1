package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.types.Metric

/** Serving-replica latency vs shard size (round-9 verdict, Missing 2):
  * the probed in-process scan is DRAM-bandwidth-bound, so at SOME rows-
  * per-replica the µs-class latency target falls off and the answer is
  * "more shards" ([[graft.serve.ReplicaSet.reshard]] exists precisely
  * for that) — this probe measures WHERE. One single-replica curve at
  * 10k/50k/200k/1M/5M rows (128d, SQ8 mirror, nlist = next-pow2(√n),
  * default √nlist probing — the serving defaults), then `ReplicaSet`
  * at 4/8/16 shards at the largest size showing the fan-out restoring
  * the latency class. Prints a markdown table for BASELINE.md.
  *
  * Run with SPARK_DRIVER_MEM=32g (the 5M-row replica holds ~3 GB of
  * primitive arrays; the heap gate below refuses a spill-degraded run).
  * Args: `ShardKneeProbe [sizes] [shardCounts]`, e.g.
  * `ShardKneeProbe 10000,50000,200000,1000000,5000000 4,8,16`.
  */
object ShardKneeProbe {

  private def nextPow2(x: Int): Int = Integer.highestOneBit(
    math.max(1, x - 1)) * 2

  private def nlistFor(n: Long): Int =
    math.max(64, nextPow2(math.sqrt(n.toDouble).toInt))

  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("10000,50000,200000,1000000,5000000")
      .split(",").map(_.trim.toLong).toSeq
    val shardCounts = args.drop(1).headOption.getOrElse("4,8,16")
      .split(",").map(_.trim.toInt).toSeq
    val heap = Runtime.getRuntime.maxMemory
    val needed = sizes.max * 128L * 4 * 3 + (2L << 30)
    require(heap >= needed,
      f"heap ${heap / (1L << 30)}%d GiB < ${needed / (1L << 30)}%d GiB " +
        "floor — rerun with SPARK_DRIVER_MEM=<N>g")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // the 5M-row replica export collects ~2.6 GB of vectors — above
      // the 1 GiB default result cap (build-time op, driver-bounded by
      // the heap gate above)
      .config("spark.driver.maxResultSize", "8g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dim = 128

    // one query pool, reused at every size (same draw as the bench)
    val qdf = graft.Bench.synthVectors(spark, 512, dim)
    val queries = qdf.select("vec").collect()
      .map(_.getSeq[Float](0).toArray)

    case class Pt(label: String, rows: Long, shards: Int, usMean: Double,
        usP95: Double)
    val pts = scala.collection.mutable.ArrayBuffer[Pt]()

    def measure(label: String, rows: Long, shards: Int)(
        f: Array[Float] => Unit): Unit = {
      val warm = 1000
      val iters = 2000
      var i = 0
      while (i < warm) { f(queries(i % queries.length)); i += 1 }
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
      System.err.println(f"[knee] $label%-22s ${mean}%8.1f us (p95 $p95%.1f)")
    }

    sizes.foreach { n =>
      val df = graft.Bench.synthVectors(spark, n, dim).cache()
      df.count()
      val rep = graft.serve.LocalReplica.fromDataFrame(df, "vec", "id",
        Metric.L2, nlist = nlistFor(n), maxRows = n + 1)
      measure(s"replica_${n}", n, 1)(q => rep.search(q, 10))
      df.unpersist()
    }

    // sharded fan-out at the largest size: per-shard nlist follows the
    // same rule at the per-shard row count
    val nMax = sizes.max
    val big = graft.Bench.synthVectors(spark, nMax, dim).cache()
    big.count()
    shardCounts.foreach { s =>
      val set = graft.serve.ReplicaSet.fromDataFrame(big, "vec", "id",
        Metric.L2, shards = s, nlist = nlistFor(nMax / s),
        maxRows = nMax + 1)
      measure(s"set_${nMax}_x$s", nMax, s)(q => set.search(q, 10))
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
