package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adjudicates the `ivf_build_vec_per_sec_big` drift (round-11 verdict
  * What's wrong 3: 279 k → 146 k vec/s across four windows with a
  * code-identical row). One JVM, interleaved rounds, each round
  * measuring the row's three components SEPARATELY:
  *
  *   - `assign`: the nearest-centroid compute only (noop sink — no file
  *     IO at all);
  *   - `write`:  the parquet layout write only (pre-assigned cached
  *     input — no kernel compute);
  *   - `full`:   the bench row as committed (assign + write);
  *
  * plus the pure-JVM [[graft.KernelBench.envelope]] canary per round.
  * If `assign` and the canary hold steady while `write` tracks `full`'s
  * drift, the axis is the device/page-cache write path (the documented
  * host envelope), not the kernels — same adjudication shape the batch
  * rows got in round 11. A `sync` runs before every write measurement so
  * accumulated dirty writeback from the previous round is not billed to
  * the next one.
  *
  * Run: `sbt "runMain graft.tools.IvfBuildProbe [n] [rounds]"`.
  */
object IvfBuildProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 500000L
    val rounds = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def syncFs(): Unit =
      try { new ProcessBuilder("sync").start().waitFor(); () }
      catch { case scala.util.control.NonFatal(_) => () }
    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // the bench row's exact fixture shape (Bench.synthVectors at 10x)
    val src = graft.Bench.synthVectors(spark, n, 128)
    val model = graft.index.IVF.train(
      src.sample(withReplacement = false, math.min(1.0, 20000.0 / n), 42L),
      "vec", k = 32, maxIter = 10)
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-ivfprobe").toString
    val assigned = graft.index.IVF.assign(src, "vec", model)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.count() // materialize: `write` must not pay the assign

    // discarded warm-up of all three shapes
    noop(graft.index.IVF.assign(src, "vec", model))
    graft.index.IVF.writeLayout(assigned, s"$outDir/w")
    graft.index.IVF.writeLayout(
      graft.index.IVF.assign(src, "vec", model), s"$outDir/f")

    for (r <- 1 to rounds) {
      val canary = graft.KernelBench.envelope() / 1e6
      val tAssign = timeIt(noop(graft.index.IVF.assign(src, "vec", model)))
      syncFs()
      val tWrite = timeIt(
        graft.index.IVF.writeLayout(assigned, s"$outDir/w"))
      syncFs()
      val tFull = timeIt(graft.index.IVF.writeLayout(
        graft.index.IVF.assign(src, "vec", model), s"$outDir/f"))
      println(f"round=$r canary_mdist=$canary%.1f " +
        f"assign_sec=$tAssign%.2f (${n / tAssign / 1e3}%.0fk/s) " +
        f"write_sec=$tWrite%.2f (${n / tWrite / 1e3}%.0fk/s) " +
        f"full_sec=$tFull%.2f (${n / tFull / 1e3}%.0fk/s)")
    }
    org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(outDir), true)
    spark.stop()
  }
}
