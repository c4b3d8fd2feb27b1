package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 optimization evidence probe: count the SPARK JOBS (driver
  * round-trips) behind the multi-job operator paths the round touched —
  * a steady-state `insertBatch(collectStats=true)` and one
  * `connectedComponents` round — plus wall time. The optimizations fold
  * whole jobs into other jobs' actions (stats pass 1 rides the segment
  * write via `observe`; the CC convergence checksum rides the
  * localCheckpoint materialization), which `.explain` cannot show: the
  * plan shapes are identical, the JOB COUNT is the diff.
  *
  * Usage: runMain graft.tools.JobCountProbe
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def measure(label: String)(f: => Unit): Unit = {
      // listener events are async — settle before reading the counter
      Thread.sleep(300)
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      f
      val ms = (System.nanoTime() - t0) / 1e6
      Thread.sleep(300)
      println(f"[jobcount] $label%-38s jobs=${jobs.get() - j0}%3d  $ms%8.1f ms")
    }

    val dim = 32
    val root = java.nio.file.Files.createTempDirectory("jobprobe").toString
    val db = graft.GraftDB.open(spark, s"$root/store", dim = dim,
      metric = "l2")
    def batch(lo: Long) = spark.range(lo, lo + 250, 1, 4).select(
      col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("id") * lit(131) + i), lit(1000))
          .cast("double") / lit(500.0) - lit(1.0)).cast("float"))
        .as("vector"))
    measure("insertBatch#1 (stats, dim discovery)") {
      db.insertBatch(batch(0), collectStats = true); ()
    }
    (1 to 3).foreach { w =>
      measure(s"insertBatch#${w + 1} (stats, steady)") {
        db.insertBatch(batch(w * 250L), collectStats = true); ()
      }
    }

    // one CC convergence loop over a chain graph (forces > 1 round)
    val edges = spark.range(0, 5000).select(col("id").as("u"),
      (col("id") + 1).as("v"))
    measure("connectedComponents (chain 5k)") {
      graft.dedup.Components.connectedComponents(edges)
        .write.format("noop").mode("overwrite").save()
    }

    // the dedup_semantic shape (r13 verdict ask 4): dense per-cluster dup
    // graphs that converge in 1-2 alternations — the row the "small
    // driver jobs" cadence complaint was about
    val sem = spark.range(0, 1000, 1, 8).select(
      col("id"),
      pmod(col("id"), lit(8)).cast("string").as("cluster"),
      transform(sequence(lit(0), lit(15)),
        i => (pmod(xxhash64(pmod(col("id"), lit(50)) * lit(7) + i),
          lit(1000)).cast("double") / lit(500.0) - lit(1.0)).cast("float"))
        .as("v"))
    sem.write.mode("overwrite").parquet(s"$root/sem")
    val semIn = spark.read.parquet(s"$root/sem")
    measure("semanticDedup (8 clusters x 125)") {
      graft.dedup.Dedup.semanticDedup(semIn, "id", "v", "cluster",
        eps = 0.99, dim = 16)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
