package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run. */
object SparkTestSession {
  // specs assert bit-exact agreement with sequential-double brute force;
  // the production default resolves to the fast kernels when Panama is
  // loaded. Fast-path behavior is covered explicitly (KernelMode.withFast)
  // in DistanceKernelsSpec.
  graft.functions.KernelMode.fast = false

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
