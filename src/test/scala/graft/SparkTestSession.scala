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
    // shared object-store emulation: any spec can point a store root at
    // an `s3sim:` path to run under S3 commit semantics (copy+delete
    // manifest renames, atomic conditional create) — see
    // graft.store.S3SimFileSystem
    graft.store.S3SimFileSystem.register(s.sparkContext.hadoopConfiguration)
    s
  }

  /** A fresh `s3sim:` store root (local dir served through the S3
    * semantics emulation) — the shared fixture for lifecycle specs that
    * must hold on an object store, not just a POSIX FS.
    */
  def s3simRoot(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-$tag").toString
    s"s3sim:$dir"
  }
}
