package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved same-JVM A/B for the lazy `dedup_minhash_lsh` shape: the
  * host's hour-scale performance windows poison run-to-run comparisons
  * (BASELINE.md), so variant A (no materialization — the pre-r12 plan:
  * the band self-join and the triple candidate consumption each
  * re-derive the whole shingle → md5 → signature pipeline) and variant B
  * (the eager scoped-cache twin `minhashLshTo`, which the declared
  * `dedup_minhash_lsh` query routes through — persists are released in
  * its finally, honoring the cache-hygiene contract) alternate inside
  * one session and are compared by min.
  *
  * Usage: runMain graft.tools.MinhashAbProbe [sfDir]
  */
object MinhashAbProbe {
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.count()
    val n = 3; val numHashes = 32; val rowsPerBand = 4; val minJ = 0.8

    // variant A: the pre-materialization plan, reconstructed inline
    def plain(): DataFrame = {
      val hashed = graft.dedup.Dedup.hashedShingles(docs, "doc_id", "text", n)
      val bands = graft.dedup.Dedup.lshBands(
        graft.dedup.Dedup.minhashSignaturesHashed(hashed, numHashes),
        rowsPerBand)
      val a = bands.as("a"); val b = bands.as("b")
      val cands = a.join(b,
          col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
      graft.dedup.Dedup.verifyCandidates(cands, hashed, minJ)
    }
    def current(): DataFrame =
      graft.dedup.Dedup.minhashLshTo(docs, "doc_id", "text",
        s"${sys.props("java.io.tmpdir")}/graft_mhab_out", n, numHashes,
        rowsPerBand, minJ)

    noop(plain()); noop(current()) // warm both shapes
    val as = collection.mutable.ArrayBuffer[Double]()
    val bs = collection.mutable.ArrayBuffer[Double]()
    (1 to 3).foreach { i =>
      var t0 = System.nanoTime(); noop(plain())
      as += (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); noop(current())
      bs += (System.nanoTime() - t0) / 1e9
      println(f"[mhab] round $i  plain=${as.last}%.3f s  checkpointed=${bs.last}%.3f s")
    }
    println(f"[mhab] MIN plain=${as.min}%.3f s  checkpointed=${bs.min}%.3f s")
    spark.stop()
  }
}
