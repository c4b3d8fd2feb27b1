package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved same-JVM A/B for the banded-SRP near-dup shape (the
  * embedding twin of [[MinhashAbProbe]]): variant A reconstructs the
  * pre-materialization plan (key frame re-derived per self-join alias,
  * pair set re-derived per verify join); variant B is the current
  * `srpNearDups` (keys + pairs localCheckpoint'd once).
  *
  * Usage: runMain graft.tools.SrpAbProbe [sfDir]
  */
object SrpAbProbe {
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
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    emb.count()
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val threshold = 0.95; val nbits = 16; val bands = 32; val seed = 42L

    def plain(): DataFrame = {
      import graft.functions.vec_cos
      val vecs = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      val offsets = graft.dedup.Dedup.srpCenteringOffsets(
        vecs, "v", dim, nbits, bands, seed)
      val keyed = vecs
        .select(col("id"),
          explode(graft.dedup.Dedup.srpBandKeys(col("v"), dim, nbits, bands,
            seed, offsets)).as("bk"))
        .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
      val cands = keyed.as("a")
        .join(keyed.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
      cands
        .join(vecs.select(col("id").as("id_a"), col("v").as("va")), "id_a")
        .join(vecs.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
        .withColumn("cos", vec_cos(col("va"), col("vb")))
        .where(col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    }
    def current(): DataFrame =
      graft.dedup.Dedup.srpNearDups(emb, "vec_id", "embedding", dim,
        threshold, nbits, bands, seed)

    noop(plain()); noop(current())
    val as = collection.mutable.ArrayBuffer[Double]()
    val bs = collection.mutable.ArrayBuffer[Double]()
    (1 to 3).foreach { i =>
      var t0 = System.nanoTime(); noop(plain())
      as += (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); noop(current())
      bs += (System.nanoTime() - t0) / 1e9
      println(f"[srpab] round $i  plain=${as.last}%.3f s  checkpointed=${bs.last}%.3f s")
    }
    println(f"[srpab] MIN plain=${as.min}%.3f s  checkpointed=${bs.min}%.3f s")
    spark.stop()
  }
}
