package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decompose the `dedup_jaccard` declared query (PPJoin prefix filter +
  * exact verify): where do its ~6 s at sf0.1 go — the hashed-shingle
  * derivation, the df/rank windows, the prefix self-join, or the exact
  * array_intersect verification?
  *
  * Usage: runMain graft.tools.JaccardProbe [sfDir]
  */
object JaccardProbe {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[jacprobe] $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }
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
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.count()
    val n = 3
    val minJaccard = 0.8
    (1 to 2).foreach { pass =>
      println(s"-- pass $pass")
      val hashed = time("hashedShingles (noop)") {
        val h = graft.dedup.Dedup.hashedShingles(docs, "doc_id", "text", n)
        noop(h); h
      }
      val dfreq = hashed.groupBy("h60").agg(count(lit(1)).as("df"))
      val ranked = hashed.join(dfreq, "h60")
        .withColumn("rnk", row_number().over(
          Window.partitionBy("id").orderBy(col("df").asc, col("h60").asc)))
        .withColumn("n_sh", count(lit(1)).over(Window.partitionBy("id")))
        .where(col("rnk") <=
          (col("n_sh") - ceil(lit(minJaccard) * col("n_sh")) + 1).cast("int"))
        .select("id", "h60")
      time("ranked prefix stream (noop)") { noop(ranked) }
      val cands = ranked.as("a")
        .join(ranked.as("b"),
          col("a.h60") === col("b.h60") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
      val nc = time("cands count") { cands.count() }
      println(s"[jacprobe] candidate pairs: $nc")
      val candsM = cands.localCheckpoint()
      time("verifyCandidates from cached cands (noop)") {
        noop(graft.dedup.Dedup.verifyCandidates(candsM, hashed,
          minJaccard))
      }
      time("full jaccardPairs (noop)") {
        noop(graft.dedup.Dedup.jaccardPairs(docs, "doc_id", "text", n,
          minJaccard))
      }
    }
    spark.stop()
  }
}
