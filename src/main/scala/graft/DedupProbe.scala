package graft
// scratch profiling main (not part of the public API)
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      f; val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables.load(spark, dir, "documents")
    println("docs rows: " + docs.count())
    // stage-by-stage
    val sh = graft.dedup.Dedup.shingles(docs, "doc_id", "text", 3)
    time("shingles")(noop(sh))
    val hashed = sh.select(col("id"),
      conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long").as("h60"))
    time("hashed_shingles")(noop(hashed))
    val hp = hashed.persist()
    hp.count()
    val sigs = graft.dedup.Dedup.minhashSignaturesHashed(hp, 32)
    time("sigs_from_cache")(noop(sigs))
    val bands = graft.dedup.Dedup.lshBands(sigs, 4)
    time("bands_from_cache")(noop(bands))
    val cands = graft.dedup.Dedup.lshCandidates(bands)
    time("cands_from_cache")(noop(cands))
    hp.unpersist()
    time("minhash_lsh_lazy")(noop(graft.dedup.Dedup.minhashLsh(
      docs, "doc_id", "text", 3, 32, 4, 0.8)))
    time("minhash_lsh")(noop(PipelineQueries.dedupMinhashLsh(spark, dir)))
    time("neardup_cosine")(noop(PipelineQueries.neardupCosine(spark, dir)))
    spark.stop()
  }
}
