package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 optimization decomposition probe: time the sub-steps of the
  * most expensive declared queries in one warm JVM so the optimization
  * effort lands on the real cost (guide §1.1 — empirical loop).
  *
  * Usage: runMain graft.tools.OptProbe [sfDir]
  */
object OptProbe {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[optprobe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
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
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    emb.count() // warm scan

    // ---- knn_join decomposition (2 passes: cold-ish then warm)
    if (sys.env.contains("OPT_ALL")) (1 to 2).foreach { pass =>
      println(s"-- knn_join pass $pass")
      val model = time("ivf_train(k=8,iters=8)") {
        graft.index.IVF.train(emb, "embedding", k = 8, maxIter = 8)
      }
      val queries = emb.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))
      time("knnJoinIvf+orderBy (noop)") {
        noop(graft.query.Search.knnJoinIvf(
            emb, "embedding", "vec_id", queries, "query_id", "qv",
            k = 3, model = model, nprobe = model.k)
          .where(col("query_id") =!= col("vec_id"))
          .select(col("query_id"), col("vec_id"), col("rank"),
            round(sqrt(col("score")), 6).as("score"))
          .orderBy(col("query_id").asc, col("rank").asc))
      }
    }

    // ---- dedup_substr decomposition
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.count()
    if (sys.env.contains("OPT_ALL")) (1 to 2).foreach { pass =>
      println(s"-- dedup_substr pass $pass (portable)")
      val grams = time("windowGrams only (noop)") {
        noop(graft.dedup.Dedup.windowGrams(docs, "doc_id", "text", 30,
          portable = true))
      }
      time("duplicateSpans (noop)") {
        noop(graft.dedup.Dedup.duplicateSpans(docs, "doc_id", "text", 30,
          portable = true))
      }
      time("removeDuplicateSpans (noop)") {
        noop(graft.dedup.Dedup.removeDuplicateSpans(docs, "doc_id", "text",
          30, portable = true))
      }
      println(s"-- dedup_substr pass $pass (fast)")
      time("windowGrams fast (noop)") {
        noop(graft.dedup.Dedup.windowGrams(docs, "doc_id", "text", 30))
      }
      time("removeDuplicateSpans fast (noop)") {
        noop(graft.dedup.Dedup.removeDuplicateSpans(docs, "doc_id", "text",
          30))
      }
    }

    // ---- knn_join variants: salted join key for parallelism (guide §2.5)
    if (sys.env.contains("OPT_ALL")) (1 to 2).foreach { pass =>
      println(s"-- knn_join variants pass $pass")
      val model = graft.index.IVF.train(emb, "embedding", k = 8, maxIter = 8)
      val queries = emb.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))
      def variant(salt: Int): DataFrame = {
        val assigned = emb
          .withColumn("ivf_part", model.assignCol(col("embedding")))
          .withColumn("_salt", pmod(xxhash64(col("vec_id")), lit(salt)))
        val probed = queries
          .withColumn("ivf_part",
            explode(model.probeCol(col("qv"), model.k)))
          .withColumn("_salt",
            explode(array((0 until salt).map(lit(_)): _*)))
        val score = graft.types.Metric.L2.score(col("embedding"), col("qv"))
        val scored = assigned.join(probed, Seq("ivf_part", "_salt"))
          .withColumn("_os_in", score)
        graft.query.Search.topKPerKey(scored, "query_id", col("_os_in"),
          "vec_id", 3)
      }
      Seq(1, 4, 8).foreach { s =>
        time(s"knnJoin salt=$s (noop)") { noop(variant(s)) }
      }
      // pinned-exchange variants: explicit repartition on the join key
      // (user repartition — AQE leaves its partition count alone), with
      // and without salt, so key cardinality and AQE coalescing separate
      def pinned(salt: Int, parts: Int): DataFrame = {
        val assigned = emb
          .withColumn("ivf_part", model.assignCol(col("embedding")))
          .withColumn("_salt", pmod(xxhash64(col("vec_id")), lit(salt)))
          .repartition(parts, col("ivf_part"), col("_salt"))
        val probed = queries
          .withColumn("ivf_part",
            explode(model.probeCol(col("qv"), model.k)))
          .withColumn("_salt",
            explode(array((0 until salt).map(lit(_)): _*)))
          .repartition(parts, col("ivf_part"), col("_salt"))
        val score = graft.types.Metric.L2.score(col("embedding"), col("qv"))
        val scored = assigned.join(probed, Seq("ivf_part", "_salt"))
          .withColumn("_os_in", score)
        graft.query.Search.topKPerKey(scored, "query_id", col("_os_in"),
          "vec_id", 3)
      }
      Seq((1, 32), (4, 32), (8, 32), (16, 32)).foreach { case (s, p) =>
        time(s"knnJoin pinned salt=$s parts=$p (noop)") { noop(pinned(s, p)) }
      }
    }

    // ---- windowGrams variants: narrow exploded rows
    if (sys.env.contains("OPT_ALL")) (1 to 2).foreach { pass =>
      println(s"-- windowGrams variants pass $pass")
      val L = 30
      // variant A: hash array per doc, then posexplode (text never rides
      // the exploded rows)
      def narrowGrams(portable: Boolean): DataFrame = {
        def gramHash(g: Column): Column =
          if (portable) graft.dedup.Dedup.portableHash(lit("ss"), g)
          else xxhash64(g)
        docs.where(length(col("text")) >= L)
          .select(col("doc_id").as("id"),
            transform(sequence(lit(1), length(col("text")) - (L - 1)),
              p => gramHash(col("text").substr(p, lit(L)))).as("_hs"))
          .select(col("id"), posexplode(col("_hs")).as(Seq("pos0", "h")))
          .select(col("id"), (col("pos0") + 1).as("pos"), col("h"))
      }
      time("narrowGrams fast (noop)") { noop(narrowGrams(false)) }
      time("narrowGrams portable (noop)") { noop(narrowGrams(true)) }
    }

    // ---- dedup_semantic decomposition
    if (sys.env.contains("OPT_ALL")) (1 to 2).foreach { pass =>
      println(s"-- dedup_semantic pass $pass")
      import graft.functions.vec_cos
      val emb0 = graft.Tables.load(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"), col("label"))
      val base = emb0.select(col("vec_id").as("id"),
        col("label").as("cluster"), col("embedding").as("v"))
      val edges = base
        .select(col("cluster"), col("id").as("u"), col("v").as("va"))
        .join(base.select(col("cluster"), col("id").as("w"),
          col("v").as("vb")), Seq("cluster"))
        .where(col("u") < col("w"))
        .where(vec_cos(col("va"), col("vb")) >= 0.9)
        .select(col("u"), col("w").as("v"))
      time("edges plain (noop)") { noop(edges) }
      val width = 32
      val baseS = base.withColumn("_salt", pmod(xxhash64(col("id")), lit(8)))
      val baseE = base.withColumn("_salt",
        explode(array((0 until 8).map(lit(_)): _*)))
      val edgesPinned = baseE
        .select(col("cluster"), col("_salt"), col("id").as("u"),
          col("v").as("va"))
        .repartition(width, col("cluster"), col("_salt"))
        .join(baseS.select(col("cluster"), col("_salt"), col("id").as("w"),
            col("v").as("vb"))
          .repartition(width, col("cluster"), col("_salt")),
          Seq("cluster", "_salt"))
        .where(col("u") < col("w"))
        .where(vec_cos(col("va"), col("vb")) >= 0.9)
        .select(col("u"), col("w").as("v"))
      time("edges pinned+salt8 (noop)") { noop(edgesPinned) }
      time("connectedComponents(edges) (noop)") {
        noop(graft.dedup.Components.connectedComponents(edges))
      }
      time("semanticDedup full (noop)") {
        noop(graft.SparkEntry.queries("dedup_semantic")(spark, sfDir))
      }
    }

    // ---- text_bpe_tokens
    if (sys.env.contains("OPT_ALL")) (1 to 2).foreach { pass =>
      println(s"-- text_bpe pass $pass")
      time("text_bpe_tokens (noop)") {
        noop(graft.SparkEntry.queries("text_bpe_tokens")(spark, sfDir))
      }
    }
    // ---- pipeline_quality_score
    if (sys.env.contains("OPT_ALL")) (1 to 2).foreach { pass =>
      println(s"-- quality pass $pass")
      time("pipeline_quality_score (noop)") {
        noop(graft.SparkEntry.queries("pipeline_quality_score")(spark, sfDir))
      }
    }
    // ---- text-row scan-parallelism A/B: the 1.5 MB documents file scans
    // as ONE task; CPU-heavy row-local operators starve at bench scale
    (1 to 2).foreach { pass =>
      println(s"-- text A/B pass $pass (docs partitions=" +
        docs.rdd.getNumPartitions + ")")
      val docsWide = docs.repartition(32)
      def bpe(d: DataFrame): DataFrame =
        graft.text.Bpe.encode(graft.CurationQueries.frozenBpe, d,
          "doc_id", "text").orderBy(col("doc_id").asc)
      time("bpe_tokens single-task (noop)") { noop(bpe(docs)) }
      time("bpe_tokens spread (noop)") { noop(bpe(docsWide)) }
      val m = graft.text.QualityClassifier.LinearQualityModel(64,
        Array.tabulate(64)(b => ((b * 2654435761L % 1000) - 500) / 1000.0),
        bias = 0.1)
      def qs(d: DataFrame): DataFrame =
        graft.text.QualityClassifier.score(m, d, "doc_id", "text",
          threshold = 0.55).orderBy(col("doc_id").asc)
      time("quality_score single-task (noop)") { noop(qs(docs)) }
      time("quality_score spread (noop)") { noop(qs(docsWide)) }
      def grams(d: DataFrame): DataFrame =
        graft.dedup.Dedup.windowGrams(d, "doc_id", "text", 30,
          portable = true)
      time("windowGrams single-task (noop)") { noop(grams(docs)) }
      time("windowGrams spread (noop)") { noop(grams(docsWide)) }
      def tfidf(d: DataFrame): DataFrame =
        graft.text.Features.hashedTfIdf(d, "doc_id", "text", dim = 64)
          .orderBy(col("doc_id").asc, col("bucket").asc)
      time("hashed_tfidf single-task (noop)") { noop(tfidf(docs)) }
      time("hashed_tfidf spread (noop)") { noop(tfidf(docsWide)) }
    }
    // ---- bigram/serve A-B (batch-2 regression check)
    (1 to 3).foreach { pass =>
      println(s"-- bigram A/B pass $pass")
      val plain = graft.Tables.load(spark, sfDir, "documents")
      val wide = graft.functions.spread_input(plain)
      time("bigram plain (noop)") {
        noop(graft.text.BigramLM.scoreNll(plain, "doc_id", "text")
          .orderBy(col("id").asc))
      }
      time("bigram spread (noop)") {
        noop(graft.text.BigramLM.scoreNll(wide, "doc_id", "text")
          .orderBy(col("id").asc))
      }
      time("unigram plain (noop)") {
        noop(graft.text.UnigramLM.scoreNll(plain, "doc_id", "text")
          .orderBy(col("id").asc))
      }
      time("unigram spread (noop)") {
        noop(graft.text.UnigramLM.scoreNll(wide, "doc_id", "text")
          .orderBy(col("id").asc))
      }
    }

    // ---- serve-refresh window decomposition
    (1 to 1).foreach { pass =>
      println(s"-- serve_refresh decomposition")
      val dim = 128
      val refreshRoot = s"${sys.props("java.io.tmpdir")}/graft_opt_refresh_db"
      new org.apache.hadoop.fs.Path(refreshRoot)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(refreshRoot), true)
      val db = graft.GraftDB.open(spark, refreshRoot, dim = dim, metric = "l2")
      def synth(lo: Long): DataFrame = spark.range(lo, lo + 250, 1, 4).select(
        col("id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => (pmod(xxhash64(col("id") * lit(131) + i), lit(1000))
            .cast("double") / lit(500.0) - lit(1.0)).cast("float"))
          .as("vector"))
      db.insertBatch(synth(0))
      val set = graft.serve.ReplicaSet.fromStore(db, shards = 2, nlist = 16)
      var next = 30000000L
      (1 to 3).foreach { w =>
        time(s"window $w insertBatch(250)") { db.insertBatch(synth(next)) }
        time(s"window $w refreshFrom") { set.refreshFrom(db) }
        next += 250
      }
      (1 to 3).foreach { w =>
        time(s"window nostats $w insertBatch(250,stats=f)") {
          db.insertBatch(synth(next), collectStats = false)
        }
        time(s"window nostats $w refreshFrom") { set.refreshFrom(db) }
        next += 250
      }
    }
    spark.stop()
  }
}
