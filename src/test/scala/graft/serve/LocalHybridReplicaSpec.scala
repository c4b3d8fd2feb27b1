package graft.serve

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.types.Metric

/** Format-v5 replica sections: the compact lexical postings (in-process
  * BM25 + hybrid RRF) and the RaBitQ 1-bit coarse pass. Ground truth for
  * hybrid is the ENGINE's own distributed result on the same store —
  * pools, rounded rank keys, id tie-breaks and fused ordering must match
  * exactly; RaBitQ is gated on recall (the estimator is unbounded) and on
  * exactness at a corpus-covering rerank pool.
  */
class LocalHybridReplicaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dim = 16
  private val n = 800

  // synthetic corpus with text: token stream drawn from a small zipfy
  // vocab + one unique token per doc ("tok<i>"), so queries mix common
  // and discriminative terms
  private def corpus = {
    val words = Array("spark", "vector", "merge", "index", "scan", "join",
      "the", "a", "of", "data")
    val wordsCol = typedLit(words)
    spark.range(0, n, 1, 4).select(
      col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("id") * lit(131) + i), lit(1000))
          .cast("double") / lit(500.0) - lit(1.0)).cast("float")).as("vector"),
      concat_ws(" ",
        element_at(wordsCol, (pmod(xxhash64(col("id") * 7), lit(10)) + 1).cast("int")),
        element_at(wordsCol, (pmod(xxhash64(col("id") * 13), lit(10)) + 1).cast("int")),
        element_at(wordsCol, (pmod(xxhash64(col("id") * 17), lit(4)) + 1).cast("int")),
        concat(lit("tok"), col("id"))).as("text"))
  }

  private def queryVec(seed: Long): Array[Float] =
    Array.tabulate(dim)(i => (((seed * 131 + i * 7919) % 1000) / 500.0 - 1.0).toFloat)

  private def freshDb(name: String): graft.GraftDB = {
    val root = s"${sys.props("java.io.tmpdir")}/graft_hyb_rep_$name"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val db = graft.GraftDB.open(spark, root, dim = dim, metric = "l2",
      textCol = Some("text"))
    db.insertBatch(corpus)
    db
  }

  test("textCol export with zero texted rows keeps an EMPTY lexical " +
      "section — hybrid degenerates to the vector-only fuse") {
    // the all-textless edge (one hash cell of a sharded export can land
    // this way): `lexical` must stay true, lexical pools come back
    // empty, and hybrid answers from the vector pool alone instead of
    // throwing — for a fresh export AND through a reshard
    val textless = corpus.withColumn("text", lit(null).cast("string"))
    val rep = LocalReplica.fromDataFrame(textless, "vector", "id",
      Metric.L2, textCol = Some("text"))
    assert(rep.lexical)
    assert(rep.lexicalSearch("spark vector", 5).isEmpty)
    val hy = rep.hybridSearch(queryVec(3), "spark vector", 5)
    assert(hy.map(_.id) == rep.search(queryVec(3), 5).map(_.id))
    val set = ReplicaSet.fromDataFrame(textless, "vector", "id",
      Metric.L2, shards = 3, textCol = Some("text"))
    assert(set.lexical)
    assert(set.hybridSearch(queryVec(3), "spark vector", 5).map(_.id) ==
      hy.map(_.id))
    val re = set.reshard(2)
    assert(re.lexical, "reshard dropped the empty lexical section")
    assert(re.hybridSearch(queryVec(3), "spark vector", 5).map(_.id) ==
      hy.map(_.id))
  }

  test("replica hybrid == engine hybridSearch: pools, ranks, fused order") {
    val db = freshDb("parity")
    val rep = LocalReplica.fromStore(db, nlist = 4, textCol = Some("text"))
    assert(rep.lexical)
    import spark.implicits._
    for ((tq, seed) <- Seq(("spark vector merge", 3L), ("index scan join", 11L),
        ("the data tok42", 29L))) {
      val q = queryVec(seed)
      val engine = db.hybridSearch(q, tq, 10)
        .as[(Long, Double)].collect().toSeq
      val local = rep.hybridSearch(q, tq, 10, nprobe = 4)
        .map(c => (c.id, c.score))
      assert(local.map(_._1) == engine.map(_._1),
        s"hybrid ids diverged for '$tq': $local vs $engine")
      local.zip(engine).foreach { case ((_, ls), (_, es)) =>
        assert(math.abs(ls - es) < 1e-9, s"fused score $ls vs $es")
      }
    }
  }

  test("replica lexicalSearch == engine lexicalSearch (rounded ranks, tf/df/avgdl)") {
    val db = freshDb("lex")
    val rep = LocalReplica.fromStore(db, textCol = Some("text"))
    import spark.implicits._
    for (tq <- Seq("spark vector", "tok7 the", "merge merge MERGE", "absentterm")) {
      val engine = db.lexicalSearch(tq, 15).as[(Long, Double)].collect().toSeq
      val local = rep.lexicalSearch(tq, 15).map(c => (c.id, c.score))
      assert(local.map(_._1) == engine.map(_._1), s"ids for '$tq'")
      local.zip(engine).foreach { case ((_, ls), (_, es)) =>
        assert(math.abs(ls - es) < 1e-9, s"bm25 score $ls vs $es for '$tq'")
      }
    }
  }

  test("tie-heavy corpus: the margin-buffer compaction keeps rounded-rank " +
      "parity with the engine (tiny vocab, thousands of exact ties)") {
    // every doc = 2 words from a 4-word vocab: each posting list covers
    // ~half the corpus and impacts take a handful of distinct values, so
    // nearly every offer lands in the rounding-tie margin — the shape
    // that degenerated the buffer to corpus size before compaction
    val vocab = typedLit(Seq("apple", "banana", "cherry", "date"))
    val tiny = spark.range(0, 3000, 1, 4).select(
      col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("id") * lit(131) + i), lit(1000))
          .cast("double") / lit(500.0) - lit(1.0)).cast("float")).as("vector"),
      concat_ws(" ",
        element_at(vocab, (pmod(xxhash64(col("id") * 7), lit(4)) + 1).cast("int")),
        element_at(vocab, (pmod(xxhash64(col("id") * 13), lit(4)) + 1).cast("int"))).as("text"))
    val root = s"${sys.props("java.io.tmpdir")}/graft_hyb_rep_ties"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val db = graft.GraftDB.open(spark, root, dim = dim, metric = "l2",
      textCol = Some("text"))
    db.insertBatch(tiny)
    val rep = LocalReplica.fromStore(db, nlist = 4, textCol = Some("text"))
    import spark.implicits._
    // k deep enough that the pool boundary sits INSIDE a tie class —
    // the id-asc boundary cut is exactly what compaction must preserve
    for ((tq, k) <- Seq(("apple banana", 15), ("apple banana", 200),
        ("cherry", 100), ("apple banana cherry date", 250))) {
      val engine = db.lexicalSearch(tq, k).as[(Long, Double)].collect().toSeq
      val local = rep.lexicalSearch(tq, k).map(c => (c.id, c.score))
      assert(local.map(_._1) == engine.map(_._1),
        s"tie-heavy ids diverged for '$tq' k=$k")
      local.zip(engine).foreach { case ((_, ls), (_, es)) =>
        assert(math.abs(ls - es) < 1e-9, s"bm25 $ls vs $es for '$tq'")
      }
    }
    val q = queryVec(17)
    val engineH = db.hybridSearch(q, "apple banana", 10)
      .as[(Long, Double)].collect().toSeq
    val localH = rep.hybridSearch(q, "apple banana", 10, nprobe = 4)
      .map(c => (c.id, c.score))
    assert(localH.map(_._1) == engineH.map(_._1), "tie-heavy hybrid diverged")
  }

  test("v5 artifact round-trips lexical + rabitq sections; tombstones respected") {
    val db = freshDb("roundtrip")
    val rep = LocalReplica.fromStore(db, nlist = 4, textCol = Some("text"),
      rabitq = true)
    assert(rep.lexical && rep.rbqCoded)
    val path = java.nio.file.Files.createTempDirectory("rep5").toString + "/r.bin"
    rep.save(path)
    val loaded = LocalReplica.load(path)
    assert(loaded.lexical && loaded.rbqCoded)
    val q = queryVec(5)
    assert(loaded.hybridSearch(q, "spark vector merge", 10, nprobe = 4) ==
      rep.hybridSearch(q, "spark vector merge", 10, nprobe = 4))
    assert(loaded.searchRabitq(q, 10, rerankPool = n) ==
      rep.searchRabitq(q, 10, rerankPool = n))
    // tombstoned rows drop out of BOTH pools (frozen df/avgdl contract)
    val top = loaded.lexicalSearch("spark vector", 5).map(_.id)
    loaded.delete(top.toArray)
    val after = loaded.lexicalSearch("spark vector", 5).map(_.id)
    assert(after.toSet.intersect(top.toSet).isEmpty,
      s"deleted docs still in the lexical pool: $after")
    val hybridAfter = loaded.hybridSearch(q, "spark vector", 10, nprobe = 4)
    assert(hybridAfter.map(_.id).toSet.intersect(top.toSet).isEmpty)
  }

  test("rabitq: exact at corpus-covering pool, recall ≥0.95 at a realistic pool") {
    // 1 bit/dim needs realistic dimensionality AND structured data to
    // resolve angles: on i.i.d.-uniform vectors pairwise angles
    // concentrate near 90° and the sign-bit estimate carries little
    // signal (recall ~0.6 even at 64d). Real embedding corpora are
    // clustered, so the gate uses the same clustered fixture shape as
    // `IndexedEngineSpec` (cluster centers + unit jitter) at 64d.
    val d64 = 64
    val nClusters = 8
    val rng = new scala.util.Random(7)
    val centers = Array.tabulate(nClusters) { c =>
      Array.tabulate(d64)(d => if (d % nClusters == c) 10f else 0f)
    }
    val rows = (0 until n).map { i =>
      val c = i % nClusters
      (i.toLong, centers(c).map(x => x + (rng.nextFloat() - 0.5f)))
    }
    import spark.implicits._
    val corpus64 = rows.toDF("id", "vector")
    val rep = LocalReplica.fromDataFrame(corpus64, "vector", "id",
      Metric.L2, rabitq = true)
    val brute = rep.withoutCodes
    var hits = 0
    var total = 0
    for (s <- 0 until 20) {
      val q = rows(s * 37 % n)._2.map(x => x + (rng.nextFloat() - 0.5f))
      val truth = brute.search(q, 10).map(_.id)
      // corpus-covering pool: identical to exact
      assert(rep.searchRabitq(q, 10, rerankPool = n) == brute.search(q, 10))
      // realistic pool: 20% of the corpus (a 1-bit first pass is the
      // coarsest coding — it buys a 5x traffic cut here, not SQ8's 4x
      // with sound margins)
      val approx = rep.searchRabitq(q, 10, rerankPool = n / 5).map(_.id).toSet
      hits += truth.count(approx.contains)
      total += truth.size
    }
    val recall = hits.toDouble / total
    assert(recall >= 0.95, s"rabitq recall@10 (pool 20%) = $recall")
  }

  test("filtered hybrid == engine hybridSearch(filter): predicates gate both pools") {
    val root = s"${sys.props("java.io.tmpdir")}/graft_hyb_rep_filtered"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val db = graft.GraftDB.open(spark, root, dim = dim, metric = "l2",
      schema = Map("label" -> "int"), textCol = Some("text"))
    db.insertBatch(corpus.withColumn("label",
      pmod(col("id"), lit(10)).cast("int")))
    val rep = LocalReplica.fromStore(db, nlist = 4,
      metaCols = Seq("label"), textCol = Some("text"))
    import spark.implicits._
    for ((f, seed) <- Seq(
        (graft.types.Filter.Gte("label", 4), 7L),
        (graft.types.Filter.In("label", Seq(1, 3, 5)), 13L))) {
      val q = queryVec(seed)
      val engine = db.hybridSearch(q, "spark vector", 10,
        filter = graft.types.FilterSet.of(f))
        .as[(Long, Double)].collect().toSeq
      val local = rep.hybridSearchWhere(q, "spark vector", 10, Seq(f),
        nprobe = 4).map(c => (c.id, c.score))
      assert(local.map(_._1) == engine.map(_._1),
        s"filtered hybrid ids diverged under $f: $local vs $engine")
      local.zip(engine).foreach { case ((_, ls), (_, es)) =>
        assert(math.abs(ls - es) < 1e-9)
      }
    }
    // empty filter delegates to the unfiltered path
    val q0 = queryVec(3)
    assert(rep.hybridSearchWhere(q0, "spark vector", 10, Nil, nprobe = 4) ==
      rep.hybridSearch(q0, "spark vector", 10, nprobe = 4))
  }


  test("streaming ingest keeps lexical/hybrid search fresh with delta-only builds") {
    // one store version per micro-batch is the worst case the incremental
    // lexical index exists for: each batch's resolve must tokenize ONLY
    // that batch's segment (vecgo updates its inverted index per insert,
    // bm25.go:180-278) — a full-corpus rebuild per micro-batch was the
    // round-7 scale-killer
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = s"${sys.props("java.io.tmpdir")}/graft_hyb_stream_lex"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val db = graft.GraftDB.open(spark, root, dim = dim, metric = "l2",
      textCol = Some("text"))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float], String)]
    val q = db.insertStream(
      input.toDF().toDF("id", "vector", "text"),
      java.nio.file.Files.createTempDirectory("graft-lex-ckpt").toString,
      collectStats = false)
    try {
      input.addData((1L, queryVec(1), "spark streams fresh"),
        (2L, queryVec(2), "vector engines scale"))
      q.processAllAvailable()
      assert(db.lexicalSearch("fresh", 3).as[(Long, Double)]
        .collect().head._1 == 1L)
      val builds0 = db.lexicalDeltaBuilds.get()
      val rows0 = db.lexicalDeltaRowsTokenized.get()
      input.addData((3L, queryVec(3), "streaming lexical deltas"))
      q.processAllAvailable()
      assert(db.lexicalSearch("deltas", 3).as[(Long, Double)]
        .collect().head._1 == 3L)
      // the post-batch resolve built exactly one delta over exactly the
      // new batch's one row
      assert(db.lexicalDeltaBuilds.get() == builds0 + 1)
      assert(db.lexicalDeltaRowsTokenized.get() == rows0 + 1)
      // hybrid over the streamed store agrees with a scratch-built index
      val hy = db.hybridSearch(queryVec(3), "streaming lexical deltas", 2)
        .as[(Long, Double)].collect()
      assert(hy.head._1 == 3L)
    } finally q.stop()
  }

  test("hybrid pool boundary uses the rounded rank key (engine tie semantics)") {
    // duplicate vectors force exact rounded-score ties at every pool
    // depth: id ordering inside the tie must match the engine
    val db = freshDb("ties")
    val rep = LocalReplica.fromStore(db, textCol = Some("text"))
    import spark.implicits._
    val q = queryVec(17)
    val engine = db.hybridSearch(q, "the data", 25)
      .as[(Long, Double)].collect().toSeq
    val local = rep.hybridSearch(q, "the data", 25).map(c => (c.id, c.score))
    assert(local.map(_._1) == engine.map(_._1))
  }

  test("randomized lexical parity: replica == engine across corpora shapes") {
    // broad-coverage guard for the pool-selection machinery (margin
    // buffering, eviction, rounded tie cuts): randomized doc lengths and
    // vocab skews produce arbitrary score clustering at the pool
    // boundary; replica DAAT selection must match the engine's rounded
    // TakeOrdered on every draw
    import spark.implicits._
    val rng = new scala.util.Random(1234)
    for (trial <- 0 until 4) {
      val vocabN = 4 + rng.nextInt(12)
      val vocab = (0 until vocabN).map(i => s"w$i")
      val docs = (0 until 300).map { i =>
        val len = 1 + rng.nextInt(12)
        (i.toLong, Seq.fill(len)(vocab(rng.nextInt(vocabN))).mkString(" "))
      }
      val root = s"${sys.props("java.io.tmpdir")}/graft_hyb_rep_rand$trial"
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val db = graft.GraftDB.open(spark, root, dim = dim, metric = "l2",
        textCol = Some("text"))
      db.insertBatch(docs.toDF("id", "text").join(
        corpus.select(col("id"), col("vector")), "id"))
      val rep = LocalReplica.fromStore(db, textCol = Some("text"))
      val tq = Seq.fill(1 + rng.nextInt(3))(vocab(rng.nextInt(vocabN)))
        .mkString(" ")
      val engine = db.lexicalSearch(tq, 20).as[(Long, Double)]
        .collect().toSeq
      val local = rep.lexicalSearch(tq, 20).map(c => (c.id, c.score))
      assert(local.map(_._1) == engine.map(_._1),
        s"trial=$trial query='$tq': $local vs $engine")
    }
  }
}
