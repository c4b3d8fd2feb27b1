package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.types.{Filter, FilterSet}

/** End-to-end engine lifecycle through the public facade — the "switch
  * from vecgo" surface: open → insert (validated) → search/hybrid/scan →
  * delete/upsert → compact → vacuum → time travel → stats/explain.
  */
class GraftDBSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshDb(metric: String = "l2", dim: Int = 8,
      textCol: Option[String] = None): GraftDB =
    GraftDB.open(spark, Files.createTempDirectory("graft-db").toString,
      dim = dim, metric = metric,
      schema = Map("label" -> "int"), textCol = textCol)

  private val rng = new scala.util.Random(11)
  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(8)(r.nextFloat() * 2 - 1)
  }
  private def records(ids: Range) =
    ids.map(i => (i.toLong, vec(i), i % 3, s"doc text number $i"))
      .toDF("id", "vector", "label", "body")

  test("compactZOrder through the facade: results exact after the " +
      "rewrite, manifest folded, indexed stores refused") {
    val db = freshDb()
    db.insertBatch(records(0 until 120))
    db.insertBatch(records(120 until 240))
    db.delete((0L until 240L by 13).toSeq)
    val q = vec(7)
    val before = db.search(q, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(r.fieldIndex("score"))))
    val v = db.compactZOrder(Seq("label"), targetFiles = 4)
    assert(v > 0)
    val after = db.search(q, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(r.fieldIndex("score"))))
    assert(after.toSeq == before.toSeq,
      "z-order rewrite must not change search results")
    // folded to one segment (the rewrite keeps the store prunable)
    assert(db.segmentInfo().size == 1)
    db.buildIndex(nlist = 4)
    intercept[IllegalArgumentException] { db.compactZOrder(Seq("label")) }
  }

  test("psiDrift reads through the unpacking facade on a packed store") {
    // the standard ingest path stores vectors as packed binary blobs;
    // psiDrift must unpack before posexploding (a store.read() frame
    // would throw an AnalysisException on the binary column)
    val db = freshDb()
    val v1 = db.insertBatch(records(0 until 120))
    val v2 = db.insertBatch(records(120 until 240))
    val drift = db.psiDrift(v1, v2).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(drift.size == 8)
    assert(drift.values.forall(p => !p.isNaN && p >= 0.0))
    // same-version drift is exactly zero on every dimension
    val same = db.psiDrift(v2, v2).collect().map(_.getDouble(1))
    assert(same.forall(_ == 0.0))
  }

  test("searchMmr with a filter matching no rows returns an empty page") {
    val db = freshDb()
    db.insertBatch(records(0 until 60))
    val got = db.searchMmr(vec(3), k = 5, fetchK = 10, lambda = 0.7,
      filter = FilterSet.of(Filter.Eq("label", 99)))
    assert(got.count() === 0)
  }

  test("validation: wrong dim, NaN, schema type pins") {
    val db = freshDb()
    intercept[IllegalArgumentException] {
      db.insertBatch(Seq((1L, Array(1f, 2f), 0, "x"))
        .toDF("id", "vector", "label", "body"))
    }
    intercept[IllegalArgumentException] {
      db.insertBatch(Seq((1L, Array.fill(8)(Float.NaN), 0, "x"))
        .toDF("id", "vector", "label", "body"))
    }
    intercept[IllegalArgumentException] { // label pinned int, given string
      db.insertBatch(Seq((1L, vec(1), "not-int", "x"))
        .toDF("id", "vector", "label", "body"))
    }
  }

  test("validation: null vectors and null elements are rejected (not silently top-ranked)") {
    val db = freshDb()
    // a NULL vector makes size()/exists() NULL — the bad-row predicate must
    // still catch it, or the null row wins every L2 search (NULLS FIRST)
    intercept[IllegalArgumentException] {
      db.insertBatch(Seq((1L, null.asInstanceOf[Array[Float]], 0, "x"))
        .toDF("id", "vector", "label", "body"))
    }
    intercept[IllegalArgumentException] {
      db.insertBatch(
        Seq((1L, Array[java.lang.Float](1f, null, 3f, 4f, 5f, 6f, 7f, 8f), 0, "x"))
          .toDF("id", "vector", "label", "body"))
    }
  }

  test("validation: zero vectors rejected under cosine, accepted under l2") {
    val zeroRec = Seq((1L, Array.fill(8)(0f), 0, "x"))
      .toDF("id", "vector", "label", "body")
    intercept[IllegalArgumentException] { freshDb(metric = "cosine").insertBatch(zeroRec) }
    val db = freshDb(metric = "l2")
    db.insertBatch(zeroRec)
    assert(db.read().count() == 1)
  }

  test("full lifecycle: insert, search, delete, upsert, compact, time travel") {
    val db = freshDb()
    db.insertBatch(records(0 until 100))
    // search matches brute force
    val q = vec(999)
    val got = db.search(q, 5).select("id").as[Long].collect().toSeq
    val brute = (0 until 100).map { i =>
      val v = vec(i)
      (i.toLong, v.zip(q).map { case (a, b) =>
        val d = a.toDouble - b; d * d }.sum)
    }.sortBy { case (id, d) => (d, id) }.take(5).map(_._1)
    assert(got == brute)
    // filtered search honors the metadata predicate
    val lab1 = db.search(q, 100, FilterSet.of(Filter.Eq("label", 1)))
      .select("id").as[Long].collect()
    assert(lab1.forall(_ % 3 == 1) && lab1.nonEmpty)
    // delete + upsert + time travel
    val vDel = db.delete(Seq(0L, 1L, 2L))
    assert(db.get(0L).count() == 0)
    db.upsert(records(0 until 1))
    assert(db.get(0L).count() == 1)
    db.compact()
    assert(db.read().count() == 98) // 100 - 3 deleted + 1 upserted back
    assert(db.read(vDel).count() == 97)
    val st = db.stats()
    assert(st("segments") == 1 && st("metric") == "l2")
    // read-amplification surface (CacheStats analog): scans recorded by
    // the session listener, amplification ≥ the scans this test just did
    val before = db.readStats()
    db.read().write.format("noop").mode("overwrite").save()
    assert(graft.query.QueryMetrics.totals(spark)
      .awaitAtLeast(before("queries").asInstanceOf[Long] + 1))
    val rs = db.readStats()
    assert(rs("live_rows") == 98L)
    assert(rs("rows_scanned").asInstanceOf[Long] >= 98L)
    assert(rs("read_amplification").asInstanceOf[Double] >= 1.0)
    assert(rs("files_read").asInstanceOf[Long] >= 1L)
  }

  test("writeBatch: mixed inserts + deletes land as one atomic version") {
    val db = freshDb()
    db.insertBatch(records(0 until 50))
    val v0 = db.stats()("version").asInstanceOf[Long]
    // one batch: delete ids 0-9, upsert id 10 (replaces), insert 50-54
    val v1 = db.writeBatch(
      records = Some(records(10 until 11).unionByName(records(50 until 55))),
      deleteIds = 0L until 10L)
    assert(v1 == v0 + 1, "exactly ONE new version for the whole batch")
    assert(db.read().count() == 45) // 50 - 10 deleted + 5 new (10 replaced)
    assert(db.get(0L).count() == 0 && db.get(9L).count() == 0)
    assert(db.get(10L).count() == 1 && db.get(54L).count() == 1)
    // time travel: the pre-batch version still sees the old world
    assert(db.read(v0).count() == 50)
    // pure-delete and pure-insert degenerate forms
    val v2 = db.writeBatch(deleteIds = Seq(54L))
    assert(db.read().count() == 44 && v2 == v1 + 1)
    val v3 = db.writeBatch(records = Some(records(60 until 62)))
    assert(db.read().count() == 46 && v3 == v2 + 1)
    // empty batch: no-op, no new version
    assert(db.writeBatch() == v3)
    // validation still applies inside the batch
    intercept[IllegalArgumentException] {
      db.writeBatch(records = Some(
        spark.range(1).select(col("id"), lit(null).cast("array<float>")
          .as("vector"), lit(0).as("label"), lit("x").as("body"))))
    }
  }

  test("collectFilterIds: engine-side survivors, loud guard above the cap") {
    val db = freshDb()
    db.insertBatch(records(0 until 90))
    // label = 1 matches ids ≡ 1 (mod 3): 30 survivors
    val got = db.collectFilterIds(Seq(Filter.Eq("label", 1)))
    assert(got == (0L until 90L).filter(_ % 3 == 1).toSet)
    // a collect that WOULD exceed the cap must fail loudly, not OOM later
    val e = intercept[IllegalArgumentException] {
      db.collectFilterIds(Seq(Filter.Eq("label", 1)), cap = 29)
    }
    assert(e.getMessage.contains("exceeds cap"), e.getMessage)
    // at the boundary it still succeeds
    assert(db.collectFilterIds(Seq(Filter.Eq("label", 1)), cap = 30).size == 30)
  }

  test("cosine metric normalizes stored vectors and queries rank by similarity") {
    val db = freshDb(metric = "cosine")
    db.insertBatch(records(0 until 50))
    val hit = db.search(vec(7), 1).as[(Long, Double)].collect()(0)
    assert(hit._1 == 7L)
    assert(math.abs(hit._2 - 1.0) < 1e-6) // self-similarity on normalized
    val norms = db.read().select(vec_norm_col()).as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-5), "stored normalized")
  }
  private def vec_norm_col() = graft.functions.vec_norm(col("vector"))

  test("batchSearch per metric: L2/cosine matrix path and dot fallback agree with single search") {
    for (m <- Seq("l2", "cosine", "dot")) {
      val db = freshDb(metric = m)
      db.insertBatch(records(0 until 80))
      val qs = Seq(3L, 9L).map(i => (i, vec(i.toInt)))
      val batch = db.batchSearch(qs, k = 5)
        .select("query_id", "id", "rank")
        .as[(Long, Long, Int)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
      for ((qid, qv) <- qs) {
        val single = db.search(qv, 5).select("id").as[Long].collect().toSeq
        assert(batch(qid) == single, s"metric=$m query=$qid")
      }
      // scores must be on the SAME scale as single-query search (the cosine
      // matrix path ranks by squared-L2 internally; it must report cosine)
      val bTop = db.batchSearch(qs, k = 1)
        .where(col("query_id") === qs.head._1)
        .select("score").as[Double].collect()(0)
      val sTop = db.search(qs.head._2, 1).select("score").as[Double].collect()(0)
      assert(math.abs(bTop - sTop) < 1e-5, s"metric=$m batch=$bTop single=$sTop")
    }
  }

  test("hybrid and lexical search through the facade") {
    val db = freshDb(textCol = Some("body"))
    db.insertBatch(records(0 until 30))
    val lex = db.lexicalSearch("number 7", 5).as[(Long, Double)].collect()
    assert(lex.head._1 == 7L) // only doc containing token '7'
    val hyb = db.hybridSearch(vec(7), "number 7", 5)
      .as[(Long, Double)].collect()
    assert(hyb.head._1 == 7L) // top of both lists
  }

  test("lexical index persists per-segment deltas and maintains incrementally") {
    val db = freshDb(textCol = Some("body"))
    db.insertBatch(records(0 until 20))
    assert(db.lexicalSearch("number 7", 3).as[(Long, Double)].collect().head._1 == 7L)
    // one segment -> one persisted delta, named after the segment dir
    val seg0 = db.store.manifest().get.segments.head
    assert(new java.io.File(s"${db.store.lexDeltaDir(seg0.path)}/postings").exists())
    assert(db.lexicalDeltaBuilds.get() == 1)
    assert(db.lexicalDeltaRowsTokenized.get() == 20)
    // cached read-back path (marker exists) returns the same result, no
    // further builds
    assert(db.lexicalSearch("number 7", 3).as[(Long, Double)].collect().head._1 == 7L)
    assert(db.lexicalDeltaBuilds.get() == 1)
    // new version -> index reflects the new docs, and the post-append
    // build tokenized ONLY the new segment's rows (the incrementality
    // proof: 1 new delta build over exactly 20 appended rows, not a
    // 40-row corpus rebuild)
    db.insertBatch(records(20 until 40))
    val hits = db.lexicalSearch("number 25", 3).as[(Long, Double)].collect()
    assert(hits.head._1 == 25L)
    assert(db.lexicalDeltaBuilds.get() == 2,
      s"post-append resolve must build only the new segment's delta, " +
        s"got ${db.lexicalDeltaBuilds.get()} builds")
    assert(db.lexicalDeltaRowsTokenized.get() == 40,
      s"post-append build must tokenize only the 20 new rows, " +
        s"got ${db.lexicalDeltaRowsTokenized.get() - 20}")
    val seg1 = db.store.manifest().get.segments.last
    assert(new java.io.File(s"${db.store.lexDeltaDir(seg1.path)}/postings").exists())
    // a SECOND engine on the same root reuses both persisted deltas:
    // zero builds
    val db2 = GraftDB.open(spark, db.root)
    assert(db2.lexicalSearch("number 25", 3)
      .as[(Long, Double)].collect().head._1 == 25L)
    assert(db2.lexicalDeltaBuilds.get() == 0,
      "persisted deltas must be reused across engines")
    // the query's term set reaches the postings scan as a pushed IN
    // predicate (postings persist term-sorted, so row-group stats prune)
    val plan = db2.lexicalSearch("number 25", 3).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"query terms must push into the postings scan:\n$plan")
  }

  test("lexical index after a mixed writeBatch: tombstones + append, no corpus rebuild") {
    val db = freshDb(textCol = Some("body"))
    db.insertBatch(records(0 until 20))
    db.lexicalSearch("number 7", 3).collect() // builds seg-0's delta
    val pre = db.lexicalDeltaBuilds.get()
    // atomic mixed batch: delete docs 7 and 13, append 20..30
    db.writeBatch(Some(records(20 until 30)), deleteIds = Seq(7L, 13L))
    // deleted docs must be invisible to lexical search...
    val gone = db.lexicalSearch("number 7", 3).as[(Long, Double)].collect()
    assert(!gone.exists(_._1 == 7L), s"deleted doc 7 still served: $gone")
    // ...new docs visible...
    assert(db.lexicalSearch("number 25", 3)
      .as[(Long, Double)].collect().head._1 == 25L)
    // ...and the resolve built exactly one new delta (the appended
    // segment) — deletes cost zero lexical build work
    assert(db.lexicalDeltaBuilds.get() == pre + 1,
      s"writeBatch resolve built ${db.lexicalDeltaBuilds.get() - pre} deltas")
    // ground truth: the incremental index == a scratch rebuild over the
    // live corpus (df/avgdl/N all follow the tombstoned row set)
    val scratch = graft.lexical.BM25.build(
      db.read().select(col("id"), col("body")), "id", "body")
    val want = graft.lexical.BM25.search(scratch, "number 15 17", 10)
      .as[(Long, Double)].collect().toSeq
    val got = db.lexicalSearch("number 15 17", 10)
      .as[(Long, Double)].collect().toSeq
    assert(got == want, s"incremental $got != scratch $want")
  }

  test("vacuum keeps retained versions readable; explain reports pruning") {
    val db = freshDb()
    db.insertBatch(records(0 until 10))
    db.insertBatch(records(10 until 20))
    db.compact()
    db.insertBatch(records(20 until 30))
    db.vacuum(keepVersions = 2)
    assert(db.read().count() == 30)
    val ex = db.explain(Seq(Filter.Eq("label", 99)))
    assert(ex.contains("segments pruned") && ex.contains("GraftDB plan"))
    // label stats: 99 out of range → all segments pruned
    assert(db.scan(Seq(Filter.Eq("label", 99))).count() == 0)
  }

  test("searchWithStats reports pruning decisions and timing") {
    val db = freshDb()
    db.insertBatch(records(0 until 50))                    // labels 0..2
    db.insertBatch(records(50 until 100)
      .withColumn("label", col("label") + 10))             // labels 10..12
    val (rows, stats) = db.searchWithStats(vec(999), 5,
      FilterSet.of(Filter.Eq("label", 11)))
    assert(rows.length == 5)
    assert(stats.segmentsScanned == 1 && stats.segmentsPruned == 1)
    assert(stats.durationMs > 0 && stats.rowsReturned == 5)
    assert(stats.strategy.startsWith("pruned_brute_force"))
    // cost counters off the executed plan: only the unpruned segment's 50
    // rows pass the distance kernel, and at least one file was opened
    assert(stats.rowsScanned == 50, s"rowsScanned=${stats.rowsScanned}")
    assert(stats.distanceComputations == 50)
    assert(stats.filesRead >= 1)
    // filtered facade search itself also prunes (same source path)
    val ids = db.search(vec(999), 100, FilterSet.of(Filter.Eq("label", 11)))
      .select("id").as[Long].collect()
    assert(ids.nonEmpty && ids.forall(_ >= 50))
    // session totals listener saw at least these two actions
    val totals = db.sessionMetrics
    assert(totals.awaitAtLeast(1), "listener never delivered")
    assert(totals.snapshot("rows_scanned") >= 50)
  }

  test("searchWithStats on an indexed store reports the two-phase counters") {
    val db = freshDb()
    db.insertBatch(records(0 until 200))
    db.buildIndex(nlist = 8)
    val (rows, stats) = db.searchWithStats(vec(7), 5, nprobe = 2)
    assert(rows.length == 5)
    assert(stats.strategy.startsWith("indexed"))
    // nprobe=2 of 8 lists: the probe-pruned scan reads a strict subset
    assert(stats.rowsScanned > 0 && stats.rowsScanned < 200,
      s"rowsScanned=${stats.rowsScanned} should show partition pruning")
    assert(stats.rerankPoolRows > 0, "two-phase path must report its pool")
    assert(stats.distanceComputations == stats.rowsScanned + stats.rerankPoolRows)
  }

  test("hamming store: packed codes in, popcount ranking out") {
    val db = freshDb(metric = "hamming", dim = 64) // 64 bits → 2 words
    val codes = (0L until 40L).map { i =>
      val r = new scala.util.Random(i)
      (i, Array(r.nextLong() & 0xffffffffL, r.nextLong() & 0xffffffffL), (i % 3).toInt)
    }
    db.insertBatch(codes.toDF("id", "vector", "label"))
    val q = codes(5)._2
    val got = db.searchCodes(q, 10).select("id", "score")
      .as[(Long, Long)].collect()
    // brute-force reference ranking (distance asc, id asc)
    val expect = codes.map { case (id, c, _) =>
      (id, (0 until 2).map(w => java.lang.Long.bitCount(c(w) ^ q(w)).toLong).sum)
    }.sortBy { case (id, d) => (d, id) }.take(10)
    assert(got.toSeq == expect)
    assert(got.head == (5L, 0L), "self-match at distance 0")
    // threshold variant: every hit within the bit budget
    val within = db.searchThresholdCodes(q, threshold = 20, maxResults = 100)
      .select("score").as[Long].collect()
    assert(within.forall(_ <= 20))
    // batch variant agrees with single-query on a shared query id
    val batch = db.batchSearchCodes(Seq((5L, q)), 10)
      .select("id", "score").as[(Long, Long)].collect()
    assert(batch.toSeq.sortBy(identity) == got.toSeq.sortBy(identity))
    // float-API misuse fails loudly, wrong word count rejected
    intercept[IllegalArgumentException] { db.search(Array.fill(64)(0f), 5) }
    intercept[IllegalArgumentException] { db.searchCodes(Array(1L), 5) }
    intercept[IllegalArgumentException] {
      db.insertBatch(Seq((99L, Array(1L), 0)).toDF("id", "vector", "label"))
    }
  }

  test("small-delete fast path: driver-side tombstone equals the job path") {
    val db = freshDb()
    db.insertBatch(records(0 until 50))
    val v1 = db.delete(Seq(1L, 5L, 7L)) // ≤ SmallDeleteMaxIds → driver-side
    assert(db.read().count() == 47)
    val left = db.read().select("id").as[Long].collect().toSet
    assert(!left(1L) && !left(5L) && !left(7L))
    // distributed-path delete on the same store reads the same tombstones
    val v2 = db.store.delete(Seq(8L, 9L).toDF("id"))
    assert(v2 == v1 + 1)
    assert(db.read().count() == 45)
    // compact folds both; time travel still serves the pre-delete view
    db.compact()
    assert(db.read().count() == 45)
    assert(db.read(v1).count() == 47)
    // re-insert after delete resurrects (tombstone seq semantics)
    db.insertBatch(records(1 until 2))
    assert(db.read().count() == 46)
  }

  test("hamming hybrid: popcount pool + BM25 pool fuse by RRF") {
    val root = Files.createTempDirectory("graft-db-hh").toString
    val db = GraftDB.open(spark, root, dim = 64, metric = "hamming",
      schema = Map("label" -> "int"), textCol = Some("body"))
    val rows = (0L until 40L).map { i =>
      val r = new scala.util.Random(i)
      (i, Array(r.nextLong() & 0xffffffffL, r.nextLong() & 0xffffffffL),
        (i % 3).toInt,
        if (i % 4 == 0) s"spark merge doc $i" else s"plain filler text $i")
    }
    db.insertBatch(rows.toDF("id", "vector", "label", "body"))
    val q = rows(5)._2
    val fused = db.hybridSearchCodes(q, "spark merge", 10)
      .select("id", "score").as[(Long, Double)].collect().toSeq
    assert(fused.size == 10)
    // manual RRF over the two pools must reproduce the fused ranking
    val m = graft.hybrid.RRF.poolSize(10)
    val vrank = db.searchCodes(q, m).select("id").as[Long].collect()
      .zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
    val lrank = db.lexicalSearch("spark merge", m)
      .select("id").as[Long].collect()
      .zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
    val expect = (vrank.keySet ++ lrank.keySet).toSeq.map { id =>
      val s = vrank.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        lrank.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (id, s)
    }.sortBy { case (id, s) => (-s, id) }.take(10)
    assert(fused == expect)
    // a doc matching the text but far in hamming space still surfaces
    assert(fused.map(_._1).exists(id => id % 4 == 0 && id != 5))
    // guards: float store rejects the codes API and vice versa
    val fdb = freshDb(textCol = Some("body"))
    fdb.insertBatch(records(0 until 5))
    intercept[IllegalArgumentException] {
      fdb.hybridSearchCodes(Array(0L, 0L), "x", 3)
    }
  }

  test("reopen reads persisted config") {
    val root = Files.createTempDirectory("graft-db-reopen").toString
    val db1 = GraftDB.open(spark, root, dim = 8, metric = "cosine",
      textCol = Some("body"))
    db1.insertBatch(records(0 until 5))
    val db2 = GraftDB.open(spark, root) // config comes from db.json
    assert(db2.config.metric == "cosine" && db2.config.dim == 8)
    assert(db2.read().count() == 5)
  }

  test("metrics observer: write/search/maintenance events fire; throwing observer is isolated") {
    val db = freshDb()
    val events = scala.collection.mutable.Buffer.empty[(String, Long)]
    db.addObserver(new MetricsObserver {
      override def onWrite(op: String, rows: Long, ms: Double, v: Long): Unit =
        events += (s"write:$op" -> rows)
      override def onSearch(strategy: String, k: Int, rows: Long, ms: Double): Unit =
        events += (s"search:${strategy.takeWhile(_ != '(')}" -> rows)
      override def onMaintenance(op: String, ms: Double, v: Long): Unit =
        events += (s"maint:$op" -> v)
    })
    // a hostile observer must never fail the operation it observes
    db.addObserver(new MetricsObserver {
      override def onWrite(op: String, rows: Long, ms: Double, v: Long): Unit =
        throw new RuntimeException("boom")
    })
    db.insertBatch(records(0 until 20))
    db.delete(Seq(3L, 4L))
    db.searchWithStats(vec(1), 5)
    db.compact()
    db.vacuum(10)
    assert(events.contains("write:insert" -> 20L))
    assert(events.contains("write:delete" -> 2L))
    assert(events.exists { case (e, n) => e == "search:brute_force" && n == 5L })
    assert(events.exists(_._1 == "maint:compact"))
    assert(events.exists(_._1 == "maint:vacuum"))
  }

  test("cache hygiene: hybrid + dedup sequence leaves no orphaned RDD blocks") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val db = freshDb(textCol = Some("body"))
    db.insertBatch(records(0 until 30))
    db.hybridSearch(vec(7), "number 7", 5).collect()
    val docs = records(0 until 30).select(col("id"), col("body").as("text"))
    graft.dedup.Dedup.minhashLsh(docs, "id", "text", n = 2).collect()
    graft.dedup.Dedup.jaccardPairs(docs, "id", "text", n = 2).collect()
    val emb = records(0 until 30).select(col("id"), col("vector"))
    graft.dedup.Dedup.srpNearDups(emb, "id", "vector", dim = 8,
      threshold = 0.9).collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"orphaned persistent RDDs: $leaked")
  }

  test("read-only open: lexical/hybrid search works without writing to the store root") {
    val root = Files.createTempDirectory("graft-db-ro-lex").toString
    val db = GraftDB.open(spark, root, dim = 8, textCol = Some("body"))
    db.insertBatch(records(0 until 20))
    val v = db.currentVersion
    // NO prior writable lexicalIndex() call: the read-only open must build
    // in memory, not persist under root
    val ro = GraftDB.open(spark, root, readOnly = true)
    def lexDeltaDirs(): Seq[String] = db.store.lexicalDeltas
    assert(ro.lexicalSearch("number 7", 3).as[(Long, Double)]
      .collect().head._1 == 7L)
    assert(ro.hybridSearch(vec(7), "number 7", 5)
      .as[(Long, Double)].collect().head._1 == 7L)
    assert(lexDeltaDirs().isEmpty,
      "read-only open must not write derived tables under the store root")
    // a pinned open takes the same in-memory path
    val pinned = GraftDB.open(spark, root, atVersion = v)
    assert(pinned.lexicalSearch("number 7", 3).as[(Long, Double)]
      .collect().head._1 == 7L)
    assert(lexDeltaDirs().isEmpty)
    // and a writable engine still persists + a fresh read-only open
    // reuses the persisted deltas (zero builds)
    db.lexicalIndex()
    assert(lexDeltaDirs().nonEmpty)
    val ro2 = GraftDB.open(spark, root, readOnly = true)
    assert(ro2.lexicalSearch("number 7", 3).as[(Long, Double)]
      .collect().head._1 == 7L)
    assert(ro2.lexicalDeltaBuilds.get() == 0,
      "read-only open must reuse persisted deltas")
  }


  test("two engines racing the same segment's lexical delta both serve correctly") {
    val root = Files.createTempDirectory("graft-db-lexrace").toString
    val w = GraftDB.open(spark, root, dim = 8, textCol = Some("body"))
    w.insertBatch(records(0 until 30))
    val a = GraftDB.open(spark, root)
    val b = GraftDB.open(spark, root)
    // both engines resolve the SAME version's lexical index concurrently:
    // the delta publication is a no-overwrite rename, so exactly one build
    // lands and the loser reads the winner's — neither may corrupt the dir
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fa = pool.submit(new java.util.concurrent.Callable[Seq[(Long, Double)]] {
        def call() = a.lexicalSearch("number 7", 3)
          .as[(Long, Double)].collect().toSeq
      })
      val fb = pool.submit(new java.util.concurrent.Callable[Seq[(Long, Double)]] {
        def call() = b.lexicalSearch("number 7", 3)
          .as[(Long, Double)].collect().toSeq
      })
      val (ra, rb) = (fa.get(), fb.get())
      assert(ra == rb && ra.head._1 == 7L, s"raced lexical results: $ra vs $rb")
    } finally pool.shutdown()
    // the published delta is complete and reusable; temps are reclaimable
    val c = GraftDB.open(spark, root)
    assert(c.lexicalSearch("number 7", 3).as[(Long, Double)]
      .collect().head._1 == 7L)
    assert(c.lexicalDeltaBuilds.get() == 0, "published delta must be reused")
    w.store.cleanOrphans()
    assert(c.lexicalSearch("number 9", 3).as[(Long, Double)]
      .collect().head._1 == 9L)
  }

  test("lexical deltas die with their segments at vacuum/cleanOrphans, survive otherwise") {
    val root = Files.createTempDirectory("graft-db-lexvac").toString
    val db = GraftDB.open(spark, root, dim = 8, textCol = Some("body"))
    db.insertBatch(records(0 until 10))   // v0, seg A
    db.lexicalIndex()                     // builds seg A's delta
    val segA = db.store.manifest().get.segments.head.path
    assert(new java.io.File(s"${db.store.lexDeltaDir(segA)}/postings").exists())
    db.compact()                          // v1: merged seg B; seg A only in v0
    db.lexicalIndex()                     // builds seg B's delta (fold point)
    val segB = db.store.manifest().get.segments.head.path
    assert(segB != segA)
    assert(new java.io.File(s"${db.store.lexDeltaDir(segB)}/postings").exists())
    db.vacuum(keepVersions = 1)           // drops v0 -> seg A unreferenced
    assert(!new java.io.File(db.store.lexDeltaDir(segA)).exists(),
      "a vacuumed segment's lexical delta must be reclaimed with it")
    assert(new java.io.File(s"${db.store.lexDeltaDir(segB)}/postings").exists(),
      "the live segment's lexical delta must survive vacuum")
    // the live delta still serves queries (read-back path, zero rebuilds)
    assert(db.lexicalSearch("number 7", 3).as[(Long, Double)]
      .collect().head._1 == 7L)
    // orphan cleanup reclaims a lexical delta whose segment is gone
    val stray = new java.io.File(s"$root/lexdelta-99-deadbeef")
    stray.mkdirs()
    db.store.cleanOrphans()
    assert(!stray.exists(), "lexdelta without a segment must be cleaned")
    assert(new java.io.File(s"${db.store.lexDeltaDir(segB)}/postings").exists())
  }

  test("open modes: readOnly rejects writes, pinned opens serve history") {
    val root = Files.createTempDirectory("graft-db-modes").toString
    val db = GraftDB.open(spark, root, dim = 8)
    db.insertBatch(records(0 until 10))   // version 0
    val v0 = db.currentVersion
    val t0 = db.store.manifest(v0).get.ts
    db.insertBatch(records(10 until 30))  // version 1
    // read-only open: full read surface, every mutation rejected
    val ro = GraftDB.open(spark, root, readOnly = true)
    assert(ro.read().count() == 30)
    assert(ro.search(vec(3), 5).count() == 5)
    intercept[IllegalStateException] { ro.insertBatch(records(90 until 91)) }
    intercept[IllegalStateException] { ro.delete(Seq(1L)) }
    intercept[IllegalStateException] { ro.compact() }
    intercept[IllegalStateException] { ro.vacuum(1) }
    // pinned-at-version open: reads serve v0; implicitly read-only
    val pinned = GraftDB.open(spark, root, atVersion = v0)
    assert(pinned.read().count() == 10)
    assert(pinned.search(vec(3), 5).collect().forall(_.getLong(0) < 10))
    assert(pinned.stats()("segment_rows") == 10L)
    intercept[IllegalStateException] { pinned.insertBatch(records(91 until 92)) }
    // pinned-at-timestamp resolves to the newest version at or before ts
    val asOf = GraftDB.open(spark, root, asOfTimestampMs = t0)
    assert(asOf.pinnedVersion.contains(v0) && asOf.read().count() == 10)
    // a head reader still sees everything
    assert(GraftDB.open(spark, root).read().count() == 30)
    // read-only/pinned opens never create a store
    intercept[IllegalArgumentException] {
      GraftDB.open(spark,
        Files.createTempDirectory("graft-db-missing").toString,
        readOnly = true)
    }
  }

  test("a failed cloneAt unstages its db.json so the same destRoot is " +
      "retryable (round-9 advice)") {
    val db = freshDb()
    db.insertBatch(records(0 until 20))
    val dest = Files.createTempDirectory("graft-db-clonefail").toString + "/c"
    // version 999 has no manifest: the clone fails AFTER staging db.json
    intercept[IllegalArgumentException] { db.cloneAt(dest, version = 999L) }
    // the staged config must not survive — a retry on the same root works
    db.cloneAt(dest)
    val clone = GraftDB.open(spark, dest)
    assert(clone.read().count() == 20)
  }
}
