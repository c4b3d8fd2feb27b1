package graft.serve

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.query.Search
import graft.types.{Candidate, Metric}

class LocalCodeReplicaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val bits = 64
  private val n = 2000

  private def corpus = {
    val vecs = spark.range(0, n, 1, 4).select(
      col("id"),
      transform(sequence(lit(0), lit(bits - 1)),
        i => (pmod(xxhash64(col("id") * lit(131) + i), lit(1000))
          .cast("double") / lit(500.0) - lit(1.0)).cast("float")).as("vec"))
    vecs.select(col("id"),
      graft.index.BQ.packCol(col("vec"), bits).as("code"))
  }

  private def queryCode(seed: Long): Array[Long] =
    corpus.where(col("id") === seed).select("code")
      .collect()(0).getSeq[Long](0).toArray

  test("replica top-k matches the distributed hamming scan exactly") {
    val rep = LocalCodeReplica.fromDataFrame(corpus, "code", "id", bits)
    assert(rep.size == n && rep.words == (bits + 31) / 32)
    for (seed <- Seq(0L, 7L, 42L)) {
      val q = queryCode(seed)
      val local = rep.search(q, 15)
      val dist = Search.knn(corpus, "code", "id", lit(q), 15, Metric.Hamming)
        .collect().map(r => Candidate(r.getLong(0), r.getLong(1).toDouble)).toSeq
      assert(local == dist)
    }
  }

  test("searchWhere: predicate survivors only, NULL rows and delta rows " +
      "excluded (three-valued semantics)") {
    val labeled = corpus.withColumn("label",
      when(pmod(col("id"), lit(10)) === 9, lit(null))
        .otherwise(pmod(col("id"), lit(10))).cast("int"))
    val rep = LocalCodeReplica.fromDataFrame(labeled, "code", "id", bits,
      metaCols = Seq("label"))
    val q = queryCode(5)
    val filters = Seq(graft.types.Filter.Gte("label", 6))
    val got = rep.searchWhere(q, 15, filters)
    // brute reference over rows whose label is non-NULL and >= 6
    val want = rep.search(q, n).filter { c =>
      val l = c.id % 10; l >= 6 && l != 9
    }.take(15)
    assert(got == want)
    // a delta row never matches a predicate (no metadata), even when its
    // code would top the page
    rep.append(Array((n + 1).toLong), Array(q))
    // delta visible to plain knn (distance 0 — ties with the query row)
    assert(rep.search(q, 2).map(_.id).contains((n + 1).toLong))
    assert(rep.searchWhere(q, 15, filters) == want) // invisible to WHERE
    // unknown column fails loudly
    intercept[IllegalArgumentException](
      rep.searchWhere(q, 5, Seq(graft.types.Filter.Eq("nope", 1))))
  }

  test("code-tier MMR equals a driver-side greedy popcount reference") {
    val rep = LocalCodeReplica.fromDataFrame(corpus, "code", "id", bits)
    def ham(a: Array[Long], b: Array[Long]): Long = {
      var d = 0L; var w = 0
      while (w < a.length) { d += java.lang.Long.bitCount(a(w) ^ b(w)); w += 1 }
      d
    }
    for (seed <- Seq(0L, 9L, 33L)) {
      val q = queryCode(seed)
      val (k, fetchK, lambda) = (6, 25, 0.7)
      // reference: pool best-first, greedy with rel = -d, sim = -d(i,j)
      val pool = rep.search(q, fetchK)
        .map(c => (c.id, rep.get(c.id).get, -c.score))
      val mu = 1.0 - lambda
      val sel = scala.collection.mutable.ArrayBuffer.empty[Int]
      val want = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      while (want.size < k) {
        var bestI = -1; var best = Double.NegativeInfinity
        for (i <- pool.indices if !sel.contains(i)) {
          val pen =
            if (sel.isEmpty) 0.0
            else sel.map(j => -ham(pool(i)._2, pool(j)._2).toDouble).max
          val s = lambda * pool(i)._3 - mu * pen
          if (s > best) { best = s; bestI = i }
        }
        sel += bestI
        want += ((pool(bestI)._1, best))
      }
      val got = rep.searchMmr(q, k, fetchK, lambda).map(c => (c.id, c.score))
      assert(got == want.toSeq, s"seed $seed")
    }
    // empty pool (k beyond nothing): a query against an all-deleted
    // replica returns an empty page, not a throw
    val rep2 = LocalCodeReplica.fromDataFrame(
      corpus.where(col("id") < 5), "code", "id", bits)
    rep2.delete(Array(0L, 1L, 2L, 3L, 4L))
    assert(rep2.searchMmr(queryCode(0), 3, 10, 0.7).isEmpty)
  }

  test("threshold equals the filtered ranking; batch equals per-query") {
    val rep = LocalCodeReplica.fromDataFrame(corpus, "code", "id", bits)
    val q = queryCode(3)
    val all = rep.search(q, n)
    val cut = all(29).score.toLong
    val thr = rep.searchThreshold(q, cut)
    assert(thr == all.takeWhile(_.score <= cut))
    assert(rep.searchThreshold(q, cut, maxResults = 7) == thr.take(7))
    val qs = Seq(1L -> queryCode(1), 2L -> queryCode(2))
    val batch = rep.batchSearch(qs, 5).toMap
    qs.foreach { case (qid, qc) => assert(batch(qid) == rep.search(qc, 5)) }
  }

  test("hamming store export refuses float stores and serves engine results") {
    import graft.GraftDB
    val root = s"${sys.props("java.io.tmpdir")}/graft_code_replica_spec"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val db = GraftDB.open(spark, root, dim = bits, metric = "hamming")
    db.insertBatch(corpus.select(col("id"), col("code").as("vector")))
    val rep = LocalCodeReplica.fromStore(db)
    val q = queryCode(11)
    val local = rep.search(q, 10)
    val engine = db.searchCodes(q, 10).collect()
      .map(r => Candidate(r.getLong(0), r.getLong(1).toDouble)).toSeq
    assert(local == engine)

    val floatRoot = s"${sys.props("java.io.tmpdir")}/graft_code_replica_l2"
    val fp = new org.apache.hadoop.fs.Path(floatRoot)
    if (fs.exists(fp)) fs.delete(fp, true)
    val fdb = GraftDB.open(spark, floatRoot, dim = 4, metric = "l2")
    val e = intercept[IllegalArgumentException](LocalCodeReplica.fromStore(fdb))
    assert(e.getMessage.contains("Hamming"))
  }

  test("mutations: delete/append/upsert match a rebuilt replica; save/load round-trips") {
    val rep = LocalCodeReplica.fromDataFrame(corpus, "code", "id", bits)
    val q = queryCode(11)
    // delete: equals a replica rebuilt without the ids, every path
    val delIds = (0L until n.toLong).filter(_ % 7 == 3).toArray
    assert(rep.delete(delIds) == delIds.length)
    assert(rep.delete(delIds) == 0) // idempotent
    assert(rep.liveSize == n - delIds.length)
    val truth = LocalCodeReplica.fromDataFrame(
      corpus.where(pmod(col("id"), lit(7)) =!= 3), "code", "id", bits)
    assert(rep.search(q, 20) == truth.search(q, 20))
    val cut = truth.search(q, 30).last.score.toLong
    assert(rep.searchThreshold(q, cut, 30) == truth.searchThreshold(q, cut, 30))
    assert(rep.batchSearch(Seq(1L -> q), 10) == truth.batchSearch(Seq(1L -> q), 10))
    // append: new codes fused exactly (give id 9000 the query's code: top-1)
    rep.append(Array(9000L), Array(q.clone()))
    assert(rep.deltaSize == 1)
    // ties at distance 0 with the original row 11 (same code) resolve by
    // id — both must sit at the top
    assert(rep.search(q, 2) == Seq(graft.types.Candidate(11L, 0.0),
      graft.types.Candidate(9000L, 0.0)))
    // upsert replaces the delta row atomically
    val q2 = queryCode(12)
    rep.upsert(Array(9000L), Array(q2.clone()))
    assert(rep.deltaSize == 1)
    assert(rep.search(q2, 2) == Seq(graft.types.Candidate(12L, 0.0),
      graft.types.Candidate(9000L, 0.0)))
    // save refuses pending mutations; a clean export round-trips
    intercept[IllegalArgumentException] {
      rep.save(java.nio.file.Files.createTempDirectory("crep").toString + "/c.bin")
    }
    val clean = LocalCodeReplica.fromDataFrame(corpus, "code", "id", bits)
    val path = java.nio.file.Files.createTempDirectory("crep").toString + "/c.bin"
    clean.save(path)
    val loaded = LocalCodeReplica.load(path)
    assert(loaded.size == n && loaded.bits == bits)
    assert(loaded.search(q, 15) == clean.search(q, 15))
  }

  test("refreshFrom: manifest-diff pull == fresh re-export (hamming twin)") {
    val root = s"${sys.props("java.io.tmpdir")}/graft_coderep_refresh"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    def recs(pred: org.apache.spark.sql.Column) =
      corpus.where(pred).select(col("id"), col("code").as("vector"))
    val db = graft.GraftDB.open(spark, root, dim = bits, metric = "hamming")
    db.insertBatch(recs(col("id") < 1500))
    val rep = LocalCodeReplica.fromStore(db)
    assert(rep.exportedVersion.contains(db.currentVersion))
    // store moves on: one insert batch, one delete batch
    db.insertBatch(recs(col("id") >= 1500))
    val delIds = (0L until 1500L).filter(_ % 9 == 2)
    db.delete(delIds)
    val st = rep.refreshFrom(db)
    assert(st.appended == n - 1500 && st.toVersion == db.currentVersion)
    val fresh = LocalCodeReplica.fromStore(db)
    val q = queryCode(5)
    assert(rep.search(q, 25) == fresh.search(q, 25))
    assert(rep.liveSize == fresh.size)
    // refresh is idempotent at the same version
    assert(rep.refreshFrom(db).appended == 0)
    // compaction rewrites files: refresh must refuse, nothing applied
    db.compact()
    val before = rep.search(q, 10)
    intercept[IllegalArgumentException] { rep.refreshFrom(db) }
    assert(rep.search(q, 10) == before)
  }

  test("get: point lookup respects tombstones and delta (hamming)") {
    val rep = LocalCodeReplica.fromDataFrame(corpus, "code", "id", bits)
    val c7 = queryCode(7)
    assert(rep.get(7L).map(_.toSeq).contains(c7.toSeq))
    assert(rep.get(424242L).isEmpty)
    rep.delete(Array(7L))
    assert(rep.get(7L).isEmpty)
    val fresh = queryCode(8)
    rep.append(Array(7L), Array(fresh.clone()))
    assert(rep.get(7L).map(_.toSeq).contains(fresh.toSeq))
  }
}
