package graft.serve

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.types.{Filter, Metric}

/** Incremental freshness on the serving replica: tombstone deletes and
  * delta appends (the reference's in-memory bitmap delete + memtable
  * insert analog — vecgo serves inserts/deletes between rebuilds the same
  * way). Ground truth everywhere: a replica REBUILT from scratch over the
  * post-mutation row set must match the mutated replica exactly.
  */
class LocalReplicaMutationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dim = 16
  private val n = 1200

  private def corpus(pred: Long => Boolean = _ => true) = {
    val keep = udf((id: Long) => pred(id))
    spark.range(0, n, 1, 4).where(keep(col("id"))).select(
      col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("id") * lit(131) + i), lit(1000))
          .cast("double") / lit(500.0) - lit(1.0)).cast("float")).as("vec"))
  }

  private def vecOf(id: Long): Array[Float] = {
    import spark.implicits._
    corpus(_ == id).select("vec").as[Array[Float]].head()
  }

  private def queryVec(seed: Long): Array[Float] =
    Array.tabulate(dim)(i => (((seed * 131 + i * 7919) % 1000) / 500.0 - 1.0).toFloat)

  test("deletes: mutated replica == replica rebuilt without the ids, every path") {
    for (metric <- Seq(Metric.L2, Metric.Cosine)) {
      val rep = LocalReplica.fromDataFrame(corpus(), "vec", "id", metric,
        nlist = 8)
      val delIds = (0L until n.toLong).filter(_ % 7 == 3).toArray
      assert(rep.delete(delIds) == delIds.length)
      assert(rep.delete(delIds) == 0) // idempotent
      assert(rep.liveSize == n - delIds.length)
      val truth = LocalReplica.fromDataFrame(
        corpus(id => id % 7 != 3), "vec", "id", metric, nlist = 8)
      val q = queryVec(5)
      // probed top-k — both replicas share KMeans-seeded centroids over
      // different row sets, so compare on the exhaustive probe (exact)
      assert(rep.search(q, 20, nprobe = 8) == truth.search(q, 20, nprobe = 8))
      // threshold
      val cut = truth.search(q, 30, nprobe = 8).last.score
      assert(rep.searchThreshold(q, cut, 30, nprobe = 8) ==
        truth.searchThreshold(q, cut, 30, nprobe = 8))
      // batch
      val qs = (0 until 5).map(s => (s.toLong, queryVec(s)))
      assert(rep.batchSearch(qs, 10, nprobe = 8) ==
        truth.batchSearch(qs, 10, nprobe = 8))
      // filtered
      val allow: Long => Boolean = id => id % 2 == 0
      assert(rep.searchFiltered(q, 10, allow, nprobe = 8) ==
        truth.searchFiltered(q, 10, allow, nprobe = 8))
    }
  }

  test("deletes are sound through the SQ8-coded and PQ-coded first passes") {
    val delIds = (0L until n.toLong).filter(_ % 5 == 1).toArray
    val base = corpus()
    val pm = graft.index.PQ.train(base.select(col("vec")), "vec", m = 4,
      iters = 4)
    for (pq <- Seq(None, Some(pm))) {
      val rep = LocalReplica.fromDataFrame(base, "vec", "id", Metric.L2,
        pqModel = pq)
      assert(if (pq.isDefined) rep.pqCoded else rep.coded)
      rep.delete(delIds)
      val truth = LocalReplica.fromDataFrame(
        corpus(id => id % 5 != 1), "vec", "id", Metric.L2).withoutCodes
      for (s <- 0 until 10) {
        val q = queryVec(s)
        assert(rep.search(q, 15) == truth.search(q, 15),
          s"coded(pq=${pq.isDefined}) delete mismatch at seed $s")
      }
    }
  }

  test("appends: searchable immediately, fused exactly; upsert replaces") {
    val cut = 1000L // build from [0, cut), append the rest
    val rep = LocalReplica.fromDataFrame(corpus(_ < cut), "vec", "id",
      Metric.L2, nlist = 6)
    val restIds = (cut until n.toLong).toArray
    import spark.implicits._
    val rest = corpus(_ >= cut).select("id", "vec")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    rep.append(rest.map(_._1), rest.map(_._2))
    assert(rep.deltaSize == restIds.length)
    assert(rep.liveSize == n)
    val truth = LocalReplica.fromDataFrame(corpus(), "vec", "id", Metric.L2,
      nlist = 6)
    val q = queryVec(9)
    assert(rep.search(q, 20, nprobe = 6) == truth.search(q, 20, nprobe = 6))
    // appended ids collide with live rows → refused; after delete → ok
    intercept[IllegalArgumentException] {
      rep.append(Array(5L), Array(vecOf(5L)))
    }
    // upsert: replace row 5 with row 7's vector — it must now score AS
    // row 7's vector does
    val v7 = vecOf(7L)
    rep.upsert(Array(5L), Array(v7))
    val got = rep.search(v7, 3, nprobe = 6)
    assert(got.take(2).map(_.id).toSet == Set(5L, 7L),
      s"upserted twin rows should tie at the top, got $got")
  }

  test("delta rows score on the SAME kernel tier as main rows (fast on and off)") {
    // residency must not affect scores: under the production fast
    // kernels, a vector in the delta must rank exactly like the same
    // vector in the main block, so fused search == compacted search
    import graft.functions.KernelMode
    for (metric <- Seq(Metric.L2, Metric.Cosine, Metric.Dot)) {
      val cut = 900L
      val rep = LocalReplica.fromDataFrame(corpus(_ < cut), "vec", "id", metric)
      import spark.implicits._
      val rest = corpus(_ >= cut).select("id", "vec")
        .as[(Long, Array[Float])].collect().sortBy(_._1)
      rep.append(rest.map(_._1), rest.map(_._2))
      for (fastOn <- Seq(false, true)) {
        KernelMode.withFast(fastOn) {
          val q = queryVec(33)
          val fused = rep.search(q, 25)
          val folded = rep.compacted().search(q, 25)
          assert(fused == folded,
            s"metric=$metric fast=$fastOn: fused != compacted")
        }
      }
    }
  }

  test("searchWhere: delta rows are all-NULL metadata → excluded by predicates") {
    val rep = LocalReplica.fromDataFrame(
      corpus(_ < 100).withColumn("label", (col("id") % 3).cast("int")),
      "vec", "id", Metric.L2, metaCols = Seq("label"))
    rep.append(Array(5000L), Array(queryVec(42)))
    val q = queryVec(42)
    // unfiltered search sees the appended row at the top
    assert(rep.search(q, 1).head.id == 5000L)
    // any predicate excludes it (NULL never matches), including Ne
    assert(!rep.searchWhere(q, 100, Seq(Filter.Ne("label", 99)))
      .exists(_.id == 5000L))
  }

  test("save() refuses pending mutations; compacted() folds them exactly") {
    val rep = LocalReplica.fromDataFrame(corpus(_ < 600), "vec", "id",
      Metric.L2, nlist = 4)
    rep.delete(Array(10L, 20L))
    rep.append(Array(9000L), Array(queryVec(1)))
    intercept[IllegalArgumentException] {
      rep.save(java.nio.file.Files.createTempDirectory("rep").toString + "/r.bin")
    }
    val folded = rep.compacted()
    assert(folded.size == 600 - 2 + 1)
    assert(folded.deltaSize == 0)
    for (s <- 0 until 5) {
      val q = queryVec(s)
      assert(folded.search(q, 12, nprobe = 4) == rep.search(q, 12, nprobe = 4),
        s"compacted mismatch at seed $s")
    }
    // compacted artifacts save/load round-trip
    val path = java.nio.file.Files.createTempDirectory("rep").toString + "/r.bin"
    folded.save(path)
    val loaded = LocalReplica.load(path)
    val q = queryVec(3)
    assert(loaded.search(q, 12, nprobe = 4) == folded.search(q, 12, nprobe = 4))
  }

  test("searches race mutations without tearing: every result is a valid snapshot") {
    // readers must never crash or observe a half-applied mutation: any
    // query result must equal the brute-force top-k over SOME prefix of
    // the mutation sequence (each mutation batch is atomic). The mutation
    // schedule deletes even ids in waves, then appends fresh ids.
    val rep = LocalReplica.fromDataFrame(corpus(), "vec", "id", Metric.L2,
      nlist = 8)
    val q = queryVec(21)
    // precompute the expected top-10 after each of the 5 atomic steps
    val evens = (0L until n.toLong).filter(_ % 2 == 0)
    val steps: Seq[Set[Long]] = {
      val s0 = (0L until n.toLong).toSet
      val s1 = s0 -- evens.take(200)
      val s2 = s1 -- evens.slice(200, 400)
      val s3 = s2 -- evens.drop(400)
      Seq(s0, s1, s2, s3)
    }
    val truthRep = LocalReplica.fromDataFrame(corpus(), "vec", "id", Metric.L2)
    val full = truthRep.search(q, n)
    val validTops: Seq[Seq[Long]] =
      steps.map(live => full.filter(c => live(c.id)).take(10).map(_.id))
    val errors = new java.util.concurrent.atomic.AtomicReference[String](null)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val readers = (0 until 4).map { _ =>
      new Thread(() => {
        try {
          while (!stop.get()) {
            val ids = rep.search(q, 10, nprobe = 8).map(_.id)
            if (!validTops.contains(ids))
              errors.compareAndSet(null, s"result $ids matches no atomic step")
          }
        } catch {
          case e: Throwable => errors.compareAndSet(null, s"reader threw: $e")
        }
      })
    }
    readers.foreach(_.start())
    Thread.sleep(50)
    rep.delete(evens.take(200).toArray)
    Thread.sleep(50)
    rep.delete(evens.slice(200, 400).toArray)
    Thread.sleep(50)
    rep.delete(evens.drop(400).toArray)
    Thread.sleep(100)
    stop.set(true)
    readers.foreach(_.join(5000))
    assert(errors.get() == null, String.valueOf(errors.get()))
  }

  test("upsert is atomic: a raced reader never sees the upserted row absent") {
    // the row being upserted always scores as the unique global best
    // (its vector IS the query on both sides of every upsert), so any
    // top-1 result that is NOT this id means a reader observed the
    // upsert half-applied — the delete published without the re-append
    // (the exact skew two separate volatile publishes allowed)
    val rep = LocalReplica.fromDataFrame(corpus(), "vec", "id", Metric.L2,
      nlist = 8)
    val star = 424242L
    val q = queryVec(99)
    val vA = q.clone() // exactly the query: L2 distance 0, unbeatable
    val vB = q.clone()
    vB(0) = vB(0) + 1e-4f // still far closer than any corpus row
    rep.append(Array(star), Array(vA))
    val errors = new java.util.concurrent.atomic.AtomicReference[String](null)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val readers = (0 until 4).map { _ =>
      new Thread(() => {
        try {
          while (!stop.get()) {
            val top = rep.search(q, 1, nprobe = 8)
            if (top.isEmpty || top.head.id != star)
              errors.compareAndSet(null,
                s"reader saw top-1 ${top.map(_.id)} during an upsert of $star")
          }
        } catch {
          case e: Throwable => errors.compareAndSet(null, s"reader threw: $e")
        }
      })
    }
    readers.foreach(_.start())
    val deadline = System.nanoTime() + 300L * 1000 * 1000
    var flip = false
    while (System.nanoTime() < deadline && errors.get() == null) {
      rep.upsert(Array(star), Array(if (flip) vA else vB))
      flip = !flip
    }
    stop.set(true)
    readers.foreach(_.join(5000))
    assert(errors.get() == null, String.valueOf(errors.get()))
  }

  test("refreshFrom: manifest-diff pull == fresh re-export; LSN replay; compaction refusal") {
    val root = s"${sys.props("java.io.tmpdir")}/graft_refresh_spec"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    def recs(pred: Long => Boolean) =
      corpus(pred).select(col("id"), col("vec").as("vector"))
    val db = graft.GraftDB.open(spark, root, dim = dim, metric = "l2")
    db.insertBatch(recs(_ < 600))
    val rep = LocalReplica.fromStore(db, nlist = 4)
    assert(rep.exportedVersion.contains(db.currentVersion))
    // store moves on: one insert batch, one delete batch
    db.insertBatch(recs(id => id >= 600 && id < 700))
    val delIds = (0L until 600L).filter(_ % 9 == 2)
    db.delete(delIds)
    val st = rep.refreshFrom(db)
    assert(st.appended == 100, s"appended ${st.appended}")
    assert(st.deleted == delIds.length, s"deleted ${st.deleted}")
    assert(rep.exportedVersion.contains(db.currentVersion))
    // refreshed replica == a fresh export of the current version
    val fresh = LocalReplica.fromStore(db, nlist = 4)
    for (s <- 0 until 5) {
      val q = queryVec(s)
      assert(rep.search(q, 15, nprobe = 4) == fresh.search(q, 15, nprobe = 4),
        s"refresh parity failed at seed $s")
    }
    // LSN semantics: delete then RE-INSERT the same id with a new vector —
    // seq-order replay must land the re-inserted row, searchable
    val marker = queryVec(77)
    db.delete(Seq(650L))
    import spark.implicits._
    db.insertBatch(Seq((650L, marker)).toDF("id", "vector"))
    val st2 = rep.refreshFrom(db)
    assert(st2.appended == 1 && st2.deleted == 1)
    assert(rep.search(marker, 1, nprobe = 4).head.id == 650L)
    // no-op refresh
    val st3 = rep.refreshFrom(db)
    assert(st3.appended == 0 && st3.deleted == 0 &&
      st3.fromVersion == st3.toVersion)
    // compaction rewrites files -> file-level refresh must refuse
    db.compact()
    intercept[IllegalArgumentException] { rep.refreshFrom(db) }
  }

  test("delete throughput sanity: bulk tombstoning is millions of ids/sec") {
    val rep = LocalReplica.fromDataFrame(corpus(), "vec", "id", Metric.L2)
    val delIds = (0L until n.toLong by 2).toArray
    val t0 = System.nanoTime()
    rep.delete(delIds)
    val perSec = delIds.length / ((System.nanoTime() - t0) / 1e9)
    // n is tiny here so this is just a smoke gate (the bench row measures
    // the real rate at 500k); still, sub-100k/s would mean a boxed path
    assert(perSec > 100000, s"delete path too slow: $perSec ids/s")
  }

  test("get: point lookup respects tombstones and delta, newest-append wins") {
    val rep = LocalReplica.fromDataFrame(corpus(_ < 100), "vec", "id",
      Metric.L2, nlist = 4)
    assert(rep.get(7L).map(_.toSeq).contains(vecOf(7L).toSeq))
    assert(rep.get(4242L).isEmpty)
    rep.delete(Array(7L))
    assert(rep.get(7L).isEmpty, "tombstoned row must be invisible")
    val fresh = queryVec(77)
    rep.append(Array(7L), Array(fresh))
    assert(rep.get(7L).map(_.toSeq).contains(fresh.toSeq),
      "re-appended row must be served from the delta")
    val fresher = queryVec(78)
    rep.upsert(Array(7L), Array(fresher))
    assert(rep.get(7L).map(_.toSeq).contains(fresher.toSeq))
  }
}
