package graft.serve

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.KernelMode
import graft.types.Metric

/** The shard-router invariant: a [[ReplicaSet]] over ANY partitioning of
  * the rows answers identically to one [[LocalReplica]] holding them all.
  */
class ReplicaSetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dim = 32
  private val n = 2000

  private def corpus = {
    spark.range(0, n, 1, 4).select(
      col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("id") * lit(131) + i), lit(1000))
          .cast("double") / lit(500.0) - lit(1.0)).cast("float")).as("vec"),
      (col("id") % 10).cast("long").as("label"))
  }

  private def queryVec(seed: Long): Array[Float] =
    Array.tabulate(dim)(
      i => (((seed * 131 + i * 7919) % 1000) / 500.0 - 1.0).toFloat)

  test("sharded search equals the single replica, all metrics, both kernels") {
    for (metric <- Seq(Metric.L2, Metric.Cosine, Metric.Dot)) {
      val set = ReplicaSet.fromDataFrame(corpus, "vec", "id", metric,
        shards = 4, nlist = 4)
      val one = LocalReplica.fromDataFrame(corpus, "vec", "id", metric)
      assert(set.numShards == 4 && set.size == n)
      for (s <- 0 until 8) {
        val q = queryVec(s)
        // full coverage per shard (nprobe >= nlist) → exact merge equality
        assert(set.search(q, 15, nprobe = 4) == one.search(q, 15),
          s"sharded/single divergence: metric=$metric seed=$s")
        val fast = KernelMode.withFast(true)(set.search(q, 15, nprobe = 4))
        assert(fast == KernelMode.withFast(true)(one.search(q, 15)),
          s"sharded/single fast divergence: metric=$metric seed=$s")
      }
    }
  }

  test("sharded batch/filtered/where/threshold equal the single replica") {
    val set = ReplicaSet.fromDataFrame(corpus, "vec", "id", Metric.L2,
      shards = 3, metaCols = Seq("label"))
    val one = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2,
      metaCols = Seq("label"))
    val qs = (0L until 16L).map(s => s -> queryVec(s))
    val batch = set.batchSearch(qs, 5).toMap
    qs.foreach { case (qid, qv) =>
      assert(batch(qid) == one.search(qv, 5), s"batch query $qid diverged")
    }
    val q = queryVec(3)
    val allowed = (0L until n.toLong).filter(_ % 7 == 2).toSet
    assert(set.searchFiltered(q, 10, allowed) ==
      one.searchFiltered(q, 10, allowed))
    import graft.types.Filter
    val preds = Seq(Filter.Gte("label", 4L), Filter.Lte("label", 6L))
    assert(set.searchWhere(q, 10, preds) == one.searchWhere(q, 10, preds))
    val cut = one.search(q, 40).last.score
    assert(set.searchThreshold(q, cut) == one.searchThreshold(q, cut))
    assert(set.searchThreshold(q, cut, maxResults = 7) ==
      one.searchThreshold(q, cut, maxResults = 7))

    // metadata columns MOVE with the rows on a reshard: typed
    // predicates keep answering after the split, and a row appended
    // after the export stays all-NULL (never matches a predicate)
    val fresh = (n + 900).toLong
    set.append(Array(fresh), Array(Array.fill(dim)(0.05f)))
    val re = set.reshard(5)
    assert(re.shards.forall(_.metaColumns == Seq("label")),
      "reshard dropped the metadata columns")
    assert(re.searchWhere(q, 10, preds) == one.searchWhere(q, 10, preds),
      "resharded searchWhere diverged")
    assert(re.searchFiltered(q, 10, allowed) ==
      one.searchFiltered(q, 10, allowed))
    assert(!re.searchWhere(Array.fill(dim)(0.05f), 5,
        Seq(Filter.Gte("label", 0))).exists(_.id == fresh),
      "appended row must stay all-NULL for predicates after a reshard")
  }

  test("mutations route correctly: broadcast delete, hashed append, upsert") {
    val set = ReplicaSet.fromDataFrame(corpus, "vec", "id", Metric.L2,
      shards = 4)
    val one = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2)
    val q = queryVec(5)
    // delete wherever the rows live; same count and answers as unsharded
    val victims = one.search(q, 5).map(_.id).toArray
    assert(set.delete(victims) == victims.length)
    assert(one.delete(victims) == victims.length)
    assert(set.search(q, 10) == one.search(q, 10))
    // appended rows are findable and searchable regardless of which
    // shard the hash routed them to
    val rng = new java.util.Random(7)
    val newIds = Array.tabulate(50)(i => (n + 1 + i).toLong)
    val newVecs = Array.fill(50)(Array.fill(dim)(rng.nextFloat() * 2f - 1f))
    set.append(newIds, newVecs)
    one.append(newIds, newVecs)
    assert(set.search(q, 20) == one.search(q, 20))
    newIds.take(5).foreach { id =>
      assert(set.get(id).isDefined, s"appended id $id not found")
      assert(set.get(id).get.toSeq == one.get(id).get.toSeq)
    }
    // upsert moves a row: old placement tombstoned, exactly one live copy
    val moved = newIds.take(3)
    val movedVecs = Array.fill(3)(Array.fill(dim)(rng.nextFloat()))
    set.upsert(moved, movedVecs)
    one.upsert(moved, movedVecs)
    moved.zip(movedVecs).foreach { case (id, v) =>
      assert(set.get(id).get.toSeq == v.toSeq)
    }
    assert(set.search(q, 20) == one.search(q, 20))
    // tombstoned ids resolve to None across every shard
    assert(set.get(victims.head).isEmpty)
  }

  test("int4-coded shards keep the exactness invariant") {
    val set = ReplicaSet.fromDataFrame(corpus, "vec", "id", Metric.L2,
      shards = 4, int4 = true)
    assert(set.shards.forall(_.int4Coded))
    val one = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2)
    for (s <- 0 until 5) {
      val q = queryVec(s)
      assert(set.search(q, 10) == one.search(q, 10))
      val fast = KernelMode.withFast(true)(set.search(q, 10))
      assert(fast == KernelMode.withFast(true)(one.search(q, 10)))
    }
    // reshard keeps the INT4 family: fresh per-shard bounds, same
    // sound-margin exactness
    val re = set.reshard(2)
    assert(re.shards.forall(s => s.int4Coded && !s.coded && !s.pqCoded),
      "reshard dropped or swapped the INT4 mirror")
    for (s <- 0 until 5) {
      val q = queryVec(s)
      assert(re.search(q, 10) == one.search(q, 10),
        s"resharded int4 diverged on seed $s")
    }
  }

  test("pq/opq and rabitq sets reshard by re-encoding under the shared " +
      "model — no Spark re-export, exactness intact") {
    val pm = graft.index.PQ.train(corpus.select(col("vec")), "vec",
      m = 8, iters = 4)
    val set = ReplicaSet.fromDataFrame(corpus, "vec", "id", Metric.L2,
      shards = 3, nlist = 4, pqModel = Some(pm))
    assert(set.shards.forall(_.pqCoded))
    val one = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2)
    val re = set.reshard(5, nlist = 2)
    assert(re.shards.forall(s => s.pqCoded && !s.coded),
      "reshard must rebuild the PQ mirror, not fall back to SQ8")
    for (s <- 0 until 5) {
      val q = queryVec(s)
      assert(re.search(q, 12, nprobe = 2) == one.search(q, 12),
        s"resharded PQ diverged on seed $s")
    }
    // RaBitQ (directly-assembled shards share the seed): the 1-bit
    // words re-pack under the same rotation
    val a = LocalReplica.fromDataFrame(corpus.where(col("id") % 2 === 0),
      "vec", "id", Metric.L2, rabitq = true)
    val b = LocalReplica.fromDataFrame(corpus.where(col("id") % 2 === 1),
      "vec", "id", Metric.L2, rabitq = true)
    val rset = ReplicaSet(Seq(a, b))
    val rre = rset.reshard(3)
    assert(rre.shards.forall(s => s.rbqCoded && s.coded),
      "reshard dropped the RaBitQ section (or the SQ8 default)")
    for (s <- 0 until 5) {
      val q = queryVec(s)
      assert(rre.search(q, 12) == one.search(q, 12),
        s"resharded rabitq diverged on seed $s")
    }
  }

  test("append rejects cross-shard duplicates and bad batches before any shard mutates") {
    val set = ReplicaSet.fromDataFrame(corpus, "vec", "id", Metric.L2,
      shards = 4)
    val q = queryVec(2)
    val before = set.search(q, 15)
    // id 5 is live in whatever shard the EXPORT placed it; the append
    // routing hash is independent, so without the membership check this
    // would silently go live twice
    val e1 = intercept[IllegalArgumentException] {
      set.append(Array(5L), Array(Array.fill(dim)(0.1f)))
    }
    assert(e1.getMessage.contains("already live"))
    // a bad vector ANYWHERE in the batch leaves the whole set untouched
    val ids = Array((n + 1).toLong, (n + 2).toLong, (n + 3).toLong)
    val vecs = Array(Array.fill(dim)(0.2f), Array.fill(dim)(Float.NaN),
      Array.fill(dim)(0.3f))
    intercept[IllegalArgumentException](set.append(ids, vecs))
    assert(set.search(q, 15) == before, "failed append mutated a shard")
    assert(ids.forall(set.get(_).isEmpty))
    // duplicate query ids with different vectors answer positionally
    val batch = set.batchSearch(
      Seq((1L, queryVec(4)), (1L, queryVec(6))), 5)
    assert(batch(0)._2 == set.search(queryVec(4), 5))
    assert(batch(1)._2 == set.search(queryVec(6), 5))
  }

  test("sharded BM25/hybrid under global stats equal the single replica") {
    val words = Seq("spark", "vector", "merge", "shard", "index", "scan",
      "fuse", "rank")
    val withText = corpus.select(col("id"), col("vec"),
      concat_ws(" ",
        element_at(typedLit(words), (pmod(xxhash64(col("id") * 7), lit(8)) + 1).cast("int")),
        element_at(typedLit(words), (pmod(xxhash64(col("id") * 13), lit(8)) + 1).cast("int")),
        element_at(typedLit(words), (pmod(xxhash64(col("id") * 29), lit(8)) + 1).cast("int"))).as("text"))
    val set = ReplicaSet.fromDataFrame(withText, "vec", "id", Metric.L2,
      shards = 4, nlist = 4, textCol = Some("text"))
    val one = LocalReplica.fromDataFrame(withText, "vec", "id", Metric.L2,
      textCol = Some("text"))
    assert(set.lexical)
    // 1/2/3-term queries hit every DAAT branch; global idf/avgdl must
    // reproduce the single replica's frozen-impact scores bit-for-bit
    for (tq <- Seq("spark", "spark vector", "spark vector merge",
        "shard rank absentterm")) {
      assert(set.lexicalSearch(tq, 12) == one.lexicalSearch(tq, 12),
        s"sharded/single BM25 divergence on '$tq'")
    }
    for (s <- 0 until 5; tq <- Seq("spark vector", "merge rank scan")) {
      val q = queryVec(s)
      assert(set.hybridSearch(q, tq, 10, nprobe = 4) ==
        one.hybridSearch(q, tq, 10),
        s"sharded/single hybrid divergence: seed=$s query='$tq'")
      val fast = KernelMode.withFast(true)(
        set.hybridSearch(q, tq, 10, nprobe = 4))
      assert(fast == KernelMode.withFast(true)(one.hybridSearch(q, tq, 10)),
        s"sharded/single fast hybrid divergence: seed=$s query='$tq'")
    }
    // absent-everywhere query: empty lexical pool, still fuses
    assert(set.lexicalSearch("absentterm", 5).isEmpty)
    assert(set.hybridSearch(queryVec(1), "absentterm", 5, nprobe = 4) ==
      one.hybridSearch(queryVec(1), "absentterm", 5))

    // ---- sharded FILTERED hybrid: predicates gate both pools on every
    // shard, corpus stats stay global — equal to the single replica
    val labeled = withText.withColumn("label",
      pmod(col("id"), lit(5)).cast("int"))
    val fset = ReplicaSet.fromDataFrame(labeled, "vec", "id", Metric.L2,
      shards = 4, nlist = 4, metaCols = Seq("label"),
      textCol = Some("text"))
    val fone = LocalReplica.fromDataFrame(labeled, "vec", "id", Metric.L2,
      metaCols = Seq("label"), textCol = Some("text"))
    val fl = Seq(graft.types.Filter.Gte("label", 1),
      graft.types.Filter.Lte("label", 3))
    for (s <- 0 until 3) {
      val q = queryVec(s)
      assert(fset.hybridSearchWhere(q, "spark vector", 10, fl, nprobe = 4) ==
        fone.hybridSearchWhere(q, "spark vector", 10, fl),
        s"sharded/single filtered hybrid divergence: seed=$s")
    }
    assert(fset.hybridSearchWhere(queryVec(1), "spark vector", 10, Nil,
      nprobe = 4) ==
      fset.hybridSearch(queryVec(1), "spark vector", 10, nprobe = 4))

    // ---- lexical survives a reshard: postings re-split with the rows,
    // per-shard stats recompute, the global-stats exchange still makes
    // sharded BM25/hybrid bit-identical to the single global replica
    for (target <- Seq(6, 2)) {
      val re = set.reshard(target, nlist = 4)
      assert(re.lexical, s"reshard($target) dropped the lexical section")
      for (tq <- Seq("spark", "spark vector", "spark vector merge",
          "shard rank absentterm")) {
        assert(re.lexicalSearch(tq, 12) == one.lexicalSearch(tq, 12),
          s"resharded($target) BM25 divergence on '$tq'")
      }
      for (s <- 0 until 3; tq <- Seq("spark vector", "merge rank scan")) {
        val q = queryVec(s)
        assert(re.hybridSearch(q, tq, 10, nprobe = 4) ==
          one.hybridSearch(q, tq, 10),
          s"resharded($target) hybrid divergence: seed=$s query='$tq'")
      }
    }
    // a tombstoned row's postings do NOT travel: delete then reshard.
    // Stats semantics differ deliberately from a mutated replica: the
    // frozen export keeps the dead doc in numDocs/idf/avgdl until
    // re-export, while reshard folds mutations = FRESH-EXPORT stats —
    // so the oracle is a fresh single export over the survivors
    val victim = one.lexicalSearch("spark", 1).head.id
    set.delete(Array(victim))
    val oneFresh = LocalReplica.fromDataFrame(
      withText.where(col("id") =!= victim), "vec", "id", Metric.L2,
      textCol = Some("text"))
    val re2 = set.reshard(3, nlist = 2)
    assert(re2.lexicalSearch("spark", 12) ==
      oneFresh.lexicalSearch("spark", 12),
      "post-delete resharded BM25 diverged from a fresh export")
    // save/load round-trips the resharded lexical section (v5 artifact)
    val dir = java.nio.file.Files.createTempDirectory("graft_reshard_lex")
    re2.save(s"$dir/set")
    val loaded = ReplicaSet.load(s"$dir/set")
    assert(loaded.lexical)
    assert(loaded.lexicalSearch("spark vector", 12) ==
      oneFresh.lexicalSearch("spark vector", 12))
  }

  test("JVM-side cell routing matches Spark's xxhash64 export partitioner") {
    val sparkCells = spark.range(0, 1000).select(col("id"),
      pmod(xxhash64(col("id")), lit(8)).as("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    (0L until 1000L).foreach { id =>
      assert(ReplicaSet.cellOf(id, 8) == sparkCells(id),
        s"cell mismatch for id $id")
    }
  }

  test("sharded refreshFrom partitions the store diff; parity with fresh export") {
    val root = s"${sys.props("java.io.tmpdir")}/graft_set_refresh_spec"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    def recs(pred: org.apache.spark.sql.Column) =
      corpus.where(pred).select(col("id"), col("vec").as("vector"))
    val db = graft.GraftDB.open(spark, root, dim = dim, metric = "l2")
    db.insertBatch(recs(col("id") < 1200))
    val set = ReplicaSet.fromDataFrame(corpus.where(col("id") < 1200),
      "vec", "id", Metric.L2, shards = 4)
    intercept[IllegalArgumentException](set.refreshFrom(db)) // no origin
    val set2 = ReplicaSet.fromStore(db, shards = 4, nlist = 2)
    // store moves on: an insert batch and a delete batch
    db.insertBatch(recs(col("id") >= 1200 && col("id") < 1400))
    val delIds = (0L until 1200L).filter(_ % 9 == 2)
    db.delete(delIds)
    val st = set2.refreshFrom(db)
    assert(st.appended == 200, s"appended ${st.appended}")
    assert(st.deleted == delIds.length, s"deleted ${st.deleted}")
    // every appended row landed in exactly ONE shard — the one whose
    // hash cell claims it
    for (id <- 1200L until 1210L) {
      val holders = set2.shards.count(_.hasLive(id))
      assert(holders == 1, s"id $id live in $holders shards")
    }
    // refreshed set == a fresh sharded export AND a fresh single replica
    val freshSet = ReplicaSet.fromStore(db, shards = 4, nlist = 2)
    val freshOne = LocalReplica.fromStore(db)
    for (s <- 0 until 5) {
      val q = queryVec(s)
      assert(set2.search(q, 15, nprobe = 2) ==
        freshSet.search(q, 15, nprobe = 2), s"set parity failed seed $s")
      assert(set2.search(q, 15, nprobe = 2) == freshOne.search(q, 15),
        s"single parity failed seed $s")
    }
    // direct append then a CDC pull of the SAME id: the cell-aligned
    // routing makes the collision fail loudly in the owning shard
    set2.append(Array(5000L), Array(Array.fill(dim)(0.5f)))
    import spark.implicits._
    db.insertBatch(Seq((5000L, Array.fill(dim)(0.6f))).toDF("id", "vector"))
    intercept[IllegalStateException](set2.refreshFrom(db))
  }

  test("set save/load round-trips shards and routing metadata") {
    val dir = java.nio.file.Files.createTempDirectory("graft_set_io").toString
    val set = ReplicaSet.fromDataFrame(corpus, "vec", "id", Metric.L2,
      shards = 4, nlist = 2)
    set.save(s"$dir/set")
    val loaded = ReplicaSet.load(s"$dir/set")
    assert(loaded.numShards == set.numShards && loaded.size == set.size)
    for (s <- 0 until 5) {
      val q = queryVec(s)
      assert(loaded.search(q, 10, nprobe = 2) == set.search(q, 10, nprobe = 2))
    }
    // routing metadata survived: a live id is rejected by the membership
    // check (and lands cell-consistently when absent)
    val e = intercept[IllegalArgumentException] {
      loaded.append(Array(3L), Array(Array.fill(dim)(0.1f)))
    }
    assert(e.getMessage.contains("already live"))
    loaded.append(Array((n + 50).toLong), Array(Array.fill(dim)(0.4f)))
    assert(loaded.shards.count(_.hasLive((n + 50).toLong)) == 1)
    // the saved form carries no store origin — refresh is re-export
    val db = graft.GraftDB.open(spark,
      s"$dir/db", dim = dim, metric = "l2")
    db.insertBatch(corpus.select(col("id"), col("vec").as("vector")))
    intercept[IllegalArgumentException](loaded.refreshFrom(db))
  }

  test("reshard: split and merge answer identically to the old set, " +
      "mutations folded, routing re-partitioned") {
    val set = ReplicaSet.fromDataFrame(corpus, "vec", "id", Metric.L2,
      shards = 3, nlist = 4)
    // mutate before the reshard so the fold is exercised: deletes,
    // appends, and an upsert all have to survive the row movement
    val rng = new java.util.Random(23)
    val victims = (0L until n.toLong).filter(_ % 13 == 5).toArray
    set.delete(victims)
    val newIds = Array.tabulate(40)(i => (n + 100 + i).toLong)
    val newVecs = Array.fill(40)(Array.fill(dim)(rng.nextFloat() * 2f - 1f))
    set.append(newIds, newVecs)
    set.upsert(newIds.take(4),
      Array.fill(4)(Array.fill(dim)(rng.nextFloat())))
    val expectLive = set.shards.map(_.liveSize).sum

    for (target <- Seq(5, 2, 1)) { // split, merge, collapse
      val re = set.reshard(target, nlist = if (target == 1) 0 else 4)
      assert(re.cellsTotal == target)
      assert(re.shards.map(_.liveSize).sum == expectLive,
        s"reshard($target) lost rows")
      // the SQ8 coded mirror is rebuilt per shard (recall-proof — the
      // parity asserts below run THROUGH the coded first pass)
      assert(re.shards.forall(_.coded), s"reshard($target) lost the codes")
      // ids landed in the shard their NEW cell claims — no id twice
      re.shards.indices.foreach { i =>
        val c = re.cellOfShard(i)
        newIds.foreach { id =>
          if (re.shards(i).hasLive(id))
            assert(ReplicaSet.cellOf(id, target) == c,
              s"id $id in shard $i but cell says ${ReplicaSet.cellOf(id, target)}")
        }
      }
      for (s <- 0 until 6) {
        val q = queryVec(s)
        assert(re.search(q, 15, nprobe = 4) == set.search(q, 15, nprobe = 4),
          s"reshard($target) diverged on seed $s")
        // full-coverage probes on BOTH sides: nprobe=0 defaults to
        // √nlist, and a partially-probed threshold scan depends on the
        // clustering, which reshard legitimately rebuilds
        val cut = set.search(q, 20, nprobe = 4).last.score
        assert(re.searchThreshold(q, cut, nprobe = 4) ==
          set.searchThreshold(q, cut, nprobe = 4))
      }
      // appends route by the NEW layout and the membership check holds
      val e = intercept[IllegalArgumentException] {
        re.append(Array(newIds.head), Array(Array.fill(dim)(0.2f)))
      }
      assert(e.getMessage.contains("already live"))
      val fresh = (n + 500).toLong
      re.append(Array(fresh), Array(Array.fill(dim)(0.3f)))
      assert(re.shards.count(_.hasLive(fresh)) == 1)
      // deleted rows stayed dead
      assert(re.get(victims.head).isEmpty)
    }
    // save/load round-trip of a resharded set keeps routing + answers
    val re5 = set.reshard(5, nlist = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_reshard").toString
    re5.save(s"$dir/set")
    val loaded = ReplicaSet.load(s"$dir/set")
    val q = queryVec(11)
    assert(loaded.search(q, 10, nprobe = 2) == re5.search(q, 10, nprobe = 2))
  }

  test("reshard keeps the refresh baseline when the set came from one " +
      "store cut; direct-assembled sets stay refresh-incapable") {
    val root = s"${sys.props("java.io.tmpdir")}/graft_set_reshard_refresh"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    def recs(pred: org.apache.spark.sql.Column) =
      corpus.where(pred).select(col("id"), col("vec").as("vector"))
    val db = graft.GraftDB.open(spark, root, dim = dim, metric = "l2")
    db.insertBatch(recs(col("id") < 1200))
    val set = ReplicaSet.fromStore(db, shards = 4, nlist = 2)
    val re = set.reshard(2, nlist = 2)
    // store moves on AFTER the reshard; the diff lands in the new cells
    db.insertBatch(recs(col("id") >= 1200 && col("id") < 1400))
    val st = re.refreshFrom(db)
    assert(st.appended == 200, s"appended ${st.appended}")
    for (id <- 1200L until 1210L) {
      val holders = re.shards.count(_.hasLive(id))
      assert(holders == 1, s"id $id live in $holders shards after reshard")
    }
    val freshOne = LocalReplica.fromStore(db)
    for (s <- 0 until 4) {
      val q = queryVec(s)
      assert(re.search(q, 15, nprobe = 2) == freshOne.search(q, 15),
        s"resharded refresh parity failed seed $s")
    }
    // a set assembled from bare replicas has no origin: reshard keeps it
    // serving but refresh stays refused
    val bare = ReplicaSet(Seq(
      LocalReplica.fromDataFrame(corpus.where(col("id") % 2 === 0),
        "vec", "id", Metric.L2),
      LocalReplica.fromDataFrame(corpus.where(col("id") % 2 === 1),
        "vec", "id", Metric.L2)))
    val reBare = bare.reshard(3)
    assert(reBare.shards.map(_.liveSize).sum == n)
    intercept[IllegalArgumentException](reBare.refreshFrom(db))
  }

  test("single-shard set is the plain replica; empty frame refused") {
    val set = ReplicaSet.fromDataFrame(corpus, "vec", "id", Metric.L2,
      shards = 1)
    val one = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2)
    val q = queryVec(9)
    assert(set.numShards == 1 && set.search(q, 10) == one.search(q, 10))
    val e = intercept[IllegalArgumentException] {
      ReplicaSet.fromDataFrame(corpus.where(lit(false)), "vec", "id",
        Metric.L2, shards = 2)
    }
    assert(e.getMessage.contains("empty"))
  }
}
