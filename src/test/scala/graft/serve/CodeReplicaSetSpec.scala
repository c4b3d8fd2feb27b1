package graft.serve

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The Hamming router invariant: a [[CodeReplicaSet]] over any
  * partitioning of the code rows answers identically to one
  * [[LocalCodeReplica]] holding them all.
  */
class CodeReplicaSetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val bits = 64
  private val n = 1500

  private def corpus = {
    val vecs = spark.range(0, n, 1, 4).select(
      col("id"),
      transform(sequence(lit(0), lit(bits - 1)),
        i => (pmod(xxhash64(col("id") * lit(131) + i), lit(1000))
          .cast("double") / lit(500.0) - lit(1.0)).cast("float")).as("vec"))
    vecs.select(col("id"),
      graft.index.BQ.packCol(col("vec"), bits).as("code"))
  }

  private lazy val queryPool: Map[Long, Array[Long]] =
    corpus.where(col("id") < 50).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap

  test("sharded code search/threshold/batch equal the single replica") {
    val set = CodeReplicaSet.fromDataFrame(corpus, "code", "id", bits,
      shards = 4)
    val one = LocalCodeReplica.fromDataFrame(corpus, "code", "id", bits)
    assert(set.numShards == 4 && set.size == n && set.words == one.words)
    for (seed <- Seq(0L, 7L, 42L)) {
      val q = queryPool(seed)
      assert(set.search(q, 15) == one.search(q, 15), s"seed $seed")
    }
    val q = queryPool(3)
    val cut = one.search(q, 40).last.score.toLong
    assert(set.searchThreshold(q, cut) == one.searchThreshold(q, cut))
    assert(set.searchThreshold(q, cut, maxResults = 9) ==
      one.searchThreshold(q, cut, maxResults = 9))
    // positional batch merge (duplicate query ids allowed)
    val qs = Seq(1L -> queryPool(1), 1L -> queryPool(2))
    val batch = set.batchSearch(qs, 5)
    assert(batch(0)._2 == one.search(queryPool(1), 5))
    assert(batch(1)._2 == one.search(queryPool(2), 5))
  }

  test("MMR and grouped pages are shard-invariant, survive reshard and " +
      "save/load with the metadata trailer") {
    val labeled = corpus.withColumn("label",
      pmod(col("id"), lit(5)).cast("int"))
    val one = LocalCodeReplica.fromDataFrame(labeled, "code", "id", bits,
      metaCols = Seq("label"))
    val set = CodeReplicaSet.fromDataFrame(labeled, "code", "id", bits,
      shards = 4, metaCols = Seq("label"))
    for (seed <- Seq(0L, 7L, 42L)) {
      val q = queryPool(seed)
      assert(set.searchMmr(q, k = 8, fetchK = 40, lambda = 0.7) ==
        one.searchMmr(q, k = 8, fetchK = 40, lambda = 0.7), s"mmr seed $seed")
      assert(set.searchGrouped(q, k = 12, "label", perGroup = 2) ==
        one.searchGrouped(q, k = 12, "label", perGroup = 2),
        s"grouped seed $seed")
    }
    // λ=1 degenerates to plain top-k on the code tier too
    val q = queryPool(3)
    assert(one.searchMmr(q, 10, 25, lambda = 1.0).map(c =>
      (c.id, -c.score)) == one.search(q, 10).map(c => (c.id, c.score)))
    // reshard must carry the metadata trailer through the row movement
    val re = set.reshard(6).reshard(2)
    assert(re.searchGrouped(q, 12, "label", 2) ==
      one.searchGrouped(q, 12, "label", 2))
    assert(re.searchMmr(q, 8, 40, 0.7) == one.searchMmr(q, 8, 40, 0.7))
    // save/load round-trips the v2 metadata trailer
    val dir = java.nio.file.Files
      .createTempDirectory("graft-codeset-meta").toString
    re.save(dir)
    val back = CodeReplicaSet.load(dir)
    assert(back.shards.forall(_.metaColumns == Seq("label")))
    assert(back.searchGrouped(q, 12, "label", 2) ==
      one.searchGrouped(q, 12, "label", 2))
    // delta rows (no metadata) share the NULL group; a missing column
    // fails loudly
    val moved = one.search(q, 3).map(_.id).toArray
    val codes = moved.map(id => one.get(id).get)
    one.delete(moved)
    one.append(moved, codes)
    val page = one.searchGrouped(q, 12, "label", 2)
    assert(page.nonEmpty)
    // re-appended ids read their ORIGINAL main-row metadata (same
    // contract as the float tier's groupKeyOf)
    intercept[IllegalArgumentException] {
      one.searchGrouped(q, 5, "nope", 1)
    }
  }

  test("filtered + lexical + hybrid pages are shard-invariant, survive " +
      "reshard and save/load with the lexical trailer") {
    val words = typedLit(Seq("apple", "banana", "cherry", "date",
      "elderberry", "fig", "grape", "honeydew"))
    val rich = corpus
      .withColumn("label", pmod(col("id"), lit(5)).cast("int"))
      .withColumn("text", concat_ws(" ",
        element_at(words, (pmod(xxhash64(col("id") * 7), lit(8)) + 1).cast("int")),
        element_at(words, (pmod(xxhash64(col("id") * 13), lit(8)) + 1).cast("int"))))
    val one = LocalCodeReplica.fromDataFrame(rich, "code", "id", bits,
      metaCols = Seq("label"), textCol = Some("text"))
    val set = CodeReplicaSet.fromDataFrame(rich, "code", "id", bits,
      shards = 4, metaCols = Seq("label"), textCol = Some("text"))
    assert(one.lexical && set.lexical)
    val filters = Seq(graft.types.Filter.Gte("label", 1),
      graft.types.Filter.Lte("label", 3))
    for (seed <- Seq(0L, 7L, 42L)) {
      val q = queryPool(seed)
      assert(set.searchWhere(q, 12, filters) ==
        one.searchWhere(q, 12, filters), s"where seed $seed")
      assert(set.lexicalSearch("apple banana", 12) ==
        one.lexicalSearch("apple banana", 12), s"lex seed $seed")
      assert(set.hybridSearch(q, "apple banana", 10) ==
        one.hybridSearch(q, "apple banana", 10), s"hybrid seed $seed")
      assert(set.hybridSearchWhere(q, "apple banana", 10, filters) ==
        one.hybridSearchWhere(q, "apple banana", 10, filters),
        s"filtered hybrid seed $seed")
    }
    val q = queryPool(3)
    // the filtered page honors the predicate; empty filters degenerate
    assert(one.searchWhere(q, 12, filters).forall { c =>
      val l = c.id % 5; l >= 1 && l <= 3
    })
    assert(one.hybridSearchWhere(q, "apple banana", 10, Nil) ==
      one.hybridSearch(q, "apple banana", 10))
    // tombstones leave both pools (frozen stats, live-only scoring)
    val victims = one.search(q, 4).map(_.id).toArray
    assert(set.delete(victims) == one.delete(victims))
    assert(set.hybridSearch(q, "apple banana", 10) ==
      one.hybridSearch(q, "apple banana", 10))
    // reshard carries the postings (re-split + per-shard stats
    // RECOMPUTED over live rows — fresh-export semantics, unlike the
    // frozen-stat tombstones above) and the global exchange restores
    // corpus-level scoring: compare against a fresh export of the
    // surviving rows
    val oneLive = LocalCodeReplica.fromDataFrame(
      rich.where(!col("id").isin(victims: _*)), "code", "id", bits,
      metaCols = Seq("label"), textCol = Some("text"))
    val re = set.reshard(6).reshard(2)
    assert(re.lexical, "reshard dropped the lexical section")
    assert(re.hybridSearch(q, "apple banana", 10) ==
      oneLive.hybridSearch(q, "apple banana", 10))
    assert(re.lexicalSearch("apple banana", 12) ==
      oneLive.lexicalSearch("apple banana", 12))
    assert(re.searchWhere(q, 12, filters) ==
      oneLive.searchWhere(q, 12, filters))
    // save/load round-trips the v3 lexical trailer
    val dir = java.nio.file.Files
      .createTempDirectory("graft-codeset-lex").toString
    re.save(dir)
    val back = CodeReplicaSet.load(dir)
    assert(back.lexical)
    assert(back.hybridSearch(q, "apple banana", 10) ==
      oneLive.hybridSearch(q, "apple banana", 10))
    // a non-lexical replica refuses hybrid/lexical IMMEDIATELY (no scan)
    val plain = LocalCodeReplica.fromDataFrame(corpus, "code", "id", bits)
    intercept[IllegalArgumentException](
      plain.hybridSearch(q, "apple banana", 10))
    intercept[IllegalArgumentException](plain.lexicalSearch("apple", 5))
  }

  test("mutations: broadcast delete, validated cell-routed append, upsert, get") {
    val set = CodeReplicaSet.fromDataFrame(corpus, "code", "id", bits,
      shards = 4)
    val one = LocalCodeReplica.fromDataFrame(corpus, "code", "id", bits)
    val q = queryPool(5)
    val victims = one.search(q, 5).map(_.id).toArray
    assert(set.delete(victims) == victims.length)
    assert(one.delete(victims) == victims.length)
    assert(set.search(q, 10) == one.search(q, 10))
    // membership check fires before any shard mutates
    val before = set.search(q, 15)
    val e = intercept[IllegalArgumentException] {
      set.append(Array(9L), Array(new Array[Long](set.words)))
    }
    assert(e.getMessage.contains("already live"))
    assert(set.search(q, 15) == before)
    // valid appends land in exactly one shard and are searchable
    val newIds = Array((n + 1).toLong, (n + 2).toLong)
    val newCodes = Array(queryPool(11), queryPool(12))
    set.append(newIds, newCodes)
    one.append(newIds, newCodes)
    assert(set.search(q, 20) == one.search(q, 20))
    newIds.foreach { id =>
      assert(set.shards.count(_.hasLive(id)) == 1, s"id $id multi-homed")
      assert(set.get(id).get.toSeq == one.get(id).get.toSeq)
    }
    // upsert replaces wherever the old row lives
    set.upsert(Array(newIds(0)), Array(queryPool(13)))
    one.upsert(Array(newIds(0)), Array(queryPool(13)))
    assert(set.get(newIds(0)).get.toSeq == queryPool(13).toSeq)
    assert(set.search(q, 20) == one.search(q, 20))
  }

  test("sharded CDC refresh partitions the diff; save/load round-trips") {
    val root = s"${sys.props("java.io.tmpdir")}/graft_codeset_refresh_spec"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val db = graft.GraftDB.open(spark, root, dim = bits, metric = "hamming")
    db.insertBatch(corpus.where(col("id") < 1000)
      .select(col("id"), col("code").as("vector")))
    val set = CodeReplicaSet.fromStore(db, shards = 4)
    db.insertBatch(corpus.where(col("id") >= 1000)
      .select(col("id"), col("code").as("vector")))
    val delIds = (0L until 1000L).filter(_ % 11 == 3)
    db.delete(delIds)
    val st = set.refreshFrom(db)
    assert(st.appended == 500, s"appended ${st.appended}")
    assert(st.deleted == delIds.length, s"deleted ${st.deleted}")
    for (id <- 1000L until 1010L)
      assert(set.shards.count(_.hasLive(id)) == 1, s"id $id multi-homed")
    val fresh = LocalCodeReplica.fromStore(db)
    for (seed <- Seq(2L, 8L)) {
      val q = queryPool(seed)
      assert(set.search(q, 15) == fresh.search(q, 15), s"seed $seed")
    }
    // persistence: saved sets serve identically (mutations folded by the
    // store export here — the set above has none pending)
    val dir = java.nio.file.Files.createTempDirectory("graft_codeset_io")
    val freshSet = CodeReplicaSet.fromStore(db, shards = 4)
    freshSet.save(s"$dir/set")
    val loaded = CodeReplicaSet.load(s"$dir/set")
    assert(loaded.numShards == 4 && loaded.size == freshSet.size)
    for (seed <- Seq(2L, 8L)) {
      val q = queryPool(seed)
      assert(loaded.search(q, 15) == freshSet.search(q, 15))
    }
    intercept[IllegalArgumentException](loaded.refreshFrom(db))
  }

  test("reshard: split/merge a mutated code set — identical answers, " +
      "re-partitioned routing, refresh baseline carried") {
    val set = CodeReplicaSet.fromDataFrame(corpus, "code", "id", bits,
      shards = 3)
    val q = queryPool(5)
    val victims = (0L until n.toLong).filter(_ % 17 == 4).toArray
    set.delete(victims)
    val newIds = Array((n + 10).toLong, (n + 11).toLong)
    set.append(newIds, Array(queryPool(21), queryPool(22)))
    val expectLive = set.liveSize
    for (target <- Seq(5, 2, 1)) {
      val re = set.reshard(target)
      assert(re.liveSize == expectLive, s"reshard($target) lost rows")
      for (seed <- Seq(0L, 7L, 42L)) {
        val qq = queryPool(seed)
        assert(re.search(qq, 15) == set.search(qq, 15),
          s"reshard($target) diverged on seed $seed")
      }
      val cut = set.search(q, 30).last.score.toLong
      assert(re.searchThreshold(q, cut) == set.searchThreshold(q, cut))
      // routing follows the NEW cells; membership check still fires
      val e = intercept[IllegalArgumentException] {
        re.append(Array(newIds(0)), Array(new Array[Long](re.words)))
      }
      assert(e.getMessage.contains("already live"))
      val fresh = (n + 500).toLong
      re.append(Array(fresh), Array(queryPool(23)))
      assert(re.shards.count(_.hasLive(fresh)) == 1)
      assert(re.get(victims.head).isEmpty)
    }
    // from one store cut, the reshard keeps CDC capability
    val root = s"${sys.props("java.io.tmpdir")}/graft_codeset_reshard_spec"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val db = graft.GraftDB.open(spark, root, dim = bits, metric = "hamming")
    db.insertBatch(corpus.where(col("id") < 1000)
      .select(col("id"), col("code").as("vector")))
    val storeSet = CodeReplicaSet.fromStore(db, shards = 4)
    val re2 = storeSet.reshard(2)
    db.insertBatch(corpus.where(col("id") >= 1000)
      .select(col("id"), col("code").as("vector")))
    val st = re2.refreshFrom(db)
    assert(st.appended == 500, s"appended ${st.appended}")
    for (id <- 1000L until 1010L)
      assert(re2.shards.count(_.hasLive(id)) == 1, s"id $id multi-homed")
    val fresh1 = LocalCodeReplica.fromStore(db)
    for (seed <- Seq(2L, 8L)) {
      val qq = queryPool(seed)
      assert(re2.search(qq, 15) == fresh1.search(qq, 15), s"seed $seed")
    }
  }
}
