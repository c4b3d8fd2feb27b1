package graft.serve

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.KernelMode
import graft.query.Search
import graft.types.{Candidate, Metric}

class LocalReplicaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dim = 32
  private val n = 2000

  private def corpus = {
    spark.range(0, n, 1, 4).select(
      col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("id") * lit(131) + i), lit(1000))
          .cast("double") / lit(500.0) - lit(1.0)).cast("float")).as("vec"))
  }

  private def queryVec(seed: Long): Array[Float] =
    Array.tabulate(dim)(i => (((seed * 131 + i * 7919) % 1000) / 500.0 - 1.0).toFloat)

  private def sparkKnn(metric: Metric, q: Array[Float], k: Int): Seq[Candidate] =
    Search.knn(corpus, "vec", "id", lit(q), k, metric).collect()
      .map(r => Candidate(r.getLong(0), r.getDouble(1))).toSeq

  test("brute replica matches the distributed scan bit-for-bit, all metrics") {
    for (metric <- Seq(Metric.L2, Metric.Cosine, Metric.Dot)) {
      val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", metric)
      val q = queryVec(7)
      val local = rep.search(q, k = 25)
      val dist = sparkKnn(metric, q, 25)
      assert(local.map(_.id) == dist.map(_.id))
      assert(local.map(_.score) == dist.map(_.score)) // exact kernels: same bits
    }
  }

  test("IVF replica probing all lists is exact; layout is CSR-consistent") {
    val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2,
      nlist = 8)
    assert(rep.nlist == 8)
    assert(rep.size == n)
    val q = queryVec(3)
    val allProbes = rep.search(q, 10, nprobe = 8)
    val brute = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2)
      .search(q, 10)
    assert(allProbes == brute)
  }

  test("probed recall@10 over a query panel; monotone in nprobe") {
    val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2,
      nlist = 16)
    val brute = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2)
    def meanRecall(nprobe: Int): Double = {
      val rs = (0 until 20).map { s =>
        val q = queryVec(s)
        val approx = rep.search(q, 10, nprobe = nprobe).map(_.id).toSet
        val exact = brute.search(q, 10).map(_.id).toSet
        (approx & exact).size / 10.0
      }
      rs.sum / rs.size
    }
    // UNIFORM vectors are IVF's worst case (no cluster structure), so the
    // gates are probe-fraction-shaped: half the lists must recover >=0.9,
    // and recall must not degrade as nprobe grows
    val r4 = meanRecall(4); val r8 = meanRecall(8)
    assert(r8 >= 0.9, s"mean recall@10 at nprobe=8 was $r8 < 0.9")
    assert(r8 >= r4, s"recall regressed with more probes: $r4 -> $r8")
  }

  test("threshold matches a filtered brute scan; cap and order respected") {
    val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2)
    val q = queryVec(11)
    val all = rep.search(q, n) // full ranking
    val cut = all(49).score    // a threshold that keeps exactly 50 rows
    val thr = rep.searchThreshold(q, cut)
    assert(thr.size == 50)
    assert(thr == all.take(50))
    assert(rep.searchThreshold(q, cut, maxResults = 5) == all.take(5))
    // descending metric: keep scores >= threshold
    val repDot = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.Dot)
    val allDot = repDot.search(q, n)
    val thrDot = repDot.searchThreshold(q, allDot(9).score)
    assert(thrDot == allDot.take(10))
  }

  test("parallel scan path (n >= threshold) is bit-identical to the distributed scan") {
    val big = spark.range(0, 20000, 1, 4).select(
      col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("id") * lit(131) + i), lit(1000))
          .cast("double") / lit(500.0) - lit(1.0)).cast("float")).as("vec"))
    val rep = LocalReplica.fromDataFrame(big, "vec", "id", Metric.L2)
    assert(rep.size >= LocalReplica.ParallelScanRows)
    val q = queryVec(21)
    val local = rep.search(q, 25) // brute over 20k rows → parallel chunks
    val dist = Search.knn(big, "vec", "id", lit(q), 25, Metric.L2).collect()
      .map(r => Candidate(r.getLong(0), r.getDouble(1))).toSeq
    assert(local == dist)
  }

  test("filtered search is exact over the allowed set") {
    val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2,
      nlist = 8)
    val q = queryVec(4)
    val allowed = (0L until n.toLong).filter(_ % 5 == 2).toSet
    val got = rep.searchFiltered(q, 10, allowed, nprobe = 8)
    assert(got.size == 10 && got.forall(c => allowed(c.id)))
    val brute = rep.search(q, n, nprobe = 8).filter(c => allowed(c.id)).take(10)
    assert(got == brute)
    assert(rep.searchFiltered(q, 10, _ => false).isEmpty)
  }

  test("replica-side predicates match the id-set path; nulls never satisfy") {
    import graft.types.Filter._
    val df = corpus.select(col("id"), col("vec"),
      (col("id") % 10).cast("int").as("label"),
      concat(lit("doc-"), col("id").cast("string")).as("tag"),
      when(col("id") % 7 === 0, lit(null).cast("double"))
        .otherwise((col("id") % 100).cast("double") / 10.0).as("quality"))
    val rep = LocalReplica.fromDataFrame(df, "vec", "id", Metric.L2,
      nlist = 8, metaCols = Seq("label", "tag", "quality"))
    assert(rep.metaColumns == Seq("label", "tag", "quality"))
    val q = queryVec(17)
    // numeric range conjunction ≡ the caller-materialized id-set
    val got = rep.searchWhere(q, 10,
      Seq(Gte("label", 6), Lte("label", 8)), nprobe = 8)
    val rangeIds = (0L until n.toLong).filter(i => i % 10 >= 6 && i % 10 <= 8).toSet
    assert(got.size == 10 && got == rep.searchFiltered(q, 10, rangeIds, nprobe = 8))
    // string substring containment
    val gotTag = rep.searchWhere(q, 5, Seq(Contains("tag", "9")))
    val tagIds = (0L until n.toLong).filter(i => s"doc-$i".contains("9")).toSet
    assert(gotTag == rep.searchFiltered(q, 5, tagIds))
    // NULL input never satisfies a predicate — not even Ne (Spark/vecgo
    // three-valued semantics)
    val gotNe = rep.searchWhere(q, 5, Seq(Ne("quality", -1.0)))
    val neIds = (0L until n.toLong).filter(_ % 7 != 0).toSet
    assert(gotNe == rep.searchFiltered(q, 5, neIds))
    // In over a value list; cross-type int value against the int column
    val gotIn = rep.searchWhere(q, 5, Seq(In("label", Seq(1, 3))))
    val inIds = (0L until n.toLong).filter(i => i % 10 == 1 || i % 10 == 3).toSet
    assert(gotIn == rep.searchFiltered(q, 5, inIds))
    // double-column range with a fractional bound
    val gotQ = rep.searchWhere(q, 5, Seq(Lt("quality", 2.5)))
    val qIds = (0L until n.toLong)
      .filter(i => i % 7 != 0 && (i % 100) / 10.0 < 2.5).toSet
    assert(gotQ == rep.searchFiltered(q, 5, qIds))
    // unknown column fails loudly; empty filter list = plain search
    val e = intercept[IllegalArgumentException](
      rep.searchWhere(q, 5, Seq(Eq("nope", 1))))
    assert(e.getMessage.contains("no metadata column"), e.getMessage)
    assert(rep.searchWhere(q, 10, Nil) == rep.search(q, 10))
  }

  test("metadata columns round-trip through save/load (format v3)") {
    import graft.types.Filter._
    val df = corpus.select(col("id"), col("vec"),
      (col("id") % 10).cast("int").as("label"),
      concat(lit("t"), col("id").cast("string")).as("tag"))
    val rep = LocalReplica.fromDataFrame(df, "vec", "id", Metric.L2,
      nlist = 4, metaCols = Seq("label", "tag"))
    val dir = java.nio.file.Files.createTempDirectory("graft_replica_meta")
    val path = s"$dir/replica.grlr"
    rep.save(path)
    val loaded = LocalReplica.load(path)
    assert(loaded.metaColumns == Seq("label", "tag"))
    val q = queryVec(23)
    val fs = Seq(Eq("label", 4), Contains("tag", "1"))
    assert(loaded.searchWhere(q, 10, fs, nprobe = 4) ==
      rep.searchWhere(q, 10, fs, nprobe = 4))
    // a v3 artifact without metadata still loads (empty trailer)
    val plain = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2)
    val path2 = s"$dir/plain.grlr"
    plain.save(path2)
    assert(LocalReplica.load(path2).metaColumns.isEmpty)
  }

  test("searchWithStats reports probed mass; results identical to search") {
    val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2,
      nlist = 8)
    val q = queryVec(13)
    val (res, st) = rep.searchWithStats(q, 10, nprobe = 2)
    assert(res == rep.search(q, 10, nprobe = 2))
    assert(st.listsProbed == 2 && st.listsTotal == 8)
    assert(st.rowsScanned > 0 && st.rowsScanned < n,
      s"2/8 probes must scan a strict subset, got ${st.rowsScanned}")
    assert(st.scanFraction == 0.25)
    val brute = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2)
    val (_, bst) = brute.searchWithStats(q, 10)
    assert(bst.rowsScanned == n && bst.scanFraction == 1.0)
    // full coverage (nprobe ≥ nlist collapses to one all-rows range) must
    // report EVERY list probed, not 1
    val (fres, fst) = rep.searchWithStats(q, 10, nprobe = 8)
    assert(fres == rep.search(q, 10, nprobe = 8))
    assert(fst.listsProbed == 8 && fst.scanFraction == 1.0)
    val (_, fst2) = rep.searchWithStats(q, 10, nprobe = 99)
    assert(fst2.listsProbed == 8 && fst2.rowsScanned == n)
  }

  test("save atomically replaces an existing artifact") {
    val dir = java.nio.file.Files.createTempDirectory("replica_ow").toString
    val path = s"$dir/rep.grlr"
    val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2,
      nlist = 4)
    rep.save(path)
    val q = queryVec(21)
    // second save lands over the live file (overwrite-rename, no window
    // where the artifact is missing) and the reloaded replica still answers
    rep.save(path)
    assert(LocalReplica.load(path).search(q, 10) == rep.search(q, 10))
    // no stray .tmp-* left behind by the replace
    val strays = new java.io.File(dir).list().filter(_.contains(".tmp-"))
    assert(strays.isEmpty, strays.mkString(","))
  }

  test("batch search agrees with per-query search") {
    val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2,
      nlist = 8)
    val qs = (0L until 16L).map(s => s -> queryVec(s))
    val batch = rep.batchSearch(qs, 5, nprobe = 3).toMap
    qs.foreach { case (qid, q) =>
      assert(batch(qid) == rep.search(q, 5, nprobe = 3))
    }
  }

  test("fast kernels agree with exact on rank order (no near-ties here)") {
    val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2)
    val q = queryVec(5)
    val exact = rep.search(q, 10)
    val fast = KernelMode.withFast(true)(rep.search(q, 10))
    // the synthetic lattice can produce exact score ties whose float-sum
    // order differs — compare the rank-aligned scores, not ids
    exact.zip(fast).foreach { case (e, f) =>
      assert(math.abs(e.score - f.score) <= 1e-3 * math.max(1.0, e.score))
    }
  }

  test("coded first pass is identical to the uncoded scan, all metrics, both kernels") {
    for (metric <- Seq(Metric.L2, Metric.Cosine, Metric.Dot)) {
      val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", metric,
        nlist = 8)
      assert(rep.coded)
      val plain = rep.withoutCodes
      for (s <- 0 until 10; nprobe <- Seq(2, 8)) {
        val q = queryVec(s)
        assert(rep.search(q, 10, nprobe) == plain.search(q, 10, nprobe),
          s"coded/uncoded divergence: metric=$metric seed=$s nprobe=$nprobe")
        val fast = KernelMode.withFast(true)(rep.search(q, 10, nprobe))
        val plainFast = KernelMode.withFast(true)(plain.search(q, 10, nprobe))
        assert(fast == plainFast,
          s"coded/uncoded fast divergence: metric=$metric seed=$s nprobe=$nprobe")
      }
    }
  }

  test("int4 first pass is identical to the uncoded scan, all metrics, both kernels") {
    for (metric <- Seq(Metric.L2, Metric.Cosine, Metric.Dot)) {
      val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", metric,
        nlist = 8, int4 = true)
      assert(rep.int4Coded && !rep.coded)
      val plain = rep.withoutCodes
      for (s <- 0 until 10; nprobe <- Seq(2, 8)) {
        val q = queryVec(s)
        assert(rep.search(q, 10, nprobe) == plain.search(q, 10, nprobe),
          s"int4/uncoded divergence: metric=$metric seed=$s nprobe=$nprobe")
        val fast = KernelMode.withFast(true)(rep.search(q, 10, nprobe))
        val plainFast = KernelMode.withFast(true)(plain.search(q, 10, nprobe))
        assert(fast == plainFast,
          s"int4/uncoded fast divergence: metric=$metric seed=$s nprobe=$nprobe")
      }
    }
  }

  test("int4 odd dim packs the dangling low nibble; v6 round-trip; deletes respected") {
    val oddDim = 33
    val odd = spark.range(0, 500, 1, 2).select(
      col("id"),
      transform(sequence(lit(0), lit(oddDim - 1)),
        i => (pmod(xxhash64(col("id") * lit(131) + i), lit(1000))
          .cast("double") / lit(500.0) - lit(1.0)).cast("float")).as("vec"))
    val rep = LocalReplica.fromDataFrame(odd, "vec", "id", Metric.L2,
      int4 = true)
    val plain = rep.withoutCodes
    def qv(seed: Long): Array[Float] = Array.tabulate(oddDim)(
      i => (((seed * 131 + i * 7919) % 1000) / 500.0 - 1.0).toFloat)
    for (s <- 0 until 5) {
      assert(rep.search(qv(s), 10) == plain.search(qv(s), 10))
      val fast = KernelMode.withFast(true)(rep.search(qv(s), 10))
      assert(fast == KernelMode.withFast(true)(plain.search(qv(s), 10)))
    }
    // v6 save/load round-trip keeps the INT4 section and its answers
    val dir = java.nio.file.Files.createTempDirectory("graft_replica_i4")
    val path = s"$dir/replica.grlr"
    rep.save(path)
    val loaded = LocalReplica.load(path)
    assert(loaded.int4Coded)
    for (s <- 0 until 5)
      assert(loaded.search(qv(s), 10) == rep.search(qv(s), 10))
    // tombstoned rows never surface through the int4 admission pass
    val victims = loaded.search(qv(1), 3).map(_.id).toArray
    loaded.delete(victims)
    val after = loaded.search(qv(1), 10)
    assert(after.forall(c => !victims.contains(c.id)))
    assert(after == plain.search(qv(1), 13).filter(
      c => !victims.contains(c.id)).take(10))
  }

  test("coded parallel-chunk scan and cosine batch agree with sequential") {
    val big = spark.range(0, 20000, 1, 4).select(
      col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("id") * lit(131) + i), lit(1000))
          .cast("double") / lit(500.0) - lit(1.0)).cast("float")).as("vec"))
    val rep = LocalReplica.fromDataFrame(big, "vec", "id", Metric.Cosine)
    assert(rep.size >= LocalReplica.ParallelScanRows && rep.coded)
    val plain = rep.withoutCodes
    val q = queryVec(21)
    assert(rep.search(q, 25) == plain.search(q, 25))
    // batch fan-out: per-query scans share immutable per-query state only
    val qs = (0L until 32L).map(s => s -> queryVec(s))
    val batch = rep.batchSearch(qs, 5).toMap
    qs.foreach { case (qid, qv) =>
      assert(batch(qid) == plain.search(qv, 5), s"batch query $qid diverged")
    }
  }

  test("corrupt CSR directory fails at load, not at query time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_replica_csr")
    val path = s"$dir/replica.grlr"
    val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2,
      nlist = 8)
    rep.save(path)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path))
    // header: magic(4) ver(4) utf"l2"(2+2) dim(4) n(4) nlist(4) = 24, then
    // ids 8n, flat 4·n·dim, centroids 4·nlist·dim, then the 9-int CSR
    val csrOff = 24 + 8 * n + 4 * n * dim + 4 * 8 * dim
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.putInt(csrOff + 4, n + 7) // entry 1 out of range; endpoint intact
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
    // drop the local-FS checksum sidecar so the CSR gate (not the
    // transport checksum) is what catches the corruption
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/.replica.grlr.crc"))
    val e = intercept[IllegalArgumentException](LocalReplica.load(path))
    assert(e.getMessage.contains("CSR"), e.getMessage)
  }

  test("maxRows guard refuses oversized exports") {
    val e = intercept[IllegalArgumentException] {
      LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2,
        maxRows = n - 1)
    }
    assert(e.getMessage.contains("per-shard"))
  }

  test("save/load round-trips bit-exactly; torn artifacts fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_replica_io")
    val path = s"$dir/replica.grlr"
    for ((nlist, metric) <- Seq((0, Metric.L2), (8, Metric.Cosine))) {
      val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", metric,
        nlist = nlist)
      rep.save(path)
      val loaded = LocalReplica.load(path)
      assert(loaded.size == rep.size && loaded.nlist == rep.nlist &&
        loaded.dim == rep.dim && loaded.metric == rep.metric)
      for (s <- 0 until 5) {
        val q = queryVec(s)
        assert(loaded.search(q, 10, nprobe = 3) == rep.search(q, 10, nprobe = 3))
      }
    }
    // bad magic (fresh path: no checksum sidecar from a prior save)
    val badPath = s"$dir/bad.grlr"
    java.nio.file.Files.write(java.nio.file.Paths.get(badPath),
      Array.fill[Byte](64)(0x5a))
    val bad = intercept[IllegalArgumentException](LocalReplica.load(badPath))
    assert(bad.getMessage.contains("bad magic"))
    // truncation: chop the tail off a valid artifact
    val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", Metric.L2)
    rep.save(path)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path))
    val tornPath = s"$dir/torn.grlr"
    java.nio.file.Files.write(java.nio.file.Paths.get(tornPath),
      bytes.dropRight(bytes.length / 3))
    intercept[java.io.IOException](LocalReplica.load(tornPath))
  }

  test("bulk primitive IO round-trips across the 8 MB chunk boundary " +
      "byte-identically to the element-wise loops") {
    // sizes straddle IoChunkBytes/elem: 0, 1, exactly one chunk, one
    // chunk ± a few — the off-by-one surface of the chunked copy
    val fStep = LocalReplica.IoChunkBytes / 4
    val lStep = LocalReplica.IoChunkBytes / 8
    val rnd = new scala.util.Random(42)
    for (n <- Seq(0, 1, 7, fStep - 1, fStep, fStep + 3)) {
      val fa = Array.fill(n)(rnd.nextFloat())
      val ia = Array.fill(n)(rnd.nextInt())
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      LocalReplica.writeFloats(out, fa)
      LocalReplica.writeInts(out, ia)
      out.flush()
      // byte-identical to the element-wise big-endian loop (the format)
      val ref = new java.io.ByteArrayOutputStream()
      val rout = new java.io.DataOutputStream(ref)
      fa.foreach(rout.writeFloat); ia.foreach(rout.writeInt); rout.flush()
      assert(java.util.Arrays.equals(bos.toByteArray, ref.toByteArray),
        s"n=$n float/int bytes")
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      assert(LocalReplica.readFloats(in, n).toSeq == fa.toSeq, s"n=$n floats")
      assert(LocalReplica.readInts(in, n).toSeq == ia.toSeq, s"n=$n ints")
    }
    for (n <- Seq(0, 1, lStep, lStep + 2)) {
      val la = Array.fill(n)(rnd.nextLong())
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      LocalReplica.writeLongs(out, la); out.flush()
      val ref = new java.io.ByteArrayOutputStream()
      val rout = new java.io.DataOutputStream(ref)
      la.foreach(rout.writeLong); rout.flush()
      assert(java.util.Arrays.equals(bos.toByteArray, ref.toByteArray),
        s"n=$n long bytes")
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      assert(LocalReplica.readLongs(in, n).toSeq == la.toSeq, s"n=$n longs")
    }
  }

  test("replica from an engine store serves the snapshot (MVCC-frozen)") {
    import graft.GraftDB
    val root = s"${sys.props("java.io.tmpdir")}/graft_replica_spec"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val db = GraftDB.open(spark, root, dim = dim, metric = "l2")
    db.insertBatch(corpus.select(col("id"), col("vec").as("vector")))
    val rep = LocalReplica.fromStore(db)
    val q = queryVec(9)
    val local = rep.search(q, 10)
    val engine = db.search(q, 10).collect()
      .map(r => Candidate(r.getLong(0), r.getDouble(1))).toSeq
    assert(local == engine)
    // replica stays frozen while the store moves on
    db.delete(local.map(_.id))
    assert(rep.search(q, 10) == local)
    assert(db.search(q, 10).collect().map(_.getLong(0)).toSeq
      .intersect(local.map(_.id)).isEmpty)
  }
}
