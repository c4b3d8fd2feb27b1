package graft.serve

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.types.{Candidate, Metric}

/** Property-style equivalence for the serving replica: across random
  * (dim, k, nprobe, metric, nlist) draws, replica results must equal an
  * INDEPENDENT in-memory reference ranking (plain Scala, no shared kernel
  * code, double sequential accumulation — the same arithmetic the DuckDB
  * oracle performs), including tie-breaks and the probed-subset contract.
  */
class ReplicaPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val rng = new scala.util.Random(7)

  private def mkCorpus(n: Int, dim: Int, seed: Int) = {
    spark.range(0, n, 1, 4).select(
      col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("id") * lit(131 + seed) + i), lit(1000))
          .cast("double") / lit(500.0) - lit(1.0)).cast("float")).as("vec"))
  }

  /** Reference scoring: same definitions as types.Metric, written
    * independently of the replica/kernel code.
    */
  private def refScore(metric: Metric, v: Array[Float], q: Array[Float]): Double =
    metric match {
      case Metric.L2 =>
        var s = 0.0; var i = 0
        while (i < q.length) { val d = v(i).toDouble - q(i).toDouble; s += d * d; i += 1 }
        s
      case Metric.Dot =>
        var s = 0.0; var i = 0
        while (i < q.length) { s += v(i).toDouble * q(i).toDouble; i += 1 }
        s
      case Metric.Cosine =>
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < q.length) {
          val x = v(i).toDouble; val y = q(i).toDouble
          d += x * y; na += x * x; nb += y * y; i += 1
        }
        if (na == 0.0 || nb == 0.0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
      case Metric.Hamming => fail("float replica has no hamming")
    }

  private def refRank(metric: Metric, rows: Array[(Long, Array[Float])],
      q: Array[Float], k: Int): Seq[Candidate] =
    rows.map { case (id, v) => Candidate(id, refScore(metric, v, q)) }
      .sortWith { (a, b) =>
        if (a.score != b.score) {
          if (metric.ascending) a.score < b.score else a.score > b.score
        } else a.id < b.id
      }.take(k).toSeq

  test("replica equals the independent reference over random draws") {
    for (trial <- 0 until 10) {
      val dim = Seq(3, 8, 17, 33, 64)(trial % 5)
      val n = 200 + rng.nextInt(800)
      val k = 1 + rng.nextInt(30)
      val metric = Seq(Metric.L2, Metric.Cosine, Metric.Dot)(trial % 3)
      val corpus = mkCorpus(n, dim, trial)
      val rows = corpus.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      val q = Array.tabulate(dim)(i =>
        (rng.nextInt(2000) - 1000) / 1000.0f)

      val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", metric)
      assert(rep.search(q, k) == refRank(metric, rows, q, k),
        s"trial $trial: dim=$dim n=$n k=$k metric=$metric")

      // clustered replica with all lists probed must still be exact
      val nlist = 2 + rng.nextInt(6)
      val clustered = LocalReplica.fromDataFrame(corpus, "vec", "id", metric,
        nlist = nlist)
      assert(clustered.search(q, k, nprobe = nlist) ==
        refRank(metric, rows, q, k),
        s"trial $trial clustered: nlist=$nlist")

      // probed subset: results must be a ranked subset of the full ranking
      val probed = clustered.search(q, k, nprobe = 1)
      val full = refRank(metric, rows, q, n)
      assert(probed.map(_.id).toSet.subsetOf(full.map(_.id).toSet))
      assert(probed == full.filter(c => probed.map(_.id).contains(c.id)).take(probed.size),
        s"trial $trial: probed results must preserve the global ranking order")
    }
  }

  test("replica-side predicates equal reference filtering over random draws") {
    import graft.types.Filter
    for (trial <- 0 until 8) {
      val dim = Seq(4, 9, 16, 32)(trial % 4)
      val n = 150 + rng.nextInt(500)
      val k = 1 + rng.nextInt(20)
      val metric = Seq(Metric.L2, Metric.Cosine, Metric.Dot)(trial % 3)
      val mod = 5 + rng.nextInt(10)
      val corpus = mkCorpus(n, dim, 100 + trial)
        .withColumn("grp", pmod(col("id"), lit(mod)).cast("int"))
        .withColumn("name", concat(lit("n"), col("id").cast("string")))
      val rows = corpus.select("id", "vec").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      val q = Array.tabulate(dim)(i => (rng.nextInt(2000) - 1000) / 1000.0f)
      val rep = LocalReplica.fromDataFrame(corpus, "vec", "id", metric,
        metaCols = Seq("grp", "name"))
      // random conjunction: a numeric range + optionally a substring
      val lo = rng.nextInt(mod); val hi = lo + rng.nextInt(mod - lo)
      val sub = rng.nextInt(10).toString
      val withSub = trial % 2 == 0
      val filters = Seq(Filter.Gte("grp", lo), Filter.Lte("grp", hi)) ++
        (if (withSub) Seq(Filter.Contains("name", sub)) else Nil)
      def passes(id: Long): Boolean = {
        val g = id % mod
        g >= lo && g <= hi && (!withSub || s"n$id".contains(sub))
      }
      val expect = refRank(metric, rows.filter(r => passes(r._1)), q, k)
      val got = rep.searchWhere(q, k, filters)
      assert(got == expect,
        s"trial $trial: dim=$dim n=$n k=$k metric=$metric mod=$mod " +
          s"range=[$lo,$hi] sub=${if (withSub) sub else "-"}")
    }
  }

  test("sharded set equals the independent reference over random draws") {
    for (trial <- 0 until 8) {
      val dim = Seq(4, 7, 16, 32)(trial % 4)
      val n = 200 + rng.nextInt(600)
      val k = 1 + rng.nextInt(25)
      val shards = 2 + rng.nextInt(5)
      val metric = Seq(Metric.L2, Metric.Cosine, Metric.Dot)(trial % 3)
      val corpus = mkCorpus(n, dim, 200 + trial)
      val rows = corpus.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      val q = Array.tabulate(dim)(i => (rng.nextInt(2000) - 1000) / 1000.0f)
      // alternate the per-shard coding across trials: the merge contract
      // must hold whatever first pass each shard runs
      val int4 = trial % 2 == 1
      val set = ReplicaSet.fromDataFrame(corpus, "vec", "id", metric,
        shards = shards, int4 = int4)
      assert(set.search(q, k) == refRank(metric, rows, q, k),
        s"trial $trial: dim=$dim n=$n k=$k shards=$shards metric=$metric " +
          s"int4=$int4 (got ${set.numShards} shards)")
      // threshold across shards: same cut, same rows, same order
      val full = refRank(metric, rows, q, n)
      val cut = full(math.min(25, n - 1)).score
      val expectThr = full.takeWhile(c =>
        if (metric.ascending) c.score <= cut else c.score >= cut)
      assert(set.searchThreshold(q, cut) == expectThr,
        s"trial $trial threshold: cut=$cut")
    }
  }

  test("resharded set equals the independent reference over random " +
      "mutations, targets, and layouts") {
    for (trial <- 0 until 8) {
      val dim = Seq(4, 7, 16, 32)(trial % 4)
      val n = 200 + rng.nextInt(600)
      val k = 1 + rng.nextInt(25)
      val shards = 2 + rng.nextInt(5)
      val metric = Seq(Metric.L2, Metric.Cosine, Metric.Dot)(trial % 3)
      val corpus = mkCorpus(n, dim, 300 + trial)
      var rows = corpus.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      val set = ReplicaSet.fromDataFrame(corpus, "vec", "id", metric,
        shards = shards)
      // random mutations the reshard must fold correctly
      val dels = rng.shuffle(rows.map(_._1).toSeq)
        .take(rng.nextInt(n / 4)).toArray
      set.delete(dels)
      val delSet = dels.toSet
      rows = rows.filterNot(r => delSet.contains(r._1))
      val nApp = 1 + rng.nextInt(30)
      val appIds = Array.tabulate(nApp)(i => (100000 + trial * 1000 + i).toLong)
      val appVecs = Array.fill(nApp)(Array.tabulate(dim)(i =>
        if (i == 0) 0.5f else (rng.nextInt(2000) - 1000) / 1000.0f))
      set.append(appIds, appVecs)
      rows = rows ++ appIds.zip(appVecs)
      // random reshard target and layout (flat or freshly k-means'd)
      val target = 1 + rng.nextInt(8)
      val nlist = if (trial % 2 == 0) 0 else 2 + rng.nextInt(5)
      val re = set.reshard(target, nlist)
      assert(re.shards.forall(_.coded), s"trial $trial: codes not rebuilt")
      assert(re.shards.map(_.liveSize).sum == rows.length,
        s"trial $trial: reshard changed the live count")
      val q = Array.tabulate(dim)(i => (rng.nextInt(2000) - 1000) / 1000.0f)
      // full coverage (nprobe = nlist; flat ignores it) → exact
      assert(re.search(q, k, nprobe = nlist) == refRank(metric, rows, q, k),
        s"trial $trial: dim=$dim n=$n k=$k shards=$shards->$target " +
          s"metric=$metric nlist=$nlist dels=${dels.length} apps=$nApp")
      val full = refRank(metric, rows, q, rows.length)
      val cut = full(math.min(20, rows.length - 1)).score
      val expectThr = full.takeWhile(c =>
        if (metric.ascending) c.score <= cut else c.score >= cut)
      assert(re.searchThreshold(q, cut, nprobe = nlist) == expectThr,
        s"trial $trial resharded threshold: cut=$cut")
    }
  }
}
