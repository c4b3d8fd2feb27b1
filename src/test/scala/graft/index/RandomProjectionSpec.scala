package graft.index

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.query.Search
import graft.types.Metric

/** Random-projection invariants (value-level cross-engine equality is the
  * `embedding_project` DuckDB oracle in Verify): matrix determinism, the
  * JL norm/distance-preservation contract on real fixture embeddings,
  * and the projected-corpus → ANN integration path.
  */
class RandomProjectionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private lazy val dim =
    emb.select(size(col("embedding"))).limit(1).collect()(0).getInt(0)

  test("sign matrix is deterministic, ±1, and seed-sensitive") {
    val m1 = RandomProjection.matrix(dim, 16, "rp0")
    val m2 = RandomProjection.matrix(dim, 16, "rp0")
    val m3 = RandomProjection.matrix(dim, 16, "other")
    assert(m1.map(_.toSeq).toSeq === m2.map(_.toSeq).toSeq)
    assert(m1.map(_.toSeq).toSeq !== m3.map(_.toSeq).toSeq)
    assert(m1.flatten.forall(v => v == 1.0 || v == -1.0))
    // balanced-ish signs (md5 parity): no row all-one-sign
    assert(m1.forall(r => r.exists(_ > 0) && r.exists(_ < 0)))
  }

  test("MRL truncation: unit-norm prefixes, driver-side parity, and the " +
      "truncated corpus feeds the ANN path") {
    // driver-side reference: slice + renorm in double
    val rows = emb.select(col("vec_id"),
        Mrl.truncateColExact(col("embedding"), 16).as("m"))
      .orderBy("vec_id").limit(20).collect()
    val src = emb.orderBy("vec_id").limit(20).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    rows.foreach { r =>
      val x = src(r.getLong(0)).take(16).map(_.toDouble)
      val n = math.sqrt(x.map(v => v * v).sum)
      val got = r.getSeq[Double](1)
      assert(got.length == 16)
      x.indices.foreach { i =>
        assert(math.abs(got(i) - (if (n > 0) x(i) / n else 0.0)) < 1e-9,
          s"vec ${r.getLong(0)} dim $i")
      }
      // renormalized: unit L2 norm (unless the prefix was all-zero)
      val gn = math.sqrt(got.map(v => v * v).sum)
      assert(n == 0.0 || math.abs(gn - 1.0) < 1e-9, s"norm $gn")
    }
    // the float frame drives brute-force self-retrieval exactly
    val tr = Mrl.truncate(emb, "vec_id", "embedding", 16).cache()
    val q = tr.where(col("vec_id") === 7).select("mrl")
      .collect()(0).getSeq[Float](0).toArray
    val top = Search.knn(tr, "mrl", "vec_id", lit(q), 1, Metric.Cosine)
      .select("vec_id").as[Long].collect()
    assert(top.head == 7L, s"self-retrieval got ${top.toSeq}")
    tr.unpersist()
  }

  test("MRL truncation fails loudly on under-length vectors instead of " +
      "silently emitting a short prefix") {
    val short = Seq((1L, Array(1f, 2f, 3f))).toDF("vec_id", "v")
    val e = intercept[Exception] {
      short.select(Mrl.truncateColExact(col("v"), 16)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("mrl truncate")), e.toString)
    // boundary: exactly dims-long vectors pass
    val ok = short.select(Mrl.truncateColExact(col("v"), 3)).collect()
    assert(ok(0).getSeq[Double](0).length == 3)
  }

  test("Spark projection equals the driver-side reference product") {
    val mat = RandomProjection.matrix(dim, 16, "rp0")
    val rows = emb.select(col("vec_id"),
        RandomProjection.projectCol(col("embedding"), mat).as("p"))
      .orderBy("vec_id").limit(20).collect()
    val src = emb.orderBy("vec_id").limit(20).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    rows.foreach { r =>
      val x = src(r.getLong(0))
      val got = r.getSeq[Double](1)
      mat.zipWithIndex.foreach { case (row, j) =>
        var acc = 0.0
        var i = 0
        while (i < x.length) { acc += x(i).toDouble * row(i); i += 1 }
        assert(math.abs(got(j) - acc / 4.0) < 1e-12, s"j=$j")
      }
    }
  }

  test("JL contract: norms and pairwise distances are preserved in " +
      "expectation at k=16") {
    val mat = RandomProjection.matrix(dim, 16, "rp0")
    val both = emb.limit(100).select(col("vec_id"),
        col("embedding"), RandomProjection.projectCol(col("embedding"),
          mat).as("p")).collect()
      .map(r => (r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getSeq[Double](2).toArray))
    def n2(v: Array[Double]) = v.map(x => x * x).sum
    val ratios = both.map { case (x, p) => n2(p) / n2(x) }
    val mean = ratios.sum / ratios.length
    // E[‖Rx/√k‖²] = ‖x‖²; k=16 has high variance per vector but the
    // mean over 100 vectors concentrates
    assert(mean > 0.8 && mean < 1.2, s"mean norm ratio $mean")
    // pairwise: sampled pairs keep relative distances within JL slack
    val ds = for (a <- 0 until 20; b <- a + 1 until 20) yield {
      val (xa, pa) = both(a); val (xb, pb) = both(b)
      val dx = n2(xa.zip(xb).map { case (u, v) => u - v })
      val dp = n2(pa.zip(pb).map { case (u, v) => u - v })
      dp / dx
    }
    val dm = ds.sum / ds.size
    assert(dm > 0.8 && dm < 1.2, s"mean distance ratio $dm")
  }

  test("projected corpus feeds the ANN path: self-retrieval and " +
      "near-optimal true distances vs full-dim exact") {
    val k = 10
    val proj = RandomProjection.project(emb, "vec_id", "embedding",
      outDim = 16, seed = "rp0", dim = dim)
    // exact top-k in ORIGINAL space per query (first 10 vectors)
    val qs = emb.orderBy("vec_id").limit(10).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val projData = proj.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val projMap = projData.toMap
    val mat = RandomProjection.matrix(dim, 16, "rp0")
    var hits = 0; var total = 0
    val ratios = scala.collection.mutable.ArrayBuffer.empty[Double]
    val src2 = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    qs.foreach { case (qid, q) =>
      val exact = Search.knn(emb.select(col("vec_id").as("id"),
            col("embedding").as("vec")), "vec", "id",
          typedlit(q.toSeq), k + 1, Metric.L2)
        .collect().map(_.getLong(0)).filterNot(_ == qid).take(k)
      // project the query through the same matrix (row-local, driver twin)
      val pq = mat.map(row => (row.zip(q.map(_.toDouble))
        .map { case (m, v) => m * v }.sum / 4.0).toFloat)
      val approx = projData.map { case (id, p) =>
        var acc = 0.0; var i = 0
        while (i < p.length) {
          val d = p(i).toDouble - pq(i).toDouble; acc += d * d; i += 1 }
        (id, acc)
      }.sortBy { case (id, d) => (d, id) }
        .map(_._1).filterNot(_ == qid).take(k)
      // self-retrieval: the projected query's nearest projected row is
      // itself (distance 0 up to float rounding)
      assert(projMap(qid).zip(pq).forall { case (a, b) =>
        math.abs(a - b) < 1e-5 })
      // near-optimality in TRUE distance — the guarantee JL actually
      // gives. (Top-10 IDENTITY is not preserved on this fixture and
      // cannot be: its 10th-NN distance is ~0.74× the MEDIAN pairwise
      // distance, i.e. neighbor gaps are far inside any 4×-compression
      // distortion — so the gate is "the projected search returns rows
      // whose true distances are close to the optimal k-th distance",
      // not set recall.)
      def trueD(id: Long): Double = {
        val x = src2(id)
        var acc = 0.0; var i = 0
        while (i < x.length) {
          val d = x(i).toDouble - q(i).toDouble; acc += d * d; i += 1 }
        acc
      }
      val exactMax = exact.map(trueD).max
      val approxMax = approx.map(trueD).max
      ratios += approxMax / exactMax
      hits += exact.toSet.intersect(approx.toSet).size
      total += k
    }
    val meanRatio = ratios.sum / ratios.size
    assert(meanRatio <= 1.5,
      s"approx top-10 true-distance blowup $meanRatio (recall was " +
        s"${hits.toDouble / total})")
  }
}
