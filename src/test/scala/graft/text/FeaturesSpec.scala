package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.query.Search
import graft.types.Metric

/** Chunking + hashed-TF-IDF invariants (value-level equality is the
  * DuckDB oracle in Verify; this spec proves the structural contracts
  * and the text→vector→ANN end-to-end path).
  */
class FeaturesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // 100 tokens
    (2L, "alpha beta gamma"),                        // shorter than a window
    (3L, "   \t  "),                                 // whitespace-only: dropped
    (4L, (1 to 48).map(i => s"x$i").mkString(" "))   // exactly one window
  ).toDF("doc_id", "text")

  test("chunk: window/step geometry, short-doc and empty-doc edges") {
    val out = Features.chunk(docs, "doc_id", "text", maxTokens = 48,
        overlap = 8)
      .orderBy("doc_id", "chunk_idx").collect()
    val byDoc = out.groupBy(_.getLong(0)).view.mapValues(_.toSeq).toMap
    // 100 tokens, window 48, step 40 → chunks at 0/40/80 (sizes 48/48/20)
    assert(byDoc(1L).map(_.getLong(3)) === Seq(48L, 48L, 20L))
    assert(byDoc(1L).map(_.getLong(1)) === Seq(0L, 1L, 2L))
    // consecutive chunks share exactly the 8-token overlap
    val c0 = byDoc(1L)(0).getString(2).split(" ")
    val c1 = byDoc(1L)(1).getString(2).split(" ")
    assert(c0.takeRight(8).toSeq === c1.take(8).toSeq)
    // sub-window and exact-window docs produce one complete chunk
    assert(byDoc(2L).map(r => (r.getString(2), r.getLong(3))) ===
      Seq(("alpha beta gamma", 3L)))
    assert(byDoc(4L).map(_.getLong(3)) === Seq(48L))
    // whitespace-only doc emits nothing
    assert(!byDoc.contains(3L))
  }

  test("chunk: non-overlap segments reconstruct the tokenized document") {
    val out = Features.chunk(docs, "doc_id", "text", 48, 8)
      .where($"doc_id" === 1L).orderBy("chunk_idx")
      .select("chunk_text").as[String].collect()
    val rebuilt = out.zipWithIndex.flatMap { case (c, i) =>
      val toks = c.split(" ")
      if (i == 0) toks else toks.drop(8) // drop the shared prefix
    }
    assert(rebuilt.toSeq === (1 to 100).map(i => s"w$i"))
  }

  test("chunk: degenerate overlap rejected loudly") {
    intercept[IllegalArgumentException] {
      Features.chunk(docs, "doc_id", "text", maxTokens = 8, overlap = 8)
    }
  }

  test("hashedTfIdf: unit L2 norm per doc, buckets in range, df consistency") {
    val n = docs.count()
    val rows = Features.hashedTfIdf(docs, "doc_id", "text", dim = 64,
      numDocs = n).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getLong(1)
      assert(b >= 0 && b < 64)
    }
    val norms = rows.groupBy(_.getLong(0)).view
      .mapValues(_.map(r => r.getDouble(2) * r.getDouble(2)).sum)
    norms.foreach { case (_, n2) => assert(math.abs(n2 - 1.0) < 1e-4) }
  }

  test("hashedTfIdf plan gate: one corpus tokenize; lazy-N overload ≡ explicit") {
    // parquet-backed so the gate counts real FileScans (the in-memory
    // fixture plans as LocalTableScan)
    val dir = java.nio.file.Files.createTempDirectory("graft_tfidf_gate")
      .toString
    docs.write.mode("overwrite").parquet(dir)
    val pq = spark.read.parquet(dir)
    val out = Features.hashedTfIdf(pq, "doc_id", "text", 64)
    val got = out.collect()
    // lazy-N overload must equal the explicit-numDocs form exactly
    val want = Features.hashedTfIdf(pq, "doc_id", "text", 64, pq.count())
      .collect()
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(keyed(got) === keyed(want))
    // exactly ONE text-reading scan in the executed plan (the ride-along
    // N count scans an empty schema and is allowed)
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val textScans = plan.linesIterator
      .count(l => l.contains("FileScan parquet") && l.contains("text#"))
    assert(textScans === 1, plan.take(600))
  }

  test("scoreTfIdf under a frozen model ≡ batch hashedTfIdf on the corpus") {
    val n = docs.count()
    val m = Features.trainIdf(docs, "doc_id", "text", dim = 64)
    assert(m.numDocs === n && m.df.length === 64)
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val batch = keyed(Features.hashedTfIdf(docs, "doc_id", "text", 64, n)
      .collect())
    val frozen = keyed(Features.scoreTfIdf(m, docs, "doc_id", "text")
      .collect())
    assert(frozen.keySet === batch.keySet)
    frozen.foreach { case (k, w) =>
      assert(math.abs(w - batch(k)) < 1e-6, s"key $k")
    }
    // frozen scoring is row-local: the plan must contain no Exchange
    val plan = Features.scoreTfIdf(m, docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "scoreTfIdf must not shuffle")
  }

  test("tfidfVectors: dense assembly matches sparse rows; self-retrieval top-1") {
    val n = docs.count()
    val sparse = Features.hashedTfIdf(docs, "doc_id", "text", 64, n)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(r => r.getLong(1).toInt -> r.getDouble(2)).toMap)
      .toMap
    val dense = Features.tfidfVectors(docs, "doc_id", "text", 64, n)
    val vecs = dense.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(vecs.values.forall(_.length == 64))
    vecs.foreach { case (id, v) =>
      v.zipWithIndex.foreach { case (x, i) =>
        val want = sparse(id).getOrElse(i, 0.0)
        assert(math.abs(x - want) < 1e-5, s"doc $id bucket $i")
      }
    }
    // the end-to-end front door: each doc's vector retrieves itself
    // (unit-norm vectors → Cosine)
    for ((id, v) <- vecs) {
      val top = Search.knn(dense, "vec", "doc_id",
          lit(v.toArray), k = 1, Metric.Cosine)
        .select("doc_id").as[Long].collect()
      assert(top.toSeq === Seq(id))
    }
  }
}
