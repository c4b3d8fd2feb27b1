package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the curation operators on the sf0.001 corpus (the
  * value-level check is the DuckDB oracle in Verify).
  */
class CurationQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("vocab: 25 rows, df within corpus bounds, idf consistent") {
    val n = Tables.load(spark, dir, "documents").count()
    val rows = CurationQueries.vocabTopk(spark, dir).collect()
    assert(rows.length === 25)
    rows.foreach { r =>
      val df = r.getLong(1)
      assert(df >= 1 && df <= n)
      val idf = r.getDouble(2)
      assert(math.abs(idf - (math.log(n.toDouble / (df + 1)) + 1)) < 1e-5)
    }
    // descending df, word tie-break
    val dfs = rows.map(_.getLong(1)).toSeq
    assert(dfs === dfs.sorted.reverse)
  }

  test("cluster assignment: all 8 clusters, sizes sum to corpus, centroids self-assign") {
    val total = Tables.load(spark, dir, "embeddings").count()
    val rows = CurationQueries.clusterAssign(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq === (0L until 8L))
    assert(rows.map(_.getLong(1)).sum === total)
    // every centroid is its own nearest → every cluster is non-empty
    rows.foreach(r => assert(r.getLong(1) >= 1))
  }

  test("class centroids: one row per label, means bounded by data") {
    val rows = CurationQueries.classCentroid(spark, dir).collect()
    assert(rows.nonEmpty)
    val labels = rows.map(_.getInt(0)).toSeq
    assert(labels === labels.sorted)
    assert(rows.map(_.getLong(1)).sum ===
      Tables.load(spark, dir, "embeddings").count())
  }

  test("norm outliers: every row flagged consistently with global moments") {
    val rows = CurationQueries.embeddingOutliers(spark, dir).collect()
    val norms = rows.map(_.getDouble(1))
    val mu = norms.sum / norms.length
    val sd = math.sqrt(norms.map(x => (x - mu) * (x - mu)).sum / norms.length)
    rows.foreach { r =>
      val out = r.getBoolean(2)
      val nrm = r.getDouble(1)
      // recomputed moments differ from the exact ones only in FP dust;
      // allow the boundary itself to disagree by a hair
      val margin = 1e-4
      if (nrm > mu + 2 * sd + margin || nrm < mu - 2 * sd - margin)
        assert(out, s"vec ${r.getLong(0)} norm $nrm should be an outlier")
      if (nrm < mu + 2 * sd - margin && nrm > mu - 2 * sd + margin)
        assert(!out, s"vec ${r.getLong(0)} norm $nrm should be inlier")
    }
  }
}
