package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.text.QualityClassifier.{LinearQualityModel, train, score}

/** Distributed logistic-regression training + frozen-model scoring.
  * Value-level scoring equality is the DuckDB oracle
  * (`pipeline_quality_score` / `streaming_quality`); this spec proves
  * the training loop itself — gradient arithmetic against a local
  * reference implementation, convergence on separable data — and the
  * zero-shuffle scoring-plan contract.
  */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Separable synthetic corpus: label 1 docs talk about "good" things,
  // label 0 about "bad" things, plus shared filler vocabulary.
  private def corpus(n: Int) = {
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      val y = i % 2
      val signal = if (y == 1) Seq("excellent", "clear", "insight")
        else Seq("spam", "click", "garbage")
      val filler = Seq.fill(5)(s"w${rnd.nextInt(30)}")
      val toks = rnd.shuffle(signal ++ filler)
      (i.toLong, toks.mkString(" "), y)
    }
  }

  test("train: converges on separable data; loss strictly decreases") {
    val df = corpus(200).toDF("doc_id", "text", "label")
    val (m, losses) = train(df, "doc_id", "text", "label", dim = 64,
      iters = 40, lr = 4.0)
    // monotone decreasing log-loss (full-batch GD on a convex objective)
    losses.sliding(2).foreach { case Array(a, b) => assert(b < a + 1e-12) }
    assert(losses.last < 0.4, s"final loss ${losses.last}")
    // training accuracy on the separable corpus
    val scored = score(m, df, "doc_id", "text", threshold = 0.5)
      .join(df, "doc_id")
      .select((col("keep") === (col("label") === 1)).cast("int").as("ok"))
      .agg(avg(col("ok"))).collect()(0).getDouble(0)
    assert(scored > 0.95, s"train accuracy $scored")
  }

  test("GD iterations match a local reference implementation") {
    val rows = Seq((1L, "aa bb aa", 1), (2L, "cc dd", 0), (3L, "aa cc cc", 1),
      (4L, "bb dd dd aa", 0))
    val dim = 16
    val iters = 3; val lr = 0.5; val l2 = 0.01
    val df = rows.toDF("doc_id", "text", "label")
    val (m, losses) = train(df, "doc_id", "text", "label", dim,
      iters = iters, lr = lr, l2 = l2)

    // local reference: identical featurization + full-batch GD. After
    // iteration 1 the margins are non-zero, so this exercises the
    // broadcast-weights dot product, not just the gradient reduce.
    def bucket(tok: String): Int = {
      // mirror Dedup.portableHash(lit("tfidf"), tok) mod dim: top 60
      // bits of md5("tfidf:" + tok)
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"tfidf:$tok".getBytes("UTF-8"))
      val top = BigInt(1, h.take(8)).toLong >>> 4
      (((top % dim) + dim) % dim).toInt
    }
    val feats = rows.map { case (_, text, y) =>
      val toks = text.split("\\s+").filter(_.nonEmpty).map(_.toLowerCase)
      val x = new Array[Double](dim)
      toks.foreach(t => x(bucket(t)) += 1.0 / toks.length)
      (x, y.toDouble)
    }
    val n = feats.length.toDouble
    var w = new Array[Double](dim); var b = 0.0
    val refLosses = (0 until iters).map { _ =>
      val gw = new Array[Double](dim); var gb = 0.0; var ls = 0.0
      feats.foreach { case (x, y) =>
        val mgn = b + x.zip(w).map { case (v, wi) => v * wi }.sum
        val g = 1.0 / (1.0 + math.exp(-mgn)) - y
        var i = 0; while (i < dim) { gw(i) += x(i) * g; i += 1 }
        gb += g
        ls += math.log1p(math.exp(-math.abs(mgn))) +
          math.max(0.0, if (y > 0.5) -mgn else mgn)
      }
      val nw = new Array[Double](dim)
      var i = 0
      while (i < dim) { nw(i) = w(i) - lr * (gw(i) / n + l2 * w(i)); i += 1 }
      b -= lr * gb / n
      w = nw
      ls / n
    }
    losses.zip(refLosses).foreach { case (a, r) =>
      assert(math.abs(a - r) < 1e-9, s"loss $a vs $r")
    }
    assert(math.abs(m.bias - b) < 1e-9)
    m.weights.zip(w).foreach { case (a, r) =>
      assert(math.abs(a - r) < 1e-9, s"$a vs $r")
    }
  }

  test("scoring plan is shuffle-free (row-local expression)") {
    val df = corpus(50).toDF("doc_id", "text", "label")
    val m = LinearQualityModel(64,
      Array.tabulate(64)(b => ((b * 2654435761L % 1000) - 500) / 1000.0),
      bias = 0.1)
    val out = score(m, df, "doc_id", "text", threshold = 0.55)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
  }

  test("score: whitespace-only text is dropped; keep matches threshold") {
    val df = Seq((1L, "excellent insight"), (2L, "  \t ")).toDF("doc_id", "text")
    val m = LinearQualityModel(8, Array.fill(8)(2.0), bias = 0.0)
    val rows = score(m, df, "doc_id", "text", threshold = 0.5)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L))
    // both tokens weight 2.0, L1-normalized x sums to 1 → σ(2.0)
    val expect = BigDecimal(1.0 / (1.0 + math.exp(-2.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows(0).getDouble(1) === expect)
    assert(rows(0).getBoolean(2))
  }
}
