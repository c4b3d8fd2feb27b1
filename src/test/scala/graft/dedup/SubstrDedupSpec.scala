package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Dedup.duplicateSpans]] / [[Dedup.removeDuplicateSpans]] vs a
  * brute-force in-memory reference: mark every position whose length-L
  * window occurs >= 2 times in the corpus, merge marked windows into
  * maximal intervals, cut them. The spark side must reproduce the marking
  * (ExactSubstr semantics: union of duplicated L-windows == chars inside
  * some duplicated substring of length >= L) exactly.
  */
class SubstrDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val L = 8

  /** brute reference: per doc, sorted maximal [start,end) 1-based spans */
  private def bruteSpans(docs: Seq[(Long, String)]): Map[Long, Seq[(Int, Int)]] = {
    val counts = scala.collection.mutable.Map[String, Int]()
    docs.foreach { case (_, t) =>
      (0 to t.length - L).foreach { i =>
        val g = t.substring(i, i + L)
        counts(g) = counts.getOrElse(g, 0) + 1
      }
    }
    docs.map { case (id, t) =>
      val marked = (0 to t.length - L)
        .filter(i => counts(t.substring(i, i + L)) >= 2)
      val spans = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      marked.foreach { i =>
        val (s, e) = (i + 1, i + 1 + L) // 1-based inclusive start, excl end
        if (spans.nonEmpty && s <= spans.last._2)
          spans(spans.length - 1) = (spans.last._1, math.max(spans.last._2, e))
        else spans += ((s, e))
      }
      id -> spans.toSeq
    }.toMap
  }

  private def cut(t: String, spans: Seq[(Int, Int)]): String = {
    var last = 1
    val sb = new StringBuilder
    spans.foreach { case (s, e) =>
      sb.append(t.substring(last - 1, s - 1)); last = e
    }
    sb.append(t.substring(last - 1)).toString
  }

  private val docs: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over the lazy dog in the park today",
    2L -> "an unrelated sentence with no repeats at all here xyz",
    3L -> "prefix the quick brown fox jumps over the wall suffix",
    // overlapping duplicated windows inside one doc -> one merged span
    4L -> "abcdefghijklmnop__abcdefghijklmnop",
    5L -> "short", // < L: passes through untouched
    6L -> "the quick brown fox jumps over the lazy dog in the park today"
  )

  private lazy val df = docs.toDF("id", "text")

  test("duplicateSpans matches brute-force window marking") {
    val got = Dedup.duplicateSpans(df, "id", "text", L)
      .select("id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => (r._2.toInt, r._3.toInt)).sortBy(_._1).toSeq)
      .toMap
    val want = bruteSpans(docs).filter(_._2.nonEmpty)
    assert(got == want)
    // doc 4: within each 16-char copy the 9 overlapping duplicated
    // windows merge to ONE maximal span; the "__" separator is not
    // duplicated, so the two copies stay distinct spans
    assert(got(4L) == Seq((1, 17), (19, 35)))
    assert(got(1L) == got(6L))
    assert(!got.contains(5L) && !got.contains(2L))
  }

  test("removeDuplicateSpans rebuilds exactly the brute-force cut") {
    val got = Dedup.removeDuplicateSpans(df, "id", "text", L)
      .select("id", "text", "n_spans", "n_removed")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val spans = bruteSpans(docs)
    docs.foreach { case (id, t) =>
      val (_, clean, nSpans, nRemoved) = got(id)
      assert(clean == cut(t, spans(id)), s"doc $id rebuilt text differs")
      assert(nSpans == spans(id).size)
      assert(nRemoved == spans(id).map { case (s, e) => e - s }.sum)
    }
    // whole doc duplicated end-to-end -> everything cut
    assert(got(1L)._2 == "" || got(1L)._4 > 0)
  }

  test("streaming increment marks each position once; merged spans == batch") {
    // three batches; duplicates within a batch, across adjacent batches,
    // and a batch-3 collision that retro-marks a batch-1 window
    val batches = Seq(
      Seq(docs(0), docs(1)),                 // doc 1 (dup of 6, later)
      Seq(docs(2), docs(3), docs(4)),        // doc 3 dups doc 1's phrase
      Seq(docs(5))                           // doc 6 == doc 1 end-to-end
    )
    var state: Option[org.apache.spark.sql.DataFrame] = None
    var allMarks: org.apache.spark.sql.DataFrame = null
    batches.foreach { b =>
      val (marked, bg) = Dedup.duplicateSpanIncrement(
        b.toDF("id", "text"), "id", "text", L, state)
      val m = marked.cache(); m.count()
      val g = bg.cache(); g.count()
      allMarks = if (allMarks == null) m else allMarks.unionByName(m)
      state = Some(state.map(_.unionByName(g)).getOrElse(g))
    }
    // exactly-once: no (id, pos) emitted twice across the stream
    val dupEmits = allMarks.groupBy("id", "pos").count()
      .where(col("count") > 1).count()
    assert(dupEmits == 0, "a window position was emitted more than once")
    val got = Dedup.mergeWindowSpans(allMarks, L)
      .select("id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => (r._2.toInt, r._3.toInt)).sortBy(_._1).toSeq)
      .toMap
    val want = bruteSpans(docs).filter(_._2.nonEmpty)
    assert(got == want,
      "incrementally-merged spans differ from the batch marking")
  }

  test("a fully-duplicated doc is cut to empty") {
    val twins = Seq(10L -> "aaaaaaaaaaaaaaaaaaaaaaaa",
      11L -> "aaaaaaaaaaaaaaaaaaaaaaaa").toDF("id", "text")
    val got = Dedup.removeDuplicateSpans(twins, "id", "text", L)
      .select("id", "text").as[(Long, String)].collect().toMap
    assert(got(10L) == "" && got(11L) == "")
  }
}
