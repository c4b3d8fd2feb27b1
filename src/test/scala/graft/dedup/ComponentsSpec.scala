package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Brute-force components via union-find on the driver. */
  private def bruteCC(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def runCC(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap

  test("components match union-find on a mixed graph") {
    // chain 1-2-3-4, triangle 10-11-12, pair 20-21, self-contained star
    val edges = Seq((2L, 1L), (3L, 2L), (3L, 4L), (10L, 11L), (11L, 12L),
      (12L, 10L), (21L, 20L), (30L, 31L), (30L, 32L), (30L, 33L))
    assert(runCC(edges) == bruteCC(edges))
  }

  test("a long chain converges to one component") {
    // worst case for naive label propagation: a 64-node path, descending
    val edges = (1L until 64L).map(i => (i + 1, i))
    val got = runCC(edges)
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == (1L to 64L).toSet)
  }

  test("duplicate edges, reversed edges, and self-loops are harmless") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (3L, 4L))
    val got = runCC(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("empty edge list yields empty components") {
    assert(runCC(Nil).isEmpty)
  }

  test("dedupClusters unions exact and near-dup relations; singletons survive") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha  beta gamma delta epsilon zeta eta theta"), // exact dup of 0
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),   // near-dup of 0
      (3L, "totally different words entirely here now ok yes"),
      (4L, "ALPHA BETA GAMMA DELTA EPSILON ZETA ETA THETA"))  // exact dup of 0
      .toDF("doc_id", "text")
    val got = Components.dedupClusters(docs, "doc_id", "text",
        minJaccard = 0.5)
      .as[(Long, Long)].collect().toMap
    assert(got(0L) == 0L && got(1L) == 0L && got(4L) == 0L)
    assert(got(2L) == 0L)  // chained through the near-dup edge
    assert(got(3L) == 3L)  // singleton
    val kept = Components.keepCanonical(docs, "doc_id", "text",
        minJaccard = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 3L))
  }

  test("keepBest retains the highest-scoring cluster member; ties break to lowest id") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha  beta gamma delta epsilon zeta eta theta"), // exact dup of 0
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),   // near-dup of 0
      (3L, "totally different words entirely here now ok yes"),
      (4L, "ALPHA BETA GAMMA DELTA EPSILON ZETA ETA THETA"))  // exact dup of 0
      .toDF("doc_id", "text")
    import org.apache.spark.sql.functions.{col, element_at, lit, typedlit}
    // explicit per-id score: doc 2 is the best copy in the {0,1,2,4} cluster
    val score = element_at(
      typedlit(Map(0L -> 1.0, 1L -> 3.0, 2L -> 9.0, 3L -> 5.0, 4L -> 3.0)),
      col("doc_id"))
    val kept = Components.keepBest(docs, "doc_id", "text", score,
        minJaccard = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
    // tie on score everywhere -> lowest id per cluster (the canonical)
    val keptTie = Components.keepBest(docs, "doc_id", "text", lit(1.0),
        minJaccard = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(keptTie == Set(0L, 3L))
  }
}
