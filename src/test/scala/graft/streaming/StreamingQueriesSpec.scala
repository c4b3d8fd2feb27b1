package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftDB, SparkTestSession, StreamingQueries}
import graft.store.CompactionPolicy

class StreamingQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("streaming tumbling agg equals the batch twin at sf0.001") {
    val streamed = StreamingQueries.streamingTumblingAgg(spark, sf).collect()
    val batch = graft.EventQueries.tumblingAgg(spark, sf).collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming sliding agg equals the batch twin at sf0.001") {
    val streamed = StreamingQueries.streamingSlidingAgg(spark, sf).collect()
    val batch = graft.EventQueries.slidingAgg(spark, sf).collect()
    assert(streamed.toSeq == batch.toSeq)
    // sliding sanity: each event lands in width/slide = 2 windows
    val tumbling = graft.EventQueries.tumblingAgg(spark, sf).collect()
    assert(batch.map(_.getLong(2)).sum == 2 * tumbling.map(_.getLong(2)).sum)
  }

  test("streaming sessionize equals the batch twin at sf0.001") {
    val streamed = StreamingQueries.streamingSessionize(spark, sf).collect()
    val batch = graft.EventQueries.sessionize(spark, sf).collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming minhash equals the batch twin at sf0.001 (pairs emit once)") {
    val streamed = StreamingQueries.streamingMinhash(spark, sf).collect()
    val batch = graft.PipelineQueries.dedupMinhashLsh(spark, sf).collect()
    assert(streamed.toSeq == batch.toSeq)
    // pair uniqueness: no pair may emit in more than one micro-batch
    assert(streamed.map(r => (r.getLong(0), r.getLong(1))).distinct.length ==
      streamed.length)
  }

  test("streaming SRP near-dup equals the batch twin at sf0.001 (pairs span the batch boundary)") {
    val streamed = StreamingQueries.streamingNeardupCosine(spark, sf).collect()
    val batch = graft.PipelineQueries.neardupCosine(spark, sf).collect()
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.map(r => (r.getLong(0), r.getLong(1))).distinct.length ==
      streamed.length)
  }

  test("minhash increment over a 3-way split equals the one-shot batch run") {
    import graft.dedup.Dedup
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val splits = Seq(
      docs.where(col("doc_id") % 3 === 0),
      docs.where(col("doc_id") % 3 === 1),
      docs.where(col("doc_id") % 3 === 2))
    var bands: Option[org.apache.spark.sql.DataFrame] = None
    var hashed: Option[org.apache.spark.sql.DataFrame] = None
    var pairs = Seq.empty[(Long, Long, Double)]
    splits.foreach { part =>
      val (p, bBands, bHashed) = Dedup.minhashLshIncrement(
        part, "doc_id", "text", bands, hashed)
      pairs ++= p.select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
        .collect().toSeq
      // cache the state unions so each step's plan doesn't re-derive
      // every earlier batch's shingles (spec-scale convenience; the
      // streaming query appends to parquet state instead)
      bands = Some(bands.map(_.unionByName(bBands)).getOrElse(bBands).cache())
      hashed = Some(hashed.map(_.unionByName(bHashed)).getOrElse(bHashed).cache())
    }
    val oneShot = Dedup.minhashLsh(docs, "doc_id", "text")
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSeq
    assert(pairs.sorted == oneShot.sorted)
    assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length)
    bands.foreach(_.unpersist()); hashed.foreach(_.unpersist())
  }

  test("session state carries across micro-batches") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val q = Ingest.sessionCounts(input.toDS(), gapSec = 1800)
      .writeStream.format("memory").queryName("sess_xbatch")
      .outputMode("update").start()
    try {
      // batch 1: user 7 starts a session
      input.addData((7L, 1000L), (7L, 1100L)); q.processAllAvailable()
      // batch 2: continuation (gap 700 ≤ 1800) + a new session (gap big)
      input.addData((7L, 1800L), (7L, 9999L)); q.processAllAvailable()
      val rows = spark.table("sess_xbatch")
        .select("key", "sessions", "events").as[(Long, Long, Long)]
        .collect()
      // update mode appends one row per key per batch: last row wins
      assert(rows.last == ((7L, 2L, 4L)))
      assert(rows.head == ((7L, 1L, 2L)))
    } finally q.stop()
  }

  test("insertStream validates batches, versions accrue, compaction folds") {
    implicit val ctx = spark.sqlContext
    val db = GraftDB.open(spark,
      Files.createTempDirectory("graft-insstream").toString,
      dim = 2, metric = "l2")
    val input = MemoryStream[(Long, Array[Float])]
    val q = db.insertStream(
      input.toDF().toDF("id", "vector"),
      Files.createTempDirectory("graft-insstream-ckpt").toString,
      policy = Some(CompactionPolicy.threshold(2)))
    try {
      input.addData((1L, Array(1f, 2f)), (2L, Array(3f, 4f)))
      q.processAllAvailable()
      assert(db.currentVersion >= 0)
      input.addData((3L, Array(5f, 6f))); q.processAllAvailable()
      input.addData((4L, Array(7f, 8f))); q.processAllAvailable()
      // every inserted row is searchable; segments folded by the policy
      assert(db.read().select("id").as[Long].collect().toSet ==
        Set(1L, 2L, 3L, 4L))
      assert(db.store.manifest().get.segments.size <= 2)
      // a bad batch (wrong dim) fails the stream, not silently corrupts
      input.addData((5L, Array(1f)))
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(err.getMessage.contains("invalid vectors") ||
        Option(err.getCause).exists(_.getMessage.contains("invalid vectors")))
      assert(db.read().select("id").as[Long].collect().toSet ==
        Set(1L, 2L, 3L, 4L))
    } finally q.stop()
  }

  test("insertStream keeps the index fresh: extendIndexTail folds every new batch") {
    implicit val ctx = spark.sqlContext
    val db = GraftDB.open(spark,
      Files.createTempDirectory("graft-insstream-idx").toString,
      dim = 2, metric = "l2")
    db.insertBatch(Seq((1L, Array(1f, 2f)), (2L, Array(9f, 9f)))
      .toDF("id", "vector"))
    db.buildIndex(nlist = 2)
    val input = MemoryStream[(Long, Array[Float])]
    val q = db.insertStream(
      input.toDF().toDF("id", "vector"),
      Files.createTempDirectory("graft-insstream-idx-ckpt").toString,
      extendIndexTail = 1)
    try {
      input.addData((3L, Array(1.1f, 2.1f))); q.processAllAvailable()
      input.addData((4L, Array(8.9f, 9.1f))); q.processAllAvailable()
      // every micro-batch's segment was folded under the frozen model —
      // no unindexed tail survives, the original sidecar centroids rule
      val m = db.store.manifest().get
      assert(m.segments.forall(_.index.isDefined),
        s"unindexed tail left: ${m.segments.map(s => s.seq -> s.index.isDefined)}")
      val got = db.search(Array(1f, 2f), 2, nprobe = 2, refineFactor = 10)
        .select("id").as[Long].collect().toSet
      assert(got == Set(1L, 3L))
    } finally q.stop()
  }

  test("streaming as-of join equals the batch twin at sf0.001") {
    val streamed = StreamingQueries.streamingAsofJoin(spark, sf).collect()
    val batch = graft.EventQueries.asofJoin(spark, sf).collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("as-of state carries purchases across micro-batch boundaries") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, Boolean, Double)]
    val sinkName = "asof_carry_test"
    val q = Ingest.asofMatches(input.toDS())
      .writeStream.format("memory").queryName(sinkName)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-asof-ckpt").toString)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
      .start()
    try {
      // batch 1: user 7 purchases (id 1) at t=100; a click before any
      // purchase (id 2, t=50) emits no match
      input.addData((7L, 2L, 50L, false, 0.0), (7L, 1L, 100L, true, 9.5))
      q.processAllAvailable()
      // batch 2: click at t=200 must see batch 1's purchase; a same-ts
      // purchase+click pair (t=300) resolves purchase-first
      input.addData((7L, 3L, 200L, false, 0.0),
        (7L, 4L, 300L, true, 1.5), (7L, 5L, 300L, false, 0.0))
      q.processAllAvailable()
      val rows = spark.table(sinkName)
        .select("eventId", "lastPId", "lastPValue").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        .sortBy(_._1)
      assert(rows.toSeq == Seq(
        (2L, None, None),
        (3L, Some(1L), Some(9.5)),
        (5L, Some(4L), Some(1.5))))
    } finally q.stop()
  }

  test("streaming range join equals an exact batch inner join at sf0.001") {
    val streamed = StreamingQueries.streamingRangeJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ev = graft.Tables.load(spark, sf, "events")
    val iv = ev.where(col("event_type") === "error" && col("value") > 50)
      .select(col("event_id").as("iv_id"), unix_micros(col("ts")).as("s"))
    val clicks = ev.where(col("event_type") === "click" && col("user_id") < 30)
      .select(col("event_id"), unix_micros(col("ts")).as("u"))
    val exact = clicks.join(iv,
        iv("s") <= clicks("u") && clicks("u") < iv("s") + 300000000L)
      .select("event_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(streamed.toSeq == exact.toSeq)
    // no pair may emit twice across micro-batches
    assert(streamed.distinct.length == streamed.length)
  }
}
