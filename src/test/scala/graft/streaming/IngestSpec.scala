package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.store.SnapshotStore

class IngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("stream micro-batches commit one store version each; compaction kicks in") {
    implicit val ctx = spark.sqlContext
    val store = new SnapshotStore(spark,
      Files.createTempDirectory("graft-stream-store").toString)
    val input = MemoryStream[(Long, String)]
    val q = Ingest.toStore(input.toDF().toDF("id", "v"), store,
      Files.createTempDirectory("graft-stream-ckpt").toString,
      compactEvery = 2)
    try {
      input.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
      assert(store.currentVersion == 0)
      input.addData((3L, "c")); q.processAllAvailable()
      input.addData((4L, "d")); q.processAllAvailable()
      // 3 inserts; compaction triggered when >2 segments accumulated
      assert(store.manifest().get.segments.size <= 2)
      assert(store.read().select("id").as[Long].collect().toSet ==
        Set(1L, 2L, 3L, 4L))
    } finally q.stop()
  }

  test("watermarked windowed counts aggregate a stream") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val counts = Ingest.windowedCounts(
      input.toDF().toDF("ts", "k"), "ts", "k", "1 hour", "10 minutes")
    val q = counts.writeStream.format("memory")
      .queryName("wc").outputMode("complete").start()
    try {
      def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      input.addData((ts(0, 5), "a"), (ts(0, 20), "a"), (ts(1, 5), "b"))
      q.processAllAvailable()
      val got = spark.table("wc")
        .select("k", "n").as[(String, Long)].collect().toMap
      assert(got == Map("a" -> 2L, "b" -> 1L))
    } finally q.stop()
  }

  test("stateful session counting matches the batch gap rule") {
    // batch-mode mapGroupsWithState: one pass, empty initial state
    val ev = Seq(
      (1L, 1000L), (1L, 1100L), (1L, 5000L), // user 1: 2 sessions (gap > 1800)
      (2L, 100L)).toDS()
    val got = Ingest.sessionCounts(ev, gapSec = 1800)
      .collect().map(u => u.key -> (u.sessions, u.events)).toMap
    assert(got(1L) == ((2L, 3L)))
    assert(got(2L) == ((1L, 1L)))
  }
}
