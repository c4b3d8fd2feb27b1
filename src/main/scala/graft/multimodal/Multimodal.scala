package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, and per-partition batched feature
  * extraction — the Scala twin of a `mapInPandas` decode stage.
  *
  * The Spark-side contract (schema, partitioning, batch shape, feature
  * output) is real and tested; the DECODE step is a clearly-marked
  * deterministic STUB ([[FakeDecoder]]) because no image/audio libraries
  * exist in this environment — swap `FakeDecoder.decode` for a real
  * decoder (JavaCV / TwelveMonkeys / ffmpeg-cli) without touching any of
  * the distributed plumbing.
  */
object Multimodal {

  case class MediaMeta(mediaType: String, width: Int, height: Int,
      durationMs: Long)
  case class MediaRecord(id: Long, meta: MediaMeta, content: Array[Byte])
  case class MediaFeatures(id: Long, mediaType: String, dim: Int,
      features: Array[Float])

  /** STUB decoder — deterministic features from content bytes: a rolling
    * polynomial accumulator `h = (h*31 + byte) mod (2^31-1)` whose running
    * value fills feature slots round-robin. A real implementation would
    * decode the media and run a feature extractor here; everything around
    * it (batch iteration, schema, shuffle behavior) is production-shaped.
    *
    * The fold is deliberately ORACLE-PORTABLE (no 64-bit wraparound):
    * DuckDB reproduces it exactly with `list_reduce` over the byte
    * sequence, so `multimodal_features` gets a full hash-compare row
    * instead of a rows-only check.
    */
  object FakeDecoder {
    val Mod = 2147483647L // 2^31-1: h*31 + 255 < 2^36, ANSI-safe

    def decode(content: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 0L
      var i = 0
      while (i < content.length) {
        h = (h * 31L + (content(i) & 0xffL)) % Mod
        out(i % dim) = (h % 1000L).toFloat / 1000f
        i += 1
      }
      out
    }

    /** STUB frame sampler: every nth 16-byte block stands in for a frame. */
    def sampleFrames(content: Array[Byte], everyN: Int): Seq[Array[Byte]] =
      content.grouped(16).zipWithIndex
        .collect { case (b, i) if i % everyN == 0 => b }.toSeq

    /** STUB resizer: a deterministic strided byte subsample standing in
      * for a real image resize — keeps every stride-th byte up to w·h
      * bytes. A real implementation would decode, scale, re-encode; the
      * signature and batch plumbing are what production code keeps.
      */
    def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val target = math.max(1, w * h)
      if (content.isEmpty) Array.emptyByteArray
      else {
        val stride = math.max(1, content.length / target)
        content.indices.by(stride).take(target).map(content).toArray
      }
    }
  }

  /** Build MediaRecords from any (id, payload-bytes, type) frame. */
  def fromBinary(df: DataFrame, idCol: String, contentCol: String,
      typeCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(contentCol).cast("binary").as("content"),
        col(typeCol).cast("string").as("mt"))
      .as[(Long, Array[Byte], String)]
      .map { case (id, bytes, mt) =>
        MediaRecord(id, MediaMeta(mt, 0, 0, 0L),
          if (bytes == null) Array.emptyByteArray else bytes)
      }
  }

  /** Batched per-partition feature extraction (the mapInPandas shape:
    * iterate the partition in fixed-size batches; each batch would be one
    * decoder call in a real vectorized implementation).
    */
  def extractFeatures(ds: Dataset[MediaRecord], dim: Int,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          MediaFeatures(r.id, r.meta.mediaType, dim,
            FakeDecoder.decode(r.content, dim))
        }
      }
    }
  }
}
