package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal plumbing coverage. The decode step is a deliberate stub
  * (SURVEY/brief: decode libs absent in this container) but its fold is
  * oracle-portable — DuckDB reproduces it with `list_reduce` over the
  * byte sequence — so the query gets a full hash-compare row. Batch
  * semantics are asserted in MultimodalSpec.
  */
object MultimodalQueries {

  /** Treat events.props as opaque media bytes: binary ingest → batched
    * feature extraction → slot-0 feature per record.
    */
  def features(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .withColumn("content", col("props").cast("binary"))
    val media = Multimodal.fromBinary(ev, "event_id", "content", "event_type")
    val feats = Multimodal.extractFeatures(media, dim = 8)
    feats.toDF()
      .select(col("id"), col("mediaType"), col("dim"),
        round(element_at(col("features"), 1).cast("double"), 6).as("f0"))
      .orderBy(col("id").asc)
      .limit(200)
  }

  /** Frame-sampling plumbing (video-shaped media): every 2nd 16-byte
    * block stands in for a frame ([[Multimodal.FakeDecoder.sampleFrames]]
    * stub); per media the query reports the sampled-frame count and the
    * md5 of the first frame — both reproducible byte-exactly in DuckDB,
    * so the distributed sampling path gets a full hash-compare row.
    */
  def frames(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .withColumn("content", col("props").cast("binary"))
    val media = Multimodal.fromBinary(ev, "event_id", "content", "event_type")
    import s.implicits._
    val sampled = media.map { r =>
      val fs = Multimodal.FakeDecoder.sampleFrames(r.content, everyN = 2)
      (r.id, fs.length.toLong, fs.headOption.orNull)
    }.toDF("id", "n_frames", "first_frame")
    sampled
      .select(col("id"), col("n_frames"), md5(col("first_frame")).as("first_md5"))
      .orderBy(col("id").asc)
      .limit(200)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> (features _),
    "multimodal_frames" -> (frames _)
  )

  /** DuckDB twin of the stub decoder: slot 0 of the round-robin fill is
    * last written at byte index 8*((len-1) div 8) (0-based), i.e. after
    * folding the first 8*((len-1) div 8)+1 bytes. `list_reduce` without an
    * init value seeds with the first element, which equals the h0=0 fold's
    * first step. props is ASCII in this corpus, so ord(char) == byte.
    */
  val oracle: Map[String, String] = Map(
    "multimodal_features" ->
      """WITH base AS (
        |  SELECT event_id AS id, event_type AS "mediaType", props,
        |         length(props) AS len
        |  FROM events ORDER BY event_id ASC LIMIT 200)
        |SELECT id, "mediaType", CAST(8 AS INT) AS dim,
        |  CASE WHEN len = 0 THEN 0.0 ELSE
        |    round((list_reduce(
        |      list_transform(range(1, 8 * ((len - 1) // 8) + 2),
        |        i -> CAST(ord(substring(props, CAST(i AS INT), 1)) AS BIGINT)),
        |      (a, x) -> (a * 31 + x) % 2147483647) % 1000) / 1000.0, 6)
        |  END AS f0
        |FROM base ORDER BY id ASC""".stripMargin,
    // frames = 16-byte blocks at even indices: count = ceil(nblocks/2);
    // the first sampled frame is bytes [1,16] (ASCII props: ord == byte,
    // so md5 over the substring equals Spark's md5 over the binary slice)
    "multimodal_frames" ->
      """WITH base AS (
        |  SELECT event_id AS id, props, length(props) AS len
        |  FROM events ORDER BY event_id ASC LIMIT 200),
        |counted AS (
        |  SELECT id, len,
        |         CASE WHEN len = 0 THEN 0
        |              ELSE ((len + 15) // 16 + 1) // 2 END AS n_frames
        |  FROM base)
        |SELECT c.id, c.n_frames::BIGINT AS n_frames,
        |       CASE WHEN c.len = 0 THEN NULL
        |            ELSE md5(substring(b.props, 1, 16)) END AS first_md5
        |FROM counted c JOIN base b ON b.id = c.id
        |ORDER BY c.id ASC""".stripMargin
  )
}
