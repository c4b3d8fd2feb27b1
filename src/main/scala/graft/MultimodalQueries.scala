package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal plumbing coverage. No DuckDB oracle (the decode step is a
  * deliberate stub — SURVEY/brief: decode libs absent in this container),
  * so the driver records the weaker rows-only check; determinism and batch
  * semantics are asserted in MultimodalSpec.
  */
object MultimodalQueries {

  /** Treat events.props as opaque media bytes: binary ingest → batched
    * feature extraction → per-type feature aggregation.
    */
  def features(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .withColumn("content", col("props").cast("binary"))
    val media = Multimodal.fromBinary(ev, "event_id", "content", "event_type")
    val feats = Multimodal.extractFeatures(media, dim = 8)
    feats.toDF()
      .select(col("id"), col("mediaType"), col("dim"),
        round(element_at(col("features"), 1), 6).as("f0"))
      .orderBy(col("id").asc)
      .limit(200)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> (features _)
  )
}
