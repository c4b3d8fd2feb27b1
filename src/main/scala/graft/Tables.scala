package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided test corpus (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS). How Spark surfaces that has
      // changed across 4.x releases, so dispatch on the type it actually
      // loads rather than assuming one reading:
      //  - long (spark.sql.legacy.parquet.nanosAsLong honored): nanos since
      //    epoch — floor-convert to µs with integer `div` (a double
      //    roundtrip would lose precision above 2^53 ns), matching
      //    DuckDB's µs-internal truncation of the same file.
      //  - TIMESTAMP_NTZ (Spark 4.1.2 reads nanos natively, µs-truncated,
      //    no zone): cast to the session-TZ timestamp; sessions here pin
      //    spark.sql.session.timeZone=UTC so the instant is identical to
      //    the legacy path and to DuckDB's naive reading.
      //  - TIMESTAMP: already what downstream and the oracle expect.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case TimestampType => raw
        case other =>
          throw new IllegalStateException(
            s"events.ts loaded as unsupported type $other")
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
}
