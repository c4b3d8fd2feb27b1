package graft

import org.apache.spark.sql.SparkSession

/** One-call session bootstrap with the engine's recommended
  * configuration — the knobs every deployment of this library should set
  * and the reasons they are set, so users do not rediscover them:
  *
  *  - [[GraftExtensions]] injected via `withExtensions`: registers the
  *    vector function library (`vec_l2sq`, `vec_cos`, …) for
  *    `spark.sql(...)`.
  *  - adaptive execution ON: runtime re-planning (skew joins, partition
  *    coalescing) is part of the 100 TB story.
  *  - `spark.sql.inMemoryColumnarStorage.compressed=false`: packed
  *    float32 vectors are entropy-dense; the cache codecs only add
  *    decode work on every scan (~22% dist/s, tools/CacheCodecProbe) —
  *    the same trade the segments make with uncompressed parquet.
  *  - `spark.sql.session.timeZone=UTC`: event-time operators and the
  *    cross-engine oracles assume one timezone.
  *  - shuffle partitions sized to the given parallelism instead of the
  *    200 default (a local[32] box wants 32; a 1000-executor cluster
  *    wants its core count — pass it).
  *
  * Every setting is a DEFAULT on the returned builder: anything the
  * caller sets afterwards (or `--conf` at submit) wins.
  */
object GraftSession {

  def builder(shufflePartitions: Int = 0): SparkSession.Builder = {
    val parts =
      if (shufflePartitions > 0) shufflePartitions
      else Runtime.getRuntime.availableProcessors()
    SparkSession.builder()
      // withExtensions injects even when an existing SparkContext is
      // reused. Deliberately NOT also setting `spark.sql.extensions`:
      // on a fresh context Spark would apply the conf-named class into
      // the same SparkSessionExtensions this builder holds, registering
      // every function/rule/strategy twice. spark-submit deployments that
      // bypass GraftSession should pass
      // `--conf spark.sql.extensions=graft.GraftExtensions` themselves.
      .withExtensions(new GraftExtensions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", parts.toString)
  }
}
