package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training batches: concatenate documents in a
  * deterministic order and chunk the token stream into fixed-budget packs
  * (the standard "concat-then-chunk" pretraining layout — each document is
  * assigned to the pack its FIRST token lands in).
  *
  * The core primitive is a DISTRIBUTED EXCLUSIVE PREFIX SUM — the thing a
  * naive `sum().over(Window.orderBy(id))` gets wrong at scale (Spark moves
  * the whole table into ONE partition for a global-ordered window). Shape
  * here:
  *
  *   1. range-repartition by id + sort within partitions (one shuffle —
  *      the same shuffle a global sort needs anyway);
  *   2. per-partition token sums: one tiny job, ONE ROW PER PARTITION on
  *      the driver (not per doc — ~1000 rows on a 1000-executor cluster);
  *   3. exclusive-scan those sums on the driver, broadcast the offsets,
  *      and stream each partition once adding its offset to a running sum.
  *
  * Wall-clock is two linear passes over the ranged data and no global
  * window. At 100 TB the ranged intermediate should be persisted (or the
  * input pre-bucketed by id) so pass 2 and 3 share the shuffle; at test
  * scale we recompute — range boundaries are sampled with fixed
  * per-partition seeds, so both passes see identical partitioning.
  */
object Packing {

  /** Assign every row a `pack_id` by exclusive-prefix-sum of `tokensCol`
    * in ascending `idCol` order, chunked at `budget` tokens.
    *
    * The id→bucket assignment is an EXPLICIT deterministic function
    * (binary search over quantile bounds computed once on the driver),
    * NOT `spark_partition_id()` of a range shuffle: the two passes below
    * each re-evaluate the frame, and RangePartitioner's sampled
    * boundaries are not stable across evaluations — relying on them
    * produced different pids per pass and silently wrong (and unstable)
    * prefix sums at some partition counts. A pure id function cannot
    * disagree with itself.
    *
    * Output: (id, tokens, pack_id) — deterministic for a given input.
    */
  def packByBudget(df: DataFrame, idCol: String, tokensCol: Column,
      budget: Long, numParts: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val n =
      if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val base = df.select(col(idCol).cast("long").as("id"),
      tokensCol.cast("long").as("tokens"))
    // deterministic bucket bounds: Greenwald-Khanna sketch, no sampling
    // randomness; upper-bound array b => bucket(id) = #bounds < id
    val bounds: Array[Long] =
      if (n <= 1) Array.empty
      else base.stat
        .approxQuantile("id", (1 until n).map(_.toDouble / n).toArray, 0.001)
        .map(_.toLong).distinct.sorted
    // native codegen'd binary search (graft.functions.LowerBoundBucket)
    // — no UDF in the assignment path, so both passes stay inside
    // whole-stage codegen
    val bucketed = base.withColumn("bucket",
      graft.functions.lower_bound_bucket(col("id"), bounds))
    // pass 1: per-bucket totals (rows on the driver = #buckets)
    val sums: Array[(Int, Long)] = bucketed
      .groupBy("bucket").agg(sum("tokens").as("s"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets = scala.collection.mutable.HashMap[Int, Long]()
    var acc = 0L
    sums.foreach { case (b, s) => offsets(b) = acc; acc += s }
    val bc = spark.sparkContext.broadcast(offsets.toMap)
    // pass 2: buckets hash-shuffle to executors, rows sorted (bucket, id)
    // within partitions; a partition may hold several whole buckets, so
    // the running sum resets to the bucket's broadcast offset on change
    bucketed.repartition(n, col("bucket"))
      .sortWithinPartitions("bucket", "id")
      .select("bucket", "id", "tokens").as[(Int, Long, Long)]
      .mapPartitions { it =>
        var curBucket = Int.MinValue
        var cum = 0L
        it.map { case (b, id, tk) =>
          if (b != curBucket) { curBucket = b; cum = bc.value.getOrElse(b, 0L) }
          val start = cum
          cum += tk
          (id, tk, start / budget)
        }
      }
      .toDF("id", "tokens", "pack_id")
  }

  /** Per-pack roll-up of [[packByBudget]]: size, token total, and the id
    * span — the manifest a downstream batch loader reads. One
    * pack_id-keyed partial aggregation.
    */
  def packSummary(assigned: DataFrame): DataFrame =
    assigned.groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("tokens").as("pack_tokens"),
        min("id").as("first_doc"), max("id").as("last_doc"))
      .orderBy(col("pack_id").asc)
}
