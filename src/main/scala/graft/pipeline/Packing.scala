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
    val ranged = df
      .select(col(idCol).cast("long").as("id"), tokensCol.cast("long").as("tokens"))
      .repartitionByRange(n, col("id"))
      .sortWithinPartitions("id")
      .withColumn("pid", spark_partition_id())
    // pass 1: per-partition totals (rows on the driver = #partitions)
    val sums: Array[(Int, Long)] = ranged
      .groupBy("pid").agg(sum("tokens").as("s"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets = scala.collection.mutable.HashMap[Int, Long]()
    var acc = 0L
    sums.foreach { case (pid, s) => offsets(pid) = acc; acc += s }
    val bc = spark.sparkContext.broadcast(offsets.toMap)
    // pass 2: partition-local running sum + broadcast offset
    ranged.select("pid", "id", "tokens").as[(Int, Long, Long)]
      .mapPartitions { it =>
        var cum = Long.MinValue
        it.map { case (pid, id, tk) =>
          if (cum == Long.MinValue) cum = bc.value.getOrElse(pid, 0L)
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
