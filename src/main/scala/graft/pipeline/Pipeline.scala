package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Training-data pipeline operators beyond the reference's surface:
  * benchmark decontamination and deterministic data-mixing sampling.
  * (The reference stops at storage/search — these are the corpus-prep
  * steps a 100 TB pretraining pipeline runs on top, per the brief.)
  */
object Decontam {

  /** Benchmark decontamination: for every training document, the fraction
    * of its distinct word n-gram shingles that appear ANYWHERE in the
    * eval/benchmark corpus — the standard n-gram-overlap contamination
    * test (GPT-3 appendix C / PaLM-style 8-gram checks, here over
    * n-grams of the caller's choosing).
    *
    * Scale shape: one shingle-keyed equi-join (the eval side is
    * `distinct` shingles — typically small enough that Spark broadcasts
    * it) followed by one per-doc aggregation; both linear, no cross
    * product. Documents with fewer than n tokens have no shingles and are
    * absent from the output (no 0/0 row).
    *
    * Output: (id, n_shingles, n_hit, overlap_frac), one row per training
    * doc with ≥1 shingle.
    */
  def overlap(train: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val ts = Dedup.shingles(train, idCol, textCol, n)
    val es = Dedup.shingles(evalSet, idCol, textCol, n)
      .select(col("shingle")).distinct()
      .withColumn("_hit", lit(1L))
    ts.join(es, Seq("shingle"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_hit"))
      .select(col("id"), col("n_shingles"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_shingles").cast("double"),
          6).as("overlap_frac"))
  }
}

/** Deterministic sampling for data mixing. */
object Sampling {

  /** Stratified hash sampling: keep a row iff
    * `md5(id) mod 1000 < round(rate(stratum)·1000)`. Deterministic (same
    * id → same decision on every run and every engine — md5 is portable
    * to the DuckDB oracle), single scan, no shuffle, no state: exactly
    * how a 100 TB mixing pass wants to subsample strata to quota.
    * Thresholds are integer-rounded ONCE on the driver so float
    * representation (0.3·1000 = 299.999…) can never shift a boundary.
    */
  def stratifiedHash(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[Any, Double], defaultRate: Double): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0,1]")
    val h = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
        .cast("long"),
      lit(1000L))
    val threshold = rates.foldLeft(lit(math.round(defaultRate * 1000)): Column) {
      case (acc, (k, v)) =>
        when(col(strataCol) === lit(k), lit(math.round(v * 1000))).otherwise(acc)
    }
    df.where(h < threshold)
  }

  /** Weighted hash sampling: keep a row iff
    * `md5(id) mod 1e6 < min(1e6, weight · scalePerUnit)` — i.e. keep
    * probability proportional to an integer weight column (length-
    * proportional corpus sampling), saturating at 1. All-integer
    * threshold math so the decision is bit-identical on every engine
    * (no float rounding at a boundary). Single scan, no shuffle,
    * deterministic — rerunning the pipeline keeps the SAME rows.
    */
  def weightedHash(df: DataFrame, idCol: String, weightCol: Column,
      scalePerUnit: Long): DataFrame = {
    require(scalePerUnit > 0, "scalePerUnit must be positive")
    val h = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
        .cast("long"),
      lit(1000000L))
    val threshold =
      least(lit(1000000L), weightCol.cast("long") * lit(scalePerUnit))
    df.where(h < threshold)
  }
}
