package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-dimension Population Stability Index between two embedding
  * corpora — the "did my embedding distribution shift between crawls /
  * store versions" observability verb a training-data pipeline reads
  * before trusting an index, a dedup threshold, or a quality classifier
  * trained on the old distribution:
  *
  *   PSI_j = Σ_buckets (p_A − p_B) · ln(p_A / p_B)
  *
  * with fixed [lo, hi) equi-width buckets (clamped at the edges, so the
  * report needs no quantile pass and is reproducible on any engine) and
  * Jeffreys 0.5-smoothing so empty buckets contribute finitely (each
  * dimension's denominator is ITS OWN histogram total, so proportions
  * sum to 1 even when nulls/short vectors/NaNs drop rows unevenly). The
  * usual reading: PSI < 0.1 stable, 0.1–0.25 moderate shift, > 0.25
  * retrain/re-tune. Feed it any two frames — two store versions (via
  * time-travel reads), two crawls, pre/post a filter.
  *
  * 100 TB shape: each side is ONE posexplode + partial-aggregated
  * (dim, bucket) count (the shuffle carries dims × buckets groups, not
  * rows), the dense grid join is broadcast-tiny, and the per-dim sum
  * folds in bucket order over a collected ≤`buckets`-long array, so the
  * float accumulation is pinned and replays bit-exact in a DuckDB
  * ordered `list_reduce`.
  */
object PsiDrift {

  /** (j, psi) for dimensions 0 until dims; `a` is the baseline, `b` the
    * candidate. Vectors shorter than `dims` simply contribute no counts
    * for the missing tail dimensions.
    */
  def perDim(a: DataFrame, b: DataFrame, vecCol: String, dims: Int,
      lo: Double, hi: Double, buckets: Int): DataFrame = {
    require(dims > 0 && buckets > 1 && hi > lo,
      s"bad PSI config: dims=$dims buckets=$buckets range=[$lo,$hi)")
    val width = hi - lo
    def bucketOf(x: Column): Column =
      least(lit(buckets - 1), greatest(lit(0),
        floor((x.cast("double") - lo) / width * buckets)))
        .cast("int")
    def hist(df: DataFrame, cName: String): DataFrame =
      df.select(posexplode(col(vecCol)).as(Seq("j", "x")))
        .where(col("j") < dims)
        .select(col("j").cast("int").as("j"), bucketOf(col("x")).as("b"))
        .groupBy("j", "b").agg(count(lit(1)).as(cName))
    val spark = a.sparkSession
    val grid = spark.range(0, dims.toLong, 1, 1)
      .select(col("id").cast("int").as("j"))
      .crossJoin(spark.range(0, buckets.toLong, 1, 1)
        .select(col("id").cast("int").as("b")))
    // smoothing denominators are PER-DIMENSION histogram totals, not a
    // side-wide row count: rows with null vectors, short vectors, or NaN
    // components (NaN buckets to null and drops at the grid join)
    // contribute no counts to a dimension, and a row-count denominator
    // would silently deflate that dimension's proportions (they would no
    // longer sum to 1). Summing the collected ≤buckets-long count array
    // is exact integer arithmetic — no extra pass over the data.
    val half = lit(0.5 * buckets)
    def total(field: String): Column =
      aggregate(transform(col("ts"), s => s.getField(field)),
        lit(0L), (acc, x) => acc + x).cast("double") + half
    grid
      .join(hist(a, "ca"), Seq("j", "b"), "left")
      .join(hist(b, "cb"), Seq("j", "b"), "left")
      .select(col("j"), col("b"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .groupBy("j")
      .agg(array_sort(
        collect_list(struct(col("b"), col("ca"), col("cb")))).as("ts"))
      .select(col("j"), col("ts"), total("ca").as("na"), total("cb").as("nb"))
      .select(col("j"),
        aggregate(col("ts"), lit(0.0), (acc, s) => {
          val pa = (s.getField("ca").cast("double") + 0.5) / col("na")
          val pb = (s.getField("cb").cast("double") + 0.5) / col("nb")
          acc + (pa - pb) * log(pa / pb)
        }).as("psi"))
  }
}
