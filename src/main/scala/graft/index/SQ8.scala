package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization (vecgo I5, `internal/quantization/quantizer.go:
  * 31-347`): per-dimension min/max → uint8 codes; asymmetric distance
  * decodes codes against the exact query.
  *
  * All encode/decode arithmetic is pure column expressions (codegen'd),
  * with the per-dim parameters baked in as literals — no UDF boxing on the
  * scan path. Two-phase search = approx top-(k·f) on codes → exact rerank
  * (vecgo R11), via [[graft.query.Search.rerank]].
  */
object SQ8 {

  final case class Model(mins: Array[Double], maxs: Array[Double],
      levels: Int = 255) {
    def dim: Int = mins.length
    private def span(i: Int): Double = {
      val s = maxs(i) - mins(i); if (s == 0.0) 1.0 else s
    }

    /** Column: encode array<float> → array<int> codes in [0,levels]
      * (levels = 255 for SQ8, 15 for INT4 — vecgo I5/I10).
      */
    def encodeCol(vec: Column): Column =
      transform(vec, (x, i) => {
        val mn = element_at(lit(mins), i + 1)
        val sp = element_at(lit(maxs.indices.map(span).toArray), i + 1)
        least(lit(levels), greatest(lit(0),
          round((x.cast("double") - mn) / sp * lit(levels.toDouble)).cast("int")))
      })

    /** Column: decode codes back to the reconstructed array<float>. */
    def decodeCol(codes: Column): Column =
      transform(codes, (c, i) => {
        val mn = element_at(lit(mins), i + 1)
        val sp = element_at(lit(maxs.indices.map(span).toArray), i + 1)
        (mn + c.cast("double") / lit(levels.toDouble) * sp).cast("float")
      })

    /** Sound L2 bound on the reconstruction error |x̃ − x| for any vector
      * inside the trained [min,max] box: each dim rounds to a grid of
      * `levels` steps, so the per-dim error is ≤ span/(2·levels) and the
      * vector error is the root-sum-square. A small absolute slack absorbs
      * the float cast of the decode. Used by threshold search to size a
      * recall-proof approximate pre-filter margin.
      */
    def maxDecodeError: Double = {
      val ss = mins.indices.foldLeft(0.0) { (acc, i) =>
        val e = span(i) / (2.0 * levels); acc + e * e
      }
      math.sqrt(ss) + 1e-6
    }
  }

  /** Train per-dimension min/max in one distributed pass (posexplode +
    * groupBy over dim index — map-side combinable). `levels` picks the
    * code width: 255 = SQ8 (default), 15 = INT4.
    */
  def train(df: DataFrame, vecCol: String, levels: Int = 255): Model = {
    val stats = df
      .select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy("dim")
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .orderBy("dim")
      .collect()
    Model(stats.map(_.getDouble(1)), stats.map(_.getDouble(2)), levels)
  }

  /** Add a `codes` column to the frame. */
  def encode(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn("codes", model.encodeCol(col(vecCol)))
}
