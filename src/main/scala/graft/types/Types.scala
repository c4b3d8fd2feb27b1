package graft.types

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Distance metric for vector search.
  *
  * Mirrors the reference metric set (vecgo `distance/distance.go:66-73`) and
  * its score conventions (`internal/engine/search.go:172-189`):
  *   - L2     → squared Euclidean distance, ascending = better
  *   - Cosine → cosine similarity, descending = better
  *   - Dot    → raw dot product, descending = better
  *   - Hamming→ popcount distance over binary codes, ascending = better
  */
sealed trait Metric {
  /** true if smaller scores are better (distances); false for similarities. */
  def ascending: Boolean
  /** Score column for (vector, query). */
  def score(v: Column, q: Column): Column
  /** Sort the score column best-first. */
  def sort(score: Column): Column = if (ascending) score.asc else score.desc
}

object Metric {
  import graft.functions.{vec_l2sq, vec_cos, vec_dot}

  case object L2 extends Metric {
    val ascending = true
    def score(v: Column, q: Column): Column = vec_l2sq(v, q)
  }
  case object Cosine extends Metric {
    val ascending = false
    def score(v: Column, q: Column): Column = vec_cos(v, q)
  }
  case object Dot extends Metric {
    val ascending = false
    def score(v: Column, q: Column): Column = vec_dot(v, q)
  }
  case object Hamming extends Metric {
    val ascending = true
    def score(v: Column, q: Column): Column = graft.functions.vec_hamming(v, q)
  }

  def fromString(s: String): Metric = s.toLowerCase match {
    case "l2"      => L2
    case "cosine"  => Cosine
    case "dot"     => Dot
    case "hamming" => Hamming
    case other     => throw new IllegalArgumentException(s"unknown metric: $other")
  }
}

/** The one logical record shape (vecgo `model/types.go:44-49`):
  * id, vector, typed metadata columns, opaque payload.
  */
case class Record(
    id: Long,
    vector: Array[Float],
    label: Int,
    payload: Array[Byte])

/** A search result row (vecgo `model/types.go:30-41`). */
case class Candidate(id: Long, score: Double)

/** Typed-metadata filter predicates, AND-combined (vecgo `metadata/types.go:
  * 409-440`, eval semantics `metadata/filter.go:9-216`).
  *
  * Semantics preserved:
  *  - a missing (NULL) field matches NO operator, including `ne`
  *    (`metadata/filter.go:9-13`) — Spark predicates evaluate to NULL on
  *    NULL input and `Dataset.where` drops them, which is exactly that.
  *  - numeric cross-type compare int~float (`filter.go:141-147`) — Spark
  *    numeric type coercion handles this.
  *  - `in` over a value list; `contains` is SUBSTRING containment
  *    (`filter.go:196-201`), not array containment.
  */
sealed trait Filter { def toColumn: Column }
object Filter {
  final case class Eq(field: String, value: Any) extends Filter {
    def toColumn: Column = col(field) === lit(value)
  }
  final case class Ne(field: String, value: Any) extends Filter {
    def toColumn: Column = col(field) =!= lit(value)
  }
  final case class Gt(field: String, value: Any) extends Filter {
    def toColumn: Column = col(field) > lit(value)
  }
  final case class Gte(field: String, value: Any) extends Filter {
    def toColumn: Column = col(field) >= lit(value)
  }
  final case class Lt(field: String, value: Any) extends Filter {
    def toColumn: Column = col(field) < lit(value)
  }
  final case class Lte(field: String, value: Any) extends Filter {
    def toColumn: Column = col(field) <= lit(value)
  }
  final case class In(field: String, values: Seq[Any]) extends Filter {
    def toColumn: Column = col(field).isin(values: _*)
  }
  final case class Contains(field: String, substring: String) extends Filter {
    def toColumn: Column = col(field).contains(substring)
  }
}

/** AND-of-predicates filter set (vecgo `metadata/types.go:437-440` — the
  * public filter language is a conjunction of leaf predicates).
  */
final case class FilterSet(filters: Seq[Filter]) {
  def toColumn: Column =
    filters.map(_.toColumn).reduceOption(_ && _).getOrElse(lit(true))
  def and(f: Filter): FilterSet = FilterSet(filters :+ f)
}
object FilterSet {
  val empty: FilterSet = FilterSet(Nil)
  def of(fs: Filter*): FilterSet = FilterSet(fs)
}
