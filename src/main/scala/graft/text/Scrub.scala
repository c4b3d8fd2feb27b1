package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII / boilerplate scrubbing for training-data pipelines: mask emails,
  * URLs and phone-shaped strings in place and count what was masked (the
  * counts feed quality filters — a doc that is mostly contact spam gets
  * dropped, not just cleaned).
  *
  * Pure column expressions (codegen'd `regexp_replace` /
  * `regexp_extract_all`) — no UDFs, scales as a scan. Patterns are
  * deliberately engine-portable (no `\d`/`\S` shorthand, no lookaround):
  * the same strings run under Java regex (Spark) and RE2 (DuckDB oracle)
  * with identical semantics.
  */
object Scrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[A-Za-z0-9./_-]+"
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

  /** Number of matches of `pattern` in `text`. */
  def count(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** All three masks applied; URLs first (the URL charset excludes `@`,
    * so order only matters for not leaving maskable tails behind).
    */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlRe, "<URL>"),
        EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")
}
