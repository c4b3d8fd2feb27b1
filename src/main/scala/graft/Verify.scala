package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // the oracle compare needs bit-exact sequential-double kernels; the
    // production default is the fast path when Panama is loaded
    graft.functions.KernelMode.fast = false
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A query that throws must be LOUD: round 6 shipped a broken table
    // loader unnoticed because failures here were stderr-only and the
    // broken queries simply vanished from the dump. Record every failure
    // in failed.json (checked by tools/check_oracle.py) and exit nonzero.
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] FAILED $name: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/failed.json"),
      s"""{"total":${SparkEntry.queries.size},"failed":[${failed.map(q).mkString(",")}]}""")
    // Don't exit nonzero: the driver must still get the dump for the
    // queries that DID succeed. failed.json + the check_oracle.py assert
    // are the gate that keeps a broken query from vanishing silently.
    if (failed.nonEmpty) System.err.println(
      s"[verify] ${failed.size}/${SparkEntry.queries.size} queries FAILED: ${failed.mkString(", ")}")
    spark.stop()
  }
}
