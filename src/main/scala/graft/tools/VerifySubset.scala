package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Subset form of [[graft.Verify]] for the optimization loop: dump only
  * the named queries (plus their oracle SQL) so a targeted change can be
  * oracle-proven in seconds instead of a full sweep.
  *
  * Usage: runMain graft.tools.VerifySubset <sfDir> <outDir> <query> [...]
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: VerifySubset <sfDir> <outDir> <query> [query ...]")
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    graft.functions.KernelMode.fast = false // bit-exact oracle kernels
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val all = graft.SparkEntry.queries
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    names.foreach { name =>
      val fn = all.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify-subset] FAILED $name: ${e.getMessage}")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val sqls = graft.SparkEntry.oracleSql.view.filterKeys(names.contains)
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      sqls.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    Files.writeString(Paths.get(s"$outDir/failed.json"),
      s"""{"total":${names.size},"failed":[${failed.map(q).mkString(",")}]}""")
    spark.stop()
  }
}
