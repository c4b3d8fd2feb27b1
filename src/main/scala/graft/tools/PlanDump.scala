package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for declared queries to per-query files —
  * the optimization-round evidence trail (plans/r12/<query>_<tag>.txt).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <tag> [query ...]
  * With no query names, dumps every SparkEntry.queries entry.
  * Data dir: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <tag> [query ...]")
    val outDir = args(0)
    val tag = args(1)
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val all = graft.SparkEntry.queries
    val names = if (args.length > 2) args.drop(2).toSeq else all.keys.toSeq.sorted
    names.foreach { name =>
      all.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(fn) =>
          try {
            val plan = fn(spark, sfDir).queryExecution
              .explainString(ExplainMode.fromString("formatted"))
            Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), plan)
            println(s"[plandump] wrote $name")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] FAILED $name: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
