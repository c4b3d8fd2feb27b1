package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * exact top-10 L2 k-NN over the embeddings table.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.knnL2(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.queries ++ PipelineQueries.queries ++ StoreQueries.queries ++
      IndexQueries.queries ++ EventQueries.queries ++
      MultimodalQueries.queries ++ FacadeQueries.queries ++
      StreamingQueries.queries ++ CurationQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = {
    val base =
      Queries.oracle ++ PipelineQueries.oracle ++ StoreQueries.oracle ++
        IndexQueries.oracle ++ EventQueries.oracle ++
        MultimodalQueries.oracle ++ FacadeQueries.oracle ++
        StreamingQueries.oracle ++ CurationQueries.oracle
    base ++ FacadeQueries.oracleAliases.view.mapValues(base).toMap
  }
}
