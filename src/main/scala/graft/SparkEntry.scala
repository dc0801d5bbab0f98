package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the two-hop Zoe traversal (customers of region EUROPE with full path
    * extraction) through the TpchGraph mapping. */
  def entry(spark: SparkSession): DataFrame =
    GraphQueries.queries("zoe_paths_europe")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data-pipeline operators. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    GraphQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    GraphQueries.oracles ++ PipelineQueries.oracles
}
