package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator-inventory entries (SURVEY.md §2) to
  * runnable DataFrame builders over a scale-factor directory;
  * `oracleSql` holds the DuckDB twin for each SQL-expressible query.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Runs the full TRACK_ATTRRECOG_REID control-plane pipeline
    * (routing, multicast, join, plan-combine, three save sinks) — the
    * engine's signature dataflow. */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.queries("vpe_plan_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ PipelineQueries.queries ++
      DataPipelineQueries.queries ++ StreamingQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ PipelineQueries.oracles ++
      DataPipelineQueries.oracles ++ StreamingQueries.oracles
}
