package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries aggregate from per-domain inventories:
  *   - [[graft.queries.Relational]] — classic relational operators
  *     (SURVEY.md §2.6) over the TPC-H-ish tables.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
    graft.queries.TemporalQueries.queries ++
    graft.queries.GraphQueries.queries ++
    graft.queries.RdfQueries.queries ++
    graft.queries.ProjectorQueries.queries ++
    graft.queries.SparqlQueries.queries ++
    graft.queries.ServerQueries.queries ++
    graft.pipeline.PipelineQueries.queries ++
    graft.streaming.StreamingQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
    graft.queries.TemporalQueries.oracle ++
    graft.queries.GraphQueries.oracle ++
    graft.queries.RdfQueries.oracle ++
    graft.queries.ProjectorQueries.oracle ++
    graft.queries.SparqlQueries.oracle ++
    graft.queries.ServerQueries.oracle ++
    graft.pipeline.PipelineQueries.oracle ++
    graft.streaming.StreamingQueries.oracle
}
