package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY §2); each entry has a
  * matching DuckDB oracle in `oracleSql` where the semantics are
  * SQL-expressible, otherwise the driver records a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q06_join_agg_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.TrainingText.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.OperatorQueries.queries ++
      graft.queries.Relational2.queries ++
      graft.queries.IngestQueries.queries ++
      graft.queries.StreamBatchQueries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.ModelQueries.queries ++
      graft.queries.CorpusQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.EventQueries.queries ++
      graft.queries.AnalyticsQueries.queries ++
      graft.queries.WarehouseQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  lazy val oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.TrainingText.oracle ++
      graft.queries.DedupQueries.oracle ++
      graft.queries.OperatorQueries.oracle ++
      graft.queries.Relational2.oracle ++
      graft.queries.StreamBatchQueries.oracle ++
      graft.queries.CurationQueries.oracle ++
      graft.queries.MultimodalQueries.oracle ++
      graft.queries.IngestQueries.oracle ++
      graft.queries.ModelQueries.oracle ++
      graft.queries.CorpusQueries.oracle ++
      graft.queries.PipelineQueries.oracle ++
      graft.queries.EventQueries.oracle ++
      graft.queries.AnalyticsQueries.oracle ++
      graft.queries.WarehouseQueries.oracle
}
