package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are grouped by domain module; every entry in [[queries]] with
  * a matching key in [[oracleSql]] is hash-checked against DuckDB on the
  * same parquet tables, so Spark column names/types must line up with
  * the oracle's exactly.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The J2 join-chain (SURVEY §2.4) — scan + 4 joins + grouped agg. */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_join_chain")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.EventsMerge.queries ++
      graft.queries.TextDocs.queries ++
      graft.queries.EmbeddingsQ.queries ++
      graft.queries.Faexport.queries ++
      graft.queries.LlmOps.queries ++
      graft.queries.IngestQ.queries ++
      graft.queries.MaintenanceQ.queries ++
      graft.queries.WebListingQ.queries ++
      graft.queries.SqlSurfaceQ.queries ++
      graft.queries.MergeScaleQ.queries ++
      graft.queries.CorpusOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.EventsMerge.oracles ++
      graft.queries.TextDocs.oracles ++
      graft.queries.EmbeddingsQ.oracles ++
      graft.queries.Faexport.oracles ++
      graft.queries.LlmOps.oracles ++
      graft.queries.IngestQ.oracles ++
      graft.queries.MaintenanceQ.oracles ++
      graft.queries.WebListingQ.oracles ++
      graft.queries.SqlSurfaceQ.oracles ++
      graft.queries.MergeScaleQ.oracles ++
      graft.queries.CorpusOps.oracles
}
