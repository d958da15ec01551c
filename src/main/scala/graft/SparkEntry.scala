package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-module query surfaces into the single map the
  * driver's smoke/correctness/bench harnesses consume.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.CcdQueries.queries ++
      ext.Text.queries ++ ext.Dedup.queries ++
      ext.Similarity.queries ++ ext.Events.queries ++ ext.Multimodal.queries ++
      ext.Hybrid.queries ++ ext.Curation.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++ ops.CcdQueries.oracle ++
      ext.Text.oracle ++ ext.Dedup.oracle ++
      ext.Similarity.oracle ++ ext.Events.oracle ++ ext.Multimodal.oracle ++
      ext.Hybrid.oracle ++ ext.Curation.oracle
}
