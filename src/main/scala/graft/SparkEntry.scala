package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers here: a DataFrame
  * query in [[queries]] and (where SQL-expressible) an equivalent DuckDB
  * oracle statement in [[oracleSql]]. Column names and value determinism are
  * part of the contract — see [[graft.ops.Det]].
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] =
    ops.Relational.queries ++ ops.Analytic.queries ++ ops.Scalars.queries ++
      ops.ScaleJoins.queries ++ ops.Dialect.queries ++
      ext.Dedup.queries ++ ext.Similarity.queries ++
      ext.TextAnalysis.queries ++ ext.Multimodal.queries ++ ext.Corpus.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracles ++ ops.Analytic.oracles ++ ops.Scalars.oracles ++
      ops.ScaleJoins.oracles ++ ops.Dialect.oracles ++
      ext.Dedup.oracles ++ ext.Similarity.oracles ++
      ext.TextAnalysis.oracles ++ ext.Multimodal.oracles ++ ext.Corpus.oracles
}
