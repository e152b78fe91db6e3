package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Analytics, ApproxOps, BloomOps, Components, ImporterCore, LayoutOps, Multimodal, Specs, TemporalJoins, TextOps, TrainOps, VectorOps}
import graft.sources.{BucketedTable, FileFormats, RawIngest}
import graft.streaming.{JdbcUpsert, StreamImport}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.queries ++ ImporterCore.queries ++ Specs.queries ++
      TextOps.queries ++ VectorOps.queries ++ Multimodal.queries ++
      StreamImport.queries ++ RawIngest.queries ++ Components.queries ++
      TemporalJoins.queries ++ TrainOps.queries ++ ApproxOps.queries ++
      JdbcUpsert.queries ++ BucketedTable.queries ++ BloomOps.queries ++
      FileFormats.queries ++ LayoutOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Analytics.oracles ++ ImporterCore.oracles ++ Specs.oracles ++
      TextOps.oracles ++ VectorOps.oracles ++ Multimodal.oracles ++
      StreamImport.oracles ++ RawIngest.oracles ++ Components.oracles ++
      TemporalJoins.oracles ++ TrainOps.oracles ++ ApproxOps.oracles ++
      JdbcUpsert.oracles ++ BucketedTable.oracles ++ BloomOps.oracles ++
      FileFormats.oracles ++ LayoutOps.oracles
}
