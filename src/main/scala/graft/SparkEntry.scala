package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by per-domain QuerySets; each query name maps to a
  * (SparkSession, sfDir) => DataFrame and (where SQL-expressible) a DuckDB
  * oracle with identical column names and deterministic numerics.
  */
object SparkEntry {

  private val sets: Seq[QuerySet] =
    Seq(Relational, EventsAnalytics, TextOps, Dedup, Similarity, X12Queries,
      MultimodalQueries, StreamingQueries, Extended)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sets.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    sets.flatMap(_.oracles).toMap
}
