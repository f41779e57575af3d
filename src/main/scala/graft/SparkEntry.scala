package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ContextQueries, CoreQueries, FormatQueries, MLQueries, MiscQueries, ParserQueries, StreamQueries, TqlQueries, WebQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator catalog (SURVEY.md §2 surface + the
  * training-data operators); `oracleSql` holds the DuckDB-equivalent SQL for
  * every query. All sketch/hash families are md5h60-based so DuckDB computes
  * identical values — every catalog query carries a hard oracle.
  */
object SparkEntry {

  /** Flagship: the CDC engine end-to-end on sf0.001 — events-as-WAL replayed
    * through LakeTable MERGE commits, returning the final page table.
    */
  def entry(spark: SparkSession): DataFrame =
    MLQueries.queries("q_cdc_lww_table")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ MLQueries.queries ++ FormatQueries.queries ++
      ParserQueries.queries ++ ContextQueries.queries ++ TqlQueries.queries ++
      MiscQueries.queries ++ StreamQueries.queries ++ WebQueries.queries

  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ MLQueries.oracleSql ++ FormatQueries.oracleSql ++
      ParserQueries.oracleSql ++ ContextQueries.oracleSql ++ TqlQueries.oracleSql ++
      MiscQueries.oracleSql ++ StreamQueries.oracleSql ++ WebQueries.oracleSql
}
