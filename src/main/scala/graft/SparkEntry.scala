package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.util.QueryDef

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All registered operators, one QueryDef per SURVEY.md §2 row. */
  def all: Seq[QueryDef] =
    graft.queries.Relational.defs ++ graft.queries.Geo.defs ++
    graft.queries.TextOps.defs ++ graft.queries.WebText.defs ++
    graft.queries.Similarity.defs ++
    graft.queries.OsmQueries.defs ++ graft.queries.StreamingQueries.defs ++
    graft.queries.MultimodalQueries.defs ++ graft.queries.OscQueries.defs

  /** Flagship: the full north-rule pipeline — fixture admin areas ×
    * synthetic pages → containment join → tiles (rows > 0). */
  def entry(spark: SparkSession): DataFrame =
    queries("q_page_tiles")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
