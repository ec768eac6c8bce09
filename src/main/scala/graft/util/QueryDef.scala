package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine operator exposed through the driver contract
  * (`graft.SparkEntry.queries` / `oracleSql`).
  *
  * @param name    stable key; becomes the Verify output parquet dir name
  * @param oracle  equivalent ANSI SQL for DuckDB over the same parquet
  *                tables (None → driver falls back to a rows-only check;
  *                those operators get Scala golden/property specs instead)
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  /** Read one driver-generated testdata table (TESTDATA.md). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
