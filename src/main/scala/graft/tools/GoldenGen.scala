package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: regenerate the GeoGolden frozen VALUES oracles. Prints the
  * Scala object body to stdout; paste into GeoGolden.scala. */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def values(q: String, cols: Seq[(String, String)]): String = {
      // string-typed columns must render as quoted SQL literals or the
      // generated VALUES clause is invalid and needs hand-fixing
      def lit(v: Any, sqlType: String): String =
        if (sqlType == "VARCHAR") "'" + v.toString.replace("'", "''") + "'"
        else v.toString
      val rows = graft.SparkEntry.queries(q)(spark, "unused").collect()
        .map(r => "(" + (0 until r.length)
          .map(i => lit(r.get(i), cols(i)._2)).mkString(",") + ")")
        .mkString(",\n| ")
      val colNames = cols.map(_._1).mkString(", ")
      val casts = cols.map { case (n, t) => s"CAST($n AS $t) AS $n" }.mkString(",\n|  ")
      s"""\"\"\"SELECT $casts
         |FROM (VALUES
         | $rows
         |) AS t($colNames)
         |ORDER BY ${cols.head._1}\"\"\".stripMargin"""
    }
    println("=== pageJoinSql ===")
    println(values("q_page_join", Seq("relation_id" -> "BIGINT", "n_pages" -> "BIGINT", "h" -> "BIGINT")))
    println("=== pageKnnSql ===")
    println(values("q_page_knn", Seq("nn_relation_id" -> "BIGINT", "n_pages" -> "BIGINT", "h" -> "BIGINT")))
    println("=== pageTilesSql ===")
    println(values("q_page_tiles", Seq("z" -> "INTEGER", "x" -> "BIGINT", "y" -> "BIGINT", "relation_id" -> "BIGINT", "n_pages" -> "BIGINT")))
    println("=== multimodalSql ===")
    println(values("q_multimodal", Seq("kind" -> "VARCHAR", "n" -> "BIGINT", "h" -> "BIGINT")))
    println("=== adminArea2Sql ===")
    println(values("q_admin_area2", Seq("relation_id" -> "BIGINT", "admin_level" -> "INTEGER", "area2" -> "VARCHAR")))
    println("=== extractSql ===")
    println(values("q_extract", Seq("kind" -> "INTEGER", "n" -> "BIGINT", "h" -> "BIGINT")))
    println("=== adminIncrementalSql ===")
    println(values("q_admin_incremental", Seq("relation_id" -> "BIGINT", "admin_level" -> "INTEGER", "name" -> "VARCHAR", "n_rings" -> "INTEGER", "complete" -> "INTEGER", "area2" -> "VARCHAR")))
    println("=== geoparseSql ===")
    println(values("q_geoparse", Seq("n" -> "BIGINT", "h" -> "BIGINT", "sum_lat7" -> "BIGINT", "sum_lon7" -> "BIGINT")))
    println("=== windowTilesSql ===")
    println(values("q_window_tiles", Seq("n" -> "BIGINT", "h" -> "BIGINT", "sum_pages" -> "BIGINT")))
    spark.stop()
  }
}
