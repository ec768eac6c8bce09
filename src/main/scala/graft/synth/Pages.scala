package graft.synth

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic Common-Crawl-style pages table, exactly the input_hint
  * shape (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING,
  * lang STRING) — FIXTURES.md §3.1. Generated distributively from
  * spark.range with only codegen'd builtins (xxhash64 etc.), so the
  * same (seed, n) always produces identical bytes at any parallelism —
  * no external data, no driver loops.
  *
  * ~70% of pages embed an in-Niue-bbox coordinate in `text` (varied
  * formats, exactly 7 fractional digits so geoparse round-trips the
  * fixed-point value losslessly), ~20% an out-of-bbox coordinate
  * (positive longitudes — Niue is all-negative), ~10% none. */
object Pages {

  // Niue fixture extent (FIXTURES.md §1)
  val LatLo = -193548665L
  val LatHi = -187534559L
  val LonLo = -1701595029L
  val LonHi = -1695647229L

  private def h(seed: Int): Column = abs(xxhash64(col("id"), lit(seed)))

  /** Decimal-string render of a 1e-7 fixed-point value with exactly 7
    * fractional digits (pure integer SQL → byte-stable). */
  private def fp7(c: Column): Column = concat(
    when(c < 0, "-").otherwise(""),
    floor(abs(c) / 10000000L).cast("long").cast("string"), // exact: |c| < 2^53
    lit("."),
    lpad(pmod(abs(c), lit(10000000L)).cast("string"), 7, "0"))

  def generate(spark: SparkSession, n: Long, seed: Int = 42): DataFrame = {
    val base = spark.range(0, n)
      .withColumn("bucket", pmod(h(seed), lit(10)))
      .withColumn("lat7",
        when(col("bucket") < 7, lit(LatLo) + pmod(h(seed + 1), lit(LatHi - LatLo)))
          .when(col("bucket") < 9, lit(100000000L) + pmod(h(seed + 2), lit(500000000L)))
          .otherwise(lit(null).cast("long")))
      .withColumn("lon7",
        when(col("bucket") < 7, lit(LonLo) + pmod(h(seed + 3), lit(LonHi - LonLo)))
          .when(col("bucket") < 9, lit(200000000L) + pmod(h(seed + 4), lit(1400000000L)))
          .otherwise(lit(null).cast("long")))
      .withColumn("fmt", pmod(h(seed + 5), lit(3)))
    base.select(
      concat(lit("https://example.test/p/"), col("id")).as("url"),
      timestamp_seconds(lit(1700000000L) + pmod(h(seed + 6), lit(31536000L))).as("warc_ts"),
      concat(lit("<html><body>page-"), col("id"), lit("-"),
        repeat(lit("x"), 64), lit("</body></html>")).cast("binary").as("html"),
      when(col("lat7").isNull,
        concat(lit("Page "), col("id"), lit(" has no location mention at all.")))
        .when(col("fmt") === 0,
          concat(lit("Page "), col("id"), lit(" is located at "),
            fp7(col("lat7")), lit(", "), fp7(col("lon7")), lit(" on the island.")))
        .when(col("fmt") === 1,
          concat(lit("Geo: lat="), fp7(col("lat7")), lit(" lon="), fp7(col("lon7")),
            lit(" for page "), col("id"), lit(".")))
        .otherwise(
          concat(lit("Visit "), fp7(col("lat7")), lit("; "), fp7(col("lon7")),
            lit(" says page "), col("id"), lit(".")))
        .as("text"),
      element_at(array(lit("en"), lit("niu"), lit("fr")),
        (pmod(h(seed + 7), lit(3)) + 1).cast("int")).as("lang"))
  }
}
