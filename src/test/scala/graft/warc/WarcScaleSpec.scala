package graft.warc

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The plain-WARC distributed path at GENUINE threshold size — no
  * sysprop shrinkage: a ≥256 MB single-part archive goes through the
  * real parallel signature resync (rolling-window ranges, chain
  * validation, per-file extent dedup) and the run-sorted pointer
  * decode, with every record's sha1 digests verified on read. */
class WarcScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("300 MB plain .warc resyncs in parallel, exactly, with bounded opens") {
    val n = 300000L
    val dir = Files.createTempDirectory("warcscale").toString
    // ~1 KB per payload, all distinct → ~390 MB in ONE part file, well
    // above the 256 MB distributed-scan threshold
    val filler = "x" * 990
    val pages = spark.range(n).select(
      concat(lit("https://scale.test/p/"), col("id")).as("url"),
      ((col("id") + 1700000000L) * 1000000L).as("ts_us"),
      concat(lit(filler), col("id")).cast("binary").as("payload"))
      .repartition(1)
    WarcWrite.write(pages, dir)
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).head
    assert(part.length > WarcRead.DistributedScanThreshold,
      s"fixture must exceed the threshold, got ${part.length}")

    val opens0 = WarcRead.decodeOpens.get()
    val got = WarcRead.records(spark, dir)
      .filter(col("warcType") === "response")
      .select(col("url"), expr("decode(payload, 'UTF-8')").as("p"))
    assert(got.count() === n, "resync index finds every record exactly once")
    // content integrity on top of the per-record digest verification:
    // each payload ends with its own id
    val bad = got.filter(!col("p").endsWith(
      regexp_extract(col("url"), "([0-9]+)$", 1))).count()
    assert(bad === 0)
    // run-sorted decode: opens scale with partitions, never records
    val opens = WarcRead.decodeOpens.get() - opens0
    assert(opens <= 64, s"decode opened $opens streams for $n records")
  }
}
