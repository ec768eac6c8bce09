package graft.warc

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** WARC sink/source: byte round trips on hostile payloads, both
  * layouts, the distributed resync path, and loud corruption. */
class WarcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture: Seq[(String, Long, Array[Byte])] = Seq(
    ("https://a.test/1", 1700000001000000L, "hello world".getBytes(UTF_8)),
    // payload that LOOKS like a record start mid-stream
    ("https://a.test/2", 1700000002000000L,
      "xx\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\nfake".getBytes(UTF_8)),
    // every byte value incl. NUL and 0xff
    ("https://a.test/3", 1700000003000000L, Array.tabulate(256)(_.toByte)),
    // empty payload
    ("https://a.test/4", 1700000004000000L, Array.emptyByteArray),
    ("https://a.test/û5", 1700000005000000L, "ünïcødé".getBytes(UTF_8)))

  private def writeFixture(gzip: Boolean): String = {
    val dir = Files.createTempDirectory("warcspec").toString
    val df = fixture.toDF("url", "ts_us", "payload").repartition(2, col("url"))
    WarcWrite.write(df, dir, gzip)
    dir
  }

  private def readBack(dir: String): Seq[(String, Long, Seq[Byte])] =
    WarcRead.records(spark, dir)
      .filter(col("warcType") === "response")
      .collect().map(r => (r.url, r.tsUs, r.payload.toSeq)).toSeq.sortBy(_._1)

  test("plain .warc round trip is byte-exact on hostile payloads") {
    val got = readBack(writeFixture(gzip = false))
    assert(got === fixture.map(f => (f._1, f._2, f._3.toSeq)).sortBy(_._1))
  }

  test(".warc.gz (per-record gzip member) round trip is byte-exact") {
    val got = readBack(writeFixture(gzip = true))
    assert(got === fixture.map(f => (f._1, f._2, f._3.toSeq)).sortBy(_._1))
  }

  test("every part file opens with a warcinfo record") {
    val dir = writeFixture(gzip = false)
    for (f <- new java.io.File(dir).listFiles()
        if f.getName.startsWith("part-")) {
      val in = new java.io.BufferedInputStream(
        new java.io.FileInputStream(f))
      try {
        val first = WarcRead.parseRecord(in).get
        assert(first.warcType === "warcinfo")
        assert(new String(first.payload, UTF_8).contains("graft-spark"))
      } finally in.close()
    }
  }

  test("distributed resync index equals the driver walk") {
    val dir = writeFixture(gzip = false)
    val seq = readBack(dir)
    val prev = sys.props.put("graft.warc.distScanThreshold", "1")
    try assert(readBack(dir) === seq)
    finally prev match {
      case Some(v) => sys.props.put("graft.warc.distScanThreshold", v)
      case None => sys.props.remove("graft.warc.distScanThreshold")
    }
  }

  test("resync rejects a single embedded well-formed record (chain validation)") {
    // a payload that IS a complete valid record: its start inside the
    // outer payload parses, but the chain step then lands on the outer
    // record's terminator and fails -> candidate rejected. (Two
    // consecutive embedded records could alias - the documented
    // residual risk of resync over an unframed container; the gz
    // layout is the exact form.)
    val inner = WarcWrite.response("https://evil.test/inner",
      1700000009000000L, "inner".getBytes(UTF_8))
    val rows = Seq(
      ("https://a.test/outer", 1700000001000000L, inner),
      ("https://a.test/tail", 1700000002000000L, "tail".getBytes(UTF_8)))
    val dir = Files.createTempDirectory("warcspec").toString
    WarcWrite.write(rows.toDF("url", "ts_us", "payload").coalesce(1), dir)
    val prev = sys.props.put("graft.warc.distScanThreshold", "1")
    try {
      val got = readBack(dir).map(_._1)
      assert(got === Seq("https://a.test/outer", "https://a.test/tail"))
    } finally prev match {
      case Some(v) => sys.props.put("graft.warc.distScanThreshold", v)
      case None => sys.props.remove("graft.warc.distScanThreshold")
    }
  }

  test("WARC-Date truncates to seconds on write and parses back") {
    assert(WarcWrite.formatDate(1700000001999999L) === "2023-11-14T22:13:21Z")
    assert(WarcRead.parseDate("2023-11-14T22:13:21Z") === 1700000001000000L)
    assert(WarcRead.parseDate("2023-11-14T22:13:21.500Z") === 1700000001500000L)
  }

  test("corrupt archive fails loudly (truncated payload)") {
    val dir = Files.createTempDirectory("warcspec")
    val rec = WarcWrite.response("https://a.test/x", 0L, "0123456789".getBytes(UTF_8))
    Files.write(dir.resolve("part-00000.warc"), rec.dropRight(6)) // cut into payload
    val ex = intercept[Exception] {
      WarcRead.records(spark, dir.toString).collect()
    }
    assert(ex.getMessage != null)
  }

  test("record ids are deterministic functions of the url") {
    assert(WarcWrite.recordId("https://a.test/1") ===
      WarcWrite.recordId("https://a.test/1"))
    assert(WarcWrite.recordId("https://a.test/1") !==
      WarcWrite.recordId("https://a.test/2"))
  }
}
