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

  private def withResync[T](body: => T): T = {
    val prev = sys.props.put("graft.warc.distScanThreshold", "1")
    try body
    finally prev match {
      case Some(v) => sys.props.put("graft.warc.distScanThreshold", v)
      case None => sys.props.remove("graft.warc.distScanThreshold")
    }
  }

  test("resync rejects a single embedded well-formed record (chain validation)") {
    // a payload that IS a complete valid record: its start inside the
    // outer payload parses, but the chain step then lands on the outer
    // record's terminator and fails -> candidate rejected.
    val inner = WarcWrite.response("https://evil.test/inner",
      1700000009000000L, "inner".getBytes(UTF_8))
    val rows = Seq(
      ("https://a.test/outer", 1700000001000000L, inner),
      ("https://a.test/tail", 1700000002000000L, "tail".getBytes(UTF_8)))
    val dir = Files.createTempDirectory("warcspec").toString
    WarcWrite.write(rows.toDF("url", "ts_us", "payload").coalesce(1), dir)
    withResync {
      val got = readBack(dir).map(_._1)
      assert(got === Seq("https://a.test/outer", "https://a.test/tail"))
    }
  }

  test("resync is exact on TWO consecutive embedded records (extent dedup)") {
    // two complete back-to-back valid records inside one payload: the
    // first embedded start chain-validates (its next position is the
    // second embedded record), which used to alias. The per-file extent
    // dedup drops both because they start inside the outer record's
    // kept extent.
    val inner1 = WarcWrite.response("https://evil.test/in1",
      1700000008000000L, "in1".getBytes(UTF_8))
    val inner2 = WarcWrite.response("https://evil.test/in2",
      1700000009000000L, "in2".getBytes(UTF_8))
    val rows = Seq(
      ("https://a.test/outer", 1700000001000000L, inner1 ++ inner2),
      ("https://a.test/tail", 1700000002000000L, "tail".getBytes(UTF_8)))
    val dir = Files.createTempDirectory("warcspec").toString
    WarcWrite.write(rows.toDF("url", "ts_us", "payload").coalesce(1), dir)
    withResync {
      val got = readBack(dir)
      assert(got.map(_._1) === Seq("https://a.test/outer", "https://a.test/tail"))
      assert(got.head._3 === (inner1 ++ inner2).toSeq) // payload byte-exact
    }
  }

  test("resync chain-carry: range-spanning records and cross-range " +
      "embedded records stay exact") {
    // 64 KB ranges force the distributed dedup's hard cases on a small
    // fixture: a ~200 KB record spans >3 whole ranges (pass-through
    // carries), and complete well-formed records embedded 100 KB into
    // its payload land in DIFFERENT ranges than the outer record's
    // start — the driver carry must skip them from another range
    val stepPrev = sys.props.put("graft.warc.maxResyncStep", "65536")
    try withResync {
      val filler = Array.fill[Byte](100000)('f'.toByte)
      val inner1 = WarcWrite.response("https://evil.test/in1",
        1700000008000000L, "in1".getBytes(UTF_8))
      val inner2 = WarcWrite.response("https://evil.test/in2",
        1700000009000000L, "in2".getBytes(UTF_8))
      val big = filler ++ inner1 ++ inner2 ++ filler
      val rows = Seq(
        ("https://a.test/head", 1700000001000000L, "head".getBytes(UTF_8)),
        ("https://a.test/big", 1700000002000000L, big),
        ("https://a.test/tail", 1700000003000000L, "tail".getBytes(UTF_8)))
      val dir = Files.createTempDirectory("warcspec").toString
      WarcWrite.write(rows.toDF("url", "ts_us", "payload").coalesce(1), dir)
      val got = readBack(dir)
      assert(got.map(_._1) === Seq("https://a.test/big",
        "https://a.test/head", "https://a.test/tail"))
      assert(got.find(_._1.endsWith("big")).get._3 === big.toSeq)
    } finally stepPrev match {
      case Some(v) => sys.props.put("graft.warc.maxResyncStep", v)
      case None => sys.props.remove("graft.warc.maxResyncStep")
    }
  }

  test("resync carry-window overflow degrades to the exact " +
      "single-partition sort with an identical index") {
    // force the fallback (window cap 1 row) on a multi-range archive
    // with adversarial embedded records: both dedup paths must keep
    // exactly the true record sequence
    val inner = WarcWrite.response("https://evil.test/in",
      1700000008000000L, "in".getBytes(UTF_8))
    val rows = Seq(
      ("https://a.test/outer", 1700000001000000L,
        Array.fill[Byte](80000)('f'.toByte) ++ inner),
      ("https://a.test/tail", 1700000002000000L, "tail".getBytes(UTF_8)))
    val dir = Files.createTempDirectory("warcspec").toString
    WarcWrite.write(rows.toDF("url", "ts_us", "payload").coalesce(1), dir)
    def props(kv: (String, String)*)(body: => Seq[String]): Seq[String] = {
      val prev = kv.map { case (k, v) => (k, sys.props.put(k, v)) }
      try body
      finally prev.foreach {
        case (k, Some(v)) => sys.props.put(k, v)
        case (k, None) => sys.props.remove(k)
      }
    }
    val viaChain = props("graft.warc.distScanThreshold" -> "1",
      "graft.warc.maxResyncStep" -> "65536")(readBack(dir).map(_._1))
    val viaSort = props("graft.warc.distScanThreshold" -> "1",
      "graft.warc.maxResyncStep" -> "65536",
      "graft.warc.maxCarryWindowRows" -> "1")(readBack(dir).map(_._1))
    assert(viaChain === Seq("https://a.test/outer", "https://a.test/tail"))
    assert(viaSort === viaChain, "fallback path must index identically")
  }

  test("pointer decode opens one stream per file-run, not per record") {
    val n = 200
    val df = (0 until n)
      .map(i => (f"https://run.test/$i%04d", 1700000000000000L + i,
        s"payload $i".getBytes(UTF_8)))
      .toDF("url", "ts_us", "payload").coalesce(1)
    val dir = Files.createTempDirectory("warcspec").toString
    WarcWrite.write(df, dir)
    WarcRead.decodeOpens.set(0L)
    val got = readBack(dir)
    assert(got.size === n)
    val opens = WarcRead.decodeOpens.get()
    // bounded by decode partitions (each holds one contiguous run of
    // ONE file), never by record count
    assert(opens >= 1L && opens <= spark.sparkContext.defaultParallelism.toLong,
      s"decode opened $opens streams for $n records")
  }

  test("http framing: status/body parsed, archive stays byte-exact") {
    val body = "<html><body>hëllo</body></html>".getBytes(UTF_8)
    val dir = Files.createTempDirectory("warcspec").toString
    WarcWrite.write(Seq(("https://h.test/1", 1700000001000000L, body))
      .toDF("url", "ts_us", "payload").coalesce(1), dir, gzip = false, http = true)
    val r = WarcRead.records(spark, dir)
      .filter(col("warcType") === "response").collect().head
    assert(r.contentType === "application/http; msgtype=response")
    assert(r.httpStatus === 200)
    assert(r.body.toSeq === body.toSeq)
    val full = new String(r.payload, UTF_8)
    assert(full.startsWith("HTTP/1.1 200 OK\r\n"))
    assert(full.contains(s"Content-Length: ${body.length}\r\n"))
  }

  test("http framing: folded (obs-fold) header lines are rejected loudly") {
    val msg = ("HTTP/1.1 200 OK\r\nX-Long: part one\r\n continued\r\n\r\nbody")
      .getBytes(UTF_8)
    val rec = WarcWrite.encodeRecord("response", Seq(
      "WARC-Record-ID" -> "<urn:graft:folded>",
      "WARC-Date" -> "2023-11-14T22:13:21Z",
      "WARC-Target-URI" -> "https://h.test/folded",
      "Content-Type" -> "application/http; msgtype=response"), msg)
    val in = new java.io.ByteArrayInputStream(rec)
    val ex = intercept[IllegalArgumentException](WarcRead.parseRecord(in))
    assert(ex.getMessage.contains("folded"))
  }

  test("http framing: request messages parse with status 0") {
    val msg = "GET /x HTTP/1.1\r\nHost: h.test\r\n\r\n".getBytes(UTF_8)
    val rec = WarcWrite.encodeRecord("request", Seq(
      "WARC-Record-ID" -> "<urn:graft:req>",
      "WARC-Date" -> "2023-11-14T22:13:21Z",
      "WARC-Target-URI" -> "https://h.test/x",
      "Content-Type" -> "application/http; msgtype=request"), msg)
    val r = WarcRead.parseRecord(new java.io.ByteArrayInputStream(rec)).get
    assert(r.httpStatus === 0)
    assert(r.body.isEmpty) // body after CRLFCRLF is empty for this GET
  }

  test("non-HTTP records pass through untouched (body aliases payload)") {
    val payload = "raw resource bytes \r\n\r\n not http".getBytes(UTF_8)
    val rec = WarcWrite.encodeRecord("resource", Seq(
      "WARC-Record-ID" -> "<urn:graft:res>",
      "WARC-Date" -> "2023-11-14T22:13:21Z",
      "WARC-Target-URI" -> "https://h.test/res",
      "Content-Type" -> "application/octet-stream"), payload)
    val r = WarcRead.parseRecord(new java.io.ByteArrayInputStream(rec)).get
    assert(r.warcType === "resource")
    assert(r.httpStatus === 0)
    assert(r.body.toSeq === payload.toSeq)
  }

  test("cdx: member walk partitions each .gz file exactly, warcinfo first") {
    val dir = writeFixture(gzip = true)
    for (f <- new java.io.File(dir).listFiles()
        if f.getName.startsWith("part-")) {
      val in = new java.io.BufferedInputStream(new java.io.FileInputStream(f))
      val members = try new WarcRead.GzMemberIter(in).map {
        case (off, len, bytes) => (off, len,
          WarcRead.parseRecord(new java.io.ByteArrayInputStream(bytes))
            .get.warcType)
      }.toSeq finally in.close()
      assert(members.head._1 === 0L)
      assert(members.head._3 === "warcinfo")
      // members tile the file: each starts where the previous ended
      members.sliding(2).foreach {
        case Seq((o1, l1, _), (o2, _, _)) => assert(o1 + l1 === o2)
        case _ =>
      }
      val (lo, ll, _) = members.last
      assert(lo + ll === f.length, "members cover the whole file")
    }
  }

  test("cdx: bounded fetch round-trips every record; wrong bounds fail loudly") {
    val dir = writeFixture(gzip = true)
    val conf = spark.sparkContext.hadoopConfiguration
    val idx = WarcRead.cdxIndex(spark, dir).collect().toSeq
    assert(idx.count(_.warcType == "response") === fixture.size)
    for (e <- idx if e.warcType == "response") {
      val r = WarcRead.fetchMember(conf, e.file, e.offset, e.length)
      assert(r.url === e.url)
      val want = fixture.find(_._1 === e.url).get
      assert(r.payload.toSeq === want._3.toSeq)
    }
    val resp = idx.filter(_.warcType == "response").head
    intercept[Exception] { // off-by-one offset: gzip magic check trips
      WarcRead.fetchMember(conf, resp.file, resp.offset + 1, resp.length)
    }
    intercept[Exception] { // truncated length: deflate body/trailer trips
      WarcRead.fetchMember(conf, resp.file, resp.offset, resp.length - 3)
    }
  }

  test("cdx: member walk handles FEXTRA/FNAME/FCOMMENT header fields (RFC 1952)") {
    // hand-assemble a member with all three optional fields set — our
    // writer never emits them, but foreign archives may
    val payload = "RFC 1952 member".getBytes(UTF_8)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x1f.toByte, 0x8b.toByte, 8, (4 | 8 | 16).toByte,
      0, 0, 0, 0, 0, 0xff.toByte))
    out.write(Array[Byte](3, 0)) // XLEN = 3
    out.write(Array[Byte](1, 2, 3)) // FEXTRA body
    out.write("name.txt".getBytes(UTF_8)); out.write(0) // FNAME
    out.write("a comment".getBytes(UTF_8)); out.write(0) // FCOMMENT
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(payload); d.finish()
    val buf = new Array[Byte](256)
    while (!d.finished()) { val k = d.deflate(buf); out.write(buf, 0, k) }
    d.end()
    def le32(v: Long): Array[Byte] = Array[Byte]((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 24) & 0xff).toByte)
    val crc = new java.util.zip.CRC32(); crc.update(payload)
    out.write(le32(crc.getValue)); out.write(le32(payload.length.toLong))
    val bytes = out.toByteArray
    val it = new WarcRead.GzMemberIter(new java.io.ByteArrayInputStream(bytes))
    val (off, len, dec) = it.next()
    assert(off === 0L && len === bytes.length.toLong)
    assert(new String(dec, UTF_8) === "RFC 1952 member")
    assert(!it.hasNext)
  }

  test("cdx: a flipped payload byte is caught by the member CRC") {
    val dir = writeFixture(gzip = true)
    val conf = spark.sparkContext.hadoopConfiguration
    val e = WarcRead.cdxIndex(spark, dir).collect()
      .filter(_.warcType == "response").maxBy(_.length)
    val f = if (e.file.startsWith("file:"))
      java.nio.file.Paths.get(new java.net.URI(e.file))
    else java.nio.file.Paths.get(e.file)
    val bytes = Files.readAllBytes(f)
    // flip one byte in the middle of the member's deflate body
    val at = (e.offset + e.length / 2).toInt
    bytes(at) = (bytes(at) ^ 0x5a).toByte
    val tampered = Files.createTempFile("warccdx", ".warc.gz")
    Files.write(tampered, bytes)
    val ex = intercept[Exception] {
      WarcRead.fetchMember(conf, tampered.toUri.toString, e.offset, e.length)
    }
    assert(ex.getMessage.matches("(?s).*(CRC|ISIZE|truncated|magic|inflate|invalid).*"),
      s"unexpected failure mode: ${ex.getMessage}")
  }

  test("digests: a flipped payload byte in a PLAIN .warc fails loudly on read") {
    val dir = writeFixture(gzip = false)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).maxBy(_.length)
    val bytes = Files.readAllBytes(f.toPath)
    // find the first response payload ("hello world" or the unicode
    // body) and flip one byte inside it — structure (lengths, CRLFs)
    // stays intact, so before digests this read back silently wrong
    val needle = "hello world".getBytes(UTF_8)
    val at = bytes.indexOfSlice(needle.toSeq)
    val target = if (at >= 0) at else {
      val n2 = "ünïcødé".getBytes(UTF_8)
      bytes.indexOfSlice(n2.toSeq)
    }
    assume(target >= 0, "fixture payload not in this part file")
    bytes(target) = (bytes(target) ^ 0x01).toByte
    Files.write(f.toPath, bytes)
    // drop Hadoop LocalFileSystem's .crc sidecar so the WARC-level
    // digest (not the transport checksum) is what catches the flip —
    // mirrors a DFS whose block checksums were computed AFTER the
    // corruption (e.g. a bad upload)
    new java.io.File(f.getParentFile, s".${f.getName}.crc").delete()
    // below the distributed threshold the driver's pointer walk parses
    // records, so the digest failure fires at plan time — either way
    // the read is loud, never silently wrong bytes
    val ex = intercept[Exception] {
      WarcRead.records(spark, dir).collect()
    }
    def digesty(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("Digest mismatch")) ||
        digesty(t.getCause))
    assert(digesty(ex), s"unexpected failure: $ex")
  }

  test("digests: sha1 base32 spelling matches the RFC 4648 vector") {
    // RFC 4648 test vector alphabet check via a known value:
    // sha1("") = da39a3ee5e6b4b0d3255bfef95601890afd80709
    // base32 of those 20 bytes = 3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ
    assert(WarcWrite.sha1Digest(Array.emptyByteArray) ===
      "sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ")
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

  test("resync chain validation is structural: a semantically-broken " +
      "http record stays in the index and fails loudly at DECODE") {
    // an application/http record whose payload has no header/body
    // CRLFCRLF split (a truncated capture — WARC-Truncated territory).
    // Structurally the WARC framing is perfect, so resync must keep it
    // (and its predecessor, whose chain step parses it) in the index;
    // the semantic malformation then fails LOUDLY at decode — it must
    // never silently shrink the index, which is what a semantic check
    // inside chain validation would do.
    val good1 = WarcWrite.response("https://a.test/ok1",
      1700000001000000L, "ok one".getBytes(UTF_8))
    val bad = WarcWrite.encodeRecord("response", Seq(
      "WARC-Record-ID" -> "<urn:graft:truncated>",
      "WARC-Date" -> "2023-11-14T22:13:21Z",
      "WARC-Target-URI" -> "https://a.test/bad",
      "Content-Type" -> "application/http; msgtype=response"),
      "HTTP/1.1 200 OK\r\nX-Truncated: mid-head".getBytes(UTF_8))
    val good2 = WarcWrite.response("https://a.test/ok2",
      1700000002000000L, "ok two".getBytes(UTF_8))
    val dir = Files.createTempDirectory("warcspec")
    Files.write(dir.resolve("part-00000.warc"), good1 ++ bad ++ good2)
    withResync {
      // the resync index itself must hold all three records: with the
      // threshold at 1 byte this file takes the distributed path, and
      // structural-only validation accepts the truncated-http record
      val ex = intercept[Exception] {
        WarcRead.records(spark, dir.toString).collect()
      }
      def crlf(t: Throwable): Boolean = t != null &&
        (Option(t.getMessage).exists(_.contains("CRLFCRLF")) || crlf(t.getCause))
      assert(crlf(ex), s"expected the splitHttp failure at decode, got: $ex")
    }
  }

  test("structural parse accepts what full decode rejects (http split, date)") {
    val truncHttp = WarcWrite.encodeRecord("response", Seq(
      "WARC-Record-ID" -> "<urn:graft:t1>",
      "WARC-Date" -> "2023-11-14T22:13:21Z",
      "WARC-Target-URI" -> "https://a.test/t1",
      "Content-Type" -> "application/http; msgtype=response"),
      "HTTP/1.1 200 OK\r\nX: no body split".getBytes(UTF_8))
    assert(WarcRead.parseRecord(new java.io.ByteArrayInputStream(truncHttp),
      structuralOnly = true).isDefined)
    intercept[Exception](
      WarcRead.parseRecord(new java.io.ByteArrayInputStream(truncHttp)))
    val badDate = WarcWrite.encodeRecord("resource", Seq(
      "WARC-Record-ID" -> "<urn:graft:t2>",
      "WARC-Date" -> "not-a-timestamp",
      "WARC-Target-URI" -> "https://a.test/t2",
      "Content-Type" -> "application/octet-stream"),
      "x".getBytes(UTF_8))
    assert(WarcRead.parseRecord(new java.io.ByteArrayInputStream(badDate),
      structuralOnly = true).isDefined)
    intercept[Exception](
      WarcRead.parseRecord(new java.io.ByteArrayInputStream(badDate)))
  }

  test("cdx: a member packing two records is rejected loudly") {
    val r1 = WarcWrite.response("https://a.test/m1", 1700000001000000L,
      "first".getBytes(UTF_8))
    val r2 = WarcWrite.response("https://a.test/m2", 1700000002000000L,
      "second".getBytes(UTF_8))
    val dir = Files.createTempDirectory("warcspec")
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(r1); gz.write(r2); gz.close() // ONE member, two records
    Files.write(dir.resolve("part-00000.warc.gz"), out.toByteArray)
    val ex = intercept[Exception] {
      WarcRead.cdxIndex(spark, dir.toString).collect()
    }
    def msg(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("one-record-per-member")) ||
        msg(t.getCause))
    assert(msg(ex), s"expected the one-record-per-member failure, got: $ex")
    // records() (which has no per-member addressing contract) still
    // reads both fine
    val urls = WarcRead.records(spark, dir.toString).collect()
      .map(_.url).sorted.toSeq
    assert(urls === Seq("https://a.test/m1", "https://a.test/m2"))
  }

  test("cdx: surt keys follow the CC spelling") {
    assert(WarcRead.surtKey("https://www.Example.COM/Path/Page?Q=1#frag")
      === "com,example,www)/path/page?q=1")
    assert(WarcRead.surtKey("http://a.b.test:8080/x") === "test,b,a:8080)/x")
    assert(WarcRead.surtKey("https://host.test") === "test,host)/")
    assert(WarcRead.surtKey("http://user@host.test:80/y") === "test,host)/y")
    assert(WarcRead.surtKey("https://host.test:443/z") === "test,host)/z")
  }

  test("cdx: index is globally surt-sorted; prefix lookup fetches a " +
      "bounded range through parquet pushdown") {
    val dir = writeFixture(gzip = true)
    val idx = WarcRead.cdxIndex(spark, dir)
    // global order: per-partition key runs, concatenated in partition
    // order, must equal the fully sorted key sequence
    val runs = idx.rdd.mapPartitionsWithIndex { (i, it) =>
      Iterator.single((i, it.map(e => (e.surt, e.tsUs)).toSeq))
    }.collect().sortBy(_._1).flatMap(_._2).toSeq
    assert(runs === runs.sorted, "index parts are not globally surt-ordered")
    // persist → prefix lookup → bounded fetch round trip
    val out = Files.createTempDirectory("cdxidx").resolve("idx").toString
    idx.write.parquet(out)
    import spark.implicits._
    val back = spark.read.parquet(out).as[WarcRead.CdxEntry]
    val hits = WarcRead.cdxLookup(back, "test,a)/").collect()
      .filter(_.warcType == "response")
    assert(hits.map(_.url).sorted.toSeq === fixture.map(_._1).sorted)
    // the StartsWith predicate reaches the parquet scan
    val plan = WarcRead.cdxLookup(back, "test,a)/")
      .queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters") && plan.contains("StartsWith"),
      s"prefix filter not pushed:\n$plan")
    val conf = spark.sparkContext.hadoopConfiguration
    for (e <- hits) {
      val r = WarcRead.fetchMember(conf, e.file, e.offset, e.length)
      val want = fixture.find(_._1 === e.url).get
      assert(r.payload.toSeq === want._3.toSeq)
    }
    // a prefix outside the host matches nothing
    assert(WarcRead.cdxLookup(back, "test,zzz)/").isEmpty)
  }

  test("cdx: fetchMember rejects out-of-range lengths before allocating") {
    val conf = spark.sparkContext.hadoopConfiguration
    val e1 = intercept[IllegalArgumentException](
      WarcRead.fetchMember(conf, "file:/nope.warc.gz", 0L, 0L))
    assert(e1.getMessage.contains("out of bounds"))
    val e2 = intercept[IllegalArgumentException](
      WarcRead.fetchMember(conf, "file:/nope.warc.gz", 0L, Int.MaxValue + 1L))
    assert(e2.getMessage.contains("out of bounds"))
  }

  test("record ids are deterministic AND unique per (url, ts, payload)") {
    val p = "x".getBytes(UTF_8)
    assert(WarcWrite.recordId("https://a.test/1", 1L, p) ===
      WarcWrite.recordId("https://a.test/1", 1L, p))
    // recrawl of the same URL at a different time → different ID
    assert(WarcWrite.recordId("https://a.test/1", 1L, p) !==
      WarcWrite.recordId("https://a.test/1", 2L, p))
    // same URL+time, different bytes → different ID
    assert(WarcWrite.recordId("https://a.test/1", 1L, p) !==
      WarcWrite.recordId("https://a.test/1", 1L, "y".getBytes(UTF_8)))
    assert(WarcWrite.recordId("https://a.test/1", 1L, p) !==
      WarcWrite.recordId("https://a.test/2", 1L, p))
  }
}
