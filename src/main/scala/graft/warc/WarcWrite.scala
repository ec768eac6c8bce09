package graft.warc

import java.io.OutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.util.zip.GZIPOutputStream

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame

/** WARC/1.0 sink (ISO 28500, the web-archive counterpart of the PBF
  * sink): one `part-NNNNN.warc[.gz]` per task, each file opening with a
  * `warcinfo` record then one `response` record per input row, streamed
  * (a task never holds more than one record in memory). Two-phase
  * commit: parts are written under a task-unique staging name and
  * renamed into place only on success, so a re-executed task can never
  * leave a torn file behind; the driver stamps `_SUCCESS` last.
  *
  * The `.gz` form is the Common-Crawl production layout — EVERY record
  * its own gzip member, so member boundaries are also record boundaries
  * and a sequential reader can stream a shard without ever resyncing.
  * Records are fully deterministic (fixed warcinfo date, record IDs a
  * SHA-256 over (target URI, capture time, payload digest) — unique per
  * capture as ISO 28500 requires, yet reproducible at any parallelism),
  * so identical input partitions produce byte-identical files.
  *
  * With `http = true` each payload is framed as a full HTTP/1.1
  * response message (status line + headers + CRLFCRLF + body) and the
  * record's Content-Type becomes `application/http; msgtype=response` —
  * the exact layout real Common-Crawl `response` records use; the
  * reader surfaces the parsed status and body columns.
  *
  * Expected input columns: `url` STRING (no CR/LF — enforced),
  * `ts_us` BIGINT (epoch microseconds; WARC/1.0 dates are
  * second-granular, so sub-second precision is truncated on write —
  * callers that need µs fidelity carry it in their own table, the
  * archive is the byte-of-record store), `payload` BINARY.
  */
object WarcWrite {

  private[warc] val WarcInfoDate = "2000-01-01T00:00:00Z"

  /** Globally unique yet deterministic record ID: SHA-256 over the
    * (url, capture micros, payload digest) triple — recrawls of one URL
    * at different times, or with different bytes, never collide. */
  private[warc] def recordId(url: String, tsUs: Long,
      payload: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(url.getBytes(UTF_8))
    md.update(0.toByte)
    md.update(java.nio.ByteBuffer.allocate(8).putLong(tsUs).array())
    md.update(java.security.MessageDigest.getInstance("SHA-256").digest(payload))
    val h = md.digest().take(8).map("%02x".format(_)).mkString
    s"<urn:graft:$h>"
  }

  private[warc] def formatDate(tsUs: Long): String =
    Instant.ofEpochSecond(Math.floorDiv(tsUs, 1000000L)).toString

  /** `sha1:<base32>` content digest — the exact Common-Crawl spelling
    * (RFC 4648 upper-case base32; SHA-1's 160 bits are 32 characters,
    * no padding). */
  private[warc] def sha1Digest(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1").digest(bytes)
    val alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val sb = new StringBuilder(32)
    var acc = 0L
    var bits = 0
    for (b <- d) {
      acc = (acc << 8) | (b & 0xffL); bits += 8
      while (bits >= 5) { bits -= 5; sb.append(alpha(((acc >> bits) & 31).toInt)) }
    }
    "sha1:" + sb.toString
  }

  private def headerBlock(kv: Seq[(String, String)], contentLength: Int): Array[Byte] = {
    val sb = new StringBuilder("WARC/1.0\r\n")
    for ((k, v) <- kv) {
      require(!v.exists(c => c == '\r' || c == '\n'), s"CR/LF in WARC header $k")
      sb.append(k).append(": ").append(v).append("\r\n")
    }
    sb.append("Content-Length: ").append(contentLength).append("\r\n\r\n")
    sb.toString.getBytes(UTF_8)
  }

  /** One serialized record: header block + payload + 2×CRLF. */
  private[warc] def encodeRecord(warcType: String, headers: Seq[(String, String)],
      payload: Array[Byte]): Array[Byte] = {
    val head = headerBlock(("WARC-Type" -> warcType) +: headers, payload.length)
    val out = new java.io.ByteArrayOutputStream(head.length + payload.length + 4)
    out.write(head); out.write(payload); out.write("\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  private def warcinfo(): Array[Byte] = {
    val body = "software: graft-spark\r\nformat: WARC File Format 1.0\r\n"
      .getBytes(UTF_8)
    encodeRecord("warcinfo", Seq(
      "WARC-Record-ID" -> "<urn:graft:warcinfo>",
      "WARC-Date" -> WarcInfoDate,
      "Content-Type" -> "application/warc-fields"), body)
  }

  /** Deterministic HTTP/1.1 response framing around a body. */
  private[warc] def httpWrap(body: Array[Byte]): Array[Byte] = {
    val head = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8)
    val out = new Array[Byte](head.length + body.length)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(body, 0, out, head.length, body.length)
    out
  }

  private[warc] def response(url: String, tsUs: Long, payload: Array[Byte],
      http: Boolean = false): Array[Byte] = {
    require(!url.exists(c => c == '\r' || c == '\n'), s"CR/LF in URI: $url")
    val (ctype, block) =
      if (http) ("application/http; msgtype=response", httpWrap(payload))
      else ("application/octet-stream", payload)
    encodeRecord("response", Seq(
      "WARC-Record-ID" -> recordId(url, tsUs, payload),
      "WARC-Date" -> formatDate(tsUs),
      "WARC-Target-URI" -> url,
      // CC convention: block digest over the record block, payload
      // digest over the HTTP body (= the original payload)
      "WARC-Block-Digest" -> sha1Digest(block),
      "WARC-Payload-Digest" -> sha1Digest(payload),
      "Content-Type" -> ctype), block)
  }

  /** Each record compressed as its OWN gzip member (CC layout); plain
    * records pass through. */
  private def emit(out: OutputStream, rec: Array[Byte], gzip: Boolean): Unit =
    if (!gzip) out.write(rec)
    else {
      val gz = new GZIPOutputStream(out, 8192)
      gz.write(rec); gz.finish() // finish, NOT close: keep the part stream open
    }

  /** Write `pages` (url, ts_us, payload) as a WARC part directory.
    * `http = true` frames every payload as an HTTP/1.1 response message
    * (the real Common-Crawl `response` layout). */
  def write(pages: DataFrame, outDir: String, gzip: Boolean = false,
      http: Boolean = false): Unit = {
    val spark = pages.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val ext = if (gzip) "warc.gz" else "warc"
    val rows = pages.selectExpr("url", "ts_us", "payload")
    rows.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      val pid = TaskContext.getPartitionId()
      val attempt = TaskContext.get().taskAttemptId()
      val dir = new Path(outDir)
      val fs = FileSystem.get(dir.toUri, conf.value)
      fs.mkdirs(dir)
      val tmp = new Path(dir, s"_tmp-$pid-$attempt")
      val out = fs.create(tmp, true)
      try {
        emit(out, warcinfo(), gzip)
        for (r <- it)
          emit(out, response(r.getString(0), r.getLong(1),
            r.getAs[Array[Byte]](2), http), gzip)
      } finally out.close()
      val dst = new Path(dir, f"part-$pid%05d.$ext")
      fs.delete(dst, false)
      require(fs.rename(tmp, dst), s"commit rename failed for $dst")
    }
    val dir = new Path(outDir)
    val fs = FileSystem.get(dir.toUri, spark.sparkContext.hadoopConfiguration)
    fs.create(new Path(dir, "_SUCCESS"), true).close()
  }
}
