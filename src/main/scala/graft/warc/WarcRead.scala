package graft.warc

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.util.zip.GZIPInputStream

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Dataset, SparkSession}

/** One parsed WARC record. `tsUs` is WARC-Date as epoch microseconds
  * (WARC/1.0 dates are second-granular). */
final case class WarcRecord(
    url: String, tsUs: Long, warcType: String, recordId: String,
    payload: Array[Byte])

/** Distributed WARC scan (ISO 28500) — the web-archive counterpart of
  * [[graft.pbf.PbfRead]], same two-mode design:
  *
  *  - plain `.warc` below [[DistributedScanThreshold]]: the driver
  *    walks the record sequence reading ONLY header blocks (payloads
  *    are seeked over via Content-Length — I/O is O(records · header
  *    bytes)), producing exact (path, offset) pointers that executors
  *    decode in parallel;
  *  - plain `.warc` at/above the threshold: record starts are
  *    rediscovered in parallel block ranges by resyncing on the
  *    `WARC/1.0\r\n` signature, each candidate CHAIN-VALIDATED (its own
  *    record parses AND the following position is EOF or another
  *    well-formed record). A payload embedding two consecutive
  *    well-formed records could alias — the documented residual risk of
  *    any resync scheme over an unframed text container; the `.gz`
  *    layout below is the exact-at-scale form;
  *  - `.warc.gz` (every record its own gzip member — the Common-Crawl
  *    production layout): one task per FILE, streaming member decode.
  *    At 100 TB a crawl ships ~100k ≈1 GB shards, so file-level
  *    parallelism saturates any cluster without in-file splitting; the
  *    multi-member stream is parsed as one concatenated record
  *    sequence.
  */
object WarcRead {

  /** Plain files at least this large index in parallel tasks (sysprop
    * override lets specs exercise the resync path on small files). */
  def DistributedScanThreshold: Long =
    sys.props.get("graft.warc.distScanThreshold").map(_.toLong)
      .getOrElse(256L << 20)

  private[warc] def parseDate(s: String): Long = {
    val i = Instant.parse(s)
    Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
      i.getNano / 1000L)
  }

  // ------------------------------------------------------- stream parse

  /** One CRLF-terminated line; null at clean EOF before any byte. */
  private def readLine(in: InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(96)
    var b = in.read()
    if (b == -1) return null
    while (b != -1 && b != '\n') {
      buf.write(b)
      if (buf.size > 65536) throw new EOFException("WARC header line > 64 KB")
      b = in.read()
    }
    val arr = buf.toByteArray
    if (b == -1 || arr.isEmpty || arr(arr.length - 1) != '\r')
      throw new EOFException("malformed WARC line ending")
    new String(arr, 0, arr.length - 1, UTF_8)
  }

  private def readFully(in: InputStream, n: Long): Array[Byte] = {
    require(n <= Int.MaxValue, s"record payload $n exceeds 2 GiB")
    val out = new Array[Byte](n.toInt)
    var off = 0
    while (off < n) {
      val k = in.read(out, off, n.toInt - off)
      if (k < 0) throw new EOFException("EOF inside WARC payload")
      off += k
    }
    out
  }

  /** Parse ONE record at the stream position; None at clean EOF.
    * Throws on any malformation (corrupt archives fail loudly — an
    * archive is a source of truth, not a best-effort feed). */
  private[warc] def parseRecord(in: InputStream): Option[WarcRecord] = {
    val version = readLine(in)
    if (version == null) return None
    require(version.startsWith("WARC/"), s"not a WARC record: '$version'")
    val h = scala.collection.mutable.Map.empty[String, String]
    var line = readLine(in)
    while (line != null && line.nonEmpty) {
      val i = line.indexOf(':')
      require(i > 0, s"malformed WARC header '$line'")
      h(line.substring(0, i).trim.toLowerCase) = line.substring(i + 1).trim
      line = readLine(in)
    }
    require(line != null, "EOF inside WARC header block")
    val len = h.getOrElse("content-length",
      sys.error("WARC record missing Content-Length")).toLong
    val payload = readFully(in, len)
    require(readLine(in) == "" && readLine(in) == "",
      "missing WARC record terminator")
    Some(WarcRecord(
      url = h.getOrElse("warc-target-uri", ""),
      tsUs = h.get("warc-date").map(parseDate).getOrElse(0L),
      warcType = h.getOrElse("warc-type", ""),
      recordId = h.getOrElse("warc-record-id", ""),
      payload = payload))
  }

  /** All records of one (possibly multi-member gzip) stream. */
  private[warc] def parseAll(in: InputStream): Iterator[WarcRecord] =
    Iterator.continually(parseRecord(in)).takeWhile(_.isDefined).map(_.get)

  // ------------------------------------------------------------ listing

  /** A single file, or the name-sorted `part-*` list of a
    * [[WarcWrite]] directory. Returns (path, length). */
  def partFiles(spark: SparkSession, path: String): Seq[(String, Long)] = {
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    if (!st.isDirectory) Seq((path, st.getLen))
    else {
      val parts = fs.listStatus(p)
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        .sortBy(_.getPath.getName)
      require(parts.nonEmpty, s"no part-* files under WARC directory $path")
      parts.toSeq.map(s => (s.getPath.toString, s.getLen))
    }
  }

  // -------------------------------------------------------- plain index

  /** Driver-side exact index: one buffered sequential pass recording
    * record-start offsets (same I/O as any single reader of the file;
    * files big enough for that to matter take the distributed path). */
  private[warc] def scanOffsets(spark: SparkSession, path: String): Seq[Long] = {
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    val raw = fs.open(p)
    val in = new CountingInputStream(new BufferedInputStream(raw, 1 << 16))
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      var at = in.count
      var more = true
      while (more) {
        parseRecord(in) match { // payload sizes are small per record; a
          // header-only skip variant would matter for GB-sized payloads
          case Some(_) => out += at; at = in.count
          case None => more = false
        }
      }
      out.toSeq
    } finally in.close()
  }

  private[warc] final class CountingInputStream(under: InputStream)
      extends InputStream {
    var count = 0L
    override def read(): Int = {
      val b = under.read(); if (b >= 0) count += 1; b
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val k = under.read(b, off, len); if (k > 0) count += k; k
    }
    override def close(): Unit = under.close()
  }

  // --------------------------------------------------- distributed index

  private val Sig = "WARC/1.0\r\n".getBytes(UTF_8)

  /** Candidate record starts in [from, to) of one file: signature scan
    * + chain validation (this record parses AND the next position is a
    * record start or clean EOF). */
  private[warc] def resyncRange(fs: FileSystem, path: String, from: Long,
      to: Long): Seq[Long] = {
    val in = fs.open(new Path(path))
    try {
      // window covers signatures straddling the range end
      in.seek(from)
      val winLen = (to - from + Sig.length - 1).toInt
      val win = new Array[Byte](winLen)
      var got = 0
      var k = 0
      while (got < winLen && k >= 0) {
        k = in.read(win, got, winLen - got)
        if (k > 0) got += k
      }
      val hits = scala.collection.mutable.ArrayBuffer.empty[Long]
      var i = 0
      while (i <= got - Sig.length) {
        if (win(i) == 'W' && win.startsWith(Sig, i)) {
          val off = from + i
          if (validatesAt(fs, path, off)) hits += off
        }
        i += 1
      }
      hits.toSeq
    } finally in.close()
  }

  private def validatesAt(fs: FileSystem, path: String, off: Long): Boolean = {
    val in = fs.open(new Path(path))
    try {
      in.seek(off)
      val buf = new BufferedInputStream(in, 1 << 16)
      // chain: this record parses AND the next position is a record
      // start or clean EOF
      parseRecord(buf).isDefined &&
        (try { parseRecord(buf); true }
         catch { case scala.util.control.NonFatal(_) => false })
    } catch { case scala.util.control.NonFatal(_) => false }
    finally in.close()
  }

  // ------------------------------------------------------------- reads

  /** All records under `path` (file or part directory; `.warc` plain
    * or `.warc.gz` per-record-member). */
  def records(spark: SparkSession, path: String): Dataset[WarcRecord] = {
    import spark.implicits._
    val files = partFiles(spark, path)
    val (gz, plain) = files.partition(_._1.endsWith(".gz"))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)

    // gz shards: one task per file, streaming multi-member decode
    val gzDs: Dataset[WarcRecord] =
      if (gz.isEmpty) spark.emptyDataset[WarcRecord]
      else spark.createDataset(gz.map(_._1))
        .repartition(gz.size)
        .mapPartitions { paths =>
          paths.flatMap { f =>
            val p = new Path(f)
            val fs = FileSystem.get(p.toUri, conf.value)
            val in = new GZIPInputStream(
              new BufferedInputStream(fs.open(p), 1 << 16), 1 << 16)
            parseAll(in) // iterator fully drained within the task
          }
        }

    // plain shards: exact pointer index (driver walk below the
    // threshold, parallel resync above — the pointer set itself stays
    // distributed; nothing record-proportional ever lands on the driver)
    val ptrDss: Seq[Dataset[(String, Long)]] = plain.map { case (f, len) =>
      if (len < DistributedScanThreshold)
        spark.createDataset(scanOffsets(spark, f).map(o => (f, o)))
      else {
        val step = math.max(1L << 20,
          len / (spark.sparkContext.defaultParallelism * 4L))
        val ranges = (0L until len by step)
          .map(s => (s, math.min(len, s + step)))
        spark.createDataset(ranges).repartition(ranges.size)
          .mapPartitions { rs =>
            val p = new Path(f)
            val fs = FileSystem.get(p.toUri, conf.value)
            rs.flatMap { case (a, b) => resyncRange(fs, f, a, b) }
          }.map(o => (f, o))
      }
    }
    val plainDs: Dataset[WarcRecord] = ptrDss.reduceOption(_ union _)
      .map(_.repartition(spark.sparkContext.defaultParallelism)
        .mapPartitions { it =>
          var curPath: String = null
          var fs: FileSystem = null
          it.toSeq.sortBy(x => (x._1, x._2)).iterator.map { case (f, off) =>
            if (f != curPath) {
              curPath = f
              fs = FileSystem.get(new Path(f).toUri, conf.value)
            }
            val in = fs.open(new Path(f))
            try {
              in.seek(off)
              parseRecord(new BufferedInputStream(in, 1 << 16))
                .getOrElse(sys.error(s"empty record at $f:$off"))
            } finally in.close()
          }
        })
      .getOrElse(spark.emptyDataset[WarcRecord])
    gzDs.union(plainDs)
  }
}
