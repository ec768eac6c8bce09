package graft.warc

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.util.concurrent.atomic.AtomicLong
import java.util.zip.GZIPInputStream

import org.apache.hadoop.fs.{FSDataInputStream, FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, lit, max}

/** One parsed WARC record. `tsUs` is WARC-Date as epoch microseconds
  * (WARC/1.0 dates are second-granular). `payload` is the raw record
  * block exactly as archived; for `application/http` records (the
  * Common-Crawl production framing, where the block is a full HTTP
  * message) `httpStatus` carries the parsed status code (0 for HTTP
  * requests and for non-HTTP records) and `body` the bytes after the
  * header/body CRLFCRLF split — for every other record `body` aliases
  * `payload` and downstream code can always extract from `body`. */
final case class WarcRecord(
    url: String, tsUs: Long, warcType: String, recordId: String,
    contentType: String, httpStatus: Int,
    payload: Array[Byte], body: Array[Byte])

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
  *    record parses structurally AND the following position is EOF or
  *    another well-formed record), then EXTENT-DEDUPED distributedly
  *    (see [[resyncOffsets]]): candidates stay in their scan ranges,
  *    each range precomputes its chain exits, and the driver carries
  *    the kept chain across range boundaries through tiny boundary
  *    windows — no shuffle, no per-file single-task sort. Because
  *    every false candidate lies inside some true record's payload and
  *    every true start chain-validates, the kept set is exactly the
  *    true record sequence — the resync index is EXACT for arbitrary
  *    payloads (including payloads that embed complete well-formed
  *    records) — and the carry chain doubles as end-to-end validation
  *    (it must land exactly on EOF). The gz layout below stays the
  *    preferred form at extreme scale because it needs no scan at all;
  *  - `.warc.gz` (every record its own gzip member — the Common-Crawl
  *    production layout): one task per FILE, streaming member decode.
  *    At 100 TB a crawl ships ~100k ≈1 GB shards, so file-level
  *    parallelism saturates any cluster without in-file splitting; the
  *    multi-member stream is parsed as one concatenated record
  *    sequence.
  *
  * Pointer decode opens ONE stream per (file, consecutive pointer run)
  * — pointers are range-partitioned and sorted, so a partition's
  * records are decoded sequentially off a single readahead stream,
  * seeking only across gaps (never one open per record — on a DFS that
  * would be a namenode request storm).
  */
object WarcRead {

  /** Plain files at least this large index in parallel tasks (sysprop
    * override lets specs exercise the resync path on small files). */
  def DistributedScanThreshold: Long =
    sys.props.get("graft.warc.distScanThreshold").map(_.toLong)
      .getOrElse(256L << 20)

  /** Per-JVM count of filesystem opens performed by the plain-pointer
    * DECODE phase (test instrumentation: specs assert opens scale with
    * file-runs, not records; meaningful in local mode where executors
    * share the JVM). */
  private[warc] val decodeOpens = new AtomicLong(0L)

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

  private val HttpStatusRe = """^HTTP/\d\.\d (\d{3})""".r

  /** Split an `application/http` record block into (status, body) at
    * the first CRLFCRLF (RFC 7230 message framing). Status is the
    * 3-digit response code, or 0 for a request message; obs-fold
    * (continuation) header lines are rejected loudly — they are
    * deprecated by RFC 7230 and silently merging them would corrupt
    * byte-exact re-archiving. */
  private[warc] def splitHttp(payload: Array[Byte]): (Int, Array[Byte]) = {
    var at = -1
    var i = 0
    while (at < 0 && i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n') at = i
      i += 1
    }
    require(at >= 0, "application/http payload has no header/body CRLFCRLF split")
    val lines = new String(payload, 0, at, UTF_8).split("\r\n", -1)
    val status = HttpStatusRe.findFirstMatchIn(lines(0)) match {
      case Some(m) => m.group(1).toInt
      case None =>
        require(lines(0).contains(" HTTP/"),
          s"not an HTTP message start line: '${lines(0)}'")
        0 // request message (e.g. CC 'request' records)
    }
    for (l <- lines.iterator.drop(1))
      require(l.nonEmpty && l.charAt(0) != ' ' && l.charAt(0) != '\t',
        s"folded HTTP header line rejected (RFC 7230 obs-fold): '$l'")
    (status, java.util.Arrays.copyOfRange(payload, at + 4, payload.length))
  }

  /** Parse ONE record at the stream position; None at clean EOF.
    * Throws on any malformation (corrupt archives fail loudly — an
    * archive is a source of truth, not a best-effort feed). When the
    * record carries `WARC-Block-Digest` / `WARC-Payload-Digest`
    * headers (sha1, the CC convention) they are VERIFIED against the
    * decoded bytes — a flipped payload byte in a plain `.warc` is now
    * as loud as the gz layout's CRC. `verifyDigests = false` /
    * `structuralOnly = true` are used ONLY by resync chain validation,
    * where candidate acceptance must stay a structural property (WARC
    * framing: version line, header syntax, Content-Length, record
    * terminator). SEMANTIC checks — digest verification, HTTP
    * header/body splitting, WARC-Date parsing — are skipped there so a
    * true record with a truncated/folded HTTP payload or a malformed
    * date does not silently vanish from the resync index (taking its
    * predecessor's chain validation with it): it must reach decode and
    * fail THERE, exactly like the gz layout does. */
  private[warc] def parseRecord(in: InputStream,
      verifyDigests: Boolean = true,
      structuralOnly: Boolean = false): Option[WarcRecord] = {
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
    val ctype = h.getOrElse("content-type", "")
    val (status, body) =
      if (!structuralOnly && ctype.startsWith("application/http"))
        splitHttp(payload)
      else (0, payload)
    if (verifyDigests && !structuralOnly) {
      for (want <- h.get("warc-block-digest") if want.startsWith("sha1:"))
        require(graft.warc.WarcWrite.sha1Digest(payload) == want,
          s"WARC-Block-Digest mismatch on record ${h.getOrElse("warc-record-id", "?")}")
      for (want <- h.get("warc-payload-digest") if want.startsWith("sha1:"))
        require(graft.warc.WarcWrite.sha1Digest(body) == want,
          s"WARC-Payload-Digest mismatch on record ${h.getOrElse("warc-record-id", "?")}")
    }
    Some(WarcRecord(
      url = h.getOrElse("warc-target-uri", ""),
      tsUs = if (structuralOnly) 0L
             else h.get("warc-date").map(parseDate).getOrElse(0L),
      warcType = h.getOrElse("warc-type", ""),
      recordId = h.getOrElse("warc-record-id", ""),
      contentType = ctype,
      httpStatus = status,
      payload = payload,
      body = body))
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

  /** Hard per-task range cap: bounds scan time per task independent of
    * file size (a 1 TB plain shard at parallelism 32 would otherwise
    * hand each task ~8 GB ranges). Sysprop override lets specs shrink
    * ranges below record size to drive the carry chain's pass-through
    * and cross-range cases on small fixtures. */
  private def MaxResyncStep: Long =
    sys.props.get("graft.warc.maxResyncStep").map(_.toLong)
      .getOrElse(128L << 20)

  /** Rolling scan-buffer size (the range is streamed through this
    * fixed window — per-task heap is O(1 MB) regardless of range
    * length, never a full-range allocation). */
  private val ScanChunk = 1 << 20

  /** Validated candidate record starts in [from, to) of one file:
    * signature scan with a rolling buffer + chain validation (this
    * record parses AND the next position is a record start or clean
    * EOF). Returns (start, end) extents; one scan stream + one shared
    * validation stream per call — opens never scale with records. */
  private[warc] def resyncRange(fs: FileSystem, path: String, from: Long,
      to: Long): Seq[(Long, Long)] = {
    val in = fs.open(new Path(path))
    val vin = fs.open(new Path(path))
    try {
      in.seek(from)
      val buf = new Array[Byte](ScanChunk + Sig.length - 1)
      var base = from // absolute offset of buf(0)
      var len = 0     // valid bytes in buf
      def fill(): Unit = {
        var k = 0
        while (len < buf.length && k >= 0) {
          k = in.read(buf, len, buf.length - len)
          if (k > 0) len += k
        }
      }
      fill()
      val hits = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var i = 0
      var done = false
      while (!done && base + i < to) {
        if (i > len - Sig.length) {
          if (len < buf.length) done = true // EOF: no full signature left
          else {
            // slide: keep the (Sig-1)-byte overlap, refill the window
            System.arraycopy(buf, len - (Sig.length - 1), buf, 0, Sig.length - 1)
            base += len - (Sig.length - 1)
            len = Sig.length - 1
            i = 0
            fill()
            if (len < Sig.length) done = true
          }
        } else {
          if (buf(i) == 'W' && buf.startsWith(Sig, i)) {
            val off = base + i
            validateEnd(vin, off).foreach(end => hits += ((off, end)))
          }
          i += 1
        }
      }
      hits.toSeq
    } finally { in.close(); vin.close() }
  }

  /** Chain validation on a SHARED seekable stream: parse the candidate
    * record (returning its exclusive end offset), then require the
    * next position to be a well-formed record or clean EOF. */
  private def validateEnd(vin: FSDataInputStream, off: Long): Option[Long] = {
    try {
      vin.seek(off)
      val cnt = new CountingInputStream(new BufferedInputStream(
        new NonClosingStream(vin), 1 << 16))
      if (parseRecord(cnt, structuralOnly = true).isEmpty) return None
      val end = off + cnt.count
      parseRecord(cnt, structuralOnly = true) // next must parse (or clean EOF)
      Some(end)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Guards the shared validation stream from wrapper close(). */
  private final class NonClosingStream(under: InputStream) extends InputStream {
    override def read(): Int = under.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      under.read(b, off, len)
    override def close(): Unit = ()
  }

  /** Per-file extent dedup over chain-validated candidates: an ordered
    * scan keeping a candidate iff it starts at/after the running end of
    * the KEPT chain. Every false candidate lies strictly inside a true
    * record's extent and every true record chain-validates, so the kept
    * set is exactly the true sequence (the dropped candidates' own —
    * possibly lying — extents never poison the chain because only KEPT
    * extents advance it). Retained as the fallback for pathological
    * record-size mixes; [[resyncOffsets]] is the scale path. */
  private[warc] def extentDedup(cands: Iterator[(Long, Long)]): Iterator[Long] = {
    var keptEnd = 0L
    cands.flatMap { case (off, end) =>
      if (off >= keptEnd) { keptEnd = end; Iterator.single(off) }
      else Iterator.empty
    }
  }

  /** Cap on the (rangeId, offset, exit) rows the distributed extent
    * dedup collects for its driver-side carry chain (~32 B each →
    * ≤ 128 MB). Exceeding it means a pathological record-size mix (a
    * near-range-sized record amid tiny ones inflates every range's
    * boundary window); the exact single-partition sort takes over.
    * Sysprop override lets specs force the fallback on small
    * fixtures and assert both paths index-identical. */
  private def MaxCarryWindowRows: Int =
    sys.props.get("graft.warc.maxCarryWindowRows").map(_.toInt)
      .getOrElse(4 << 20)

  /** Distributed exact record index of one huge plain `.warc`: the
    * scale replacement for the old per-file `repartition(1)` sort
    * (a 1 TB shard has ~10^9 candidate pairs — one sorting task was
    * the straggler/spill bottleneck). Exploits WARC CONTIGUITY
    * (records tile the file: each true record ends exactly where the
    * next starts), which makes the kept chain a linked list of exact
    * end→offset hops:
    *
    *  1. per range (parallel): signature resync as before, then each
    *     candidate's chain EXIT — the offset where the hop chain from
    *     it first leaves the range — by one backward O(candidates)
    *     memoization (hops only move forward); a hop landing inside
    *     the range on no candidate marks the chain DEAD (true chains
    *     never die: every true start chain-validates in its range);
    *  2. driver: the carry entering range k is the end of the record
    *     covering the range boundary, so it lies within maxExtent (the
    *     largest candidate extent — an upper bound on the true record
    *     size) of the range start. Collecting only those boundary-
    *     window candidates (tiny for any sane record-size mix), the
    *     driver chains exits across ranges in O(ranges) — and gets
    *     end-to-end validation free: the final carry must equal the
    *     file length, every carry must hit a live candidate, else the
    *     archive is corrupt and the read fails LOUDLY (the old ordered
    *     scan silently resynced past a broken chain);
    *  3. per range (parallel): replay the hop chain from the
    *     broadcast carry over the persisted per-range candidates,
    *     emitting the kept offsets.
    *
    * Shuffle-free (the candidate set stays where it was scanned); the
    * only driver state is the boundary windows. Index construction is
    * eager (two small jobs + the range scan), like the driver walk is
    * for small files. */
  private[warc] def resyncOffsets(spark: SparkSession,
      conf: org.apache.spark.util.SerializableConfiguration,
      f: String, len: Long): Dataset[Long] = {
    import spark.implicits._
    val step = math.min(MaxResyncStep,
      math.max(1L << 20, len / (spark.sparkContext.defaultParallelism * 4L)))
    val nRanges = ((len + step - 1) / step).toInt

    // round 1: candidates + per-candidate chain exits, one task/range
    val cands = spark.createDataset(0 until nRanges)
      .repartition(nRanges)
      .mapPartitions { rids =>
        val p = new Path(f)
        val fs = FileSystem.get(p.toUri, conf.value)
        rids.flatMap { rid =>
          val from = rid.toLong * step
          val to = math.min(len, from + step)
          val hits = resyncRange(fs, f, from, to).toArray // offset-sorted
          val n = hits.length
          val exit = new Array[Long](n)
          val idxByOff = new java.util.HashMap[java.lang.Long, Integer](n * 2)
          var i = 0
          while (i < n) { idxByOff.put(hits(i)._1, i); i += 1 }
          i = n - 1
          while (i >= 0) {
            val e = hits(i)._2
            exit(i) =
              if (e >= to) e
              else {
                val j = idxByOff.get(e)
                if (j == null) -1L else exit(j) // -1 = DEAD
              }
            i -= 1
          }
          (0 until n).iterator
            .map(i => (rid, hits(i)._1, hits(i)._2, exit(i)))
        }
      }
      .persist()

    val maxExtRow = cands.agg(max(col("_3") - col("_2"))).head()
    require(!maxExtRow.isNullAt(0), s"no WARC records found by resync in $f")
    val maxExt = maxExtRow.getLong(0)

    val win = cands
      .filter(col("_2") <= col("_1").cast("long") * lit(step) + lit(maxExt))
      .select(col("_1").as[Int], col("_2").as[Long], col("_4").as[Long])
      .limit(MaxCarryWindowRows + 1)
      .collect()
    if (win.length > MaxCarryWindowRows) {
      // pathological mix: exact fallback, one sorted partition.
      // localCheckpoint materializes the kept offsets so the candidate
      // cache can be freed NOW — without it every later consumer of the
      // returned dataset kept the full (rid, off, end, exit) candidate
      // RDD pinned in the block manager for the session's lifetime
      val kept = cands.select(col("_2").as[Long], col("_3").as[Long])
        .repartition(1).sortWithinPartitions("_1")
        .mapPartitions(extentDedup)
        .localCheckpoint()
      cands.unpersist()
      kept
    } else {
      val winMap = win.map { case (rid, off, exit) => ((rid, off), exit) }.toMap
      val carries = Array.fill(nRanges)(-1L)
      var c = 0L
      var rid = 0
      while (rid < nRanges) {
        val from = rid.toLong * step
        val to = math.min(len, from + step)
        if (c < to) {
          require(c >= from,
            s"resync carry $c fell behind range start $from in $f")
          carries(rid) = c
          val exit = winMap.getOrElse((rid, c), sys.error(
            s"WARC resync chain broken: no record starts at offset $c in $f"))
          require(exit >= 0, s"WARC resync chain broken at offset $c in $f " +
            "(record not followed by a valid record)")
          c = exit
        }
        rid += 1
      }
      require(c == len, s"WARC resync chain ends at offset $c but $f is " +
        s"$len bytes — trailing garbage or truncated final record")
      val bc = spark.sparkContext.broadcast(carries)
      // kept offsets materialize once (8 B/record — a quarter of the
      // candidate rows they replace), then the candidate cache is freed
      // immediately instead of staying pinned for the session
      val kept = cands.mapPartitions { it =>
        it.toArray.groupBy(_._1).iterator.flatMap { case (rid, rs) =>
          val cIn = bc.value(rid)
          if (cIn < 0) Iterator.empty // record spans the whole range
          else {
            val to = math.min(len, (rid.toLong + 1L) * step)
            val m = new java.util.HashMap[java.lang.Long, java.lang.Long](rs.length * 2)
            rs.foreach(r => m.put(r._2, r._3))
            Iterator.unfold(cIn) { cc =>
              if (cc >= to) None
              else {
                val e = m.get(cc)
                require(e != null, s"resync chain lost at offset $cc in $f")
                Some((cc, e.longValue()))
              }
            }
          }
        }
      }.localCheckpoint()
      cands.unpersist()
      kept
    }
  }

  // ----------------------------------------------------------- CDX index

  /** One CDX-style index row: where record `url`@`tsUs` lives inside a
    * `.warc.gz` archive — `offset`/`length` delimit the record's OWN
    * gzip member, so a consumer fetches one page with a single bounded
    * range read + gunzip (the Common-Crawl index contract). `surt` is
    * the index's SORT KEY — [[cdxIndex]] returns the rows globally
    * surt-ordered, so persisted parts serve prefix lookups from a
    * bounded key range. */
  final case class CdxEntry(surt: String, url: String, tsUs: Long,
      warcType: String, file: String, offset: Long, length: Long)

  /** SURT key (Sort-friendly URI Reordering Transform), the CC index
    * spelling: fragment and scheme dropped, userinfo dropped, host
    * label-reversed and comma-joined, default ports (80/443) dropped,
    * then `)` + path?query — the whole key lowercased. Host-grouped
    * lexicographic order is what makes by-domain/by-prefix index
    * queries range scans. */
  def surtKey(url: String): String = {
    val noFrag = url.indexOf('#') match {
      case -1 => url
      case h => url.substring(0, h)
    }
    val rest = noFrag.indexOf("://") match {
      case -1 => noFrag
      case i => noFrag.substring(i + 3)
    }
    val (auth, path) = rest.indexOf('/') match {
      case -1 => (rest, "/")
      case s => (rest.substring(0, s), rest.substring(s))
    }
    val hostPort = (auth.lastIndexOf('@') match {
      case -1 => auth
      case a => auth.substring(a + 1)
    }).toLowerCase(java.util.Locale.ROOT)
    val (host, port) = hostPort.lastIndexOf(':') match {
      case c if c >= 0 && c < hostPort.length - 1 &&
          hostPort.substring(c + 1).forall(_.isDigit) =>
        (hostPort.substring(0, c), hostPort.substring(c + 1))
      case _ => (hostPort, "")
    }
    val revHost = host.split('.').reverse.mkString(",")
    val portSfx = if (port.isEmpty || port == "80" || port == "443") ""
      else ":" + port
    revHost + portSfx + ")" + path.toLowerCase(java.util.Locale.ROOT)
  }

  /** Bounded prefix lookup over a CDX index: rows whose SURT key
    * starts with `surtPrefix` (e.g. `"test,a)/"` for a whole host,
    * `"com,example)/images/"` for a path subtree). Over a
    * parquet-persisted index the StringStartsWith predicate pushes
    * into the scan, and because [[cdxIndex]] output is globally
    * surt-sorted the part/row-group min-max stats confine the read to
    * the matching key range — the serving-side lookup never scans the
    * whole index. */
  def cdxLookup(index: Dataset[CdxEntry], surtPrefix: String)
      : Dataset[CdxEntry] =
    index.filter(col("surt").startsWith(surtPrefix))

  /** Walk the gzip MEMBERS of a multi-member stream, yielding
    * (memberStartOffset, memberCompressedLength, decompressedBytes).
    * Parses gzip framing manually (header flags, deflate body via
    * Inflater, CRC32+ISIZE trailer both VERIFIED) because
    * GZIPInputStream concatenates members without exposing their
    * boundaries — and the boundary IS the index. */
  private[warc] final class GzMemberIter(under: InputStream)
      extends Iterator[(Long, Long, Array[Byte])] {
    private val buf = new Array[Byte](1 << 16)
    private var bufLen = 0
    private var bufPos = 0
    private var absBase = 0L // absolute offset of buf(0)
    private def abs: Long = absBase + bufPos
    /** Ensure ≥ n bytes (n ≤ buf.length) are buffered; false at EOF. */
    private def ensure(n: Int): Boolean = {
      if (bufLen - bufPos >= n) return true
      System.arraycopy(buf, bufPos, buf, 0, bufLen - bufPos)
      absBase += bufPos; bufLen -= bufPos; bufPos = 0
      var k = 0
      while (bufLen < n && k >= 0) {
        k = under.read(buf, bufLen, buf.length - bufLen)
        if (k > 0) bufLen += k
      }
      bufLen - bufPos >= n
    }
    private def skipZeroTerminated(): Unit = {
      var done = false
      while (!done) {
        require(ensure(1), "truncated gzip header string")
        done = buf(bufPos) == 0
        bufPos += 1
      }
    }
    override def hasNext: Boolean = ensure(1)
    override def next(): (Long, Long, Array[Byte]) = {
      val start = abs
      require(ensure(10), "truncated gzip member header")
      require((buf(bufPos) & 0xff) == 0x1f && (buf(bufPos + 1) & 0xff) == 0x8b,
        f"bad gzip magic at offset $start")
      require(buf(bufPos + 2) == 8, "unsupported gzip compression method")
      val flg = buf(bufPos + 3) & 0xff
      bufPos += 10
      if ((flg & 0x04) != 0) { // FEXTRA
        require(ensure(2), "truncated FEXTRA")
        val xlen = (buf(bufPos) & 0xff) | ((buf(bufPos + 1) & 0xff) << 8)
        bufPos += 2
        var left = xlen
        while (left > 0) {
          require(ensure(1), "truncated FEXTRA body")
          val take = math.min(left, bufLen - bufPos)
          bufPos += take; left -= take
        }
      }
      if ((flg & 0x08) != 0) skipZeroTerminated() // FNAME
      if ((flg & 0x10) != 0) skipZeroTerminated() // FCOMMENT
      if ((flg & 0x02) != 0) { require(ensure(2), "truncated FHCRC"); bufPos += 2 }
      val inf = new java.util.zip.Inflater(true)
      val out = new java.io.ByteArrayOutputStream(1 << 16)
      val tmp = new Array[Byte](1 << 16)
      try {
        while (!inf.finished()) {
          if (inf.needsInput()) {
            require(ensure(1), "truncated gzip deflate body")
            inf.setInput(buf, bufPos, bufLen - bufPos)
            bufPos = bufLen // all handed over; reclaimed via getRemaining
          }
          val k = inf.inflate(tmp)
          if (k > 0) out.write(tmp, 0, k)
          else require(!inf.needsDictionary(), "deflate stream needs dictionary")
        }
        bufPos -= inf.getRemaining // give back what deflate didn't consume
      } finally inf.end()
      val bytes = out.toByteArray
      require(ensure(8), "truncated gzip trailer")
      val crc = (buf(bufPos) & 0xffL) | ((buf(bufPos + 1) & 0xffL) << 8) |
        ((buf(bufPos + 2) & 0xffL) << 16) | ((buf(bufPos + 3) & 0xffL) << 24)
      val isize = (buf(bufPos + 4) & 0xffL) | ((buf(bufPos + 5) & 0xffL) << 8) |
        ((buf(bufPos + 6) & 0xffL) << 16) | ((buf(bufPos + 7) & 0xffL) << 24)
      bufPos += 8
      val c = new java.util.zip.CRC32()
      c.update(bytes)
      require(c.getValue == crc, f"gzip member CRC mismatch at offset $start")
      require((bytes.length & 0xffffffffL) == isize,
        f"gzip member ISIZE mismatch at offset $start")
      (start, abs - start, bytes)
    }
  }

  /** Build the CDX index of a `.warc.gz` archive (file or part dir):
    * one row per record with the exact (offset, length) of its OWN gzip
    * member. One sequential pass per shard — exactly how Common Crawl
    * builds its index; at 100 TB the ~100k shards index in parallel,
    * one task each, nothing on the driver. The result is globally
    * SURT-ORDERED (range partitioned + sorted within parts — the CC
    * index contract), so persisting it yields sorted parts that serve
    * [[cdxLookup]] prefix queries from a bounded range; the sort
    * shuffles only the ~60 B index rows, never archive bytes. The raw
    * per-shard index is persisted before the range sort because
    * RangePartitioner's key-sampling job would otherwise recompute its
    * child — i.e. decompress and walk every archive shard TWICE. */
  def cdxIndex(spark: SparkSession, path: String): Dataset[CdxEntry] = {
    import spark.implicits._
    val files = partFiles(spark, path).map(_._1).filter(_.endsWith(".gz"))
    require(files.nonEmpty, s"cdxIndex needs .warc.gz shards under $path")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val raw = spark.createDataset(files).repartition(files.size)
      .mapPartitions { paths =>
        paths.flatMap { f =>
          val p = new Path(f)
          val fs = FileSystem.get(p.toUri, conf.value)
          new GzMemberIter(new BufferedInputStream(fs.open(p), 1 << 16))
            .map { case (off, len, bytes) =>
              val bin = new java.io.ByteArrayInputStream(bytes)
              val r = parseRecord(bin)
                .getOrElse(sys.error(s"empty gzip member at $f:$off"))
              // the CDX contract addresses ONE record per member; a
              // foreign archive that packs several must fail loudly
              // here, not silently drop its trailing records
              require(bin.available() == 0,
                s"gzip member at $f:$off carries ${bin.available()} bytes " +
                  "after its first record — cdxIndex requires the CC " +
                  "one-record-per-member layout (use records() for " +
                  "multi-record-member archives)")
              CdxEntry(surtKey(r.url), r.url, r.tsUs, r.warcType, f, off, len)
            }
        }
      }
      .persist()
    val sorted = raw
      .repartitionByRange(files.size, col("surt"), col("tsUs"))
      .sortWithinPartitions("surt", "tsUs")
      // localCheckpoint materializes the SORTED index (same row count
      // as the raw per-shard index, ~60 B/record) so the raw persist
      // can be freed here instead of leaking one cached RDD per index
      // build into the session's block manager
      .localCheckpoint()
    raw.unpersist()
    sorted
  }

  /** Random-access fetch of ONE record through its CDX entry: a single
    * bounded range read of exactly [offset, offset+length), gunzipped
    * and parsed. Wrong boundaries fail loudly (bad magic / CRC /
    * truncation), so a green fetch PROVES the index is byte-exact. */
  def fetchMember(conf: org.apache.hadoop.conf.Configuration, file: String,
      offset: Long, length: Long): WarcRecord = {
    require(offset >= 0 && length > 0 && length <= Int.MaxValue,
      s"CDX range $file:$offset+$length out of bounds (length must be " +
        "in (0, 2 GiB) — a per-record gzip member never legitimately " +
        "reaches the single-allocation limit)")
    val p = new Path(file)
    val fs = FileSystem.get(p.toUri, conf)
    val in = fs.open(p)
    val raw = try {
      in.seek(offset)
      val b = new Array[Byte](length.toInt)
      in.readFully(b)
      b
    } finally in.close()
    val it = new GzMemberIter(new java.io.ByteArrayInputStream(raw))
    val (_, len, bytes) = it.next()
    require(len == length, s"member at $file:$offset is $len bytes, CDX says $length")
    require(!it.hasNext, s"CDX range $file:$offset+$length spans >1 member")
    val bin = new java.io.ByteArrayInputStream(bytes)
    val rec = parseRecord(bin)
      .getOrElse(sys.error(s"empty record in member $file:$offset"))
    require(bin.available() == 0,
      s"member at $file:$offset packs >1 record — not a CC-layout archive")
    rec
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

    // one open stream per (file, consecutive run): sequential decode,
    // seek only across gaps, close on path change / task end. Input
    // partitions must hold (file, offset)-sorted runs.
    def decodeRuns(ptrs: Dataset[(String, Long)]): Dataset[WarcRecord] =
      ptrs.mapPartitions { it =>
        var curPath: String = null
        var raw: FSDataInputStream = null
        var in: CountingInputStream = null
        var base = 0L // absolute offset where `in` started
        Option(TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => if (raw != null) raw.close()))
        it.map { case (f, off) =>
          if (f != curPath) {
            if (raw != null) raw.close()
            val p = new Path(f)
            raw = FileSystem.get(p.toUri, conf.value).open(p)
            decodeOpens.incrementAndGet()
            curPath = f
            raw.seek(off)
            in = new CountingInputStream(new BufferedInputStream(raw, 1 << 16))
            base = off
          } else if (base + in.count != off) { // gap: seek, rebuild buffer
            raw.seek(off)
            in = new CountingInputStream(new BufferedInputStream(raw, 1 << 16))
            base = off
          }
          parseRecord(in).getOrElse(sys.error(s"empty record at $f:$off"))
        }
      }

    // plain shards: exact pointer index (driver walk below the
    // threshold, parallel resync + extent dedup above — the pointer set
    // itself stays distributed; nothing record-proportional ever lands
    // on the driver)
    val (small, big) = plain.partition(_._2 < DistributedScanThreshold)
    // driver-walked files: the offsets are already sorted, so CONTIGUOUS
    // slices preserve the one-stream-per-run invariant with ZERO
    // exchange — no repartitionByRange (whose key-sampling pass alone
    // re-scanned every pointer partition) and no per-file
    // defaultParallelism-sized empty partitions (the old
    // createDataset-per-file shape put 32 near-empty partitions per
    // small file: 10k small shards would mean 320k empty tasks)
    val smallDs: Option[Dataset[WarcRecord]] = {
      val ptrs = small.flatMap { case (f, _) =>
        scanOffsets(spark, f).map(o => (f, o)) }
      if (ptrs.isEmpty) None
      else {
        val chunk = math.max(256,
          ptrs.size / math.max(1, spark.sparkContext.defaultParallelism) + 1)
        val slices = ptrs.grouped(chunk).toSeq
        Some(decodeRuns(spark.createDataset(
          spark.sparkContext.parallelize(slices, slices.size)
            .flatMap(_.iterator))))
      }
    }
    // resync-indexed files keep the range sort: their kept offsets come
    // out partitioned by scan range, not globally run-sorted
    val bigDs: Option[Dataset[WarcRecord]] = big
      .map { case (f, len) => resyncOffsets(spark, conf, f, len).map(o => (f, o)) }
      .reduceOption(_ union _)
      .map(ds => decodeRuns(
        ds.repartitionByRange(spark.sparkContext.defaultParallelism,
            col("_1"), col("_2"))
          .sortWithinPartitions("_1", "_2")))
    val plainDs: Dataset[WarcRecord] = (smallDs.toSeq ++ bigDs.toSeq)
      .reduceOption(_ union _)
      .getOrElse(spark.emptyDataset[WarcRecord])
    gzDs.union(plainDs)
  }
}
