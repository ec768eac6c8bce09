package graft.pbf

import java.io.ByteArrayOutputStream
import java.util.zip.Deflater

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.{OsmEntity, OsmKind}

/** `.osm.pbf` sink (SURVEY.md A7/E2): global Type_then_ID order via
  * range sort, per-partition block encode (string table, dense-node
  * delta coding, zlib) STREAMED to one part file per task, driver
  * concatenation after the header frame — valid because a PBF file is a
  * plain frame sequence with one leading OSMHeader (format: public
  * osmformat/fileformat protos; reference call site
  * /root/reference/src/lib.rs:177-215).
  *
  * Header fidelity matches the reference's FileInfo
  * (/root/reference/src/lib.rs:177-186): bbox (field 1, nanodegrees),
  * required/optional features, writingprogram (16), source (17), and
  * the osmosis replication fields (32-34). The bbox and the
  * HistoricalInformation feature can be derived from the data DURING
  * the encode pass (per-partition fold, no extra scan). */
object PbfWrite {

  private val BlockSize = 8000

  /** Export header metadata (reference FileInfo analog). `bbox7` is
    * (left, right, top, bottom) in 1e-7°; `historical`/`bbox7` = None →
    * derive from the data during the encode pass. */
  final case class PbfInfo(
      bbox7: Option[(Long, Long, Long, Long)] = None,
      calcBBox: Boolean = false,
      historical: Option[Boolean] = None,
      source: Option[String] = None,
      writingProgram: String = "graft-spark",
      replicationTimestamp: Option[Long] = None, // epoch seconds
      replicationSequence: Option[Long] = None,
      replicationBaseUrl: Option[String] = None)

  /** Per-partition encode stats folded during the streaming write —
    * gives the driver `historical` and the bbox for free:
    * (partition, rows, invisible, minLat, maxLat, minLon, maxLon). */
  private type PartStats = (Int, Long, Long, Long, Long, Long, Long)

  // ---- protobuf wire writer ----
  final class Out {
    val buf = new ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { buf.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      buf.write(v.toInt)
    }
    def zig(v: Long): Unit = varint((v << 1) ^ (v >> 63))
    def key(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def bytes(field: Int, b: Array[Byte]): Unit = {
      key(field, 2); varint(b.length); buf.write(b)
    }
    def str(field: Int, s: String): Unit =
      bytes(field, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def msg(field: Int, m: Out): Unit = bytes(field, m.toArray)
    def packedVarints(field: Int, vs: Iterable[Long]): Unit =
      if (vs.nonEmpty) { val o = new Out; vs.foreach(o.varint); bytes(field, o.toArray) }
    def packedSints(field: Int, vs: Iterable[Long]): Unit =
      if (vs.nonEmpty) { val o = new Out; vs.foreach(o.zig); bytes(field, o.toArray) }
    def int(field: Int, v: Long): Unit = { key(field, 0); varint(v) }
    def sint(field: Int, v: Long): Unit = { key(field, 0); zig(v) }
    def toArray: Array[Byte] = buf.toByteArray
  }

  private def deltas(vs: Seq[Long]): Seq[Long] =
    vs.headOption.toSeq ++ vs.sliding(2).collect { case Seq(a, b) => b - a }

  /** G5 — replication-param defaulting, mirroring the reference's
    * select_replication_params (/root/reference/src/lib.rs:222-253):
    * user-supplied values win; otherwise the timestamp defaults to the
    * snapshot/dump commit time (epoch seconds) and the sequence number
    * to the dump transaction-id analog. */
  def selectReplicationParams(
      userTimestamp: Option[Long], userSequence: Option[Long],
      dumpTimestampMillis: Long, dumpTransactionId: Long): (Long, Long) =
    (userTimestamp.getOrElse(dumpTimestampMillis / 1000),
      userSequence.getOrElse(dumpTransactionId))

  /** G6 — parse a CLI bounding box 'left,bottom,right,top' (degrees,
    * reference /root/reference/src/bin/osm/main.rs:41) into 1e-7°
    * (left, right, top, bottom) as [[PbfInfo.bbox7]] expects. */
  def parseBoundingBox(s: String): (Long, Long, Long, Long) = {
    val parts = s.split(",").map(_.trim)
    require(parts.length == 4,
      s"bounding box must be 'left,bottom,right,top' (got: $s)")
    def f7(v: String): Long =
      (BigDecimal(v) * 10000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
    val (left, bottom, right, top) = (f7(parts(0)), f7(parts(1)), f7(parts(2)), f7(parts(3)))
    require(left >= -1800000000L && right <= 1800000000L && left <= right,
      s"longitude range invalid: $s")
    require(bottom >= -900000000L && top <= 900000000L && bottom <= top,
      s"latitude range invalid: $s")
    (left, right, top, bottom)
  }

  /** One frame: 4-byte BE length + BlobHeader + zlib Blob. The deflate
    * loop grows its buffer until finished() — a fixed len+64 buffer
    * silently truncated incompressible blocks. */
  def frame(blobType: String, payload: Array[Byte]): Array[Byte] = {
    val blob = new Out
    blob.int(2, payload.length)
    val deflater = new Deflater()
    deflater.setInput(payload); deflater.finish()
    var comp = new Array[Byte](payload.length + 64)
    var n = 0
    while (!deflater.finished()) {
      if (n == comp.length) comp = java.util.Arrays.copyOf(comp, comp.length * 2)
      n += deflater.deflate(comp, n, comp.length - n)
    }
    deflater.end()
    blob.bytes(3, java.util.Arrays.copyOf(comp, n))
    val blobBytes = blob.toArray
    val header = new Out
    header.str(1, blobType)
    header.int(3, blobBytes.length)
    val hb = header.toArray
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](
      (hb.length >>> 24).toByte, (hb.length >>> 16).toByte,
      (hb.length >>> 8).toByte, hb.length.toByte))
    out.write(hb); out.write(blobBytes)
    out.toByteArray
  }

  /** OSMHeader frame with resolved metadata. bbox is written in
    * nanodegrees (HeaderBBox sint64 fields left/right/top/bottom),
    * matching the public osmformat.proto and the reference's export. */
  def headerFrame(historical: Boolean,
      bbox7: Option[(Long, Long, Long, Long)] = None,
      source: Option[String] = None,
      writingProgram: String = "graft-spark",
      replicationTimestamp: Option[Long] = None,
      replicationSequence: Option[Long] = None,
      replicationBaseUrl: Option[String] = None): Array[Byte] = {
    val h = new Out
    bbox7.foreach { case (left, right, top, bottom) =>
      val bb = new Out
      bb.sint(1, left * 100)   // 1e-7° → nanodegrees
      bb.sint(2, right * 100)
      bb.sint(3, top * 100)
      bb.sint(4, bottom * 100)
      h.msg(1, bb)
    }
    h.str(4, "OsmSchema-V0.6")
    h.str(4, "DenseNodes")
    if (historical) h.str(4, "HistoricalInformation")
    h.str(5, "Sort.Type_then_ID")
    h.str(16, writingProgram)
    source.foreach(s => h.str(17, s))
    replicationTimestamp.foreach(t => h.int(32, t))
    replicationSequence.foreach(s => h.int(33, s))
    replicationBaseUrl.foreach(u => h.str(34, u))
    frame("OSMHeader", h.toArray)
  }

  /** Encode one block of same-kind entities into an OSMData frame. */
  def encodeBlock(entities: Seq[OsmEntity]): Array[Byte] = {
    val strings = scala.collection.mutable.LinkedHashMap[String, Int]("" -> 0)
    def sid(s: String): Int = strings.getOrElseUpdate(s, strings.size)
    val group = new Out
    entities.head.kind match {
      case OsmKind.Node =>
        val dense = new Out
        dense.packedSints(1, deltas(entities.map(_.id)))
        val info = new Out
        info.packedVarints(1, entities.map(_.version.toLong))
        info.packedSints(2, deltas(entities.map(_.tsMillis / 1000)))
        info.packedSints(3, deltas(entities.map(_.changeset)))
        info.packedSints(4, deltas(entities.map(_.uid.toLong)))
        info.packedSints(5, deltas(entities.map(e => sid(e.user).toLong)))
        if (entities.exists(!_.visible))
          info.packedVarints(6, entities.map(e => if (e.visible) 1L else 0L))
        dense.msg(5, info)
        // deleted node versions legitimately carry no coordinates —
        // encode 0 (the convention other writers use for invisible
        // dense nodes) instead of throwing on lat7=None
        dense.packedSints(8, deltas(entities.map(_.lat7.getOrElse(0L))))
        dense.packedSints(9, deltas(entities.map(_.lon7.getOrElse(0L))))
        if (entities.exists(_.tags.nonEmpty)) {
          val kv = entities.flatMap(e =>
            e.tags.flatMap(t => Seq(sid(t.k).toLong, sid(t.v).toLong)) :+ 0L)
          dense.packedVarints(10, kv)
        }
        group.msg(2, dense)
      case kind =>
        for (e <- entities) {
          val m = new Out
          m.int(1, e.id)
          m.packedVarints(2, e.tags.map(t => sid(t.k).toLong))
          m.packedVarints(3, e.tags.map(t => sid(t.v).toLong))
          val info = new Out
          info.int(1, e.version.toLong)
          info.int(2, e.tsMillis / 1000)
          info.int(3, e.changeset)
          info.int(4, e.uid.toLong)
          info.int(5, sid(e.user).toLong)
          if (!e.visible) info.int(6, 0L)
          m.msg(4, info)
          if (kind == OsmKind.Way) {
            m.packedSints(8, deltas(e.refs))
            group.msg(3, m)
          } else {
            m.packedVarints(8, e.members.map(mm => sid(mm.role).toLong))
            m.packedSints(9, deltas(e.members.map(_.ref)))
            m.packedVarints(10, e.members.map(_.mtype.toLong))
            group.msg(4, m)
          }
        }
    }
    val block = new Out
    val st = new Out
    strings.keys.foreach(s => st.bytes(1,
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    block.msg(1, st)
    block.msg(2, group)
    block.int(17, 100) // granularity: 100 nanodeg == 1e-7°, exact
    block.int(18, 1000) // date_granularity ms
    frame("OSMData", block.toArray)
  }

  /** Write the dataset as PBF. Global Type_then_ID order via
    * repartitionByRange + sortWithinPartitions (one range shuffle);
    * each task STREAMS its encoded frames to its own part file (never
    * buffering the partition — a planet partition would blow the 2 GB
    * array limit), returning a tiny stats row; the driver derives
    * historical/bbox from the stats (no extra scan).
    *
    * DEFAULT OUTPUT IS A DIRECTORY: the header frame lands in
    * `part-00000` and task partition i commits `part-%05d` (i+1) — the
    * PBF format is frame-concatenable, so the ordered part list IS the
    * file and no byte ever passes through the driver. `singleFile =
    * true` additionally concatenates the parts into one `.osm.pbf`
    * through a driver stream for compatibility (a single-threaded
    * ~70 GB pass at planet scale — scale jobs should keep the
    * directory form, which [[PbfRead.read]] consumes natively). */
  def write(spark: SparkSession, ds: Dataset[OsmEntity], path: String,
      partitions: Int = 0, info: PbfInfo = PbfInfo(),
      singleFile: Boolean = false): Unit = {
    import spark.implicits._
    val nPart = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    // part-%05d: name order IS frame order for directory readers, so
    // the width must not roll over (a planet at 64 MB parts is ~10^3)
    require(nPart <= 99998, s"at most 99998 partitions, got $nPart")
    val sorted = ds
      .repartitionByRange(nPart, $"kind", $"id", $"version")
      .sortWithinPartitions($"kind", $"id", $"version")
    // BOTH modes stage parts next door and only touch the destination
    // after every task has succeeded: single-file concatenates the
    // staging parts, directory mode renames the staging dir into place
    // — a failed export leaves the previous output intact either way
    // (round 3 wrote directory parts straight to the final path, so a
    // mid-job failure destroyed the prior output)
    val tmp = path + ".staging"
    val hconfSer = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val bc = spark.sparkContext.broadcast(hconfSer)
    val fs0 = FileSystem.get(new Path(tmp).toUri, hconfSer.value)
    fs0.delete(new Path(tmp), true)
    fs0.mkdirs(new Path(tmp))
    // phase 1 — STAGE (tasks + header + sweep): on failure the staging
    // dir is disposable (destination untouched), so sweep it
    try writeStaged(spark, sorted, path, tmp, bc, info, singleFile)
    catch { case e: Throwable =>
      fs0.delete(new Path(tmp), true) // destination untouched on failure
      throw e
    }
    // phase 2 — COMMIT (clobber destination, rename/concat): from here
    // the staging dir may hold the ONLY copy of the new data, so a
    // failure must NOT delete it (a rename/concat failure after the
    // destination delete would otherwise lose both outputs)
    if (singleFile) {
      // compatibility concat: every byte re-passes through one driver
      // stream — fine for extracts, wrong for planet-scale outputs.
      // Concat lands in a SIBLING temp file first, so a driver crash
      // mid-concat leaves the previous destination intact; the no-output
      // window shrinks to the final delete→rename pair.
      val concatTmp = new Path(path + ".commit")
      fs0.delete(concatTmp, true)
      val out = fs0.create(concatTmp, true)
      val parts = fs0.listStatus(new Path(tmp)).map(_.getPath)
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      for (p <- parts) {
        val in = fs0.open(p)
        val b = new Array[Byte](1 << 20)
        var n = in.read(b)
        while (n > 0) { out.write(b, 0, n); n = in.read(b) }
        in.close()
      }
      out.close()
      fs0.delete(new Path(path), true) // may be a prior directory-form output
      require(fs0.rename(concatTmp, new Path(path)),
        s"commit rename failed; concatenated output preserved at $concatTmp")
      fs0.delete(new Path(tmp), true)
    } else {
      fs0.delete(new Path(path), true)
      require(fs0.rename(new Path(tmp), new Path(path)),
        s"commit rename failed; staged output preserved at $tmp")
    }
  }

  private def writeStaged(spark: SparkSession, sorted: Dataset[OsmEntity],
      path: String, tmp: String,
      bc: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.SerializableConfiguration],
      info: PbfInfo, singleFile: Boolean): Unit = {
    import spark.implicits._
    val stats = sorted.mapPartitions { it =>
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val fs = FileSystem.get(new Path(tmp).toUri, bc.value.value)
      // task-commit protocol: write under an attempt-unique name, rename
      // to the final part on success — duplicate attempts (speculation,
      // zombie first attempts on real clusters) never interleave writes;
      // last committer wins with byte-identical content (the partition
      // data is deterministic under the range sort). part-00000 is
      // reserved for the header frame the driver commits at the end.
      val finalPath = new Path(tmp, f"part-${pid + 1}%05d")
      val attemptPath = new Path(tmp, f".part-${pid + 1}%05d-attempt-${tc.taskAttemptId()}")
      val out = fs.create(attemptPath, true)
      var rows = 0L
      var invisible = 0L
      var minLat = Long.MaxValue; var maxLat = Long.MinValue
      var minLon = Long.MaxValue; var maxLon = Long.MinValue
      val buf = scala.collection.mutable.ArrayBuffer.empty[OsmEntity]
      def flush(): Unit = if (buf.nonEmpty) {
        // split by kind: blocks are single-kind (sorted ⇒ contiguous)
        var start = 0
        for (i <- 1 to buf.length) {
          if (i == buf.length || buf(i).kind != buf(start).kind) {
            out.write(encodeBlock(buf.slice(start, i).toSeq))
            start = i
          }
        }
        buf.clear()
      }
      for (e <- it) {
        rows += 1
        if (!e.visible) invisible += 1
        else if (e.kind == OsmKind.Node) {
          for (la <- e.lat7) { if (la < minLat) minLat = la; if (la > maxLat) maxLat = la }
          for (lo <- e.lon7) { if (lo < minLon) minLon = lo; if (lo > maxLon) maxLon = lo }
        }
        buf += e
        if (buf.length >= BlockSize) flush()
      }
      flush()
      out.close()
      if (fs.exists(finalPath)) fs.delete(finalPath, false)
      require(fs.rename(attemptPath, finalPath), s"commit failed: $finalPath")
      Iterator((pid, rows, invisible, minLat, maxLat, minLon, maxLon): PartStats)
    }.collect()

    val historical = info.historical.getOrElse(stats.exists(_._3 > 0))
    val bbox = info.bbox7.orElse {
      if (!info.calcBBox) None
      else {
        val withNodes = stats.filter(s => s._4 != Long.MaxValue)
        if (withNodes.isEmpty) None
        else Some((withNodes.map(_._6).min, withNodes.map(_._7).max,
          withNodes.map(_._5).max, withNodes.map(_._4).min))
      }
    }
    val hf = headerFrame(historical, bbox, info.source, info.writingProgram,
      info.replicationTimestamp, info.replicationSequence, info.replicationBaseUrl)
    val fs = FileSystem.get(new Path(path).toUri, bc.value.value)
    // header as part-00000 (written last — it needs the stats — but
    // FIRST in name order, which is all a frame-concatenated reader uses)
    val hout = fs.create(new Path(tmp, "part-00000"), true)
    hout.write(hf)
    hout.close()
    // sweep zombie attempt files (failed/duplicate task attempts that
    // never renamed) so neither output form carries them
    for (st <- fs.listStatus(new Path(tmp))
         if st.getPath.getName.startsWith(".part-"))
      fs.delete(st.getPath, false)
  }
}
