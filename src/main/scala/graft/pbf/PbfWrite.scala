package graft.pbf

import java.io.ByteArrayOutputStream
import java.util.zip.Deflater

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.{OsmEntity, OsmKind}

/** `.osm.pbf` sink (SURVEY.md A7/E2): global Type_then_ID order via
  * range sort, per-partition block encode (string table, dense-node
  * delta coding, zlib) into part files, driver concatenation after the
  * header frame — valid because a PBF file is a plain frame sequence
  * with one leading OSMHeader (format: public osmformat/fileformat
  * protos; reference call site /root/reference/src/lib.rs:200-215). */
object PbfWrite {

  private val BlockSize = 8000

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
    def toArray: Array[Byte] = buf.toByteArray
  }

  private def deltas(vs: Seq[Long]): Seq[Long] =
    vs.headOption.toSeq ++ vs.sliding(2).collect { case Seq(a, b) => b - a }

  /** One frame: 4-byte BE length + BlobHeader + zlib Blob. */
  def frame(blobType: String, payload: Array[Byte]): Array[Byte] = {
    val blob = new Out
    blob.int(2, payload.length)
    val deflater = new Deflater()
    deflater.setInput(payload); deflater.finish()
    val comp = new Array[Byte](payload.length + 64)
    val n = deflater.deflate(comp)
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

  def headerFrame(historical: Boolean): Array[Byte] = {
    val h = new Out
    h.str(4, "OsmSchema-V0.6")
    h.str(4, "DenseNodes")
    if (historical) h.str(4, "HistoricalInformation")
    h.str(5, "Sort.Type_then_ID")
    h.str(16, "graft-spark")
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
        dense.packedSints(8, deltas(entities.map(_.lat7.get)))
        dense.packedSints(9, deltas(entities.map(_.lon7.get)))
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

  /** Write the dataset as a PBF file. Global Type_then_ID order via
    * repartitionByRange + sortWithinPartitions (one range shuffle), then
    * per-partition encode into part files merged in partition order. */
  def write(spark: SparkSession, ds: Dataset[OsmEntity], path: String,
      partitions: Int = 0): Unit = {
    import spark.implicits._
    val nPart = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    val historical = ds.filter(e => !e.visible).take(1).nonEmpty
    val sorted = ds
      .repartitionByRange(nPart, $"kind", $"id", $"version")
      .sortWithinPartitions($"kind", $"id", $"version")
    val tmp = path + ".parts"
    val hconfSer = spark.sparkContext.hadoopConfiguration
    // encode each partition to its own part file (distributed)
    val fs0 = FileSystem.get(new Path(tmp).toUri, hconfSer)
    fs0.mkdirs(new Path(tmp))
    sorted.mapPartitions { it =>
      val frames = new ByteArrayOutputStream()
      val buf = scala.collection.mutable.ArrayBuffer.empty[OsmEntity]
      def flush(): Unit = if (buf.nonEmpty) {
        // split by kind: blocks are single-kind (sorted ⇒ contiguous)
        var start = 0
        for (i <- 1 to buf.length) {
          if (i == buf.length || buf(i).kind != buf(start).kind) {
            frames.write(encodeBlock(buf.slice(start, i).toSeq))
            start = i
          }
        }
        buf.clear()
      }
      for (e <- it) {
        buf += e
        if (buf.length >= BlockSize && buf.last.kind != buf.head.kind) flush()
        else if (buf.length >= BlockSize) flush()
      }
      flush()
      Iterator(frames.toByteArray)
    }.rdd.zipWithIndex().map { case (bytes, idx) => (idx, bytes) }
      .foreachPartition { it =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val fs = FileSystem.get(new Path(tmp).toUri, conf)
        for ((idx, bytes) <- it) {
          val out = fs.create(new Path(tmp, f"part-$idx%05d"), true)
          out.write(bytes); out.close()
        }
      }
    // driver: header + ordered concat
    val fs = FileSystem.get(new Path(path).toUri, hconfSer)
    val out = fs.create(new Path(path), true)
    out.write(headerFrame(historical))
    val parts = fs.listStatus(new Path(tmp)).map(_.getPath)
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    for (p <- parts) {
      val in = fs.open(p)
      val b = new Array[Byte](1 << 20)
      var n = in.read(b)
      while (n > 0) { out.write(b, 0, n); n = in.read(b) }
      in.close()
    }
    out.close()
    fs.delete(new Path(tmp), true)
  }
}
