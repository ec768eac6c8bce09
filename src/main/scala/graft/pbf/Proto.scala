package graft.pbf

/** Minimal protobuf wire-format reader (public format: protobuf.dev
  * encoding spec + the public OSM PBF schema, osmformat.proto /
  * fileformat.proto). Zero dependencies — reads from a byte array. */
final class Proto(val buf: Array[Byte], var pos: Int, val end: Int) {

  def this(buf: Array[Byte]) = this(buf, 0, buf.length)

  @inline def hasMore: Boolean = pos < end

  def readVarint(): Long = {
    var shift = 0
    var result = 0L
    while (true) {
      val b = buf(pos)
      pos += 1
      result |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) return result
      shift += 7
    }
    result
  }

  @inline def zigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  /** One sint64 scalar (zigzag varint). */
  def readSint(): Long = zigzag(readVarint())

  /** Returns (fieldNumber, wireType). */
  def readKey(): (Int, Int) = {
    val k = readVarint()
    ((k >>> 3).toInt, (k & 7).toInt)
  }

  def skip(wireType: Int): Unit = wireType match {
    case 0 => readVarint()
    case 1 => pos += 8
    case 2 => val len = readVarint().toInt; pos += len
    case 5 => pos += 4
    case other => throw new IllegalStateException(s"unsupported wire type $other")
  }

  /** Sub-reader over a length-delimited field (no copy). */
  def readMessage(): Proto = {
    val len = readVarint().toInt
    val p = new Proto(buf, pos, pos + len)
    pos += len
    p
  }

  def readBytes(): Array[Byte] = {
    val len = readVarint().toInt
    val out = java.util.Arrays.copyOfRange(buf, pos, pos + len)
    pos += len
    out
  }

  def readString(): String = {
    val len = readVarint().toInt
    val s = new String(buf, pos, len, java.nio.charset.StandardCharsets.UTF_8)
    pos += len
    s
  }

  def readPackedVarints(): Array[Long] = {
    val m = readMessage()
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    while (m.hasMore) out += m.readVarint()
    out.toArray
  }

  def readPackedSints(): Array[Long] = {
    val m = readMessage()
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    while (m.hasMore) out += m.zigzag(m.readVarint())
    out.toArray
  }
}
