package graft.streaming

import java.io.{ByteArrayInputStream, InputStream}

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.{OsmEntity, OsmKind, OsmMember, OsmTag}

/** OsmChange (`.osc` / `.osc.gz`) ingest → `Dataset[OsmEntity]` — the
  * source side of the replication-sync story the reference defers to
  * its v0.2 roadmap (/root/reference/README.md:15-17). Downstream is
  * [[Replication.upsertLatest]]: an .osc batch parsed here and replayed
  * into the keyed upsert state applies create/modify/delete exactly
  * once per (kind, id, version).
  *
  * Distribution model: one task per FILE (replication diffs are many
  * small files — minutely/hourly .osc.gz of a few MB — so the file is
  * the natural parallelism unit; the binaryFile source caps at 2 GB a
  * file, far above any real diff). Parsing is JDK StAX — streaming,
  * no DOM materialization, DTD/external entities disabled.
  *
  * Semantics: elements under `<delete>` yield `visible = false` (their
  * lat/lon/tags/refs/members are not carried — matching the osmosis
  * convention); `<create>`/`<modify>` yield `visible = true`. Missing
  * optional attributes default to changeset 0, uid −1, empty user.
  * Coordinates parse EXACTLY to 1e-7° fixed point via scaled
  * BigDecimal — no doubles anywhere (the engine-wide invariant). */
object OscRead {

  /** Batch read of a file, directory, or glob of .osc/.osc.gz files. */
  def read(spark: SparkSession, path: String): Dataset[OsmEntity] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.osc*")
      .load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (name, bytes) => parseBytes(name, bytes) }
  }

  /** Streaming read: new .osc files landing in `dir` become
    * micro-batches — feed straight into [[Replication.upsertLatest]]. */
  def readStream(spark: SparkSession, dir: String): Dataset[OsmEntity] = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      // the binaryFile schema is fixed by the format, but the streaming
      // source requires it stated explicitly
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .option("pathGlobFilter", "*.osc*")
      .load(dir)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (name, bytes) => parseBytes(name, bytes) }
  }

  /** Decompress-if-gzip (by magic, not just extension) and parse. */
  def parseBytes(name: String, bytes: Array[Byte]): Seq[OsmEntity] = {
    val in: InputStream =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
        new java.util.zip.GZIPInputStream(new ByteArrayInputStream(bytes))
      else new ByteArrayInputStream(bytes)
    try parse(in)
    catch {
      case e: Exception =>
        throw new java.io.IOException(s"failed to parse OsmChange file $name", e)
    }
  }

  /** Exact decimal-degrees → 1e-7° fixed point (no double transit). */
  private[streaming] def fixed7(s: String): Long =
    new java.math.BigDecimal(s).movePointRight(7)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  private def tsMillis(s: String): Long = java.time.Instant.parse(s).toEpochMilli

  /** StAX parse of one OsmChange document. */
  def parse(in: InputStream): Seq[OsmEntity] = {
    val f = XMLInputFactory.newInstance()
    // XXE hardening: .osc files come from outside; never resolve
    // DTDs or external entities
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    val r = f.createXMLStreamReader(in)
    try {
      val out = Vector.newBuilder[OsmEntity]
      var action: String = null
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "create" | "modify" | "delete" => action = r.getLocalName
              case "node" => out += entity(r, OsmKind.Node, action)
              case "way" => out += entity(r, OsmKind.Way, action)
              case "relation" => out += entity(r, OsmKind.Relation, action)
              case _ => // osmChange root, unknown extensions: skip
            }
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "create" | "modify" | "delete" => action = null
              case _ =>
            }
          case _ =>
        }
      }
      out.result()
    } finally r.close()
  }

  /** Parse one node/way/relation element (reader ON its START_ELEMENT;
    * consumes through the matching END_ELEMENT). */
  private def entity(r: XMLStreamReader, kind: Byte, action: String): OsmEntity = {
    require(action != null, "node/way/relation element outside a create/modify/delete block")
    val elem = r.getLocalName
    var id = 0L; var version = 0; var ts = 0L
    var changeset = 0L; var uid = -1; var user = ""
    var lat: Option[Long] = None; var lon: Option[Long] = None
    // id/version are the element's IDENTITY — silently defaulting them
    // would merge every malformed element into (kind, 0) version 0
    // downstream, so their absence fails loudly like every other
    // malformation here
    var hasId = false; var hasVersion = false
    var i = 0
    while (i < r.getAttributeCount) {
      val v = r.getAttributeValue(i)
      r.getAttributeLocalName(i) match {
        case "id" => id = v.toLong; hasId = true
        case "version" => version = v.toInt; hasVersion = true
        case "timestamp" => ts = tsMillis(v)
        case "changeset" => changeset = v.toLong
        case "uid" => uid = v.toInt
        case "user" => user = v
        case "lat" => lat = Some(fixed7(v))
        case "lon" => lon = Some(fixed7(v))
        case _ =>
      }
      i += 1
    }
    require(hasId, s"missing attribute id on <$elem>")
    require(hasVersion, s"missing attribute version on <$elem>")
    val visible = action != "delete"
    val tags = Vector.newBuilder[OsmTag]
    val refs = Vector.newBuilder[Long]
    val members = Vector.newBuilder[OsmMember]
    var depth = 1
    while (depth > 0) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          depth += 1
          r.getLocalName match {
            case "tag" =>
              tags += OsmTag(attr(r, "k"), attr(r, "v"))
            case "nd" =>
              refs += attr(r, "ref").toLong
            case "member" =>
              members += OsmMember(
                attr(r, "type") match {
                  case "node" => OsmKind.Node
                  case "way" => OsmKind.Way
                  case "relation" => OsmKind.Relation
                  case t => throw new IllegalArgumentException(s"member type $t")
                },
                attr(r, "ref").toLong, attr(r, "role"))
            case other =>
              throw new IllegalArgumentException(s"unexpected <$other> inside <$elem>")
          }
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ =>
      }
    }
    if (visible)
      OsmEntity(kind, id, version, visible, lat, lon, ts, changeset, uid,
        user, tags.result(), refs.result(), members.result())
    else // deletes carry identity + meta only
      OsmEntity(kind, id, version, visible = false, None, None, ts,
        changeset, uid, user, Nil, Nil, Nil)
  }

  private def attr(r: XMLStreamReader, name: String): String = {
    val v = r.getAttributeValue(null, name)
    require(v != null, s"missing attribute $name on <${r.getLocalName}>")
    v
  }
}
