package graft.queries

import org.apache.spark.sql.functions._

import graft.streaming.OscRead
import graft.util.{QueryDef, Tables}

/** Driver gate for the OsmChange ingest (SURVEY §2-H / the reference's
  * v0.2 replication roadmap): a deterministic .osc batch is synthesized
  * from the events table (one element per event — creates, modifies and
  * deletes across nodes/ways/relations, one file gzipped), parsed back
  * DISTRIBUTED by [[OscRead.read]], and reduced to latest-version state
  * per (kind, id) — the batch equivalent of `Replication.upsertLatest`.
  * The DuckDB oracle recomputes the same final state relationally from
  * events.parquet, so every parsed field (coords, tags incl. XML-escaped
  * JSON values, way refs, members, timestamps) is value-checked. */
object OscQueries {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
      // literal CR/LF/TAB in attribute values would be rewritten to
      // spaces by XML attribute-value normalization — character
      // references survive it, keeping oracle parity for any fixture
      .replace("\t", "&#9;").replace("\n", "&#10;").replace("\r", "&#13;")

  /** One XML element per event; action/kind/id/version are pure
    * functions of event_id so the oracle can recompute them in SQL. */
  private def elementXml(eventId: Long, tsMs: Long, userId: Long,
      eventType: String, props: String): (String, String) = {
    val kind = eventId % 3
    val id = eventId % 499
    val version = eventId / 499 + 1
    val action =
      if (eventType == "error") "delete"
      else if (version == 1) "create" else "modify"
    val name = Seq("node", "way", "relation")(kind.toInt)
    val ts = java.time.Instant.ofEpochMilli(tsMs).toString
    val common = s"""id="$id" version="$version" timestamp="$ts" """ +
      s"""changeset="${eventId % 97}" uid="$userId" user="u$userId""""
    val body =
      if (action == "delete") s"  <$name $common/>"
      else {
        val coords =
          if (kind == 0) {
            val lat7 = (eventId * 1237) % 1800000000L - 900000000L
            val lon7 = (eventId * 2467) % 3600000000L - 1800000000L
            s""" lat="${java.math.BigDecimal.valueOf(lat7, 7).toPlainString}"""" +
              s""" lon="${java.math.BigDecimal.valueOf(lon7, 7).toPlainString}""""
          } else ""
        val children = new StringBuilder
        if (kind == 1)
          for (m <- Seq(1000L, 1001L, 1002L))
            children ++= s"""    <nd ref="${eventId % m}"/>\n"""
        if (kind == 2)
          children ++= s"""    <member type="node" ref="${eventId % 1003}" role="outer"/>\n"""
        children ++= s"""    <tag k="name" v="e$eventId"/>\n"""
        children ++= s"""    <tag k="props" v="${esc(props)}"/>\n"""
        s"""  <$name $common$coords>\n$children  </$name>"""
      }
    (action, body)
  }

  /** Write the 8-file .osc fixture (one gzipped) for dataset `d`. */
  private def stageFixture(s: org.apache.spark.sql.SparkSession, d: String,
      dir: java.nio.file.Path): Unit = {
    val rows = Tables.t(s, d, "events")
      .select(col("event_id"), unix_millis(col("ts").cast("timestamp")),
        col("user_id"), col("event_type"), col("props"))
      .collect()
    val files = (0 until 8).map { _ =>
      new StringBuilder(
        "<?xml version='1.0' encoding='UTF-8'?>\n" +
          "<osmChange version=\"0.6\" generator=\"graft\">\n")
    }
    for (r <- rows) {
      val eventId = r.getLong(0)
      val (action, body) = elementXml(eventId, r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4))
      files((eventId % 8).toInt) ++= s"<$action>\n$body\n</$action>\n"
    }
    files.zipWithIndex.foreach { case (sb, i) =>
      sb ++= "</osmChange>\n"
      val bytes = sb.toString.getBytes("UTF-8")
      if (i == 3) { // one gzipped file exercises the gz sniff
        val bos = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(bytes); gz.close()
        java.nio.file.Files.write(dir.resolve(s"part-$i.osc.gz"), bos.toByteArray)
      } else
        java.nio.file.Files.write(dir.resolve(s"part-$i.osc"), bytes)
    }
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_osc_upsert",
      (s, d) => {
        // synthesis is driver-side and bounded (one small XML line set
        // per event — gate fixture construction, not the operator); the
        // OPERATOR under test is the distributed parse + reduction.
        // Staged per dataset via the shared shutdown-cleaned fixture
        // root (see graft.util.Staging for the local-mode assumption)
        // and reused across calls — the fixture is a pure function of
        // the dataset dir.
        val dir = graft.util.Staging.dir("osc", d)
        val marker = dir.resolve("_STAGED")
        if (!java.nio.file.Files.exists(marker)) {
          stageFixture(s, d, dir)
          java.nio.file.Files.createFile(marker)
        }

        val e = OscRead.read(s, dir.toString).toDF()
          .select(col("kind").cast("int").as("kind"), col("id"),
            col("version"), col("visible"), col("lat7"), col("lon7"),
            col("tsMillis").as("ts_ms"), col("changeset"),
            col("uid").cast("long").as("uid"),
            expr("get(filter(tags, t -> t.k = 'name'), 0).v").as("name_v"),
            expr("get(filter(tags, t -> t.k = 'props'), 0).v").as("props_v"),
            when(col("kind") === 1 && col("visible"),
              expr("aggregate(refs, 0L, (a, x) -> a + x)")).as("sum_refs"),
            when(col("kind") === 2 && col("visible"),
              size(col("members"))).as("n_members"))
        // latest-version winner per (kind, id): the batch equivalent of
        // Replication.upsertLatest's keyed max-version state
        val payload = e.columns.filterNot(Set("kind", "id")).map(col).toSeq
        e.groupBy("kind", "id")
          .agg(max(struct(payload: _*)).as("w"))
          .select(col("kind"), col("id"), col("w.*"))
          .orderBy("kind", "id")
      },
      Some("""WITH src AS (
             |  SELECT event_id,
             |    CAST(event_id % 3 AS INTEGER) AS kind,
             |    event_id % 499 AS id,
             |    CAST(event_id // 499 + 1 AS INTEGER) AS version,
             |    event_type <> 'error' AS visible,
             |    epoch_ms(ts) AS ts_ms,
             |    event_id % 97 AS changeset,
             |    user_id AS uid,
             |    props
             |  FROM events),
             |win AS (SELECT * FROM src
             |  QUALIFY row_number() OVER (PARTITION BY kind, id ORDER BY version DESC) = 1)
             |SELECT kind, id, version, visible,
             |  CASE WHEN visible AND kind = 0
             |    THEN (event_id * 1237) % 1800000000 - 900000000 END AS lat7,
             |  CASE WHEN visible AND kind = 0
             |    THEN (event_id * 2467) % 3600000000 - 1800000000 END AS lon7,
             |  ts_ms, changeset, uid,
             |  CASE WHEN visible THEN 'e' || CAST(event_id AS VARCHAR) END AS name_v,
             |  CASE WHEN visible THEN props END AS props_v,
             |  CASE WHEN visible AND kind = 1 THEN
             |    (event_id % 1000) + (event_id % 1001) + (event_id % 1002) END AS sum_refs,
             |  CASE WHEN visible AND kind = 2 THEN CAST(1 AS INTEGER) END AS n_members
             |FROM win ORDER BY kind, id""".stripMargin))
  )
}
