package graft.queries

import org.apache.spark.sql.functions._

import graft.norm.Normalize
import graft.pbf.PbfRead
import graft.util.QueryDef

/** OSM pipeline invariants surfaced through the driver gate as
  * VALUES-oracled summary rows (the heavy lifting is in the specs;
  * these make the round-trip property machine-checked every round). */
object OsmQueries {

  private val fixture = "/root/reference/tests/fixtures/niue-230612.osm.pbf"

  /** The fixture decode, once per session: every gate query here (and
    * diffCount inside them) consumes the stream 2-3×, so the
    * materialized form saves repeated full decodes without weakening
    * the gates (PbfReadSpec pins the decode itself). */
  private lazy val fixtureCached =
    new graft.util.SessionCache[org.apache.spark.sql.Dataset[graft.model.OsmEntity]]

  private[queries] def osmFixture(s: org.apache.spark.sql.SparkSession) =
    fixtureCached.get(s)(PbfRead.read(s, fixture).localCheckpoint())

  private lazy val fixtureLVCached =
    new graft.util.SessionCache[org.apache.spark.sql.Dataset[graft.model.OsmEntity]]

  /** The fixture resolved to LATEST-VISIBLE entities, once per session —
    * the staged snapshot both eager geo gates (q_admin_incremental,
    * q_extract) consume. latestVisible is idempotent and every consumer
    * reads its input only through it, so pre-resolving is semantics-
    * preserving (their frozen VALUES goldens re-prove it each run);
    * sharing it stops each gate paying the 3-kind window resolution
    * separately. This mirrors production, where extracts and diff
    * application run against a persisted snapshot stage whose stored
    * form IS latest-visible. */
  private[queries] def osmFixtureLV(s: org.apache.spark.sql.SparkSession) =
    fixtureLVCached.get(s) {
      import s.implicits._
      import graft.model.{OsmEntity, OsmKind}
      val osm = osmFixture(s)
      Seq(OsmKind.Node, OsmKind.Way, OsmKind.Relation)
        .map(k => graft.jobs.AdminAreas.latestVisible(osm, k).as[OsmEntity])
        .reduce(_ union _)
        .localCheckpoint()
    }

  val defs: Seq[QueryDef] = Seq(

    // master property: pbf → apidb tables → reassemble ≡ original
    QueryDef(
      "q_osm_roundtrip",
      (s, _) => {
        val osm = osmFixture(s)
        val back = Normalize.reassemble(s, Normalize.demux(osm))
        val diffs = Normalize.diffCount(osm, back)
        val n = osm.count()
        import s.implicits._
        Seq((n, diffs)).toDF("n_entities", "n_diffs")
      },
      Some("""SELECT CAST(45000 AS BIGINT) AS n_entities,
             |       CAST(0 AS BIGINT) AS n_diffs""".stripMargin)),

    // A5/A6 as surveyed: pg_dump COPY-text interop — fixture → COPY
    // dump dir → read back → reassemble ≡ original (tags canonicalized
    // by (k,v): the apidb schema has no tag-order column)
    QueryDef(
      "q_pgcopy_roundtrip",
      (s, _) => {
        import s.implicits._
        val osm = osmFixture(s)
        val dir = "/tmp/graft-pgcopy-gate"
        graft.norm.PgCopy.writeApiDb(Normalize.demux(osm), dir)
        // materialize: consumed by both the diff and the row count —
        // without this the COPY parse + reassembly joins run twice
        val back = Normalize.reassemble(s, graft.norm.PgCopy.readApiDb(s, dir))
          .localCheckpoint()
        def canonTags(ds: org.apache.spark.sql.Dataset[graft.model.OsmEntity]) =
          ds.map(e => e.copy(tags = e.tags.sortBy(t => (t.k, t.v))))
        val diffs = Normalize.diffCount(canonTags(osm), canonTags(back))
        val n = back.count()
        Seq((n, diffs)).toDF("n_entities", "n_diffs")
      },
      Some("""SELECT CAST(45000 AS BIGINT) AS n_entities,
             |       CAST(0 AS BIGINT) AS n_diffs""".stripMargin)),

    // A3/D1: count objects by kind (reference count_objects, lib.rs:50)
    QueryDef(
      "q_osm_counts",
      (s, _) => {
        import s.implicits._
        osmFixture(s).groupBy("kind").count().orderBy("kind")
      },
      Some("""SELECT * FROM (VALUES
             | (CAST(0 AS TINYINT), CAST(41861 AS BIGINT)),
             | (CAST(1 AS TINYINT), CAST(3014 AS BIGINT)),
             | (CAST(2 AS TINYINT), CAST(125 AS BIGINT))
             |) AS t(kind, count) ORDER BY kind""".stripMargin)),

    // D2: bounding-box fold over visible nodes (reference lib.rs:255-291)
    QueryDef(
      "q_osm_bbox",
      (s, _) =>
        osmFixture(s).toDF()
          .filter(col("kind") === 0 && col("visible"))
          .agg(min("lon7").as("left7"), min("lat7").as("bottom7"),
            max("lon7").as("right7"), max("lat7").as("top7")),
      Some("""SELECT CAST(-1701595029 AS BIGINT) AS left7,
             |  CAST(-193548665 AS BIGINT) AS bottom7,
             |  CAST(-1695647229 AS BIGINT) AS right7,
             |  CAST(-187534559 AS BIGINT) AS top7""".stripMargin))
  )
}
