package graft.model

/** Typed OSM data model (SURVEY.md §1.2/§1.5). Field inventory pinned by
  * the reference's round-trip tests (/root/reference/src/bin/export-test/
  * main.rs:78-150): tags are an ORDERED list of (k,v) pairs (order
  * significant, duplicates representable — hence array-of-struct, not
  * map); way refs ordered; relation member order NOT significant.
  * Coordinates are 1e-7° fixed-point longs (export-test/main.rs:81 pins
  * bit-exact round-trip, so no doubles in the engine). */

final case class OsmTag(k: String, v: String)

/** member_type: 0=node, 1=way, 2=relation. */
final case class OsmMember(mtype: Byte, ref: Long, role: String)

object OsmKind {
  val Node: Byte = 0
  val Way: Byte = 1
  val Relation: Byte = 2
}

/** Unified entity row — one Dataset[OsmEntity] carries the whole file;
  * kind-specific Datasets are cheap filtered views (SURVEY.md §1.5).
  * lat7/lon7 are null (None) for ways/relations. */
final case class OsmEntity(
    kind: Byte,
    id: Long,
    version: Int,
    visible: Boolean,
    lat7: Option[Long],
    lon7: Option[Long],
    tsMillis: Long,
    changeset: Long,
    uid: Int,
    user: String,
    tags: Seq[OsmTag],
    refs: Seq[Long],
    members: Seq[OsmMember])
