package graft.geo

import scala.collection.mutable

/** Way-stitching: connect way segments sharing endpoint NODE IDS into
  * closed rings (SURVEY.md J2; semantics from the reference's relation
  * members, /root/reference/src/bin/export-test/main.rs:113-127 — member
  * order must NOT matter, so the walk is keyed on endpoints only and
  * tie-breaks deterministically by way id).
  *
  * This is the per-component local step; the distributed part (grouping
  * ways into components per (relation, role)) happens in DataFrame land.
  */
object Stitch {

  /** One member way: parallel arrays of node ids and their fixed-point
    * coords, in way order. */
  final case class WaySeg(wayId: Long, nodeIds: Array[Long],
      xs: Array[Long], ys: Array[Long])

  final case class StitchResult(rings: Array[Array[Long]], failedWayIds: Array[Long])

  /** Assemble closed rings. Deterministic regardless of input order:
    * ways are processed ascending by wayId; at junctions the smallest
    * unused incident wayId is chosen. Returns rings as flat open
    * [x0,y0,x1,y1,...] arrays (duplicate closing vertex dropped,
    * consecutive duplicate vertices collapsed). */
  def stitch(segsIn: Seq[WaySeg]): StitchResult = {
    val segs = segsIn.filter(_.nodeIds.length >= 2).sortBy(_.wayId).toArray
    val used = new Array[Boolean](segs.length)
    // endpoint node id -> indices of incident segs
    val byEnd = mutable.HashMap.empty[Long, List[Int]]
    for (i <- segs.indices) {
      val s = segs(i)
      byEnd(s.nodeIds.head) = i :: byEnd.getOrElse(s.nodeIds.head, Nil)
      byEnd(s.nodeIds.last) = i :: byEnd.getOrElse(s.nodeIds.last, Nil)
    }
    val rings = mutable.ArrayBuffer.empty[Array[Long]]
    val failed = mutable.ArrayBuffer.empty[Long]

    for (start <- segs.indices if !used(start)) {
      val s0 = segs(start)
      used(start) = true
      val pathIds = mutable.ArrayBuffer.empty[Long]
      val pathX = mutable.ArrayBuffer.empty[Long]
      val pathY = mutable.ArrayBuffer.empty[Long]
      var i = 0
      while (i < s0.nodeIds.length) {
        pathIds += s0.nodeIds(i); pathX += s0.xs(i); pathY += s0.ys(i)
        i += 1
      }
      val ringStart = pathIds.head
      val chained = mutable.ArrayBuffer(s0.wayId)
      var stuck = false
      while (pathIds.last != ringStart && !stuck) {
        val endNode = pathIds.last
        val candidates = byEnd.getOrElse(endNode, Nil)
          .filter(j => !used(j)).sorted // ascending index == ascending wayId
        candidates.headOption match {
          case None => stuck = true
          case Some(j) =>
            used(j) = true
            val sj = segs(j)
            chained += sj.wayId
            val forward = sj.nodeIds.head == endNode
            val m = sj.nodeIds.length
            var k = 1 // skip shared endpoint
            while (k < m) {
              val idx = if (forward) k else m - 1 - k
              pathIds += sj.nodeIds(idx); pathX += sj.xs(idx); pathY += sj.ys(idx)
              k += 1
            }
        }
      }
      if (stuck) failed ++= chained
      else {
        // closed: drop duplicate last vertex, collapse consecutive dups
        val n = pathIds.length - 1
        val flat = mutable.ArrayBuffer.empty[Long]
        var prevX = Long.MinValue; var prevY = Long.MinValue
        var k = 0
        while (k < n) {
          if (pathX(k) != prevX || pathY(k) != prevY) {
            flat += pathX(k); flat += pathY(k)
            prevX = pathX(k); prevY = pathY(k)
          }
          k += 1
        }
        if (flat.length >= 6) rings += flat.toArray
        else failed ++= chained // degenerate (< 3 distinct vertices)
      }
    }
    StitchResult(rings.toArray, failed.toArray)
  }
}
