package graft.geo

/** Exact fixed-point (1e-7°) planar geometry kernels. All predicates are
  * decided in integer arithmetic (128-bit where products can exceed i64)
  * so results are bit-stable across partitionings and cluster sizes —
  * required for the N vs 4N identical-output check (SURVEY.md §7.4.3).
  *
  * Boundary rule (pinned, FIXTURES.md §3.2): a point ON a ring edge or
  * vertex is INSIDE.
  */
object Geom {

  /** Exact sign of the 2x2 determinant ax*by - ay*bx with |a|,|b| up to
    * 2^62 (coordinates and their differences fit comfortably). */
  def crossSign(ax: Long, ay: Long, bx: Long, by: Long): Int = {
    val hi1 = Math.multiplyHigh(ax, by); val lo1 = ax * by
    val hi2 = Math.multiplyHigh(ay, bx); val lo2 = ay * bx
    // (hi1,lo1) - (hi2,lo2) in 128-bit two's complement
    val lo = lo1 - lo2
    val borrow = if (java.lang.Long.compareUnsigned(lo1, lo2) < 0) 1L else 0L
    val hi = hi1 - hi2 - borrow
    if (hi < 0) -1
    else if (hi > 0) 1
    else if (lo == 0) 0
    else 1 // hi == 0, lo != 0 treated unsigned => positive
  }

  /** Is p on the closed segment a-b (collinear and within bbox)? */
  def onSegment(px: Long, py: Long, ax: Long, ay: Long, bx: Long, by: Long): Boolean = {
    if (crossSign(bx - ax, by - ay, px - ax, py - ay) != 0) return false
    px >= math.min(ax, bx) && px <= math.max(ax, bx) &&
      py >= math.min(ay, by) && py <= math.max(ay, by)
  }

  /** Even-odd point-in-polygon over a set of rings (multipolygon with
    * holes handled by parity). Rings are closed implicitly (last→first
    * edge added if absent). Coordinates are (x=lon7, y=lat7) longs laid
    * out flat as [x0,y0,x1,y1,...] per ring. On-boundary → true. */
  def pointInRings(px: Long, py: Long, rings: Array[Array[Long]]): Boolean = {
    var inside = false
    var r = 0
    while (r < rings.length) {
      val ring = rings(r)
      val n = ring.length / 2
      if (n >= 2) {
        var i = 0
        var ax = ring(2 * (n - 1)); var ay = ring(2 * (n - 1) + 1)
        while (i < n) {
          val bx = ring(2 * i); val by = ring(2 * i + 1)
          if (onSegment(px, py, ax, ay, bx, by)) return true
          if ((ay > py) != (by > py)) {
            val c = crossSign(bx - ax, by - ay, px - ax, py - ay)
            if ((c > 0) == (by > ay)) inside = !inside
          }
          ax = bx; ay = by
          i += 1
        }
      }
      r += 1
    }
    inside
  }

  /** Sign of twice the signed area (shoelace) of a ring; > 0 ⇔ CCW.
    * 128-bit accumulation, coordinates translated to the first vertex
    * to keep per-edge products small. Also returns |area2| as double
    * for size heuristics. */
  def shoelace(ring: Array[Long]): (Int, Double) = {
    val n = ring.length / 2
    if (n < 3) return (0, 0.0)
    val x0 = ring(0); val y0 = ring(1)
    var hi = 0L; var lo = 0L
    var approx = 0.0
    var i = 0
    var ax = ring(2 * (n - 1)) - x0; var ay = ring(2 * (n - 1) + 1) - y0
    while (i < n) {
      val bx = ring(2 * i) - x0; val by = ring(2 * i + 1) - y0
      // term = ax*by - ay*bx  (128-bit), accumulate
      val thi1 = Math.multiplyHigh(ax, by); val tlo1 = ax * by
      val thi2 = Math.multiplyHigh(ay, bx); val tlo2 = ay * bx
      val tlo = tlo1 - tlo2
      val tborrow = if (java.lang.Long.compareUnsigned(tlo1, tlo2) < 0) 1L else 0L
      val thi = thi1 - thi2 - tborrow
      val nlo = lo + tlo
      val carry = if (java.lang.Long.compareUnsigned(nlo, lo) < 0) 1L else 0L
      lo = nlo
      hi = hi + thi + carry
      approx += ax.toDouble * by.toDouble - ay.toDouble * bx.toDouble
      ax = bx; ay = by
      i += 1
    }
    val sign =
      if (hi < 0) -1
      else if (hi > 0) 1
      else if (lo == 0) 0
      else 1
    (sign, math.abs(approx))
  }

  /** Normalize winding: outer rings CCW, holes CW; then rotate so the
    * ring starts at its lexicographically-minimal (x,y) vertex — a
    * byte-stable canonical form (SURVEY.md J3). Input/output rings are
    * open (no repeated last==first vertex). */
  def canonicalRing(ring: Array[Long], wantCCW: Boolean): Array[Long] = {
    val n = ring.length / 2
    if (n == 0) return ring
    val (sign, _) = shoelace(ring)
    val oriented =
      if ((sign > 0) == wantCCW || sign == 0) ring
      else {
        val out = new Array[Long](ring.length)
        var i = 0
        while (i < n) {
          out(2 * i) = ring(2 * (n - 1 - i))
          out(2 * i + 1) = ring(2 * (n - 1 - i) + 1)
          i += 1
        }
        out
      }
    // rotate to min vertex
    var best = 0
    var i = 1
    while (i < n) {
      val bx = oriented(2 * best); val by = oriented(2 * best + 1)
      val cx = oriented(2 * i); val cy = oriented(2 * i + 1)
      if (cx < bx || (cx == bx && cy < by)) best = i
      i += 1
    }
    if (best == 0) oriented
    else {
      val out = new Array[Long](oriented.length)
      var j = 0
      while (j < n) {
        out(2 * j) = oriented(2 * ((j + best) % n))
        out(2 * j + 1) = oriented(2 * ((j + best) % n) + 1)
        j += 1
      }
      out
    }
  }

  /** Does segment a-b intersect the closed axis-aligned rectangle
    * [xlo,xhi] × [ylo,yhi]? Exact. */
  def segmentIntersectsRect(ax: Long, ay: Long, bx: Long, by: Long,
      xlo: Long, ylo: Long, xhi: Long, yhi: Long): Boolean = {
    // quick bbox reject
    if (math.max(ax, bx) < xlo || math.min(ax, bx) > xhi ||
        math.max(ay, by) < ylo || math.min(ay, by) > yhi) return false
    // endpoint inside
    @inline def in(px: Long, py: Long) =
      px >= xlo && px <= xhi && py >= ylo && py <= yhi
    if (in(ax, ay) || in(bx, by)) return true
    // proper/improper crossing with any rect edge
    @inline def segSeg(p1x: Long, p1y: Long, p2x: Long, p2y: Long,
        q1x: Long, q1y: Long, q2x: Long, q2y: Long): Boolean = {
      val d1 = crossSign(p2x - p1x, p2y - p1y, q1x - p1x, q1y - p1y)
      val d2 = crossSign(p2x - p1x, p2y - p1y, q2x - p1x, q2y - p1y)
      val d3 = crossSign(q2x - q1x, q2y - q1y, p1x - q1x, p1y - q1y)
      val d4 = crossSign(q2x - q1x, q2y - q1y, p2x - q1x, p2y - q1y)
      if (d1 * d2 < 0 && d3 * d4 < 0) return true
      (d1 == 0 && onSegment(q1x, q1y, p1x, p1y, p2x, p2y)) ||
        (d2 == 0 && onSegment(q2x, q2y, p1x, p1y, p2x, p2y)) ||
        (d3 == 0 && onSegment(p1x, p1y, q1x, q1y, q2x, q2y)) ||
        (d4 == 0 && onSegment(p2x, p2y, q1x, q1y, q2x, q2y))
    }
    segSeg(ax, ay, bx, by, xlo, ylo, xhi, ylo) ||
      segSeg(ax, ay, bx, by, xhi, ylo, xhi, yhi) ||
      segSeg(ax, ay, bx, by, xhi, yhi, xlo, yhi) ||
      segSeg(ax, ay, bx, by, xlo, yhi, xlo, ylo)
  }
}
