package graft.geo

import org.scalatest.funsuite.AnyFunSuite

/** The localized refine must agree EXACTLY with the full-ring even-odd
  * PIP for every point in every partial cover cell — swept over random
  * star polygons, holes, and lattice-adversarial squares. */
class GeomCellSpec extends AnyFunSuite {

  private def starPolygon(cx: Long, cy: Long, n: Int, seed: Long): Array[Long] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).flatMap { i =>
      val ang = 2 * math.Pi * i / n
      val r = 1000000L + rnd.nextInt(9000000)
      Seq(cx + (r * math.cos(ang)).toLong, cy + (r * math.sin(ang)).toLong)
    }.toArray
  }

  private def sweepPolygon(rings: Array[Array[Long]], maxLevel: Int,
      seed: Long, pointsPerCell: Int): (Long, Long) = {
    val cov = Cover.coverDetailed(rings, maxLevel)
    val rnd = new scala.util.Random(seed)
    var checked = 0L
    var fallbacks = 0L
    for (cc <- cov if !cc.full) {
      if (cc.fallback) fallbacks += 1
      else {
        val (wx, sy, lonHi, latHi) = Cells.bounds(cc.cell)
        for (_ <- 0 until pointsPerCell) {
          val px = wx + math.abs(rnd.nextLong()) % (lonHi - wx)
          val py = sy + math.abs(rnd.nextLong()) % (latHi - sy)
          val local = GeomCell.pointInCell(px, py, wx, sy, cc.cornerInside, cc.edges)
          val full = Geom.pointInRings(px, py, rings)
          assert(local == full,
            s"cell=${cc.cell} p=($px,$py) local=$local full=$full corner=${cc.cornerInside}")
          checked += 1
        }
        // cell corners are adversarial (exactly on cell boundary)
        for ((qx, qy) <- Seq((wx, sy), (lonHi - 1, sy), (wx, latHi - 1),
            (lonHi - 1, latHi - 1))) {
          val local = GeomCell.pointInCell(qx, qy, wx, sy, cc.cornerInside, cc.edges)
          assert(local == Geom.pointInRings(qx, qy, rings),
            s"corner probe cell=${cc.cell} p=($qx,$qy)")
          checked += 1
        }
      }
    }
    (checked, fallbacks)
  }

  test("localized PIP ≡ full PIP on random star polygons (every partial cell)") {
    var total = 0L
    for (seed <- 0 until 20) {
      val ring = starPolygon(300000000L, -100000000L, 6 + seed % 20, seed)
      val (checked, _) = sweepPolygon(Array(ring), maxLevel = 13, seed + 99, 8)
      total += checked
    }
    assert(total > 10000, s"swept only $total points")
  }

  test("localized PIP ≡ full PIP with holes") {
    val shell = starPolygon(0L, 0L, 16, 7L)
    val hole = starPolygon(0L, 0L, 8, 8L).map(_ / 4) // smaller, inside
    val (checked, _) = sweepPolygon(Array(shell, hole), maxLevel = 13, 123L, 10)
    assert(checked > 500)
  }

  test("lattice-adversarial axis-aligned square: corners on cell boundaries") {
    // square aligned to cell boundaries at level 10 → corners/edges land
    // exactly on cell walls; fallback flagging must keep this exact
    val c = Cells.encode(0L, 0L, 10)
    val (lo, la, hi, lb) = Cells.bounds(c)
    val square = Array[Long](lo, la, hi + (hi - lo), la,
      hi + (hi - lo), lb + (lb - la), lo, lb + (lb - la))
    val cov = Cover.coverDetailed(Array(square), maxLevel = 12)
    val rnd = new scala.util.Random(5L)
    var checked = 0
    for (cc <- cov if !cc.full && !cc.fallback) {
      val (wx, sy, lonHi, latHi) = Cells.bounds(cc.cell)
      for (_ <- 0 until 20) {
        val px = wx + math.abs(rnd.nextLong()) % (lonHi - wx)
        val py = sy + math.abs(rnd.nextLong()) % (latHi - sy)
        assert(GeomCell.pointInCell(px, py, wx, sy, cc.cornerInside, cc.edges) ==
          Geom.pointInRings(px, py, Array(square)))
        checked += 1
      }
    }
    assert(checked > 0 || cov.forall(c => c.full || c.fallback))
  }
}
