package graft.geo

import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
import org.scalatest.funsuite.AnyFunSuite

/** The polygonizer's contract: rings close, outers are CCW, holes CW,
  * and Σ signed areas == cell count — exactly, on hand cases and on
  * pseudorandom rasters. */
class VectorizeSpec extends AnyFunSuite {

  private def signedCells(rings: Seq[Seq[Long]]): Long =
    rings.map(Vectorize.area2).sum / 2

  test("single cell: one CCW unit square") {
    val rings = Vectorize.boundaryRings(Seq((5L, 7L)))
    assert(rings.length == 1)
    assert(rings.head == Seq(5L, 7L, 6L, 7L, 6L, 8L, 5L, 8L))
    assert(Vectorize.area2(rings.head) == 2) // CCW, area 1
  }

  test("2x2 block: one CCW square of area 4, collinear vertices merged") {
    val rings = Vectorize.boundaryRings(
      for (x <- 0L to 1L; y <- 0L to 1L) yield (x, y))
    assert(rings.length == 1)
    assert(rings.head.length == 8, "collinear mid-edge vertices must merge")
    assert(Vectorize.area2(rings.head) == 8)
  }

  test("donut: CCW outer + CW hole; signed areas sum to the cell count") {
    val cells = for (x <- 0L to 2L; y <- 0L to 2L if !(x == 1 && y == 1))
      yield (x, y)
    val rings = Vectorize.boundaryRings(cells)
    assert(rings.length == 2)
    val areas = rings.map(Vectorize.area2)
    assert(areas.toSet == Set(18L, -2L), s"got $areas") // outer 9 CCW, hole 1 CW
    assert(signedCells(rings) == 8)
  }

  test("corner pinch within one region resolves into separate simple rings") {
    // U-shape plus a diagonal cell touching only at a corner of the U's
    // tip — 4-connected this is ONE region only via the U; make it one
    // region: an S/Z pentomino with a pinch: (0,0),(1,0),(1,1),(2,1)
    // touches (2,0)? Use the classic pinch: two 2x1 bars joined
    // diagonally through a corner PLUS a connector making them one
    // region:
    val cells = Seq((0L, 0L), (1L, 0L), (1L, 1L), (2L, 1L), (2L, 0L))
    val rings = Vectorize.boundaryRings(cells)
    assert(signedCells(rings) == 5)
    assert(rings.forall(r => r.length >= 8))
  }

  test("genuine pinch vertex: 3x3 ring minus {(0,0),(1,1)} gives two SIMPLE rings") {
    // At vertex (1,1) the absent cells (0,0) and (1,1) meet diagonally
    // across present cells (1,0)/(0,1): four boundary edges meet at one
    // vertex. The straight>right>back>left successor rule must pair
    // each walk with its own side of the pinch — a notched outer ring
    // (area2=16, CCW) plus the hole around (1,1) (area2=-2, CW), each
    // individually simple (they may touch at the pinch vertex, which
    // OGC validity allows). Welding them (a left-preferring rule)
    // would make one self-touching JTS-invalid figure-eight.
    val cells = for (x <- 0L to 2L; y <- 0L to 2L
      if !(x == 0 && y == 0) && !(x == 1 && y == 1)) yield (x, y)
    val rings = Vectorize.boundaryRings(cells)
    assert(rings.length == 2, s"expected 2 rings, got $rings")
    assert(rings.map(Vectorize.area2).toSet == Set(16L, -2L))
    assert(signedCells(rings) == 7)
    val gf = new GeometryFactory()
    for (r <- rings) {
      val n = r.length / 2
      val coords = (0 to n).map { i =>
        val j = i % n
        new Coordinate(r(2 * j).toDouble, r(2 * j + 1).toDouble)
      }.toArray
      assert(gf.createLinearRing(coords).isValid, s"self-touching ring $r")
    }
  }

  test("distributed vectorize (edge-assembled) rings identical to local boundaryRings") {
    // The distributed path groups only O(perimeter) boundary edges per
    // region; this pins its ring output (and stats) bit-identical to
    // the local cell-set construction on pseudorandom rasters.
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val level = 5
    for (seed <- Seq(3, 9)) {
      var h = seed * 2654435761L
      val cells = (for (x <- 0L until 20L; y <- 0L until 20L) yield {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17
        ((x, y), (h & 3) == 0)
      }).filter(_._2).map(_._1)
        // clamp to the level-5 grid (32x32 — 20x20 fits)
      val ids = cells.map { case (x, y) => (level.toLong << 58) | (y << level) | x }
      val df = ids.toDF("cell")
      val got = Vectorize.vectorize(spark, df, level)
        .selectExpr("region_id", "n_cells", "perimeter", "area2", "rings")
        .as[(Long, Long, Long, Long, Seq[Seq[Long]])]
        .collect().sortBy(_._1)
      // local oracle: flood-fill components, then boundaryRings per comp
      val set = cells.toSet
      val comp = scala.collection.mutable.Map.empty[(Long, Long), Long]
      for (cell <- cells.sortBy(c => (c._2 << level) | c._1) if !comp.contains(cell)) {
        val rid = (level.toLong << 58) | (cell._2 << level) | cell._1
        val stack = scala.collection.mutable.Stack(cell)
        while (stack.nonEmpty) {
          val (x, y) = stack.pop()
          if (set((x, y)) && !comp.contains((x, y))) {
            comp((x, y)) = rid
            stack.push((x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1))
          }
        }
      }
      val want = cells.groupBy(comp).toSeq.map { case (rid, cs) =>
        val rings = Vectorize.boundaryRings(cs)
        val perim = cs.map { case (x, y) =>
          Seq((x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1))
            .count(n => !set(n))
        }.sum.toLong
        (rid, cs.size.toLong, perim, rings.map(Vectorize.area2).sum, rings)
      }.sortBy(_._1)
      assert(got.length == want.length, s"seed $seed region count")
      for (((g, w), i) <- got.zip(want).zipWithIndex) {
        assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3 && g._4 == w._4,
          s"seed $seed region $i stats: got $g want ${(w._1, w._2, w._3, w._4)}")
        assert(g._5 == w._5, s"seed $seed region ${g._1} rings differ")
      }
    }
  }

  test("pseudorandom rasters: rings valid, signed areas == cell count per region") {
    val gf = new GeometryFactory()
    for (seed <- 1 to 8) {
      // deterministic sprinkle on a 12x12 grid
      var h = seed * 2654435761L
      val cells = (for (x <- 0L until 12L; y <- 0L until 12L) yield {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17
        ((x, y), (h & 3) == 0)
      }).filter(_._2).map(_._1)
      if (cells.nonEmpty) {
        // 4-connected components (local oracle)
        val set = cells.toSet
        val comp = scala.collection.mutable.Map.empty[(Long, Long), Int]
        var c = 0
        for (cell <- cells if !comp.contains(cell)) {
          c += 1
          val stack = scala.collection.mutable.Stack(cell)
          while (stack.nonEmpty) {
            val (x, y) = stack.pop()
            if (set((x, y)) && !comp.contains((x, y))) {
              comp((x, y)) = c
              stack.push((x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1))
            }
          }
        }
        for ((cid, cs) <- cells.groupBy(comp)) {
          val rings = Vectorize.boundaryRings(cs)
          assert(signedCells(rings) == cs.size,
            s"seed $seed comp $cid: cells=${cs.size} rings=$rings")
          for (r <- rings) {
            val n = r.length / 2
            val coords = (0 to n).map { i =>
              val j = i % n
              new Coordinate(r(2 * j).toDouble, r(2 * j + 1).toDouble)
            }.toArray
            assert(gf.createLinearRing(coords).isValid,
              s"seed $seed comp $cid invalid ring")
          }
        }
      }
    }
  }
}
