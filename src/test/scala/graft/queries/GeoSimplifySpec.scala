package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Kernels behind q_simplify / q_line_cover on hand geometries. */
class GeoSimplifySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("vwFilter drops collinear vertices, keeps corners and endpoints") {
    val line = Seq(
      (1L, 0L, 0L, 0L), (1L, 1L, 1000L, 0L), (1L, 2L, 2000L, 0L),
      (1L, 3L, 3000L, 900L), (1L, 4L, 4000L, 0L))
      .toDF("line_id", "seq", "x", "y")
    val kept = Geo.vwFilter(line, eps = 900000L)
      .orderBy("seq").collect().map(_.getLong(1)).toSeq
    // seq1 collinear (area2 = 0) dropped; seq2 area2 = 900000 kept at
    // the closed threshold; seq3 area2 = 1800000 kept; endpoints kept
    assert(kept === Seq(0L, 2L, 3L, 4L))
  }

  test("vwFilter below-threshold corner is dropped (strict boundary)") {
    val line = Seq(
      (1L, 0L, 0L, 0L), (1L, 1L, 1000L, 0L), (1L, 2L, 2000L, 0L),
      (1L, 3L, 3000L, 899L), (1L, 4L, 4000L, 0L))
      .toDF("line_id", "seq", "x", "y")
    val kept = Geo.vwFilter(line, eps = 900000L)
      .orderBy("seq").collect().map(_.getLong(1)).toSeq
    // seq2 area2 = 899000 < eps and seq3 area2 = 1798000 ≥ eps
    assert(kept === Seq(0L, 3L, 4L))
  }

  test("vwFixedPoint iterates genuinely beyond one pass, then is idempotent") {
    // Shelf-notch line: period-10 shelves at y=1000 (seq%10 ∈ {3,4,6,7})
    // flanking a baseline notch (seq%10 = 5, y=0), x = 1000·seq.
    // At eps=1.5e6: shelf/ramp vertices have |2A| = 1e6 < eps → dropped
    // in pass 1; notches have |2A| = 2e6 ≥ eps → SURVIVE pass 1. Once
    // the shelves are gone the notches are collinear with the baseline
    // endpoints (all y=0), so pass 2 drops them — a drop that exists
    // only because the neighbours changed. Fixed point = endpoints.
    val line = (0 until 21).map { i =>
      val y = if (Set(3, 4, 6, 7)(i % 10)) 1000L else 0L
      (1L, i.toLong, i * 1000L, y)
    }.toDF("line_id", "seq", "x", "y")
    val onePass = Geo.vwFilter(line, eps = 1500000L)
      .orderBy("seq").collect().map(_.getLong(1)).toSeq
    assert(onePass === Seq(0L, 5L, 15L, 20L),
      "pass 1 must keep the notches — the multi-pass premise")
    val fixed = Geo.vwFixedPoint(line, eps = 1500000L)
    val fixedSeqs = fixed.orderBy("seq").collect().map(_.getLong(1)).toSeq
    assert(fixedSeqs === Seq(0L, 20L),
      "pass 2 must drop the now-collinear notches")
    val again = Geo.vwFilter(fixed, eps = 1500000L)
      .orderBy("seq").collect().map(_.getLong(1)).toSeq
    assert(again === fixedSeqs, "fixed point must be idempotent under vwFilter")
  }

  test("lineCover: axis-aligned segment covers the expected cell run") {
    val segs = Seq((1L, 0L, 0L, 8L, 0L)).toDF("event_id", "x0", "y0", "x1", "y1")
    val cells = Geo.lineCover(segs)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(cells === Set((0L, 0L), (1L, 0L), (2L, 0L)))
  }

  test("lineCover: diagonal through a cell corner") {
    val segs = Seq((1L, 0L, 0L, 4L, 4L)).toDF("event_id", "x0", "y0", "x1", "y1")
    val cells = Geo.lineCover(segs)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(cells === Set((0L, 0L), (1L, 1L)))
  }

  test("lineCover: degenerate point segment is its single cell") {
    val segs = Seq((1L, 5L, 5L, 5L, 5L)).toDF("event_id", "x0", "y0", "x1", "y1")
    val cells = Geo.lineCover(segs)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(cells === Set((1L, 1L)))
  }

  test("lineCover samples step < 1 unit: consecutive cells 8-connected") {
    val segs = Seq((7L, -100L, 60L, -89L, 51L)).toDF("event_id", "x0", "y0", "x1", "y1")
    val cells = Geo.lineCover(segs)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // walk along x between endpoint cells: every cell has an
    // 8-neighbour in the set (no gaps along the line)
    for (c <- cells if cells.size > 1)
      assert(cells.exists(o => o != c &&
        math.abs(o._1 - c._1) <= 1 && math.abs(o._2 - c._2) <= 1),
        s"isolated cell $c in $cells")
  }
}
