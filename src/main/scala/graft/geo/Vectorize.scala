package graft.geo

import scala.collection.mutable

/** Raster→vector polygonization (north rule "raster↔vector"): turn a
  * set of grid cells into the boundary RINGS of its connected regions.
  *
  * Construction: every cell contributes one directed unit edge per
  * side whose 4-neighbour is absent, oriented with the REGION INTERIOR
  * ON THE LEFT (top edge runs east→west, bottom west→east, left
  * north→south, right south→north). Following each incoming edge with
  * its sharpest-LEFT outgoing edge decomposes the boundary into cycles
  * where outer rings come out CCW and holes CW automatically — no
  * point-in-polygon pass, and regions pinched at a corner separate
  * deterministically. Collinear runs merge; each ring rotates to its
  * smallest vertex. All arithmetic is exact integer grid math.
  *
  * The core invariant (spec-pinned): Σ signed shoelace areas of a
  * region's rings == its cell count (in cell units). */
object Vectorize {

  private final val E = 0; private final val N = 1
  private final val W = 2; private final val S = 3

  @inline private def pack(x: Long, y: Long): Long = (x << 31) | y

  /** Boundary rings of ONE 4-connected region (the caller groups cells
    * by region). Input: the region's cells as (gx, gy); output: flat
    * [x0,y0,x1,y1,...] rings, outers CCW, holes CW. Pure and local —
    * the distributed layer bounds group size by construction. */
  def boundaryRings(cells: Iterable[(Long, Long)]): Seq[Seq[Long]] = {
    val set = cells.map { case (x, y) => pack(x, y) }.toSet
    // directed boundary edges keyed by (fromVertex, dir) → toVertex
    final case class Edge(fx: Long, fy: Long, dir: Int, tx: Long, ty: Long)
    val edges = mutable.ArrayBuffer.empty[Edge]
    for ((x, y) <- cells) {
      if (!set(pack(x, y + 1))) edges += Edge(x + 1, y + 1, W, x, y + 1) // top
      if (!set(pack(x, y - 1))) edges += Edge(x, y, E, x + 1, y) // bottom
      if (!set(pack(x - 1, y))) edges += Edge(x, y + 1, S, x, y) // left
      if (!set(pack(x + 1, y))) edges += Edge(x + 1, y, N, x + 1, y + 1) // right
    }
    // out-edges per vertex
    val outs = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Edge]]
    for (e <- edges)
      outs.getOrElseUpdate(pack(e.fx, e.fy), mutable.ArrayBuffer.empty) += e
    // next(e): at e's target vertex, the unused out-edge turning the
    // sharpest LEFT relative to e's direction (left > straight > right
    // > back) — a permutation on directed edges (at a pinch vertex the
    // two incoming directions differ by 180°, so their sharpest-left
    // pairings are distinct)
    def turnScore(in: Int, out: Int): Int = ((out - in + 5) % 4) match {
      case 1 => 3 // left
      case 0 => 2 // straight
      case 3 => 1 // right
      case _ => 0 // back
    }
    val used = mutable.HashSet.empty[(Long, Long, Int)]
    def key(e: Edge) = (e.fx, e.fy, e.dir)
    val rings = mutable.ArrayBuffer.empty[Seq[Long]]
    for (start <- edges.sortBy(e => (e.fx, e.fy, e.dir)) if !used(key(start))) {
      val verts = mutable.ArrayBuffer.empty[(Long, Long, Int)] // (x, y, outDir)
      var cur = start
      var guard = 0
      val cap = 4 * edges.length + 8
      while ({ // do-while: close when the walk returns to the start edge
        used += key(cur)
        verts += ((cur.fx, cur.fy, cur.dir))
        val cands = outs(pack(cur.tx, cur.ty))
        val next = cands.filter(c => !used(key(c)))
          .sortBy(c => (-turnScore(cur.dir, c.dir), c.dir))
          .headOption.getOrElse(start)
        guard += 1
        require(guard <= cap, "boundary walk did not close")
        cur = next
        key(cur) != key(start)
      }) ()
      // merge collinear runs: keep vertices where the direction changes
      val n = verts.length
      val kept = (0 until n).collect {
        case i if verts(i)._3 != verts((i + n - 1) % n)._3 =>
          (verts(i)._1, verts(i)._2)
      }
      // rotate to the canonical (smallest) vertex
      val minIdx = kept.indices.minBy(i => (kept(i)._1, kept(i)._2))
      val rot = kept.drop(minIdx) ++ kept.take(minIdx)
      rings += rot.flatMap { case (x, y) => Seq(x, y) }.toSeq
    }
    rings.toSeq
  }

  /** DISTRIBUTED polygonize: cells (one level) → per-region boundary
    * stats + rings. Regions via shared min-label propagation over the
    * 4-adjacency graph (edges built by id arithmetic + one semi-join —
    * no geometry); each region's rings assemble LOCALLY in one
    * `mapGroups` (the boundary of a region is O(perimeter) — tiny next
    * to its cells; a region larger than a task means the raster should
    * polygonize at a coarser level first). Output: (region_id = min
    * cell id, n_cells, perimeter, area2, min_x, min_y, max_x, max_y,
    * rings) — area2 == 2·n_cells by the ring-geometry invariant, which
    * makes ring correctness checkable relationally. */
  def vectorize(spark: org.apache.spark.sql.SparkSession,
      cells: org.apache.spark.sql.DataFrame, level: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    require(level >= 1 && level <= 28)
    val c = cells.select(col("cell")).distinct().localCheckpoint()
    val mask = (1L << level) - 1
    val low58 = (1L << 58) - 1
    val xOf = col("cell").bitwiseAND(lit(low58)).bitwiseAND(lit(mask))
    val yOf = shiftrightunsigned(col("cell").bitwiseAND(lit(low58)), level)
    val withXY = c.select(col("cell"), xOf.as("x"), yOf.as("y"))
    // candidate 4-neighbour ids by pure arithmetic; the semi-join keeps
    // only neighbours that exist — the whole adjacency build is one
    // explode + one equi-join, no spatial machinery
    val nbrs = withXY.select(col("cell").as("a"), explode(array(
        when(col("x") < mask, col("cell") + 1),
        when(col("x") > 0, col("cell") - 1),
        when(col("y") < mask, col("cell") + (1L << level)),
        when(col("y") > 0, col("cell") - (1L << level)))).as("b"))
      .filter(col("b").isNotNull)
    val edges = nbrs
      .join(c.select(col("cell").as("b")), Seq("b"), "left_semi")
      .select("a", "b")
    // TWO-LEVEL components — label propagation over raw cells needs
    // O(region CELL diameter) rounds, which is unbounded at planet
    // rasters. Phase 1: one shuffle groups cells into 16×16 BLOCKS and
    // union-finds each block locally (≤256 cells/task). Phase 2:
    // propagation runs on the block-coarsened component graph, whose
    // diameter is the region's extent in BLOCKS — 16× fewer rounds,
    // and the block size is the knob if that is ever not enough.
    val blockShift = 4
    def blockOf(cellCol: org.apache.spark.sql.Column) = {
      val lx = cellCol.bitwiseAND(lit(low58)).bitwiseAND(lit(mask))
      val ly = shiftrightunsigned(cellCol.bitwiseAND(lit(low58)), level)
      shiftleft(shiftrightunsigned(ly, blockShift), 30)
        .bitwiseOR(shiftrightunsigned(lx, blockShift))
    }
    val localComp = withXY
      .select(col("cell"), col("x"), col("y"), blockOf(col("cell")).as("blk"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._4)
      .flatMapGroups { (_, it) =>
        val cs = it.map(t => (t._1, t._2, t._3)).toSeq
        val byXY = cs.map(t => (t._2, t._3) -> t._1).toMap
        val parent = mutable.HashMap.empty[Long, Long]
        def find(v: Long): Long = {
          var r = v
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var cur = v
          while (parent.getOrElse(cur, cur) != cur) {
            val nxt = parent(cur); parent(cur) = r; cur = nxt
          }
          r
        }
        def union(a: Long, b: Long): Unit = {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { // min-id root so labels stay canonical
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
        }
        for ((id, x, y) <- cs) {
          byXY.get((x + 1, y)).foreach(union(id, _))
          byXY.get((x, y + 1)).foreach(union(id, _))
        }
        cs.iterator.map { case (id, _, _) => (id, find(id)) }
      }
      .toDF("cell", "lcomp")
      .localCheckpoint()
    val cellBlk = (cl: org.apache.spark.sql.Column) => blockOf(cl)
    val crossEdges = edges
      .filter(cellBlk(col("a")) =!= cellBlk(col("b")))
    val superEdges = crossEdges
      .join(localComp.select(col("cell").as("a"), col("lcomp").as("la")), "a")
      .join(localComp.select(col("cell").as("b"), col("lcomp").as("lb")), "b")
      .select(col("la"), col("lb"))
    val superComp = graft.util.LabelProp.components(spark, superEdges,
      nodes = Some(localComp.select(col("lcomp").as("node")).distinct()),
      debugTag = "vec", shufflePartitions = Some(8))
    val comp = localComp
      .join(superComp, localComp("lcomp") === superComp("node"))
      .select(col("cell"), col("comp"))
    comp
      .select(col("comp").as("region_id"),
        xOf.as("x"), yOf.as("y"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (rid, it) =>
        val cs = it.map(t => (t._2, t._3)).toSeq
        val rings = boundaryRings(cs)
        val perim = rings.map { r =>
          val n = r.length / 2
          (0 until n).map { i =>
            val j = (i + 1) % n
            math.abs(r(2 * j) - r(2 * i)) + math.abs(r(2 * j + 1) - r(2 * i + 1))
          }.sum
        }.sum
        (rid, cs.size.toLong, perim, rings.map(area2).sum,
          cs.map(_._1).min, cs.map(_._2).min, cs.map(_._1).max, cs.map(_._2).max,
          rings)
      }
      .toDF("region_id", "n_cells", "perimeter", "area2",
        "min_x", "min_y", "max_x", "max_y", "rings")
  }

  /** Signed doubled shoelace area of a flat ring — exact. */
  def area2(ring: Seq[Long]): Long = {
    val n = ring.length / 2
    var acc = 0L
    var ax = ring(2 * (n - 1)); var ay = ring(2 * (n - 1) + 1)
    var i = 0
    while (i < n) {
      val bx = ring(2 * i); val by = ring(2 * i + 1)
      acc += ax * by - ay * bx
      ax = bx; ay = by
      i += 1
    }
    acc
  }
}
