package graft.jobs

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.geo.Geom

/** Many-polygon containment join: a 32×32 admin grid (1,024 areas,
  * multi-thousand-row cover — the regime where the polygon side is no
  * longer a toy) joined against deterministic points, pinned to the
  * exact plain-Scala PIP oracle, with the plan asserted to stay an
  * equi-join (broadcast or shuffled — never cartesian). */
class SpatialJoinScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val n = 32
  // grid cell ~0.53°, offset so rectangle edges do NOT align to cell
  // walls (lattice-aligned edges are covered by SpatialJoinSpec)
  private val lon0 = -171234567L
  private val lat0 = -205678901L
  private val step = 5300000L

  private lazy val areas: Seq[AdminAreas.AdminArea] =
    for (i <- 0 until n; j <- 0 until n) yield {
      val lo = lon0 + i * step; val hi = lo + step - 700001L
      val la = lat0 + j * step; val lb = la + step - 700001L
      AdminAreas.AdminArea((i * n + j).toLong, 8, s"r$i-$j",
        Seq(Seq(lo, la, hi, la, hi, lb, lo, lb)),
        Some((la + lb) / 2), Some((lo + hi) / 2), complete = true)
    }

  private lazy val points: Seq[(String, Long, Long)] =
    (0 until 20000).map { k =>
      val h1 = k * 2654435761L
      val h2 = k * 2971215073L
      ("p" + k,
        lat0 - 3000000L + Math.floorMod(h1, n * step + 6000000L),
        lon0 - 3000000L + Math.floorMod(h2, n * step + 6000000L))
    }

  test("1,024-polygon grid join matches the exact PIP oracle (20k points)") {
    val prep = SpatialJoin.prepare(spark, spark.createDataset(areas),
      SpatialJoin.Params(coverMaxLevel = 11))
    val nCover = prep.cover.count()
    info(s"cover rows: $nCover")
    assert(nCover > 4000, "the cover must be beyond toy size")
    val pts = points.toDF("url", "lat7", "lon7")
    val joined = SpatialJoin.containmentJoin(spark, pts, prep.cover,
      prep.polygons, SpatialJoin.Params(coverMaxLevel = 11))
    val plan = joined.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"plan degraded:\n$plan")
    val got = joined.select("url", "relation_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val ringArr = areas.map(a => a.relationId -> a.rings.map(_.toArray).toArray)
    val expected = (for {
      (url, lat7, lon7) <- points
      (rel, rings) <- ringArr
      if Geom.pointInRings(lon7, lat7, rings)
    } yield (url, rel)).toSet
    assert(expected.size > 10000, s"oracle hit count ${expected.size} too small")
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("salting on the grid join is output-identical") {
    val prep = SpatialJoin.prepare(spark, spark.createDataset(areas),
      SpatialJoin.Params(coverMaxLevel = 11))
    val pts = points.toDF("url", "lat7", "lon7")
    def run(p: SpatialJoin.Params) =
      SpatialJoin.containmentJoin(spark, pts, prep.cover, prep.polygons, p)
        .select("url", "relation_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    val plain = run(SpatialJoin.Params(coverMaxLevel = 11))
    val salted = run(SpatialJoin.Params(coverMaxLevel = 11,
      saltBuckets = 4, hotCellMinPages = 1))
    assert(plain == salted)
  }
}
