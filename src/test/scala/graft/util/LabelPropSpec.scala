package graft.util

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Focused spec for the shared min-label-propagation CC operator —
  * added with the r9 lazy-seed optimization (the seed plan folds into
  * round 1 instead of materializing its own checkpoint), pinning the
  * exact outputs the two production callers (near-dup clusters,
  * polygonize supergraph) rely on. */
class LabelPropSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)],
      nodes: Option[Seq[Long]] = None): Map[Long, Long] = {
    val both = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    LabelProp.components(spark, both.toDF("a", "b"),
        nodes = nodes.map(_.toDF("node")), shufflePartitions = Some(4))
      .as[(Long, Long)].collect().toMap
  }

  test("two components + isolated node resolve to min ids") {
    val got = comps(Seq((10L, 20L), (20L, 30L), (50L, 60L)),
      nodes = Some(Seq(10L, 20L, 30L, 50L, 60L, 99L)))
    assert(got === Map(10L -> 10L, 20L -> 10L, 30L -> 10L,
      50L -> 50L, 60L -> 50L, 99L -> 99L))
  }

  test("chain deeper than one round converges to one component") {
    // a path 1-2-3-...-12: min-label needs several propagation rounds,
    // exercising the loop past the fused seed round
    val chain = (1L until 12L).map(i => (i, i + 1))
    val got = comps(chain)
    assert(got.keySet === (1L to 12L).toSet)
    assert(got.values.toSet === Set(1L))
  }

  test("star with high-id hub converges in the seeded round") {
    val got = comps(Seq((100L, 1L), (100L, 2L), (100L, 3L)))
    assert(got === Map(100L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("empty edges with only isolated nodes yields singletons") {
    val got = comps(Seq.empty, nodes = Some(Seq(7L, 8L)))
    assert(got === Map(7L -> 7L, 8L -> 8L))
  }
}
