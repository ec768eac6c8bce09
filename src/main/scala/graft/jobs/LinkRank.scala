package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Damped fixed-point link rank (PageRank) as iterative DataFrame
  * joins — the canonical Pregel-style shape expressed declaratively:
  *
  *   r₀(v)   = SCALE
  *   rₖ₊₁(v) = (1−d)·SCALE + d · Σ_{(u,v)∈E} rₖ(u) DIV outdeg(u)
  *
  * in BIGINT fixed-point (SCALE = 1e6, d = 0.85 as ·850 DIV 1000), so
  * the result is bit-deterministic at any parallelism and a relational
  * oracle can replay it CTE-for-CTE.
  *
  * Scale design (10^10-edge graphs):
  *  - the degree-annotated edge list is built ONCE, hash-partitioned on
  *    `src`, and localCheckpointed — each iteration re-reads cached
  *    blocks instead of re-scanning the source (and the truncated
  *    lineage keeps the 5-join plan from compounding);
  *  - each iteration is exactly two shuffles: ranks→edges equi-join on
  *    `src` (co-partitioned with the cached edges), then the `dst`
  *    aggregation with map-side partial sums. Nothing is collected to
  *    the driver;
  *  - dangling vertices (no out-edges) simply contribute nothing, and
  *    contributions to `dst` ids ABSENT from `nodes` are dropped by the
  *    left join — rank mass leaks rather than being redistributed (the
  *    classic dangling-mass correction is deliberately omitted: it
  *    needs a per-iteration global scalar, and the damping floor keeps
  *    every rank positive; callers wanting stochastic-matrix semantics
  *    should pre-filter edges to `dst ∈ nodes` and add the dangling
  *    redistribution term themselves). Vertices with no in-edges take
  *    the (1−d) floor via the left join against the node set;
  *  - hot `dst` keys (celebrity pages) are a shuffle-skew concern, not
  *    a correctness one: partial aggregation absorbs them map-side and
  *    AQE skew handling splits the residue.
  *
  * For very deep iteration counts the caller should rebuild `ranks`
  * through an RDD round trip every ~10 rounds (Catalyst statistics
  * compound across localCheckpoint otherwise); at the 5 rounds the gate
  * uses, the straight chain is the faster plan.
  */
object LinkRank {

  val Scale = 1000000L

  /** @param nodes one `id` column (BIGINT), the vertex set
    * @param edges `src`, `dst` columns (BIGINT), one row per link */
  def run(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
      iters: Int): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e = edges.join(deg, "src").select("src", "dst", "outdeg")
      .repartition(col("src"))
      .localCheckpoint()
    var ranks = nodes.select(col("id"), lit(Scale).as("r"))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), expr("r DIV outdeg").as("c"))
        .groupBy("dst").agg(sum("c").as("acc"))
        .withColumnRenamed("dst", "id")
      ranks = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          expr("150000 + (850 * coalesce(acc, 0)) DIV 1000").as("r"))
    }
    ranks
  }
}
