package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.{GeoFunctions => G}
import graft.jobs.AdminAreas.{AdminArea, CoverRow, CoverRowEx}

/** The flagship pipeline (SURVEY.md J5-J8, north rule): geoparse page
  * text → quadcell encode → multi-level cell equi-join against the
  * compacted admin cover → ray-casting PIP refine for boundary cells →
  * cell-ring-expansion kNN to nearest admin centre → z/x/y tile
  * aggregation. Everything is DataFrame + codegen expressions — the
  * spatial join is a plain Catalyst equi-join (AQE-optimizable), never a
  * custom physical operator, because the PIP→cell-join rewrite happens
  * at API level (SURVEY.md §4.3).
  *
  * Skew (J8): pages concentrate in few cells (cities). `saltBuckets > 0`
  * replicates cover rows of hot cells S ways and spreads their pages by
  * hash(url) — output-identical to the unsalted plan (asserted in spec).
  */
object SpatialJoin {

  final case class Params(
      coverMaxLevel: Int = 17,
      knnLevel: Int = 9,
      knnMaxRing: Int = 3,
      tileZoom: Int = 12,
      saltBuckets: Int = 0,
      hotCellMinPages: Long = 100000L)

  /** Geoparse: url + packed coordinate; drops pages with no mention.
    * Column pruning matters here — only (url, text) are read, never
    * html (SURVEY.md §4.2). */
  def geoparsedPoints(pages: DataFrame): DataFrame =
    pages.select(col("url"), G.geoparse_packed(col("text")).as("p"))
      .filter(col("p").isNotNull)
      .select(col("url"), G.packed_lat7(col("p")).as("lat7"),
        G.packed_lon7(col("p")).as("lon7"))

  /** J5: containment join. Returns (url, lat7, lon7, relation_id).
    * Refine is LOCALIZED (GeomCell): boundary cover rows carry their
    * clipped edges + SW-corner parity, so per-candidate cost is
    * O(edges-in-cell) — independent of polygon size — and the polygon
    * rings table never enters the hot path (only the rare `fallback`
    * cells join it). */
  def containmentJoin(spark: SparkSession, points: DataFrame,
      cover: Dataset[CoverRowEx], polygons: DataFrame, p: Params): DataFrame = {
    import spark.implicits._
    val coverDf = cover.toDF("relation_id", "cell", "full", "corner_inside",
      "fallback", "edges")
    // distinct cover levels: tiny (≤ maxLevel+1 values), driver-collected
    val levels = coverDf
      .select(shiftrightunsigned(col("cell"), 58).cast("int").as("l"))
      .distinct().as[Int].collect().sorted
    val pts = points.withColumn("pcell",
      G.cell_encode(col("lat7"), col("lon7"), lit(p.coverMaxLevel)))
    val keyed = pts.withColumn("jcell", explode(array(
      levels.map(l => G.cell_ancestor(col("pcell"), lit(l))): _*)))

    val cand =
      if (p.saltBuckets <= 1) keyed.join(coverDf, col("jcell") === col("cell"))
      else {
        // hot join keys measured exactly (one cheap agg), then salted
        val hot = keyed.groupBy("jcell").count()
          .filter(col("count") >= p.hotCellMinPages)
          .select(col("jcell").as("cell")).withColumn("hot", lit(true))
        val coverS = coverDf.join(broadcast(hot), Seq("cell"), "left_outer")
          .withColumn("salt", explode(when(col("hot").isNotNull,
            sequence(lit(0), lit(p.saltBuckets - 1))).otherwise(array(lit(0)))))
          .drop("hot")
        val keyedS = keyed.join(broadcast(hot), keyed("jcell") === hot("cell"), "left_outer")
          .drop("cell")
          .withColumn("salt", when(col("hot").isNotNull,
            pmod(xxhash64(col("url")), lit(p.saltBuckets)).cast("int")).otherwise(lit(0)))
          .drop("hot")
        keyedS.join(coverS, col("jcell") === col("cell") &&
          keyedS("salt") === coverS("salt"))
      }

    // branches recompute the candidate chain — a narrow all-codegen
    // pipeline from the source scan (no shuffle); streaming passes beat
    // materializing 10^7+ rows into the block manager (measured:
    // checkpoint contention inverted 8c vs 32c)
    val fullHits = cand.filter(col("full"))
      .select(col("url"), col("lat7"), col("lon7"), col("relation_id"))
    val localHits = cand.filter(!col("full") && !col("fallback"))
      .filter(G.point_in_cell(col("lon7"), col("lat7"), col("cell"),
        col("corner_inside"), col("edges")))
      .select(col("url"), col("lat7"), col("lon7"), col("relation_id"))
    val fallbackHits = cand.filter(col("fallback"))
      .join(polygons, "relation_id")
      .filter(G.point_in_rings(col("lon7"), col("lat7"), col("rings")))
      .select(col("url"), col("lat7"), col("lon7"), col("relation_id"))
    fullHits.union(localHits).union(fallbackHits)
  }

  /** J6: nearest admin centre by cell-ring expansion. Distance is exact
    * integer squared planar L2 in 1e-7° space with antimeridian wrap —
    * deterministic at any parallelism. Pages still unmatched after
    * `knnMaxRing` rings fall back to a broadcast argmin (the centroid
    * table is small — one row per admin area). */
  def knnCentres(spark: SparkSession, points: DataFrame,
      centres: DataFrame, p: Params): DataFrame = {
    val centIdx = centres.select(col("relation_id").as("c_rel"),
        col("c_lat7"), col("c_lon7"))
      .withColumn("ccell", G.cell_encode(col("c_lat7"), col("c_lon7"), lit(p.knnLevel)))

    def d2: Column = {
      val dlat = col("lat7") - col("c_lat7")
      val dlonRaw = abs(col("lon7") - col("c_lon7"))
      val dlon = least(dlonRaw, lit(3600000000L) - dlonRaw)
      dlat * dlat + dlon * dlon
    }
    // truncate lineage AND stats (Dataset.localCheckpoint keeps origin
    // statistics, which compound across loop rounds — see AdminAreas)
    def truncate(df: DataFrame): DataFrame =
      spark.createDataFrame({ val r = df.rdd; r.localCheckpoint(); r.count(); r },
        df.schema)
    // Phase 1 — expanding ring probe: find SOME candidate distance per
    // page (not necessarily the nearest yet).
    var remaining = truncate(points
      .withColumn("kcell", G.cell_encode(col("lat7"), col("lon7"), lit(p.knnLevel))))
    var probed: DataFrame = null // url, lat7, lon7, kcell, d2found
    var k = 0
    while (k <= p.knnMaxRing && !remaining.isEmpty) {
      val hit = remaining
        .withColumn("rc", explode(G.cell_ring(col("kcell"), lit(k))))
        .join(centIdx, col("rc") === col("ccell"))
        .groupBy("url").agg(min(d2).as("d2found"))
      val found = remaining.join(hit, "url")
        .select(col("url"), col("lat7"), col("lon7"), col("kcell"), col("d2found"))
      probed = if (probed == null) found else probed.union(found)
      remaining = truncate(remaining.join(hit, Seq("url"), "left_anti"))
      k += 1
    }
    // Phase 2 — exact gather: the true nearest lies within ceil(r/hCell)+1
    // rings of the probe hit (hCell = the cell's smaller dimension), so
    // gathering those rings and taking the argmin is EXACT. Pages whose
    // radius exceeds the ring cap — and pages never probed — fall back to
    // a broadcast argmin over the (small) centroid table.
    val hCell = (graft.geo.Cells.LatSpan >> p.knnLevel).toDouble
    val ringCap = p.knnMaxRing * 4
    def argminOver(cand: DataFrame): DataFrame =
      cand.withColumn("d2v", d2)
        .groupBy("url").agg(min(struct(col("d2v"), col("c_rel"))).as("b"))
        .select(col("url"), col("b.c_rel").as("nn_relation_id"))
    var result: DataFrame = null
    var needsFallback =
      remaining.select(col("url"), col("lat7"), col("lon7"))
    if (probed != null) {
      val withNeed = probed.withColumn("kneed",
        (ceil(sqrt(col("d2found")) / hCell) + 1).cast("int")).cache()
      val exact = argminOver(withNeed
        .filter(col("kneed") <= ringCap)
        .withColumn("rc", explode(flatten(transform(
          sequence(lit(0), col("kneed")),
          j => G.cell_ring(col("kcell"), j)))))
        .join(centIdx, col("rc") === col("ccell")))
      result = exact
      needsFallback = needsFallback.union(withNeed.filter(col("kneed") > ringCap)
        .select(col("url"), col("lat7"), col("lon7")))
    }
    if (!needsFallback.isEmpty) {
      val fb = argminOver(needsFallback.crossJoin(broadcast(centIdx)))
      result = if (result == null) fb else result.union(fb)
    }
    if (result == null) points.select(col("url")).limit(0)
      .withColumn("nn_relation_id", lit(null).cast("long"))
    else result
  }

  /** J7: z/x/y raster-tile aggregation of the join output. */
  def tiles(joined: DataFrame, zoom: Int): DataFrame =
    joined
      .withColumn("t", G.tile_zxy(col("lat7"), col("lon7"), lit(zoom)))
      .groupBy(col("t"), col("relation_id"))
      .agg(count(lit(1)).as("n_pages"))
      .select(
        lit(zoom).as("z"),
        col("t").bitwiseAND(lit((1L << zoom) - 1)).as("x"),
        shiftrightunsigned(col("t").bitwiseAND(lit((1L << 58) - 1)), zoom).as("y"),
        col("relation_id"), col("n_pages"))

  /** End-to-end: pages + assembled areas → per-url join rows + tiles.
    * `knn` is lazy — knnCentres drives driver-side actions (the ring
    * probe loop), which must not run unless the kNN output is wanted. */
  final class Outputs(val joined: DataFrame, knnThunk: () => DataFrame,
      val tileCounts: DataFrame) {
    lazy val knn: DataFrame = knnThunk()
  }

  /** Prepared polygon side: built once, reused across page batches —
    * the cover is a property of the admin dataset, not of the pages. */
  final case class Prepared(cover: Dataset[CoverRowEx], polygons: DataFrame,
      centres: DataFrame)

  def prepare(spark: SparkSession, areas: Dataset[AdminArea],
      p: Params = Params()): Prepared = {
    val complete = areas.filter(_.complete).cache()
    val cover = AdminAreas.coverTableDetailed(spark, complete, p.coverMaxLevel)
      .localCheckpoint() // materialize: read many times (levels + join)
    val polygons = complete.select(col("relationId").as("relation_id"), col("rings"))
      .localCheckpoint()
    val centres = complete
      .filter((a: AdminArea) => a.centreLat7.isDefined && a.centreLon7.isDefined)
      .select(col("relationId").as("relation_id"),
        col("centreLat7").as("c_lat7"), col("centreLon7").as("c_lon7"))
      .localCheckpoint()
    Prepared(cover, polygons, centres)
  }

  def run(spark: SparkSession, pages: DataFrame, areas: Dataset[AdminArea],
      p: Params): Outputs =
    run(spark, pages, prepare(spark, areas, p), p)

  def run(spark: SparkSession, pages: DataFrame, areas: Dataset[AdminArea]): Outputs =
    run(spark, pages, prepare(spark, areas, Params()), Params())

  def run(spark: SparkSession, pages: DataFrame, prep: Prepared,
      p: Params): Outputs = {
    val pts = geoparsedPoints(pages)
    val joined = containmentJoin(spark, pts, prep.cover, prep.polygons, p)
    new Outputs(joined, () => knnCentres(spark, pts, prep.centres, p),
      tiles(joined, p.tileZoom))
  }
}
