package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.kernel.Kernels

/** The flagship distributed query: garden polygons x aerial tile table ->
  * per-garden vegetation fractions (the Spark-native re-expression of
  * analyse_polygons.main, reference: green_spaces/analyse_polygons.py:189-237,
  * calculate_indices.py:105-182, image_loaders.py:187-329).
  *
  * Plan shape (designed for a 100 TB tile table):
  *   1. prepare gardens (tiny side): CRS transform, centroid, area, cover
  *      cells, pixel-space blob — one narrow projection.
  *   2. group polygon blobs by cell -> cell→polys "interval index".
  *   3. join tiles ⋈ broadcast(cellPolys) on cell — the tile table streams,
  *      image bytes NEVER shuffle; each matched tile is decoded exactly
  *      once and scored against all covering polygons (ScoreFragments).
  *   4. explode fragment scores -> partial-aggregated (map-side combine)
  *      groupBy gid: only (gid, npix, veg[]) rows cross the wire.
  *   5. broadcast-join garden metadata back, derive fractions.
  *
  * Skew: dense cells cost per-tile work proportional to covering polygons;
  * no shuffle key carries image bytes, so AQE's skew-join handling plus the
  * small fragment rows keep hot cells bounded. When the polygon side
  * exceeds broadcast size, set broadcastPolys=false: the same plan runs as
  * a shuffled join co-partitioned on cell (tiles shuffle once; pre-bucket
  * the tile table by cell to eliminate even that at scale).
  */
object VegPipeline {

  final case class Config(
      tileSize: Int = 256,
      kernelNames: Seq[String] = Seq("greenleaf"),
      broadcastPolys: Boolean = true,
      handleMissingTiles: Boolean = true,
      /** Some(zoom): the web-mercator loader path (slippy "z/x/y" tiles,
        * y-down raster, area in tile^2 units, image_loaders.py:32-158). */
      webMercatorZoom: Option[Int] = None,
      /** >1 and !broadcastPolys: replicate the polygon side saltFactor
        * times and spray tiles across salts, spreading skewed (dense
        * urban) cells over partitions in the shuffle-join path. */
      saltFactor: Int = 1,
      /** decoded-tile / fragment accumulators (C3 statistics). */
      metrics: Option[PipelineMetrics] = None)

  import Exprs.{col => ec, expr => ee}

  /** Normalized gardens (id, uprn, geometry, crs) -> prepared metadata. */
  def prepareGardens(gardens: DataFrame, tileSize: Int,
                     webMercatorZoom: Option[Int] = None): DataFrame = {
    val withGid = gardens.withColumn("gid", monotonically_increasing_id())
    val prepExpr = webMercatorZoom match {
      case Some(z) => PrepareGardenWebMerc(
        ee(col("gid")), ee(col("geometry")), ee(col("crs")), z, tileSize)
      case None => PrepareGarden(
        ee(col("gid")), ee(col("geometry")), ee(col("crs")), tileSize)
    }
    withGid
      .withColumn("prep", ec(prepExpr))
      .select(col("gid"), col("id"), col("uprn"),
        col("prep.blob").as("blob"), col("prep.cells").as("cells"),
        col("prep.cx").as("cx"), col("prep.cy").as("cy"),
        col("prep.area_m2").as("area_m2"), col("prep.sort_key").as("sort_key"))
  }

  def tileCell(imageId: Column): Column = ec(TileCodeToCell(ee(imageId)))

  /** The reusable cell→polygon "interval index" artifact: prepared garden
    * metadata (persisted) + per-cell packed polygon blobs. Build once,
    * score any number of tile batches/streams against it. */
  final case class PolyIndex(prepared: DataFrame, cellPolys: DataFrame, tileSize: Int)

  def buildIndex(spark: SparkSession, gardens: DataFrame, tileSize: Int,
                 webMercatorZoom: Option[Int] = None): PolyIndex = {
    val prepared = prepareGardens(gardens, tileSize, webMercatorZoom)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cellPolys = prepared
      .select(explode(col("cells")).as("cell"), col("blob"))
      .groupBy("cell").agg(collect_list("blob").as("blobs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    PolyIndex(prepared, cellPolys, tileSize)
  }

  /** Per-garden result: gid, id, uprn, cx, cy, area_m2, sort_key, npix,
    * frac_<kernel>... */
  def run(spark: SparkSession, gardens: DataFrame, tiles: DataFrame,
          cfg: Config = Config(), cirTiles: Option[DataFrame] = None): DataFrame =
    scoreAgainst(spark, buildIndex(spark, gardens, cfg.tileSize, cfg.webMercatorZoom),
      tiles, cfg, cirTiles)

  def scoreAgainst(spark: SparkSession, index: PolyIndex, tiles: DataFrame,
                   cfg: Config, cirTiles: Option[DataFrame] = None): DataFrame = {
    val nK = cfg.kernelNames.length
    require(nK > 0, "at least one index kernel required")
    require(index.tileSize == cfg.tileSize, "index/config tile size mismatch")
    // format-compat check (reference: analyse_polygons.py:208-213)
    val fmts = cfg.kernelNames.map(Kernels.all(_).inputFormat).distinct
    require(fmts.size == 1,
      s"all kernels in one pass must share an input format, got $fmts")
    require(fmts.head != "IRGB" || cirTiles.nonEmpty,
      "IRGB kernels need the CIR tile table for Ir fusion (S3)")

    val prepared = index.prepared
    val cellPolys = index.cellPolys
    val useSalt = !cfg.broadcastPolys && cfg.saltFactor > 1
    val polysSide =
      if (cfg.broadcastPolys) broadcast(cellPolys)
      else if (useSalt)
        cellPolys.withColumn("salt",
          explode(array((0 until cfg.saltFactor).map(lit(_)): _*)))
      else cellPolys

    def keyToCell(c: Column): Column = cfg.webMercatorZoom match {
      case Some(z) => ec(SlippyKeyToCell(ee(c), z))
      case None => tileCell(c)
    }
    val rgbWithCell = tiles
      .select(keyToCell(col("image_id")).as("cell"), col("bytes"))
      .where(col("cell").isNotNull)

    // RGB ⋈ CIR fusion join on tile cell (J2) for IRGB kernels
    val tilesWithCell = cirTiles match {
      case Some(cir) =>
        val cirWithCell = cir
          .select(keyToCell(col("image_id")).as("cell"), col("bytes").as("cir_bytes"))
          .where(col("cell").isNotNull)
        rgbWithCell.join(cirWithCell, Seq("cell"), "left_outer")
      case None => rgbWithCell.withColumn("cir_bytes", lit(null).cast("binary"))
    }

    val scoreCol = ec(ScoreFragments(
      ee(col("cell")), ee(col("bytes")), ee(col("cir_bytes")), ee(col("blobs")),
      cfg.tileSize, cfg.kernelNames, yDown = cfg.webMercatorZoom.nonEmpty,
      metrics = cfg.metrics))

    val joinedTiles =
      if (useSalt)
        tilesWithCell.withColumn("salt", pmod(hash(col("bytes")), lit(cfg.saltFactor)))
          .join(polysSide, Seq("cell", "salt"))
      else tilesWithCell.join(polysSide, Seq("cell"))
    val scored = joinedTiles
      .select(col("cell"), explode(scoreCol).as("s"))
      .select(col("cell"), col("s.gid").as("gid"), col("s.npix").as("npix"), col("s.veg").as("veg"))

    val frags =
      if (cfg.handleMissingTiles) {
        val sc = scored.persist(StorageLevel.MEMORY_AND_DISK)
        val present = sc.select("cell").distinct()
        val missing = cellPolys.join(present, Seq("cell"), "left_anti")
        val missingScore = ec(ScoreFragments(
          ee(col("cell")), ee(lit(null).cast("binary")), ee(lit(null).cast("binary")), ee(col("blobs")),
          cfg.tileSize, cfg.kernelNames, yDown = cfg.webMercatorZoom.nonEmpty,
          metrics = cfg.metrics))
        val missingScored = missing
          .select(col("cell"), explode(missingScore).as("s"))
          .select(col("cell"), col("s.gid").as("gid"), col("s.npix").as("npix"), col("s.veg").as("veg"))
        sc.union(missingScored)
      } else scored

    val vegSums = (0 until nK).map(i => sum(col("veg")(i)).as(s"veg_$i"))
    val agg = frags.groupBy("gid")
      .agg(sum(col("npix")).as("npix"), vegSums: _*)

    val meta = prepared.select("gid", "id", "uprn", "cx", "cy", "area_m2", "sort_key")
    val joined = meta.join(agg, Seq("gid"), "left_outer")

    val fracCols = cfg.kernelNames.zipWithIndex.map { case (name, i) =>
      when(col("npix").isNull || col("npix") === 0L, lit(0.0))
        .otherwise(col(s"veg_$i").cast("double") / col("npix").cast("double"))
        .as(s"frac_$name")
    }
    joined.select(
      Seq(col("gid"), col("id"), col("uprn"), col("cx"), col("cy"),
        col("area_m2"), col("sort_key"),
        coalesce(col("npix"), lit(0L)).as("npix")) ++ fracCols: _*)
  }

  /** Global summary (A2): total area, per-index vegetation area + pct
    * (reference: analyse_polygons.py:135-155). */
  def summarize(perGarden: DataFrame, kernelNames: Seq[String]): DataFrame = {
    val aggs = kernelNames.flatMap { name =>
      Seq(sum(col("area_m2") * col(s"frac_$name")).as(s"veg_area_$name"))
    }
    val base = perGarden.agg(sum(col("area_m2")).as("total_area_m2"), aggs: _*)
    val pctCols = kernelNames.map { name =>
      (col(s"veg_area_$name") / col("total_area_m2") * 100.0).as(s"veg_pct_$name")
    }
    base.select(Seq(col("total_area_m2")) ++
      kernelNames.map(n => col(s"veg_area_$n")) ++ pctCols: _*)
  }

  /** toid->uprn explode (S8; reference: analyse_polygons.py:175-186). */
  def toid2uprn(perGarden: DataFrame): DataFrame =
    perGarden.select(col("id"), explode(col("uprn")).as("uprn"))
      .withColumnRenamed("id", "feature_id")
}
