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
object VegPipeline extends org.apache.spark.internal.Logging {

  final case class Config(
      tileSize: Int = 256,
      kernelNames: Seq[String] = Seq("greenleaf"),
      broadcastPolys: Boolean = true,
      handleMissingTiles: Boolean = true,
      /** Some(zoom): the web-mercator loader path (slippy "z/x/y" tiles,
        * y-down raster, area in tile^2 units, image_loaders.py:32-158). */
      webMercatorZoom: Option[Int] = None,
      /** Ceiling on the estimated broadcast-lookup size: when the
        * prepared polygon side exceeds it, the broadcast path is
        * auto-disabled and the same plan runs as the shuffled cell join
        * (the reference user never picks an execution strategy — the
        * cache self-sizes, analyse_polygons.py:203-206 — so the engine
        * must not OOM the driver just because broadcastPolys defaulted
        * to true on an oversized garden set). 2 GiB default: well under
        * driver/executor headroom and Spark's 8 GiB broadcast hard cap. */
      broadcastMaxBytes: Long = 2L << 30,
      /** >1 and !broadcastPolys: replicate the polygon side saltFactor
        * times and spray tiles across salts, spreading skewed (dense
        * urban) cells over partitions in the shuffle-join path. */
      saltFactor: Int = 1,
      /** Push the polygon set's covering range into the tile scan as an
        * image_id predicate (the reference never reads a tile outside the
        * covering range, image_loaders.py:266-269). Canonical-id IN set
        * for small extents, min/max range otherwise — both reach the
        * parquet reader as PushedFilters.
        *
        * PRECONDITION: image_ids must be in canonical form (the id
        * [[normalizeImageIds]] round-trips to itself; the reference only
        * ever reads canonically-named tiles, it builds paths FROM
        * coordinates, image_loaders.py:229-233). A parseable but
        * NON-canonical id (e.g. an OSGB code containing the skipped
        * letter 'I') decodes to the same cell yet fails the IN-set match
        * and is treated as missing (zero-filled). Run
        * [[normalizeImageIds]] at ingest when ids may be non-canonical. */
      pruneTileScan: Boolean = true,
      /** Covering-cell count above which pruning falls back from an exact
        * IN set to a sound min/max image_id range. The literal IN set is
        * serialized into every task binary and deserialized PER TASK —
        * measured at ~35 ms/task for 147k strings, which at 1000 scan
        * tasks costs more than the whole unpruned scan. 8k ids ≈ 200 KB
        * keeps that negligible; beyond it a covering set that large
        * overlaps most of the table anyway, so the min/max range (pushed
        * to parquet row-group stats) plus the exact cell join filter
        * capture nearly all the benefit. */
      pruneInSetMax: Int = 8192,
      /** decoded-tile / fragment accumulators (C3 statistics). */
      metrics: Option[PipelineMetrics] = None,
      /** Grid system for the cell→polygon index and the polygon⋈tile
        * join key. Square (default) = one cell per km tile, the
        * reference's semantics and the zero-fill/pruning-capable path.
        * A hex grid (H3-style axial hexes, [[graft.index.HexIndex]])
        * indexes polygons by the hexes of their covered tiles' centers;
        * the join matches a superset of the square-grid tile set whose
        * extra fragments score zero pixels, so the per-garden sums are
        * bit-identical. Hex requires handleMissingTiles=false (zero-fill
        * enumerates expected TILES, which only the square grid can) and
        * disables covering-range scan pruning. */
      grid: graft.index.GridSystem = graft.index.GridSystem.Square)

  import Exprs.{col => ec, expr => ee}

  /** Normalized gardens (id, uprn, geometry, crs) -> prepared metadata.
    *
    * gid is xxhash64(id): deterministic under partition recomputation,
    * executor loss and session restart (monotonically_increasing_id is
    * none of those — a recomputed partition can renumber rows, silently
    * mis-joining fragment sums onto the wrong garden, and checkpoint
    * partials written by a crashed run would not survive a resume).
    * Requires unique feature ids (the reference keys its outputs by
    * feature id too, analyse_polygons.py:157-165); 64-bit collision odds
    * at 10^6 features are ~3e-8. */
  def prepareGardens(gardens: DataFrame, tileSize: Int,
                     webMercatorZoom: Option[Int] = None,
                     grid: graft.index.GridSystem = graft.index.GridSystem.Square): DataFrame = {
    require(webMercatorZoom.isEmpty || grid == graft.index.GridSystem.Square,
      "non-square grids are only wired for the OSGB tile path")
    val withGid = gardens.withColumn("gid", xxhash64(col("id")))
    val prepExpr = webMercatorZoom match {
      case Some(z) => PrepareGardenWebMerc(
        ee(col("gid")), ee(col("geometry")), ee(col("crs")), z, tileSize)
      case None => PrepareGarden(
        ee(col("gid")), ee(col("geometry")), ee(col("crs")), tileSize, grid)
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
  final case class PolyIndex(prepared: DataFrame, cellPolys: DataFrame, tileSize: Int) {
    /** Memoized covering-range scan predicates (one per loader/config):
      * the index is immutable once built, so repeated scoring runs reuse
      * the computed id set instead of re-collecting it. */
    @transient private[pipeline] lazy val predicateCache =
      new java.util.concurrent.ConcurrentHashMap[(Option[Int], Int), Option[Column]]()

    /** Estimated in-memory size of [[broadcastLookup]], from one bounded
      * agg over the persisted `prepared` frame (3 longs to the driver):
      * each garden contributes its blob bytes once (blobs are
      * reference-shared across covering cells) plus an 8-byte array ref
      * per covering cell, and each distinct cell a map-entry overhead.
      * Drives the automatic broadcast↔shuffle path choice — computed
      * lazily and memoized so the shuffle-only path never pays for it. */
    @transient lazy val broadcastEstimateBytes: Long = {
      val r = prepared.agg(
        sum(length(col("blob"))), sum(size(col("cells"))), count(lit(1))).head()
      val blobBytes = if (r.isNullAt(0)) 0L else r.getLong(0)
      val cellRefs = if (r.isNullAt(1)) 0L else r.getLong(1)
      blobBytes + cellRefs * 8L + cellRefs * 64L // 64B/entry map overhead bound
    }

    /** The cell→blobs lookup as an executor-shared Broadcast variable,
      * materialized ONCE per index lifetime. A BroadcastHashJoin would
      * rebuild+rebroadcast its HashedRelation for EVERY query over the
      * same index — measurable seconds per run, and one rebuild per
      * micro-batch on the streaming path. Built lazily so the
      * shuffle-join path never pays for it.
      *
      * Built from `prepared` (one row per garden), sharing each blob's
      * byte array across all its covering cells: Java serialization
      * writes shared references once, so the broadcast does NOT pay the
      * per-covering-cell blob duplication that the exploded cellPolys
      * frame (and a HashedRelation over it) would. */
    @transient lazy val broadcastLookup
        : org.apache.spark.broadcast.Broadcast[java.util.HashMap[Long, Array[Array[Byte]]]] = {
      val buf = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuffer[Array[Byte]]]()
      prepared.select("blob", "cells").collect().foreach { r =>
        val blob = r.getAs[Array[Byte]](0)
        r.getSeq[Long](1).foreach { c =>
          buf.computeIfAbsent(c, _ => scala.collection.mutable.ArrayBuffer.empty) += blob
        }
      }
      val m = new java.util.HashMap[Long, Array[Array[Byte]]](buf.size())
      buf.forEach((k, v) => m.put(k, v.toArray))
      prepared.sparkSession.sparkContext.broadcast(m)
    }
  }

  def buildIndex(spark: SparkSession, gardens: DataFrame, tileSize: Int,
                 webMercatorZoom: Option[Int] = None,
                 grid: graft.index.GridSystem = graft.index.GridSystem.Square): PolyIndex = {
    val prepared = prepareGardens(gardens, tileSize, webMercatorZoom, grid)
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
    scoreAgainst(spark,
      buildIndex(spark, gardens, cfg.tileSize, cfg.webMercatorZoom, cfg.grid),
      tiles, cfg, cirTiles)

  def scoreAgainst(spark: SparkSession, index: PolyIndex, tiles: DataFrame,
                   cfg: Config, cirTiles: Option[DataFrame] = None): DataFrame =
    fractionsFromSums(index, fragmentSums(spark, index, tiles, cfg, cirTiles), cfg)

  private def keyToCell(cfg: Config)(c: Column): Column = cfg.webMercatorZoom match {
    case Some(z) => ec(SlippyKeyToCell(ee(c), z))
    case None => tileCell(c)
  }

  /** Canonical image_id of a packed cell — the exact inverse of
    * [[keyToCell]] for well-formed ids (the reference only ever reads
    * canonically-named tiles: it builds file paths FROM coordinates,
    * image_loaders.py:229-233, 266-269). */
  private def cellToImageId(cfg: Config, cell: Column = col("cell")): Column =
    cfg.webMercatorZoom match {
      case Some(z) =>
        concat(lit(s"$z/"), shiftright(cell, 31).cast("long"),
          lit("/"), (cell.bitwiseAND(lit(0x7fffffffL))).cast("long"))
      case None =>
        ec(CellToTileCode(
          ee(shiftright(cell, 31).cast("int")),
          ee(cell.bitwiseAND(lit(0x7fffffffL)).cast("int"))))
    }

  /** Covering-range scan pruning: a parquet-pushable predicate on
    * image_id derived from the polygon set's covering cells. Exact IN
    * set of canonical ids when the extent is small (the reference's
    * covering-range read, image_loaders.py:266-269); sound min/max id
    * range (row-group pruning via parquet stats) when it is not. None
    * when the polygon set covers nothing. */
  def tileIdPredicate(index: PolyIndex, cfg: Config): Option[Column] =
    index.predicateCache.computeIfAbsent((cfg.webMercatorZoom, cfg.pruneInSetMax), _ => {
      val ids = index.cellPolys.select(cellToImageId(cfg).as("tid"))
        .where(col("tid").isNotNull)
      // one bounded collect decides small-vs-large AND supplies the set
      val headIds = ids.limit(cfg.pruneInSetMax + 1).collect().map(_.getString(0))
      if (headIds.isEmpty) Some(lit(false))
      else if (headIds.length <= cfg.pruneInSetMax)
        Some(col("image_id").isInCollection(headIds.toSeq))
      else {
        val r = ids.agg(min("tid").as("lo"), max("tid").as("hi")).head()
        Some(col("image_id") >= r.getString(0) && col("image_id") <= r.getString(1))
      }
    })

  /** Rewrite image_id to canonical form by round-tripping through the
    * cell key (id -> cell -> canonical id); unparseable ids pass through
    * unchanged (and are skipped by scoring anyway). Run at ingest when a
    * tile catalog may contain parseable-but-non-canonical names, so the
    * covering-range pruning predicate ([[Config.pruneTileScan]]) and the
    * scored set agree. */
  def normalizeImageIds(tiles: DataFrame, cfg: Config): DataFrame =
    tiles.withColumn("image_id",
      coalesce(cellToImageId(cfg, keyToCell(cfg)(col("image_id"))), col("image_id")))

  /** The tile frame with the covering-range scan predicate applied — the
    * exact pruning [[fragmentSums]] performs internally. Exposed so
    * resumable/streaming callers zero-fill against the SAME tile set the
    * scoring pass saw (a tile dropped by pruning must count as missing,
    * not silently vanish from both passes). */
  def pruneTiles(tiles: DataFrame, index: PolyIndex, cfg: Config): DataFrame =
    if (!cfg.pruneTileScan || cfg.grid != graft.index.GridSystem.Square) tiles
    else tileIdPredicate(index, cfg).fold(tiles)(tiles.where)

  /** The distributive core: per-garden raw long sums
    * (gid, npix, veg_0..veg_{nK-1}) of all fragment scores. This is the
    * unit Checkpoint groups and streaming batches persist — re-aggregating
    * any partition of the tile table and summing is bit-exact (pure long
    * adds), so partials never round-trip through a double.
    *
    * `handleMissingTiles` adds the reference's zero-fill fragments
    * (image_loaders.py:239): cells covered by polygons but absent from
    * the tile table score against a null raster (onBlack classification,
    * full npix denominator). The present-cell set comes from a second,
    * image_id-column-only pass over the tile table — parquet column
    * pruning makes that a ~0.01% re-read, no fragment persist needed. */
  def fragmentSums(spark: SparkSession, index: PolyIndex, tiles: DataFrame,
                   cfg: Config, cirTiles: Option[DataFrame] = None): DataFrame = {
    val nK = cfg.kernelNames.length
    val frags = fragments(spark, index, tiles, cfg, cirTiles)
    val vegSums = (0 until nK).map(i => sum(col("veg")(i)).as(s"veg_$i"))
    frags.groupBy("gid").agg(sum(col("npix")).as("npix"), vegSums: _*)
  }

  /** The unaggregated fragment frame (gid, npix, veg[nK]) that
    * [[fragmentSums]] groups — one row per scored polygon∩tile fragment
    * (plus the zero-fill rows when handleMissingTiles). Exposed so the
    * correctness sidecars ([[graft.Sidecars]]) can hand the DuckDB oracle
    * the pipeline's pre-aggregation state: the oracle then re-derives the
    * groupBy-sum, metadata join and fraction division independently. */
  def fragments(spark: SparkSession, index: PolyIndex, tiles: DataFrame,
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
    val hexGrid = cfg.grid != graft.index.GridSystem.Square
    require(!hexGrid || !cfg.handleMissingTiles,
      "missing-tile zero-fill enumerates expected TILES, which only the " +
        "square grid keys; use handleMissingTiles=false with a hex grid")

    val cellPolys = index.cellPolys
    // automatic path selection: the broadcast-lookup formulation only when
    // the estimated lookup size fits the configured ceiling; otherwise the
    // shuffled cell join, without the caller having to know (What a user
    // of the reference never configures, the engine must not OOM over).
    val useBroadcast = cfg.broadcastPolys && {
      val est = index.broadcastEstimateBytes
      if (est > cfg.broadcastMaxBytes)
        logWarning(s"polygon index estimated at $est bytes exceeds " +
          s"broadcastMaxBytes=${cfg.broadcastMaxBytes}; using the shuffled cell join")
      est <= cfg.broadcastMaxBytes
    }
    val useSalt = !useBroadcast && cfg.saltFactor > 1

    def prune(df: DataFrame): DataFrame = pruneTiles(df, index, cfg)
    val prunedTiles = prune(tiles)
    // a pre-materialized `cell` column (the bucketed tile-table write
    // path, TileBuckets.write) is used as-is: deriving it again through
    // the key expression would discard the scan's bucket partitioning
    // and reintroduce the Exchange the bucketing exists to remove
    def withCell(df: DataFrame): DataFrame =
      if (df.columns.contains("cell")) df
      else df.withColumn("cell", keyToCell(cfg)(col("image_id")))
    val rgbWithCell = withCell(prunedTiles)
      .select(col("cell"), col("image_id"), col("bytes"))
      .where(col("cell").isNotNull)

    // RGB ⋈ CIR fusion join on tile cell (J2) for IRGB kernels.
    // Deliberately a SortMergeJoin: each side's payload crosses exactly
    // one Exchange (the floor for a non-co-located layout) and SMJ
    // spills gracefully. A shuffle_hash hint was MEASURED WORSE here
    // (IrgbProbe irgb_quarter 2.49 -> 2.87 s min with a 34 s GC-bound
    // outlier): the build side pins a partition's whole CIR payload in
    // an in-memory HashedRelation, which is exactly the §3.1 OOM risk
    // for fat rows. The zero-Exchange answer is the bucketed layout
    // (TileBuckets), benched separately as q34_irgb_bucketed.
    val tilesWithCell = cirTiles match {
      case Some(cir) =>
        val cirWithCell = withCell(prune(cir))
          .select(col("cell"), col("bytes").as("cir_bytes"))
          .where(col("cell").isNotNull)
        rgbWithCell.join(cirWithCell, Seq("cell"), "left_outer")
      case None => rgbWithCell.withColumn("cir_bytes", lit(null).cast("binary"))
    }

    // hex cover: the join key is the hex of the tile's CENTER; `cell`
    // stays the square tile cell that anchors the raster geometry
    val tilesKeyed =
      if (!hexGrid) tilesWithCell
      else tilesWithCell.withColumn("jcell", ec(PointCell(
        ee(shiftright(col("cell"), 31).cast("double") + lit(0.5)),
        ee(col("cell").bitwiseAND(lit(0x7fffffffL)).cast("double") + lit(0.5)),
        cfg.grid)))
    val joinKey = if (hexGrid) "jcell" else "cell"

    val scored =
      if (useBroadcast) {
        // map-side-join formulation: the cell→blobs lookup is an
        // executor-shared Broadcast built ONCE per index lifetime
        // (index.broadcastLookup) — a BroadcastHashJoin would rebuild its
        // HashedRelation per query / per streaming micro-batch. Uncovered
        // cells yield an empty fragment array, i.e. inner-join semantics.
        val scoreCol = ec(ScoreFragments(
          ee(col("cell")), ee(col("bytes")), ee(col("cir_bytes")),
          ee(lit(null).cast("array<binary>")),
          cfg.tileSize, cfg.kernelNames, yDown = cfg.webMercatorZoom.nonEmpty,
          metrics = cfg.metrics, lookup = Some(index.broadcastLookup),
          joinCell = if (hexGrid) Some(ee(col("jcell"))) else None))
        tilesKeyed
          .select(explode(scoreCol).as("s"))
          .select(col("s.gid").as("gid"), col("s.npix").as("npix"), col("s.veg").as("veg"))
      } else {
        val polysKeyed =
          if (hexGrid) cellPolys.withColumnRenamed("cell", "jcell") else cellPolys
        val polysSide =
          if (useSalt)
            polysKeyed.withColumn("salt",
              explode(array((0 until cfg.saltFactor).map(lit(_)): _*)))
          else polysKeyed
        val scoreCol = ec(ScoreFragments(
          ee(col("cell")), ee(col("bytes")), ee(col("cir_bytes")), ee(col("blobs")),
          cfg.tileSize, cfg.kernelNames, yDown = cfg.webMercatorZoom.nonEmpty,
          metrics = cfg.metrics))
        val joinedTiles =
          if (useSalt)
            // salt from the (short) image_id, not the ~100 KB image bytes —
            // any well-spread per-tile value works, hashing bytes is waste
            tilesKeyed.withColumn("salt", pmod(hash(col("image_id")), lit(cfg.saltFactor)))
              .join(polysSide, Seq(joinKey, "salt"))
          else tilesKeyed.join(polysSide, Seq(joinKey))
        joinedTiles
          .select(explode(scoreCol).as("s"))
          .select(col("s.gid").as("gid"), col("s.npix").as("npix"), col("s.veg").as("veg"))
      }

    if (cfg.handleMissingTiles)
      scored.union(missingTileSums(prunedTiles, index, cfg))
    else scored
  }

  /** Distinct cells present in a tile table — an image_id-column-only
    * scan (parquet column pruning skips the bytes entirely). */
  def presentCells(tiles: DataFrame, cfg: Config): DataFrame = {
    val cellCol =
      if (tiles.columns.contains("cell")) col("cell")
      else keyToCell(cfg)(col("image_id"))
    tiles.select(cellCol.as("cell"))
      .where(col("cell").isNotNull)
      .distinct()
  }

  /** Zero-fill fragment scores for covered cells absent from the tile
    * table (null raster -> onBlack classification). Returns unaggregated
    * (gid, npix, veg) rows. The tile scan here reads ONLY image_id. */
  def missingTileSums(tiles: DataFrame, index: PolyIndex, cfg: Config): DataFrame =
    missingSumsFromPresent(presentCells(tiles, cfg), index, cfg)

  /** As [[missingTileSums]] but from an already-computed present-cell
    * frame (the streaming path accumulates per-batch cell sets). */
  def missingSumsFromPresent(present: DataFrame, index: PolyIndex, cfg: Config): DataFrame = {
    val missing = index.cellPolys.join(present, Seq("cell"), "left_anti")
    val missingScore = ec(ScoreFragments(
      ee(col("cell")), ee(lit(null).cast("binary")), ee(lit(null).cast("binary")), ee(col("blobs")),
      cfg.tileSize, cfg.kernelNames, yDown = cfg.webMercatorZoom.nonEmpty,
      metrics = cfg.metrics))
    missing
      .select(explode(missingScore).as("s"))
      .select(col("s.gid").as("gid"), col("s.npix").as("npix"), col("s.veg").as("veg"))
  }

  /** Garden metadata ⋈ raw sums -> the per-garden result frame
    * (gid, id, uprn, cx, cy, area_m2, sort_key, npix, frac_<kernel>...). */
  def fractionsFromSums(index: PolyIndex, sums: DataFrame, cfg: Config): DataFrame = {
    val meta = index.prepared.select("gid", "id", "uprn", "cx", "cy", "area_m2", "sort_key")
    val joined = meta.join(sums, Seq("gid"), "left_outer")
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
    * (reference: analyse_polygons.py:135-155). Each double term is cast
    * to DECIMAL(28,4) before summing: decimal addition is exact, so the
    * totals are independent of partition/association order — a plain
    * double sum would drift in its last bits run-to-run at scale (and a
    * SQL oracle doing the same cast reproduces them bit-for-bit). Scale 4
    * (sub-cm² on m² values) stays far from the ~16-significant-digit edge
    * of a double, where Spark's shortest-repr-based double→decimal cast
    * and an exact-binary cast could round a digit apart. */
  def summarize(perGarden: DataFrame, kernelNames: Seq[String]): DataFrame = {
    def dsum(c: Column): Column = sum(c.cast("decimal(28,4)")).cast("double")
    val aggs = kernelNames.flatMap { name =>
      Seq(dsum(col("area_m2") * col(s"frac_$name")).as(s"veg_area_$name"))
    }
    val base = perGarden.agg(dsum(col("area_m2")).as("total_area_m2"), aggs: _*)
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
