package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog abstraction over the aerial tile table (the "Iceberg table of
  * image + caption pairs" of the north rule). The engine only requires
  * the input_hint schema
  * (image_id, bytes, w, h, fmt, caption, phash); a real Iceberg/Delta
  * catalog slots in behind this trait without touching the pipeline —
  * partition pruning, snapshot isolation and bucketing-by-cell then come
  * from the table format. */
trait TileCatalog extends Serializable {
  def tiles(spark: SparkSession): DataFrame
  /** Companion CIR table for the IRGB fusion path (S3), if any. */
  def cirTiles(spark: SparkSession): Option[DataFrame] = None
}

/** Plain parquet directory catalog (what this sandbox uses). At scale,
  * write the table bucketed/sorted by tile cell so the shuffle-join
  * fallback becomes co-located. */
final case class ParquetTileCatalog(path: String, cirPath: Option[String] = None)
    extends TileCatalog {
  def tiles(spark: SparkSession): DataFrame = spark.read.parquet(path)
  override def cirTiles(spark: SparkSession): Option[DataFrame] =
    cirPath.map(spark.read.parquet)
}

/** Bucketed/sorted tile-table write path: at scale, the tile table is
  * written ONCE bucketed by its join cell, so every subsequent
  * shuffle-join run (broadcastPolys=false — the polygon side too big to
  * broadcast) streams the 100 TB side with NO Exchange: the bucketed
  * scan already carries HashPartitioning(cell, nBuckets) and only the
  * small polygon side shuffles to match. The reference's analogue is
  * its tile-sorted feature ordering for cache locality
  * (calculate_indices.py:110-137); bucketing is the cluster-grade
  * version of the same idea. */
object TileBuckets {

  /** Write `tiles` (input_hint schema) as a parquet table bucketed and
    * sorted by the materialized `cell` column. Rows whose image_id maps
    * outside the grid are dropped (they can never join). */
  def write(spark: SparkSession, tiles: DataFrame, tableName: String,
            nBuckets: Int, webMercatorZoom: Option[Int] = None): Unit = {
    import org.apache.spark.sql.functions.col
    val cellCol = webMercatorZoom match {
      case Some(z) => graft.pipeline.Exprs.col(
        graft.pipeline.SlippyKeyToCell(graft.pipeline.Exprs.expr(col("image_id")), z))
      case None => graft.pipeline.VegPipeline.tileCell(col("image_id"))
    }
    tiles.withColumn("cell", cellCol)
      .where(col("cell").isNotNull)
      // pre-shuffle into the bucket partitioning (same murmur hash), so
      // each writer holds exactly one bucket -> nBuckets files instead of
      // sourcePartitions x nBuckets small files (a 192-partition source
      // produced 6k files whose open cost dominated the bucketed scan)
      .repartition(nBuckets, col("cell"))
      .write.format("parquet")
      .bucketBy(nBuckets, "cell").sortBy("cell")
      .mode("overwrite")
      .saveAsTable(tableName)
  }

  def read(spark: SparkSession, tableName: String): DataFrame = spark.table(tableName)
}

/** Z-ordered tile-table layout: the RANGE-layout write path, complementing
  * [[TileBuckets]] (hash layout for co-located joins). Rows are clustered
  * by the Morton key of their grid cell ([[graft.index.ZOrder]]) —
  * `repartitionByRange + sortWithinPartitions` on the key — so each
  * parquet file covers a COMPACT 2-D region. Any bounding-box scan then
  * prunes on the per-file/row-group min/max statistics of the plain
  * cell_e/cell_n columns (no curve arithmetic in the reader): a narrow
  * strip query that would intersect EVERY file of a column-major layout
  * touches O(perimeter/blockside) files here — the OperatorsSpec pruning
  * test pins 4/16 vs 16/16 on exactly that adversarial strip. This is
  * what Delta/Iceberg `OPTIMIZE ZORDER BY` does; at 100 TB it is the
  * difference between a city-bbox scan reading hundreds of files or the
  * whole national table. */
object TileLayout {

  /** Write `tiles` (input_hint schema) z-order-clustered into nFiles
    * range partitions, with explicit cell_e/cell_n columns for the
    * reader's min/max pruning. 16-bit coordinates (the full OSGB grid is
    * 700×1300 km-cells; web-mercator beyond zoom 16 needs a wider
    * spread). */
  def writeZOrdered(tiles: DataFrame, path: String, nFiles: Int,
                    webMercatorZoom: Option[Int] = None): Unit = {
    import org.apache.spark.sql.functions.{col, lit, shiftright}
    val cellCol = webMercatorZoom match {
      case Some(z) => graft.pipeline.Exprs.col(
        graft.pipeline.SlippyKeyToCell(graft.pipeline.Exprs.expr(col("image_id")), z))
      case None => graft.pipeline.VegPipeline.tileCell(col("image_id"))
    }
    tiles.withColumn("cell", cellCol)
      .where(col("cell").isNotNull)
      // CellIndex packing: cell = (e << 31) | n
      .withColumn("cell_e", shiftright(col("cell"), 31).cast("int"))
      .withColumn("cell_n", col("cell").bitwiseAND(lit(0x7fffffffL)).cast("int"))
      .withColumn("zkey",
        graft.index.ZOrder.key(col("cell_e").cast("long"), col("cell_n").cast("long")))
      .repartitionByRange(nFiles, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(path)
  }
}

/** The 100 TB deployment shape: the tile table lives in a
  * [[SnapshotTable]] (Iceberg-style immutable data files + versioned
  * manifests) and every flagship run resolves ONE snapshot, prunes at
  * the MANIFEST level with the polygon index's covering-cell bounding
  * box (files whose per-file (cell_e, cell_n) min/max stats can't
  * intersect it are never planned — Iceberg's planning step), and then
  * the engine's covering-range image_id predicate
  * ([[graft.pipeline.VegPipeline.tileIdPredicate]]) prunes row-groups
  * WITHIN the surviving files. Two independent pruning levels, both
  * ahead of any decode work. */
object SnapshotTiles {
  import org.apache.spark.sql.functions._

  /** Stat columns every tile-table commit carries for manifest skipping. */
  val statCols: Seq[String] = Seq("cell_e", "cell_n")

  private def withCellCols(tiles: DataFrame, webMercatorZoom: Option[Int]): DataFrame = {
    val cellCol = webMercatorZoom match {
      case Some(z) => graft.pipeline.Exprs.col(
        graft.pipeline.SlippyKeyToCell(graft.pipeline.Exprs.expr(col("image_id")), z))
      case None => graft.pipeline.VegPipeline.tileCell(col("image_id"))
    }
    tiles.withColumn("cell", cellCol)
      .where(col("cell").isNotNull)
      .withColumn("cell_e", shiftright(col("cell"), 31))
      .withColumn("cell_n", col("cell").bitwiseAND(lit(0x7fffffffL)))
  }

  /** Commit `tiles` (input_hint schema) as a new snapshot,
    * z-order-clustered into `nFiles` range partitions (the
    * [[TileLayout]] layout) so each data file's (cell_e, cell_n)
    * min/max stats cover a COMPACT 2-D region — that tightness is what
    * makes the manifest bbox prune selective. */
  def append(spark: SparkSession, root: String, tiles: DataFrame, nFiles: Int,
             webMercatorZoom: Option[Int] = None): Long = {
    val clustered = withCellCols(tiles, webMercatorZoom)
      .withColumn("zkey", graft.index.ZOrder.key(col("cell_e"), col("cell_n")))
      .repartitionByRange(nFiles, col("zkey"))
      .sortWithinPartitions("zkey")
      .drop("cell", "zkey")
    SnapshotTable.append(spark, root, clustered, statCols)
  }

  /** The polygon index's covering-cell bounding box as manifest-prune
    * ranges — O(covering cells) aggregation, resolved once per run. An
    * empty index yields an impossible range, so the scan plans no real
    * work and the re-applied filter returns an empty frame. */
  def coveringRanges(index: graft.pipeline.VegPipeline.PolyIndex): Seq[SnapshotTable.Range] = {
    val e = shiftright(col("cell"), 31)
    val n = col("cell").bitwiseAND(lit(0x7fffffffL))
    val r = index.cellPolys.agg(min(e), max(e), min(n), max(n)).head()
    // The empty sentinel must prune EVERY file's [min,max] stats — a
    // (lo=1, hi=0) range fails to prune files whose stats straddle 0,
    // so they would be planned and scanned for nothing. (MaxValue,
    // MinValue) makes `max < lo` true for every file.
    if (r.isNullAt(0)) Seq(SnapshotTable.Range("cell_e", Long.MaxValue, Long.MinValue))
    else Seq(SnapshotTable.Range("cell_e", r.getLong(0), r.getLong(1)),
      SnapshotTable.Range("cell_n", r.getLong(2), r.getLong(3)))
  }
}

/** [[TileCatalog]] over a [[SnapshotTable]] tile table: snapshot-pinned
  * reads (version = time travel) with manifest-level covering-box
  * pruning. Compose with [[SnapshotTiles.coveringRanges]] once the
  * polygon index is built. */
final case class SnapshotTileCatalog(root: String,
                                     ranges: Seq[SnapshotTable.Range] = Nil,
                                     version: Option[Long] = None,
                                     cirRoot: Option[String] = None,
                                     cirVersion: Option[Long] = None)
    extends TileCatalog {
  def tiles(spark: SparkSession): DataFrame =
    SnapshotTable.scan(spark, root, ranges, version)
  // The CIR side pins its OWN version: a pinned RGB read next to a
  // latest-snapshot CIR read would tear if a CIR commit lands mid-job.
  override def cirTiles(spark: SparkSession): Option[DataFrame] =
    cirRoot.map(SnapshotTable.scan(spark, _, ranges, cirVersion))
}

/** C2: secondary disk cache for re-scanned tile sets (the reference
  * caches downloaded web-mercator tiles on local disk keyed by tile
  * path, so a second analysis run never re-fetches,
  * image_loaders.py:62-83). The Spark analogue caches a normalized tile
  * frame as local parquet keyed by a source tag: the first scan pays
  * the full acquisition cost (HTTP fetch / remote object store /
  * decode-normalize); every later run — including a different session —
  * re-reads the local parquet instead. */
object TileCache {
  def cached(spark: SparkSession, cacheRoot: String, key: String)
            (build: => DataFrame): DataFrame = {
    require(key.matches("[A-Za-z0-9._=-]+"), s"cache key '$key' must be path-safe")
    val dir = java.nio.file.Paths.get(cacheRoot, key)
    // parquet commit marker — a crashed write leaves no _SUCCESS and rebuilds
    if (!java.nio.file.Files.exists(dir.resolve("_SUCCESS")))
      build.write.mode("overwrite").parquet(dir.toString)
    spark.read.parquet(dir.toString)
  }
}

/** Deterministic synthetic catalog (tests/benchmarks). */
final case class SyntheticTileCatalog(gridW: Int, gridH: Int, tileSize: Int,
                                      withCir: Boolean = false, seed: Long = 42L)
    extends TileCatalog {
  def tiles(spark: SparkSession): DataFrame =
    graft.data.Synthetic.tiles(spark, gridW, gridH, tileSize, seed)
  override def cirTiles(spark: SparkSession): Option[DataFrame] =
    if (withCir) Some(graft.data.Synthetic.tilesCir(spark, gridW, gridH, tileSize, seed))
    else None
}
