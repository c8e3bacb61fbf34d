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
