package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Decoded-tile / fragment metrics (the engine's analogue of the
  * reference's cache request/hit/miss counters and statistics_report,
  * image_loaders.py:44-45,160-184,305-329 — per BASELINE's
  * "per-partition lineage + decoded-tile metrics").
  *
  * Spark accumulators: serialized into the scoring expression, merged
  * back per task — correct on a real multi-executor cluster, not just
  * local mode. */
final case class PipelineMetrics(tilesDecoded: LongAccumulator,
                                 fragmentsScored: LongAccumulator,
                                 missingTileFragments: LongAccumulator)
    extends Serializable {

  /** One-line usage report (reference report_usage/statistics_report). */
  def report: String =
    s"Tiles decoded: ${tilesDecoded.value}; fragments scored: ${fragmentsScored.value};" +
      s" missing-tile fragments: ${missingTileFragments.value}"
}

object PipelineMetrics {
  def create(spark: SparkSession): PipelineMetrics = PipelineMetrics(
    spark.sparkContext.longAccumulator("graft.tilesDecoded"),
    spark.sparkContext.longAccumulator("graft.fragmentsScored"),
    spark.sparkContext.longAccumulator("graft.missingTileFragments"))
}
