package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.VegPipeline

/** Structured-Streaming surface. The reference is batch-only (its
  * work-queue is the closest analogue, scripts/bulk_analyse.py) — the
  * engine exposes the tile-scoring stage as an incremental streaming
  * pipeline (stateless map + idempotent per-batch commit) plus a
  * windowed-aggregation path over event streams. */
object Streams {

  /** Incremental tile scoring: tiles arriving in a parquet directory are
    * scored against the (static) prepared garden index per micro-batch;
    * per-batch raw-long (gid, npix, veg_i) partials — plus the batch's
    * distinct cell set — are written idempotently by batch id. Final
    * fractions = re-aggregate over all batch outputs — the same
    * distributive algebra that makes the batch pipeline mosaic-free makes
    * the streaming pipeline incremental. */
  def startTileScoring(spark: SparkSession, tilesDir: String, tileSchemaSource: DataFrame,
                       gardens: DataFrame, cfg: VegPipeline.Config, outDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val index = VegPipeline.buildIndex(spark, gardens, cfg.tileSize, cfg.webMercatorZoom)
    // per-batch pruning would re-derive the covering predicate each
    // micro-batch for no scan benefit (batches are already small)
    val batchCfg = cfg.copy(handleMissingTiles = false, pruneTileScan = false)

    val stream = spark.readStream.schema(tileSchemaSource.schema).parquet(tilesDir)
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // idempotent per batch: overwrite both artifacts by batch id
        VegPipeline.fragmentSums(spark, index, batch, batchCfg)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        VegPipeline.presentCells(batch, batchCfg)
          .write.mode("overwrite").parquet(s"$outDir/cells/batch=$batchId")
        ()
      }
      .start()
  }

  /** Final per-garden fractions from the accumulated streaming partials.
    * With cfg.handleMissingTiles (the batch default), covered cells never
    * seen in ANY batch get the reference's zero-fill fragments here, once
    * — same semantics as the batch path with handleMissingTiles=true. */
  def fractionsFromPartials(spark: SparkSession, outDir: String, gardens: DataFrame,
                            cfg: VegPipeline.Config): DataFrame = {
    val index = VegPipeline.buildIndex(spark, gardens, cfg.tileSize, cfg.webMercatorZoom)
    val nK = cfg.kernelNames.length
    val partials = spark.read.parquet(s"$outDir/batch=*")
    val withMissing =
      if (cfg.handleMissingTiles)
        partials.unionByName(
          VegPipeline.missingSumsFromPresent(
              spark.read.parquet(s"$outDir/cells/batch=*").distinct(), index, cfg)
            .select(Seq(col("gid"), col("npix")) ++
              (0 until nK).map(i => col("veg")(i).as(s"veg_$i")): _*))
      else partials
    val agg = withMissing.groupBy("gid").agg(
      sum("npix").as("npix"),
      (0 until nK).map(i => sum(col(s"veg_$i")).as(s"veg_$i")): _*)
    VegPipeline.fractionsFromSums(index, agg, cfg)
      .drop("uprn", "sort_key")
  }

  /** Windowed streaming aggregation over an event stream (hourly windows,
    * per type), run to completion on a static parquet dir — the canonical
    * readStream -> window -> memory-sink pattern. */
  def hourlyEventCounts(spark: SparkSession, eventsPath: String): DataFrame = {
    val static = spark.read.parquet(eventsPath)
    // the file streaming source requires a directory; stage single files
    val srcDir = {
      val p = java.nio.file.Paths.get(eventsPath)
      if (java.nio.file.Files.isDirectory(p)) eventsPath
      else {
        val d = java.nio.file.Files.createTempDirectory("graft_stream_src")
        java.nio.file.Files.copy(p, d.resolve(p.getFileName))
        d.toString
      }
    }
    val stream = spark.readStream.schema(static.schema).parquet(srcDir)
    val agg = stream
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ parquet -> event time
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
    val sinkName = "graft_hourly_events"
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(sinkName).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(sinkName)
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start", "event_type")
  }
}
