package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Exprs, ScoreFragments, VegPipeline}

/** Structured-Streaming surface. The reference is batch-only (its
  * work-queue is the closest analogue, scripts/bulk_analyse.py) — the
  * engine exposes the tile-scoring stage as an incremental streaming
  * pipeline (stateless map + idempotent per-batch commit) plus a
  * windowed-aggregation path over event streams. */
object Streams {

  /** Incremental tile scoring: tiles arriving in a parquet directory are
    * scored against the (static) prepared garden index per micro-batch;
    * per-batch partial (gid, npix, veg) parquet is written idempotently by
    * batch id. Final fractions = re-aggregate over all batch outputs —
    * the same algebra that makes the batch pipeline mosaic-free makes the
    * streaming pipeline incremental. */
  def startTileScoring(spark: SparkSession, tilesDir: String, tileSchemaSource: DataFrame,
                       gardens: DataFrame, cfg: VegPipeline.Config, outDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import Exprs.{col => ec, expr => ee}
    val prepared = VegPipeline.prepareGardens(gardens, cfg.tileSize)
    val cellPolys = prepared
      .select(explode(col("cells")).as("cell"), col("blob"))
      .groupBy("cell").agg(collect_list("blob").as("blobs"))
    val cellPolysB = broadcast(cellPolys)

    val stream = spark.readStream.schema(tileSchemaSource.schema).parquet(tilesDir)
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val scoreCol = ec(ScoreFragments(
          ee(col("cell")), ee(col("bytes")), ee(lit(null).cast("binary")), ee(col("blobs")),
          cfg.tileSize, cfg.kernelNames))
        batch
          .select(VegPipeline.tileCell(col("image_id")).as("cell"), col("bytes"))
          .where(col("cell").isNotNull)
          .join(cellPolysB, Seq("cell"))
          .select(explode(scoreCol).as("s"))
          .select(col("s.gid").as("gid"), col("s.npix").as("npix"), col("s.veg").as("veg"))
          .groupBy("gid").agg(sum("npix").as("npix"),
            (cfg.kernelNames.indices.map(i => sum(col("veg")(i)).as(s"veg_$i"))): _*)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId") // idempotent per batch
        ()
      }
      .start()
  }

  /** Final per-garden fractions from the accumulated streaming partials. */
  def fractionsFromPartials(spark: SparkSession, outDir: String, gardens: DataFrame,
                            cfg: VegPipeline.Config): DataFrame = {
    val partials = spark.read.parquet(s"$outDir/batch=*")
    val nK = cfg.kernelNames.length
    val agg = partials.groupBy("gid").agg(
      sum("npix").as("npix"),
      (0 until nK).map(i => sum(col(s"veg_$i")).as(s"veg_$i")): _*)
    val meta = VegPipeline.prepareGardens(gardens, cfg.tileSize)
      .select("gid", "id", "uprn", "cx", "cy", "area_m2", "sort_key")
    val joined = meta.join(agg, Seq("gid"), "left_outer")
    val fracCols = cfg.kernelNames.zipWithIndex.map { case (name, i) =>
      when(col("npix").isNull || col("npix") === 0L, lit(0.0))
        .otherwise(col(s"veg_$i").cast("double") / col("npix").cast("double"))
        .as(s"frac_$name")
    }
    joined.select(
      Seq(col("gid"), col("id"), col("cx"), col("cy"), col("area_m2"),
        coalesce(col("npix"), lit(0L)).as("npix")) ++ fracCols: _*)
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
