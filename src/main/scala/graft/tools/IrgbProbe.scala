package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.VegPipeline

/** Decompose the IRGB fused-join bench cost: RGB-only vs +CIR join vs
  * decode/upscale. Run: SPARK_GRAFT_SF_DIR=... runMain graft.tools.IrgbProbe */
object IrgbProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.columnarReaderBatchSize", "128")
      .config("spark.sql.files.maxPartitionBytes", (32 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rgbQ = "data/gen/tilesjpg_g400x300_ts256"
    val cirQ = "data/gen/tilescirjpg_g400x300_ts256"
    val gardens = "data/gen/gardens_n80000_g400x1200"
    val ts = 256
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(cirQ)))
      graft.data.Synthetic.tilesCirJpg(spark, 400, 300, ts)
        .repartition(96).write.mode("overwrite")
        .option("parquet.block.size", (4 * 1024 * 1024).toString).parquet(cirQ)
    val idx = VegPipeline.buildIndex(spark, spark.read.parquet(gardens), ts)
    idx.cellPolys.count()
    def t(tag: String)(f: => Unit): Unit = {
      f // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $tag min=${times.min}%.2f reps=${times.map(x => f"$x%.2f").mkString(",")}")
    }
    def score(cfg: VegPipeline.Config, cir: Option[String]): Unit = {
      val res = VegPipeline.scoreAgainst(spark, idx, spark.read.parquet(rgbQ), cfg,
        cir.map(spark.read.parquet))
      res.agg(count(lit(1)), sum("npix")).collect()
    }
    val rgbCfg = VegPipeline.Config(tileSize = ts,
      kernelNames = Seq("greenleaf", "hsv"), handleMissingTiles = false)
    val irgbCfg = VegPipeline.Config(tileSize = ts,
      kernelNames = Seq("ndvi-irgb", "matt"), handleMissingTiles = false)
    // driver-local microbench: one 128->256 bicubic plane upscale
    locally {
      val plane = Array.tabulate(128 * 128)(i => (i * 31).toByte)
      (1 to 50).foreach(_ => graft.img.Resize.bicubicPlane(plane, 128, 128, 256, 256))
      val t0 = System.nanoTime()
      (1 to 200).foreach(_ => graft.img.Resize.bicubicPlane(plane, 128, 128, 256, 256))
      println(f"PROBE bicubic_128_256_ms=${(System.nanoTime() - t0) / 200 / 1e6}%.3f")
    }
    t("rgb_quarter")(score(rgbCfg, None))
    t("irgb_quarter")(score(irgbCfg, Some(cirQ)))
    def ensureBucketed(name: String, srcPath: String): Unit = {
      val loc = new java.io.File(s"spark-warehouse/$name").getAbsolutePath
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(loc)))
        graft.sources.TileBuckets.write(spark, spark.read.parquet(srcPath), name, 32)
      else if (!spark.catalog.tableExists(name))
        spark.sql(s"CREATE TABLE $name (image_id STRING, bytes BINARY, w INT, h INT, " +
          s"fmt STRING, caption STRING, phash BIGINT, cell BIGINT) USING PARQUET " +
          s"CLUSTERED BY (cell) SORTED BY (cell) INTO 32 BUCKETS LOCATION '$loc'")
    }
    ensureBucketed("bench_rgb_q", rgbQ)
    ensureBucketed("bench_cir_q", cirQ)
    println("PROBE bucketed_rows rgb=" + spark.table("bench_rgb_q").count() +
      " cir=" + spark.table("bench_cir_q").count())
    def fp(tiles: org.apache.spark.sql.DataFrame, cir: Option[org.apache.spark.sql.DataFrame]) =
      VegPipeline.scoreAgainst(spark, idx, tiles, irgbCfg, cir)
        .agg(count(lit(1)), sum("npix")).collect()(0).toString
    println("PROBE fp_plain=" + fp(spark.read.parquet(rgbQ), Some(spark.read.parquet(cirQ))))
    println("PROBE fp_bucketed=" + fp(spark.table("bench_rgb_q"), Some(spark.table("bench_cir_q"))))
    t("irgb_bucketed") {
      VegPipeline.scoreAgainst(spark, idx, spark.table("bench_rgb_q"), irgbCfg,
        Some(spark.table("bench_cir_q")))
        .agg(count(lit(1)), sum("npix")).collect()
    }
    // join-only: same fused join, cheap RGB kernels would need RGB fmt; so
    // time the raw join+decode side via a count over the joined bytes
    t("cir_scan_decode") {
      import graft.pipeline.Exprs.{col => ec, expr => ee}
      spark.read.parquet(cirQ)
        .select(ec(graft.media.FrameFeatures(ee(col("bytes")))).as("f"))
        .agg(sum(element_at(col("f"), 1))).collect()
    }
    spark.stop()
  }
}
