package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.VegPipeline

/** Dev scratch: print the physical join strategy of the IRGB fused scan
  * (is the byte-carrying RGB⋈CIR join sorting its payload rows?). */
object IrgbPlan {
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
    val idx = VegPipeline.buildIndex(spark, spark.read.parquet(gardens), ts)
    idx.cellPolys.count()
    val irgbCfg = VegPipeline.Config(tileSize = ts,
      kernelNames = Seq("ndvi-irgb", "matt"), handleMissingTiles = false)
    val res = VegPipeline.scoreAgainst(spark, idx, spark.read.parquet(rgbQ), irgbCfg,
      Some(spark.read.parquet(cirQ)))
    val agg = res.agg(count(lit(1)), sum("npix"))
    agg.collect() // executed plan with AQE final
    println("=== executed plan (final) ===")
    println(agg.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
