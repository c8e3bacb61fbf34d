package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.data.Synthetic

/** One-shot generator for the cached benchmark parquet tables (same paths
  * Bench.benchData expects under data/gen). Run ahead of a bench so the
  * timed region measures the engine, not the generator.
  *
  * args: gridW tileSize nGardens
  */
object GenData {
  def main(args: Array[String]): Unit = {
    val grid = if (args.length > 0) args(0).toInt else 384
    val ts = if (args.length > 1) args(1).toInt else 256
    val nGardens = if (args.length > 2) args(2).toLong else 80000L
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .appName("graft-gendata")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tilesPath = s"data/gen/tilesjpg_g${grid}_ts$ts"
    val gardensPath = s"data/gen/gardens_n${nGardens}_g$grid"
    if (!Files.exists(Paths.get(tilesPath))) {
      // jpg tiles (reference format) with small row groups: with fat
      // binary rows, default 128 MB row groups make every reading task
      // buffer ~128 MB — 32 concurrent tasks then exceed the local heap
      Synthetic.tilesJpg(spark, grid, grid, ts).repartition(512)
        .write.mode("overwrite")
        .option("parquet.block.size", (4 * 1024 * 1024).toString)
        .parquet(tilesPath)
      println(s"wrote $tilesPath")
    }
    if (!Files.exists(Paths.get(gardensPath))) {
      Synthetic.gardens(spark, nGardens, grid, grid).repartition(8)
        .write.mode("overwrite").parquet(gardensPath)
      println(s"wrote $gardensPath")
    }
    spark.stop()
  }
}
