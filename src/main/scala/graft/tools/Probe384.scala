package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.VegPipeline

/** Dev probe: isolate where wall-clock goes on the 384-grid bench table
  * (raw scan vs decode vs join vs pruning). Not part of the driver
  * contract. */
object Probe384 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    a
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.columnarReaderBatchSize", "128")
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tiles = spark.read.parquet("data/gen/tiles_g384_ts256")
    val gardens = spark.read.parquet("data/gen/gardens_n80000_g384")

    (1 to 3).foreach { i =>
      time(s"raw scan sum(length(bytes)) $i")(
        println(tiles.select(sum(length(col("bytes")))).collect()(0)))
    }

    val idx = VegPipeline.buildIndex(spark, gardens, 256)
    idx.cellPolys.count()

    def flag(label: String, cfg: VegPipeline.Config): Unit = (1 to 2).foreach { i =>
      time(s"$label $i") {
        val r = VegPipeline.scoreAgainst(spark, idx, tiles, cfg)
          .agg(count(lit(1)), sum("npix"), sum("frac_greenleaf"), sum("frac_hsv")).collect()(0)
        println(r)
      }
    }
    val base = VegPipeline.Config(tileSize = 256,
      kernelNames = Seq("greenleaf", "hsv"), handleMissingTiles = false)
    flag("flagship range-pruned", base.copy(pruneInSetMax = 1))
    flag("flagship inset-pruned", base)
    flag("flagship unpruned", base.copy(pruneTileScan = false))

    // raw filter cost on the scan alone
    val predIn = VegPipeline.tileIdPredicate(idx, base).get
    val predRange = VegPipeline.tileIdPredicate(idx, base.copy(pruneInSetMax = 1)).get
    (1 to 2).foreach { i =>
      time(s"scan+inset filter $i")(
        println(tiles.where(predIn).select(sum(length(col("bytes")))).collect()(0)))
      time(s"scan+range filter $i")(
        println(tiles.where(predRange).select(sum(length(col("bytes")))).collect()(0)))
    }
    spark.stop()
  }
}
