package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.VegPipeline

/** Dev probe: flagship scaling on the jpg bench table across session
  * configs. Not part of the driver contract. */
object Probe384 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    a
  }

  def session(cpus: Int, maxPB: Long, extra: Map[String, String]): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"probe-$cpus-$maxPB")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.columnarReaderBatchSize", "128")
      .config("spark.sql.files.maxPartitionBytes", maxPB.toString)
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val tilesPath = "data/gen/tilesjpg_g576_ts256"
    val variants = Seq(
      ("base8MB", 8L * 1024 * 1024, Map.empty[String, String]),
      ("pb32MB", 32L * 1024 * 1024, Map.empty[String, String]),
      ("pb32MB-noloc", 32L * 1024 * 1024, Map("spark.locality.wait" -> "0")),
      ("pb8MB-batch1k", 8L * 1024 * 1024,
        Map("spark.sql.parquet.columnarReaderBatchSize" -> "1024"))
    )
    Seq(32, 8).foreach { cpus =>
      variants.foreach { case (tag, pb, extra) =>
        val s = session(cpus, pb, extra)
        val gardens = s.read.parquet("data/gen/gardens_n80000_g576")
        val idx = VegPipeline.buildIndex(s, gardens, 256)
        idx.cellPolys.count()
        val tiles = s.read.parquet(tilesPath)
        val cfg = VegPipeline.Config(tileSize = 256,
          kernelNames = Seq("greenleaf", "hsv"), handleMissingTiles = false)
        val reps = (1 to 3).map { i =>
          time(s"flagship [$tag] @$cpus $i") {
            VegPipeline.scoreAgainst(s, idx, tiles, cfg)
              .agg(count(lit(1)), sum("npix")).collect()(0)
            ()
          }
        }
        val _ = reps
        s.stop()
      }
    }
  }
}
