package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.VegPipeline

/** Temporary: utilization at 8/32 threads under finer input splits. */
object ScaleDiag {
  def main(a: Array[String]): Unit = {
    val tilesPath = "data/gen/tilesjpg_g400x1200_ts256"
    val gardensPath = "data/gen/gardens_n80000_g400x1200"
    val ts = 256

    def measure(cpus: Int, mpbMb: Int, openKb: Int): Double = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]").appName(s"scalediag-$cpus-$mpbMb")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.columnarReaderBatchSize", "128")
        .config("spark.sql.files.maxPartitionBytes", (mpbMb.toLong * 1024 * 1024).toString)
        .config("spark.sql.files.openCostInBytes", (openKb.toLong * 1024).toString)
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      val tasks = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long)]()
      val lis = new SparkListener {
        override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) tasks.add((e.stageId, m.executorRunTime, m.executorCpuTime / 1000000))
        }
      }
      val tiles = s.read.parquet(tilesPath)
      val idx = VegPipeline.buildIndex(s, s.read.parquet(gardensPath), ts)
      idx.cellPolys.count()
      val cfg = VegPipeline.Config(tileSize = ts,
        kernelNames = Seq("greenleaf", "hsv"), handleMissingTiles = false)
      def full(): Unit = {
        VegPipeline.scoreAgainst(s, idx, tiles, cfg)
          .agg(count(lit(1)), sum("npix")).collect(); ()
      }
      full() // warm
      s.sparkContext.addSparkListener(lis)
      val t0 = System.nanoTime(); full(); val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      s.sparkContext.removeSparkListener(lis)
      import scala.jdk.CollectionConverters._
      val big = tasks.asScala.toSeq.groupBy(_._1).maxBy(_._2.map(_._2).sum)._2
      val run = big.map(_._2)
      println(f"cpus=$cpus mpb=${mpbMb}MB openKb=$openKb: wall=$wall%.2f n=${run.size} " +
        f"sumRun=${run.sum / 1000.0}%.2f sumCpu=${big.map(_._3).sum / 1000.0}%.2f maxTask=${run.max / 1000.0}%.2f util=${run.sum / 1000.0 / (cpus * wall)}%.2f")
      s.stop()
      wall
    }
    for ((mpb, open) <- Seq((32, 4096), (12, 1024), (6, 1024))) {
      val t32 = measure(32, mpb, open)
      val t8 = measure(8, mpb, open)
      println(f"--> mpb=${mpb}MB rawEff=${t8 / (4 * t32)}%.3f")
    }
  }
}
