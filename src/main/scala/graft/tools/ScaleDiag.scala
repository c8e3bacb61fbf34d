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
    val mode = if (a.nonEmpty) a(0) else "sweep"
    if (mode == "custom") {
      // args: custom <cpus:mpbMB:openKb> ... — 2 interleaved reps each
      val specs = a.drop(1).map { s =>
        val Array(c, m, o) = s.split(":"); (c.toInt, m.toInt, o.toInt)
      }
      val res = scala.collection.mutable.Map[(Int, Int, Int), List[Double]]().withDefaultValue(Nil)
      for (_ <- 1 to 2; sp <- specs) {
        val t = measure(sp._1, sp._2, sp._3)
        res(sp) = t :: res(sp)
      }
      for ((sp, ts) <- res.toSeq.sortBy(_._1))
        println(f"CUSTOM cpus=${sp._1} mpb=${sp._2}MB open=${sp._3}KB reps=${ts.map(t => f"$t%.2f").mkString(",")} min=${ts.min}%.2f")
    } else if (mode == "ab") {
      // interleaved A/B: 32MB (current bench config) vs 6MB, 3 reps each level
      val res = scala.collection.mutable.Map[(Int, Int), List[Double]]().withDefaultValue(Nil)
      for (_ <- 1 to 3; (mpb, open) <- Seq((32, 4096), (6, 1024)); cpus <- Seq(32, 8)) {
        val t = measure(cpus, mpb, open)
        res((cpus, mpb)) = t :: res((cpus, mpb))
      }
      for (((cpus, mpb), ts) <- res.toSeq.sortBy(_._1))
        println(f"AB cpus=$cpus mpb=${mpb}MB reps=${ts.map(t => f"$t%.2f").mkString(",")} min=${ts.min}%.2f")
      println(f"AB rawEff32MB=${res((8, 32)).min / (4 * res((32, 32)).min)}%.3f rawEff6MB=${res((8, 6)).min / (4 * res((32, 6)).min)}%.3f")
    } else {
      for ((mpb, open) <- Seq((32, 4096), (12, 1024), (6, 1024))) {
        val t32 = measure(32, mpb, open)
        val t8 = measure(8, mpb, open)
        println(f"--> mpb=${mpb}MB rawEff=${t8 / (4 * t32)}%.3f")
      }
    }
  }
}
