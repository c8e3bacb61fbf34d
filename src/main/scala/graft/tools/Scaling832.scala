package graft.tools

import org.apache.spark.sql.SparkSession

import graft.data.Synthetic
import graft.pipeline.VegPipeline

/** Quiet-epoch hunter for the SECONDARY 8→32 scaling pair (BENCH/
  * BASELINE.md): this VM's hypervisor delivers 32 vCPUs only in some
  * epochs, so the run first probes the no-Spark kernel ceiling (~15 s)
  * and only spends on the Spark measurement when the host is quiet
  * (ceiling >= minCeiling). Prints one JSON line per attempt:
  * {"kernel_eff_8_32":…, "skipped":true} or the full measurement with
  * engine-vs-ceiling ratio. */
object Scaling832 {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]").appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.columnarReaderBatchSize", "128")
      .config("spark.sql.files.maxPartitionBytes", (32 * 1024 * 1024).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val minCeiling = sys.env.getOrElse("SPARK_GRAFT_MIN_CEILING", "0.72").toDouble
    val tilesPath = sys.env.getOrElse("SPARK_GRAFT_TILES", "data/gen/tilesjpg_g400x1200_ts256")
    val gardensPath = sys.env.getOrElse("SPARK_GRAFT_GARDENS", "data/gen/gardens_n80000_g400x1200")
    val ts = 256
    val nTiles = sys.env.getOrElse("SPARK_GRAFT_NTILES", "480000").toLong

    // ---- kernel ceiling probe (same-count 8 vs 32, as Bench)
    val jpgs = (0 until 64).map(i =>
      graft.img.Quality.encodeJPEG(Synthetic.tileRasterSmooth(400 + i % 8, 100 + i / 8, 256, 42L), 0.92f))
    def work(n: Int, threads: Int): Double = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      val tasks = (0 until n).map { i =>
        pool.submit(new Runnable {
          def run(): Unit = { graft.img.Codec.decodeBGR(jpgs(i % 64)); () }
        })
      }
      tasks.foreach(_.get())
      pool.shutdown()
      (System.nanoTime() - t0) / 1e9
    }
    work(4000, 32) // warm
    val k8 = (1 to 3).map(_ => work(48000, 8)).min
    val k32 = (1 to 3).map(_ => work(48000, 32)).min
    val kernelEff = k8 / (4.0 * k32)
    if (kernelEff < minCeiling) {
      println(f"""{"kernel_eff_8_32":$kernelEff%.3f,"kernel_t8":$k8%.2f,"kernel_t32":$k32%.2f,"skipped":true}""")
      return
    }

    // ---- Spark 8 vs 32, interleaved rounds, min-of-reps
    def repsAt(cpus: Int, n: Int): (Seq[Double], Long, Long) = {
      val s = session(cpus)
      import org.apache.spark.sql.functions._
      val idx = VegPipeline.buildIndex(s, s.read.parquet(gardensPath), ts)
      idx.cellPolys.count()
      val cfg = VegPipeline.Config(tileSize = ts,
        kernelNames = Seq("greenleaf", "hsv"), handleMissingTiles = false)
      def run(): (Long, Long) = {
        val res = VegPipeline.scoreAgainst(s, idx, s.read.parquet(tilesPath), cfg)
        val row = res.agg(count(lit(1)), sum("npix"), sum("frac_greenleaf"), sum("frac_hsv")).collect()(0)
        (row.getAs[Long](0), row.getAs[Long](1))
      }
      val (rows, pix) = run() // warm
      val reps = (1 to n).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      s.stop()
      (reps, rows, pix)
    }
    val rounds = (1 to 2).map(_ => (repsAt(8, 3), repsAt(32, 3)))
    val reps8 = rounds.flatMap(_._1._1)
    val reps32 = rounds.flatMap(_._2._1)
    require(rounds.forall(r => r._1._2 == r._2._2 && r._1._3 == r._2._3),
      "output mismatch across parallelism levels")
    val t8 = reps8.min
    val t32 = reps32.min
    val eff = (nTiles / t32) / (4.0 * (nTiles / t8))
    // re-probe the ceiling AFTER so the quoted same-run ceiling brackets
    // the Spark measurement window
    val k8b = (1 to 3).map(_ => work(48000, 8)).min
    val k32b = (1 to 3).map(_ => work(48000, 32)).min
    val kernelEffAfter = k8b / (4.0 * k32b)
    val ceil = math.max(kernelEff, kernelEffAfter)
    println(f"""{"kernel_eff_8_32":$kernelEff%.3f,"kernel_eff_8_32_after":$kernelEffAfter%.3f,""" +
      f""""t8_sec":$t8%.3f,"t32_sec":$t32%.3f,"efficiency_8_32":$eff%.3f,""" +
      f""""reps8":[${reps8.map(r => f"$r%.2f").mkString(",")}],"reps32":[${reps32.map(r => f"$r%.2f").mkString(",")}],""" +
      f""""tiles_per_sec_32":${nTiles / t32}%.1f,"ratio_to_ceiling":${eff / ceil}%.3f,"skipped":false}""")
  }
}
