package graft.tools

import org.apache.spark.sql.SparkSession

import graft.data.Synthetic
import graft.pipeline.VegPipeline

/** Quiet-epoch hunter for the N-vs-4N scaling rows (BENCH/BASELINE.md):
  * this VM's hypervisor delivers 32 vCPUs only in some epochs, so the
  * run first probes the no-Spark kernel ceiling (~15 s) and only spends
  * on the Spark measurement when the host is quiet (8→32 ceiling >=
  * SPARK_GRAFT_MIN_CEILING). Measures ALL THREE levels (2/8/32) so one
  * quiet window yields both the primary 2→8 and secondary 8→32 pair.
  * Prints one JSON line per attempt: {"skipped":true,...} or the full
  * measurement with engine-vs-ceiling ratios. */
object ScalingHunt {

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

  /** Waves-aware split rule, shared with Bench (one implementation so the
    * two measurement paths can never drift — Bench's version also RESETS
    * to the defaults when the rule does not fire, which matters when a
    * finer-split quarter-table scan precedes a timed full-table one). */
  private def tuneSplits(s: SparkSession, path: String, cpus: Int): Unit =
    graft.Bench.tuneSplits(s, path, cpus)

  def main(args: Array[String]): Unit = {
    val minCeiling = sys.env.getOrElse("SPARK_GRAFT_MIN_CEILING", "0.72").toDouble
    val tilesPath = sys.env.getOrElse("SPARK_GRAFT_TILES", "data/gen/tilesjpg_g400x1200_ts256")
    val gardensPath = sys.env.getOrElse("SPARK_GRAFT_GARDENS", "data/gen/gardens_n80000_g400x1200")
    val ts = 256
    val nTiles = sys.env.getOrElse("SPARK_GRAFT_NTILES", "480000").toLong

    // ---- kernel ceiling probe (same-count pairs, as Bench)
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
    def kernels(): (Double, Double) = {
      val k2 = (1 to 3).map(_ => work(12000, 2)).min
      val k8small = (1 to 3).map(_ => work(12000, 8)).min
      val k8 = (1 to 3).map(_ => work(48000, 8)).min
      val k32 = (1 to 3).map(_ => work(48000, 32)).min
      (k2 / (4.0 * k8small), k8 / (4.0 * k32))
    }
    work(4000, 32) // warm
    val (k28pre, k832pre) = kernels()

    // SPARK_GRAFT_RAW832: hunt a RAW (not marginal) 8->32 efficiency row
    // — plain t8/(4·t32) on the full table, the number the north rule
    // quotes directly — in the shortest possible window: only the 8 and
    // 32 levels, one timed rep each after warm, 32 first (it is the
    // level the hypervisor sabotages), bracketing kernel ceilings before
    // AND after. Gate high (the r4 verdict asks for raw >= 0.8 at
    // ceiling >= 0.85), so most probes skip cheaply at the ~15 s kernel
    // probe and the Spark spend lands only on genuinely quiet epochs.
    if (sys.env.contains("SPARK_GRAFT_RAW832")) {
      if (k832pre < minCeiling) {
        println(f"""{"mode":"raw832","kernel_eff_8_32":$k832pre%.3f,"skipped":true}""")
        return
      }
      def rawAt(cpus: Int): (Double, Long, Long) = {
        val s = session(cpus)
        import org.apache.spark.sql.functions._
        val idx = VegPipeline.buildIndex(s, s.read.parquet(gardensPath), ts)
        idx.cellPolys.count()
        tuneSplits(s, tilesPath, cpus)
        val cfg = VegPipeline.Config(tileSize = ts,
          kernelNames = Seq("greenleaf", "hsv"), handleMissingTiles = false)
        def run(): (Long, Long) = {
          val res = VegPipeline.scoreAgainst(s, idx, s.read.parquet(tilesPath), cfg)
          val row = res.agg(count(lit(1)), sum("npix"), sum("frac_greenleaf"), sum("frac_hsv")).collect()(0)
          (row.getAs[Long](0), row.getAs[Long](1))
        }
        val (rows, pix) = run() // warm
        val t = {
          val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
        }
        s.stop()
        (t, rows, pix)
      }
      val (t32, r32, p32) = rawAt(32)
      val (t8, r8, p8) = rawAt(8)
      require(r8 == r32 && p8 == p32, "output mismatch across parallelism levels")
      val eff = t8 / (4.0 * t32)
      val (_, k832post) = kernels()
      val ceil = math.max(k832pre, k832post)
      println(f"""{"mode":"raw832","kernel_eff_8_32":$k832pre%.3f,"kernel_eff_8_32_after":$k832post%.3f,""" +
        f""""t8_sec":$t8%.3f,"t32_sec":$t32%.3f,"efficiency_8_32":$eff%.3f,""" +
        f""""ratio_to_ceiling":${eff / ceil}%.3f,"tiles_per_sec_32":${nTiles / t32}%.1f,"skipped":false}""")
      return
    }

    // SPARK_GRAFT_MARGINAL: hunt the fixed-cost-free 8->32 MARGINAL
    // efficiency (two job sizes per level, slope w = (t_full - t_q)/dn;
    // see Bench's twosize block) in a short window — no 2-core runs, so
    // one attempt fits a ~1-minute quiet epoch. Gated on the 8->32
    // ceiling alone.
    if (sys.env.contains("SPARK_GRAFT_MARGINAL")) {
      if (k832pre < minCeiling) {
        println(f"""{"mode":"marginal","kernel_eff_8_32":$k832pre%.3f,"skipped":true}""")
        return
      }
      val quarterPath = sys.env.getOrElse("SPARK_GRAFT_TILES_Q", "data/gen/tilesjpg_g400x300_ts256")
      val nTilesQ = sys.env.getOrElse("SPARK_GRAFT_NTILES_Q", "120000").toLong
      // SPARK_GRAFT_FAST_PROBE: one timed rep per (level, size) instead of
      // min-of-2 — halves the Spark-measurement span so a probe fits the
      // short quiet windows this hypervisor actually delivers (two 0.75+
      // windows on record collapsed before a min-of-2 probe finished).
      val nReps = if (sys.env.contains("SPARK_GRAFT_FAST_PROBE")) 1 else 2
      def sizesAt(cpus: Int): (Double, Double, (Long, Long), (Long, Long)) = {
        val s = session(cpus)
        import org.apache.spark.sql.functions._
        val idx = VegPipeline.buildIndex(s, s.read.parquet(gardensPath), ts)
        idx.cellPolys.count()
        val cfg = VegPipeline.Config(tileSize = ts,
          kernelNames = Seq("greenleaf", "hsv"), handleMissingTiles = false)
        def run(path: String): (Long, Long) = {
          val res = VegPipeline.scoreAgainst(s, idx, s.read.parquet(path), cfg)
          val row = res.agg(count(lit(1)), sum("npix"), sum("frac_greenleaf"), sum("frac_hsv")).collect()(0)
          (row.getAs[Long](0), row.getAs[Long](1))
        }
        tuneSplits(s, tilesPath, cpus)
        val fpF = run(tilesPath)
        tuneSplits(s, quarterPath, cpus)
        val fpQ = run(quarterPath) // warm both
        tuneSplits(s, tilesPath, cpus)
        val tF = (1 to nReps).map { _ =>
          val t0 = System.nanoTime(); run(tilesPath); (System.nanoTime() - t0) / 1e9
        }.min
        tuneSplits(s, quarterPath, cpus)
        val tQ = (1 to nReps).map { _ =>
          val t0 = System.nanoTime(); run(quarterPath); (System.nanoTime() - t0) / 1e9
        }.min
        s.stop()
        (tF, tQ, fpF, fpQ)
      }
      // 32-level FIRST: the gate just verified the window is quiet, and
      // it is the 32-core measurement the hypervisor sabotages — the
      // 8-core level survives almost every epoch (probe 2 of the 2x-table
      // hunt collapsed exactly this way: 8-level clean, then the window
      // closed during the trailing 32-level).
      val (t32, t32q, fpF32, fpQ32) = sizesAt(32)
      val (t8, t8q, fpF8, fpQ8) = sizesAt(8)
      require(fpF8 == fpF32 && fpQ8 == fpQ32, "output mismatch across parallelism levels")
      val dn = (nTiles - nTilesQ).toDouble
      val w8 = (t8 - t8q) / dn
      val w32 = (t32 - t32q) / dn
      val effM = w8 / (4.0 * w32)
      val (_, k832post) = kernels()
      val ceil = math.max(k832pre, k832post)
      println(f"""{"mode":"marginal","kernel_eff_8_32":$k832pre%.3f,"kernel_eff_8_32_after":$k832post%.3f,""" +
        f""""t8_sec":$t8%.3f,"t8q_sec":$t8q%.3f,"t32_sec":$t32%.3f,"t32q_sec":$t32q%.3f,""" +
        f""""w8_us":${w8 * 1e6}%.2f,"w32_us":${w32 * 1e6}%.2f,""" +
        f""""c8_sec":${t8q - nTilesQ * w8}%.3f,"c32_sec":${t32q - nTilesQ * w32}%.3f,""" +
        f""""eff_marginal_8_32":$effM%.3f,"ratio_to_ceiling":${effM / ceil}%.3f,""" +
        f""""tiles_per_sec_32_marginal":${1.0 / w32}%.1f,"skipped":false}""")
      return
    }

    // two-mode: measure all three levels when the host is delivering 32
    // cores; fall back to the PRIMARY 2->8 pair alone when only the low
    // levels are quiet (most epochs on this VM); skip otherwise
    val full = k832pre >= minCeiling && k28pre >= 0.85 && k28pre <= 1.05
    val pairOnly = !full && k28pre >= 0.88 && k28pre <= 1.05 &&
      !sys.env.contains("SPARK_GRAFT_NO_PAIR28") // set once the 2->8 row is on record
    if (!full && !pairOnly) {
      println(f"""{"kernel_eff_2_8":$k28pre%.3f,"kernel_eff_8_32":$k832pre%.3f,"skipped":true}""")
      return
    }

    // ---- Spark 2/8/32, interleaved rounds, min-of-reps
    def repsAt(cpus: Int, n: Int): (Seq[Double], Long, Long) = {
      val s = session(cpus)
      import org.apache.spark.sql.functions._
      val idx = VegPipeline.buildIndex(s, s.read.parquet(gardensPath), ts)
      idx.cellPolys.count()
      tuneSplits(s, tilesPath, cpus)
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
    if (full) {
      val rounds = (1 to 2).map(_ => (repsAt(2, 2), repsAt(8, 2), repsAt(32, 2)))
      val reps2 = rounds.flatMap(_._1._1)
      val reps8 = rounds.flatMap(_._2._1)
      val reps32 = rounds.flatMap(_._3._1)
      require(rounds.forall(r => r._1._2 == r._2._2 && r._1._3 == r._2._3
          && r._2._2 == r._3._2 && r._2._3 == r._3._3),
        "output mismatch across parallelism levels")
      val t2 = reps2.min
      val t8 = reps8.min
      val t32 = reps32.min
      val eff28 = t2 / (4.0 * t8)
      val eff832 = t8 / (4.0 * t32)
      // re-probe AFTER so the quoted ceilings bracket the measurement window
      val (k28post, k832post) = kernels()
      val ceil832 = math.max(k832pre, k832post)
      println(f"""{"pair":"full","kernel_eff_2_8":$k28pre%.3f,"kernel_eff_8_32":$k832pre%.3f,""" +
        f""""kernel_eff_2_8_after":$k28post%.3f,"kernel_eff_8_32_after":$k832post%.3f,""" +
        f""""t2_sec":$t2%.3f,"t8_sec":$t8%.3f,"t32_sec":$t32%.3f,""" +
        f""""efficiency_2_8":$eff28%.3f,"efficiency_8_32":$eff832%.3f,""" +
        f""""reps2":[${reps2.map(r => f"$r%.2f").mkString(",")}],""" +
        f""""reps8":[${reps8.map(r => f"$r%.2f").mkString(",")}],""" +
        f""""reps32":[${reps32.map(r => f"$r%.2f").mkString(",")}],""" +
        f""""tiles_per_sec_32":${nTiles / t32}%.1f,""" +
        f""""ratio_832_to_ceiling":${eff832 / ceil832}%.3f,"skipped":false}""")
    } else {
      val rounds = (1 to 3).map(_ => (repsAt(2, 1), repsAt(8, 1)))
      val reps2 = rounds.flatMap(_._1._1)
      val reps8 = rounds.flatMap(_._2._1)
      require(rounds.forall(r => r._1._2 == r._2._2 && r._1._3 == r._2._3),
        "output mismatch across parallelism levels")
      val t2 = reps2.min
      val t8 = reps8.min
      val eff28 = t2 / (4.0 * t8)
      val (k28post, _) = kernels()
      println(f"""{"pair":"2_8","kernel_eff_2_8":$k28pre%.3f,"kernel_eff_2_8_after":$k28post%.3f,""" +
        f""""kernel_eff_8_32":$k832pre%.3f,""" +
        f""""t2_sec":$t2%.3f,"t8_sec":$t8%.3f,"efficiency_2_8":$eff28%.3f,""" +
        f""""reps2":[${reps2.map(r => f"$r%.2f").mkString(",")}],""" +
        f""""reps8":[${reps8.map(r => f"$r%.2f").mkString(",")}],""" +
        f""""tiles_per_sec_8":${nTiles / t8}%.1f,"skipped":false}""")
    }
  }
}
