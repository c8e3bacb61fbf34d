package graft.pipeline

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpoint-resumable execution of the flagship scoring over an
  * arbitrarily large tile table (the engine's replacement for the
  * reference's atomic-rename work queue + sift + recombine,
  * scripts/bulk_analyse.py / bulk_sift_incomplete.py / bulk_recombine.py).
  *
  * The tile table is bucketed by cell hash into `buckets` units of work,
  * processed `groupSize` buckets per Spark job. Each completed group
  * appends a manifest line after its partial-sum parquet commits, so a
  * crashed run resumes by anti-joining the manifest — per-partition
  * lineage, idempotent (re-running a group overwrites its own output
  * only). The final fractions re-aggregate all partials (the same
  * distributive algebra the mosaic-free pipeline relies on).
  */
object Checkpoint {

  private def manifestPath(outDir: String) = Paths.get(outDir, "_manifest")

  def completedGroups(outDir: String): Set[Int] = {
    val p = manifestPath(outDir)
    if (!Files.exists(p)) Set.empty
    else Files.readAllLines(p).toArray.map(_.toString.trim).filter(_.nonEmpty).map(_.toInt).toSet
  }

  /** Score tiles in resumable groups; returns the number of groups run
    * this invocation. `maxGroups` limits work per call (used to simulate
    * interruption in tests; production passes Int.MaxValue). */
  def runGroups(spark: SparkSession, index: VegPipeline.PolyIndex, tiles: DataFrame,
                cfg: VegPipeline.Config, outDir: String,
                buckets: Int = 64, groupSize: Int = 8,
                maxGroups: Int = Int.MaxValue): Int = {
    Files.createDirectories(Paths.get(outDir))
    val done = completedGroups(outDir)
    val nGroups = (buckets + groupSize - 1) / groupSize
    val pending = (0 until nGroups).filterNot(done)
    val toRun = pending.take(maxGroups)

    val tilesWithBucket = tiles
      .withColumn("cell0", VegPipeline.tileCell(col("image_id")))
      .where(col("cell0").isNotNull)
      .withColumn("bucket", pmod(hash(col("cell0")), lit(buckets)))

    toRun.foreach { g =>
      val lo = g * groupSize
      val hi = math.min(lo + groupSize, buckets)
      val part = tilesWithBucket.where(col("bucket") >= lo && col("bucket") < hi)
        .drop("cell0", "bucket")
      val scored = VegPipeline.scoreAgainst(spark, index, part,
        cfg.copy(handleMissingTiles = false))
      val nK = cfg.kernelNames.length
      scored.select(
        Seq(col("gid"), col("npix")) ++
          cfg.kernelNames.zipWithIndex.map { case (nm, i) =>
            // recover exact integer veg counts (frac = veg/npix was one
            // rounded divide; round() restores the integer exactly)
            round(col(s"frac_$nm") * col("npix")).cast("long").as(s"veg_$i")
          }: _*)
        .write.mode("overwrite").parquet(s"$outDir/group=$g")
      // commit marker AFTER the data is durably written
      Files.writeString(manifestPath(outDir), s"$g\n",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      val _ = nK
    }
    toRun.size
  }

  /** Final per-garden fractions across all committed groups. The missing-
    * tile fragments (cells with polygons but no tile anywhere in the
    * table) are handled here, once, against the full covered-cell set. */
  def fractions(spark: SparkSession, index: VegPipeline.PolyIndex,
                cfg: VegPipeline.Config, outDir: String): DataFrame = {
    val nK = cfg.kernelNames.length
    val partials = spark.read.parquet(s"$outDir/group=*")
    val agg = partials.groupBy("gid").agg(
      sum("npix").as("npix"),
      (0 until nK).map(i => sum(col(s"veg_$i")).as(s"veg_$i")): _*)
    val meta = index.prepared.select("gid", "id", "uprn", "cx", "cy", "area_m2", "sort_key")
    val joined = meta.join(agg, Seq("gid"), "left_outer")
    val fracCols = cfg.kernelNames.zipWithIndex.map { case (name, i) =>
      when(col("npix").isNull || col("npix") === 0L, lit(0.0))
        .otherwise(col(s"veg_$i") / col("npix").cast("double"))
        .as(s"frac_$name")
    }
    joined.select(
      Seq(col("gid"), col("id"), col("cx"), col("cy"), col("area_m2"),
        coalesce(col("npix"), lit(0L)).as("npix")) ++ fracCols: _*)
  }
}
