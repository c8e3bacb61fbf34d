package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{Exprs, ScoreFragments, TileCodeToCell, VegPipeline}

/** Dev profiler for the flagship pipeline: stage-by-stage timings +
  * explain, to find where wall-clock goes. Not part of the driver
  * contract. */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    a
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", sys.env.getOrElse("MAXPB", "134217728"))
      .config("spark.sql.parquet.columnarReaderBatchSize", sys.env.getOrElse("PQBATCH", "64"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import Exprs.{col => ec, expr => ee}

    val tilesPath = sys.env.getOrElse("SPARK_GRAFT_TILES", "data/gen/tilesjpg_g400x1200_ts256")
    val gardensPath = sys.env.getOrElse("SPARK_GRAFT_GARDENS", "data/gen/gardens_n80000_g400x1200")
    val tiles = spark.read.parquet(tilesPath)

    println(s"[profile] tile scan partitions: ${tiles.rdd.getNumPartitions}")
    time("tiles.count")(println(tiles.count()))
    time("bytes length sum")(
      println(tiles.select(sum(length(col("bytes")))).collect()(0)))

    // decode-only: score against zero polygons is skipped, so use a dummy
    // 1-polygon blob far away to force decode? Instead: decode via expression
    val decoded = tiles.select(
      ec(ScoreFragments(
        ee(Exprs.col(TileCodeToCell(ee(col("image_id"))))),
        ee(col("bytes")),
        ee(lit(null).cast("binary")),
        ee(array(lit(graft.pipeline.PolyBlob.serialize(0L, 0, 10, 0, 10,
          graft.geom.MPoly.fromPolygonCoords(Seq(Seq(Seq(1.0, 1.0), Seq(9.0, 1.0), Seq(9.0, 9.0), Seq(1.0, 9.0), Seq(1.0, 1.0)))))))),
        256, Seq("greenleaf"))).as("s"))
    time("decode+trivial-score x2")(println(decoded.select(count(col("s"))).collect()(0)))
    time("decode+trivial-score again")(println(decoded.select(count(col("s"))).collect()(0)))

    val gardens = spark.read.parquet(gardensPath)
    time("prepare gardens")(
      println(VegPipeline.prepareGardens(gardens, 256).select(count(lit(1))).collect()(0)))

    val res = VegPipeline.run(spark, gardens, tiles,
      VegPipeline.Config(tileSize = 256, kernelNames = Seq("greenleaf", "hsv"),
        handleMissingTiles = false))
    time("full pipeline run 1")(
      println(res.agg(count(lit(1)), sum("npix"), sum("frac_greenleaf")).collect()(0)))
    val res2 = VegPipeline.run(spark, gardens, tiles,
      VegPipeline.Config(tileSize = 256, kernelNames = Seq("greenleaf", "hsv"),
        handleMissingTiles = false))
    time("full pipeline run 2")(
      println(res2.agg(count(lit(1)), sum("npix"), sum("frac_greenleaf")).collect()(0)))
    // fixed-cost isolation: same plan over a 32-tile subset
    val idx = VegPipeline.buildIndex(spark, gardens, 256)
    idx.cellPolys.count()
    val tiny = tiles.limit(32)
    val cfg = VegPipeline.Config(tileSize = 256, kernelNames = Seq("greenleaf", "hsv"), handleMissingTiles = false)
    (1 to 2).foreach { i =>
      time(s"tiny scoreAgainst $i")(
        println(VegPipeline.scoreAgainst(spark, idx, tiny, cfg)
          .agg(count(lit(1)), sum("npix")).collect()(0)))
    }
    (1 to 2).foreach { i =>
      time(s"full scoreAgainst $i")(
        println(VegPipeline.scoreAgainst(spark, idx, tiles, cfg)
          .agg(count(lit(1)), sum("npix")).collect()(0)))
    }
    res2.explain("formatted")
    spark.stop()
  }
}
