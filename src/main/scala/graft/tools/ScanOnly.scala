package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ScanOnly {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.parquet.columnarReaderBatchSize", sys.env.getOrElse("PQBATCH", "4096"))
      .config("spark.sql.parquet.enableVectorizedReader", sys.env.getOrElse("VECT", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tiles = spark.read.parquet("data/gen/tiles_g96_ts256")
    def gcStats(): (Long, Long) = {
      import scala.jdk.CollectionConverters._
      val beans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      (beans.map(_.getCollectionCount).sum, beans.map(_.getCollectionTime).sum)
    }
    (1 to 3).foreach { i =>
      val (c0, t0g) = gcStats()
      val t0 = System.nanoTime()
      val r = tiles.select(sum(length(col("bytes")))).collect()(0)
      val dt = (System.nanoTime() - t0) / 1e9
      val (c1, t1g) = gcStats()
      val heap = java.lang.management.ManagementFactory.getMemoryMXBean.getHeapMemoryUsage
      println(f"[scan] pass $i: $dt%.2f s ($r) gc=${c1 - c0} gcMs=${t1g - t0g} heapUsed=${heap.getUsed / 1e9}%.1f/${heap.getMax / 1e9}%.1f GB")
    }
    spark.stop()
  }
}
