package graft.tools
import org.apache.spark.sql.SparkSession
object Prof {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("prof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = a(0)
    val names = a.drop(1)
    // warm the session
    graft.SparkEntry.queries("q01_summary_agg")(spark, dir).count()
    for (n <- names; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(n)(spark, dir).count()
      println(f"$n rep$rep ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$c")
    }
    spark.stop()
  }
}
