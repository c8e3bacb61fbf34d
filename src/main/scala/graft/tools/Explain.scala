package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: print a query's formatted physical plan. */
object Explain {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("explain")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(a(1))(spark, a(0)).explain("formatted")
    spark.stop()
  }
}
