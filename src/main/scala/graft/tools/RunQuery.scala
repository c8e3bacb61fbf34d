package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: `RunQuery <name> [sfDir] [reps]` runs one
  * `SparkEntry.queries` entry under the Bench session configs and prints
  * per-rep wall seconds + row count — for iterating on one operator
  * without a full bench run. */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-runquery")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries(name)
    val n = q(spark, sfDir).count() // warm
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      q(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"""{"query":"$name","rows":$n,"reps":[${times.map(t => f"$t%.3f").mkString(",")}],"min":${times.min}%.3f}""")
    spark.stop()
  }
}
