package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev scratch: run a query twice (warm, then measured) and print every
  * Spark job it launches with wall-clock duration and call site — finds
  * where the time goes in queries that launch many small jobs
  * (localCheckpoints, gate counts, collects). */
object JobProf {
  def main(a: Array[String]): Unit = {
    val dir = a(0)
    val name = a(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]").appName("jobprof")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries("q01_summary_agg")(spark, dir).count() // session warm
    graft.SparkEntry.queries(name)(spark, dir).count()             // query warm
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse {
            js.stageInfos.map(si => si.name.takeWhile(_ != '\n')).distinct.mkString(" | ")
          }
        starts.put(js.jobId, (js.time, site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, site) =>
          lines.add(f"  job ${je.jobId}%3d  ${(je.time - t0) / 1e3}%7.3f s  $site")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val c = graft.SparkEntry.queries(name)(spark, dir).count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1500)
    println(f"$name total $total%.3f s rows=$c, jobs:")
    lines.forEach(l => println(l))
    spark.stop()
  }
}
