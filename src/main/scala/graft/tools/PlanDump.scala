package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Dev scratch: write each query's `.explain("formatted")` output to
  * plans/<tag>/<query>_<suffix>.txt (the round's plan-evidence files).
  * Bench-shaped session (local[32], shuffle.partitions=32, AQE on) so
  * the dumped plan is the one the bench actually runs.
  *
  * Queries that eagerly localCheckpoint interior frames truncate their
  * final plan to ExistingRDD scans, so a QueryExecutionListener also
  * records every INTERIOR plan executed while the query was being
  * built (the checkpoint-materializing actions) — the file holds the
  * full plan evidence, interior fragments first, final plan last. */
object PlanDump {
  def main(a: Array[String]): Unit = {
    val dir = a(0)      // data dir, e.g. /root/testdata/sf0.1
    val tag = a(1)      // plans subdir, e.g. r06
    val suffix = a(2)   // "before" | "after"
    val names = a.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]").appName("plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(s"plans/$tag"))
    for (n <- names) {
      val interior = new StringBuilder
      val listener = new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
                               durationNs: Long): Unit = interior.synchronized {
          interior.append(s"== interior action: $funcName ==\n")
            .append(qe.explainString(org.apache.spark.sql.execution.FormattedMode))
            .append("\n")
        }
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Thread.sleep(2000) // listener bus is async; let interior plans drain
      spark.listenerManager.unregister(listener)
      val full = interior.synchronized { interior.toString } +
        "== final plan ==\n" + plan
      Files.writeString(Paths.get(s"plans/$tag/${n}_$suffix.txt"), full)
      println(s"[plandump] wrote plans/$tag/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
