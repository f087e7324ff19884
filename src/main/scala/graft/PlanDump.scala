package graft

/** Measurement tool (optimization rounds): dump `.explain("formatted")`
  * for catalog queries to files — the plan evidence committed under
  * `plans/rNN/<query>_{before,after}.txt`. Bench-form overrides apply
  * (the bench times those plans, so the plan evidence must match).
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [q1,q2,...]
  * No data is executed — driver-side Catalyst only (AQE plans print
  * `isFinalPlan=false`; the shape, join strategies, PushedFilters and
  * Exchange count are all visible).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val only = if (args.length > 2)
      Some(args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet)
    else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus, appName = "graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { n =>
      val fn = SparkEntry.benchForm.getOrElse(n, SparkEntry.queries(n))
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, n + ".txt"),
          txt.getBytes("UTF-8"))
        println(s"[plandump] $n ok")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
