package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the AQE-finalized physical plan of named battery
  * queries. Usage: runMain graft.tools.PlanDump q1,q2 [sfDir] */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q_scan_filter_project"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = graft.SparkTune.tuned(SparkSession.builder()).master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      df.collect()
      println(s"===== $q =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
