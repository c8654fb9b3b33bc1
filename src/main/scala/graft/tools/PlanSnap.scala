package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: write `.explain("formatted")` output (and, after driving
  * the query through the noop sink, the AQE-finalized physical plan)
  * for named battery queries to <outDir>/<name>_<suffix>.txt — the
  * optimization-round evidence files under plans/rNN/.
  *
  * Usage: runMain graft.tools.PlanSnap q1,q2 [sfDir] [outDir] [suffix]
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q_scan_filter_project"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(2).getOrElse("/root/repo/plans/r16")
    val suffix = args.lift(3).getOrElse("before")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkTune.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { q =>
      spark.sparkContext.setJobDescription(s"plansnap: $q")
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val formatted = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      df.write.format("noop").mode("overwrite").save()
      val finalPlan = df.queryExecution.executedPlan.toString
      val txt =
        s"""===== $q ($suffix) explain(formatted), sf=$sfDir =====
           |$formatted
           |===== $q ($suffix) AQE-finalized executed plan =====
           |$finalPlan
           |""".stripMargin
      Files.writeString(Paths.get(outDir, s"${q}_$suffix.txt"), txt)
      println(s"[plansnap] wrote $outDir/${q}_$suffix.txt")
    }
    spark.stop()
  }
}
