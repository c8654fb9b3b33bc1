package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: run ONE battery query and print per-job / per-stage wall
  * times (guide §1 empirical loop without the UI). Warm-up rep first,
  * then a measured rep, so shared materializations and codegen are
  * charged to the warm-up like the bench's min-of-3 discipline.
  *
  * Usage: runMain graft.tools.JobProfile <queryName> [sfDir]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkTune.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    // warm-up rep: shared materializations, codegen, page cache
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    val jobs = mutable.LinkedHashMap[Int, (Long, String)]()
    val ends = mutable.LinkedHashMap[Int, Long]()
    val stages = mutable.LinkedHashMap[Int, (String, Long, Int)]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs(e.jobId) = (e.time,
            Option(e.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .getOrElse(""))
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { ends(e.jobId) = e.time }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val si = e.stageInfo
          val wall = (for {a <- si.completionTime; b <- si.submissionTime}
            yield a - b).getOrElse(-1L)
          stages(si.stageId) = (si.name.takeWhile(_ != '\n'), wall, si.numTasks)
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let the listener bus drain
    println(f"[jobprofile] $name total ${wall}%.3f s, ${jobs.size} jobs, ${stages.size} stages")
    jobs.synchronized {
      jobs.toSeq.sortBy(_._1).foreach { case (id, (start, desc)) =>
        val dur = ends.get(id).map(e => (e - start) / 1e3).getOrElse(-1.0)
        println(f"[job] $id%3d ${dur}%8.3f s  $desc")
      }
      stages.toSeq.sortBy(_._1).foreach { case (id, (nm, ms, nt)) =>
        println(f"[stage] $id%3d ${ms / 1e3}%8.3f s  tasks=$nt%3d  $nm")
      }
    }
    spark.stop()
  }
}
