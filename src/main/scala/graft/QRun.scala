package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query runner: `runMain graft.QRun <name> <sfDir> [n]`
  * executes one SparkEntry.queries entry and prints its row count and
  * first n rows — the quick local check between full Verify runs. */
object QRun {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val show = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.SparkTune.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(s"[qrun] $name rows=${df.count()}")
    df.show(show, truncate = false)
    spark.stop()
  }
}
