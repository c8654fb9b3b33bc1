package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time ONE battery query at several scale factors to
  * separate fixed overhead (planning, codegen compile) from data cost.
  * Usage: runMain graft.tools.QueryTime <queryName> [sfDir ...]
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val dirs = if (args.length > 1) args.tail.toSeq
    else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")
    val spark = graft.SparkTune.tuned(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    // warm the session (JIT, classloading) on the smallest dir
    fn(spark, dirs.head).write.format("noop").mode("overwrite").save()
    for (d <- dirs; rep <- 1 to 2) {
      val t0 = System.nanoTime()
      fn(spark, d).write.format("noop").mode("overwrite").save()
      println(f"[qtime] $name $d rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
