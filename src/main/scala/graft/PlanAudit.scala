package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the physical plan of every battery query and flag
  * scale smells (cartesian joins, un-pushed scans, wide reads).
  * Usage: runMain graft.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.SparkTune.tuned(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      // execute df's OWN QueryExecution (count()/foreach build new ones)
      // so AQE finalizes and the plan string shows the real stages
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val smells = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "BroadcastNestedLoop" -> plan.contains("BroadcastNestedLoopJoin"),
        "noCodegen" -> !plan.contains("*("))
        .collect { case (s, true) => s }
      val exchanges = "Exchange".r.findAllIn(plan).length
      println(f"$name%-28s exchanges=$exchanges%-3d ${smells.mkString(",")}")
      if (args.contains("-v")) println(plan)
    }
    spark.stop()
  }
}
