package graft
import org.apache.spark.sql.SparkSession
object PlanOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"TIME ${(System.nanoTime()-t0)/1e9}%.2f s")
    println(df.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
