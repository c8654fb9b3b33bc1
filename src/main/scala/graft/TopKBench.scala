package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TopKBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTune.tuned(SparkSession.builder()).master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    def time(label: String)(f: => Long): Unit = {
      f // warmup
      val t0 = System.nanoTime(); val n = f
      println(f"TOPK $label ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("l_partkey").orderBy(desc("l_extendedprice"), asc("l_orderkey"))
    time("window_rn") {
      li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select("l_partkey","l_orderkey").count()
    }
    time("topk_exec") {
      plans.TopKPerGroup.topKPerGroup(li, Seq(col("l_partkey")),
        Seq(desc("l_extendedprice"), asc("l_orderkey")), 3)
        .select("l_partkey","l_orderkey").count()
    }
    // equality check
    val a = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("l_partkey","l_orderkey").collect().map(r=>(r.getLong(0),r.getLong(1))).toSet
    val b = plans.TopKPerGroup.topKPerGroup(li, Seq(col("l_partkey")),
      Seq(desc("l_extendedprice"), asc("l_orderkey")), 3)
      .select("l_partkey","l_orderkey").collect().map(r=>(r.getLong(0),r.getLong(1))).toSet
    println(s"TOPK equal=${a == b} (${a.size} rows)")
    spark.stop()
  }
}
