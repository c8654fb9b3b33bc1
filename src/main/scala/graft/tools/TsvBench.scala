package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: is the graft-tsv V2 connector a toy, or does it move data
  * at native-source rates? Writes N rows of (long, md5-string, double)
  * through graft-tsv and through Spark's built-in csv (tab-separated,
  * no quoting — the closest native equivalent), then scans both back
  * with a count + one projected aggregate. Prints MB/s each way.
  * Usage: runMain graft.tools.TsvBench [nRows] */
object TsvBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = graft.SparkTune.tuned(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val df = spark.range(n).select(col("id"),
      md5(col("id").cast("string")).as("payload"),
      (col("id") % 997 * 13).cast("double").as("v"))
    df.write.format("noop").mode("overwrite").save() // warm generator

    def dirSize(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(p))
    }
    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    for (fmt <- Seq("graft-tsv", "csv"); rep <- 1 to 2) {
      val out = java.nio.file.Files
        .createTempDirectory(s"tsvbench_$fmt").toString
      val (_, wSec) = time {
        val w = df.write.mode("overwrite")
        (if (fmt == "csv") w.option("sep", "\t") else w)
          .format(fmt).save(out)
      }
      val mb = dirSize(out) / 1e6
      val (cnt, rSec) = time {
        val r = spark.read.format(fmt)
        val d = (if (fmt == "csv") r.option("sep", "\t") else r).load(out)
        d.agg(count(lit(1)), sum(length(d.columns.map(col).head
          .cast("string")))).collect()(0).getLong(0)
      }
      println(f"[tsvbench] $fmt%-9s rep$rep write ${mb / wSec}%7.1f MB/s " +
        f"($wSec%5.2f s)  read ${mb / rSec}%7.1f MB/s ($rSec%5.2f s)  " +
        f"rows=$cnt  size=${mb}%.0f MB")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
    spark.stop()
  }
}
