package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface of the engine beyond parquet: the reference's S2
  * (tab-separated line text, CountReference.java:283-284,342-352) and
  * W1/W2 sinks (tab text / headered CSV, :335,292-306), plus JSON for
  * completeness. Always explicit-schema on read (never infer at scale)
  * and partitioned writes by default — coalesce(1) belongs only in a
  * final finalize step (WikiPipeline.writeCsv).
  */
object SourcesSinks {

  /** W1: tab-separated text sink (the reference's intermediate format). */
  def writeTsv(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("sep", "\t").option("header", false).csv(dir)

  /** S2: tab-separated line scan with explicit schema. */
  def readTsv(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("sep", "\t").csv(dir)

  /** W2: headered CSV sink, partitioned (scale default). */
  def writeCsv(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", true).csv(dir)

  /** Headered CSV scan with explicit schema. */
  def readCsv(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", true).csv(dir)

  /** JSON-lines sink/scan pair. */
  def writeJsonl(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(dir)

  def readJsonl(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(dir)

  /** Parquet sink with explicit partition columns — the layout that
    * enables partition pruning downstream. */
  def writePartitionedParquet(df: DataFrame, dir: String,
                              partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(dir)

  /** ORC sink/scan pair — the second columnar format (native Spark
    * OrcFileFormat: same predicate-pushdown/column-pruning/row-group
    * skipping contract as parquet, so a layout written here keeps the
    * engine's scan posture on ORC-standardized lakes). */
  def writeOrc(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(dir)

  def readOrc(spark: SparkSession, dir: String): DataFrame =
    spark.read.orc(dir)
}
