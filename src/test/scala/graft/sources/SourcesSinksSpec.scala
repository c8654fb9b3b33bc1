package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SourcesSinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("srcsink").toString

  test("TSV round-trip preserves rows (reference W1/S2 format)") {
    val df = spark.read.parquet(s"$sf0001/nation.parquet")
    val dir = tmp() + "/nation_tsv"
    SourcesSinks.writeTsv(df, dir)
    val back = SourcesSinks.readTsv(spark, dir, df.schema)
    assert(back.count() === df.count())
    assert(back.orderBy("n_nationkey").collect()
      === df.orderBy("n_nationkey").collect())
  }

  test("CSV round-trip with header (reference W2 format)") {
    val df = spark.read.parquet(s"$sf0001/region.parquet")
    val dir = tmp() + "/region_csv"
    SourcesSinks.writeCsv(df, dir)
    val back = SourcesSinks.readCsv(spark, dir, df.schema)
    assert(back.orderBy("r_regionkey").collect()
      === df.orderBy("r_regionkey").collect())
  }

  test("JSONL round-trip") {
    val df = spark.read.parquet(s"$sf0001/supplier.parquet")
    val dir = tmp() + "/supplier_json"
    SourcesSinks.writeJsonl(df, dir)
    val back = SourcesSinks.readJsonl(spark, dir, df.schema)
    assert(back.count() === df.count())
  }

  test("partitioned parquet write enables partition pruning") {
    val df = spark.read.parquet(s"$sf0001/customer.parquet")
    val dir = tmp() + "/cust_part"
    SourcesSinks.writePartitionedParquet(df, dir, "c_mktsegment")
    val pruned = spark.read.parquet(dir)
      .filter(col("c_mktsegment") === "BUILDING")
    val plan = pruned.queryExecution.executedPlan.toString
    // partition filter must reach the scan, not survive as a row filter
    assert(plan.contains("PartitionFilters: [isnotnull(c_mktsegment"), plan)
    assert(pruned.count() ===
      df.filter(col("c_mktsegment") === "BUILDING").count())
  }

  test("events nanos handling is scoped to the read, not the session") {
    // loading events must NOT flip the session-global legacy conf:
    // other nanos-timestamp parquet reads in the same session keep
    // default semantics
    val before = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    val ev = graft.Tables.load(spark, sf0001, "events")
    assert(ev.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    assert(ev.select(max(col("ts"))).collect().head.getTimestamp(0) != null)
    assert(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      === before)
  }
}
