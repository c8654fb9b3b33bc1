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

  test("ORC round-trip preserves rows and pushes filters to the scan") {
    val df = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val dir = tmp() + "/lineitem_orc"
    SourcesSinks.writeOrc(df, dir)
    val back = SourcesSinks.readOrc(spark, dir)
    assert(back.schema === df.schema)
    assert(back.orderBy("l_orderkey", "l_linenumber").collect()
      === df.orderBy("l_orderkey", "l_linenumber").collect())
    // the columnar contract must survive the format switch: predicate
    // reaches the ORC scan and the projection prunes columns
    val plan = back.filter(col("l_quantity") >= 45)
      .select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity)"),
      s"ORC scan lost filter pushdown:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"ORC scan reads more than the projection:\n$plan")
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
