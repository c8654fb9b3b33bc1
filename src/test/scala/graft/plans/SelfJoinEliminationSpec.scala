package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Self-join elimination: the declared-PK merge must fire when (and
  * only when) the rewrite is sound. */
class SelfJoinEliminationSpec extends SparkSpec {

  private def declare(): Unit = {
    SelfJoinEliminationRule.ensure(spark)
    FkCatalog.declarePk(spark, s"$sf0001/documents.parquet", "doc_id")
  }

  private def merged(): DataFrame = {
    val l = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "n_chars").filter(col("n_chars") >= 50)
    val r = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "lang")
    l.join(r, l("doc_id") === r("doc_id"))
      .select(l("doc_id"), col("n_chars"), col("lang"))
  }

  test("declared-PK self-join is merged into one scan, answer-identical") {
    declare()
    val df = merged()
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("Join"), s"self-join not eliminated:\n$opt")
    // answer-identical to the executed join (rule stood down by
    // joining through a renamed key, which disqualifies)
    val l = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "n_chars").filter(col("n_chars") >= 50)
    val r = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id").as("rid"), col("lang"))
    val real = l.join(r, l("doc_id") === col("rid"))
      .select(l("doc_id"), col("n_chars"), col("lang"))
    assert(real.queryExecution.optimizedPlan.toString.contains("Join"))
    assert(df.orderBy("doc_id").collect().toSeq ===
      real.orderBy("doc_id").collect().toSeq)
  }

  test("both sides' filters survive the merge (AND semantics)") {
    declare()
    val l = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "n_chars").filter(col("n_chars") >= 50)
    val r = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "lang").filter(col("lang") === "en")
    val df = l.join(r, l("doc_id") === r("doc_id"))
      .select(l("doc_id"), col("n_chars"), col("lang"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("Join"), s"filtered self-join not eliminated:\n$opt")
    val expected = Tables.load(spark, sf0001, "documents")
      .filter(col("n_chars") >= 50 && col("lang") === "en")
      .select("doc_id", "n_chars", "lang")
    assert(df.orderBy("doc_id").collect().toSeq ===
      expected.orderBy("doc_id").collect().toSeq)
  }

  test("join on a non-PK column keeps its join") {
    declare()
    val l = Tables.load(spark, sf0001, "documents").select("doc_id", "source")
    val r = Tables.load(spark, sf0001, "documents").select("source", "lang")
    val df = l.join(r, l("source") === r("source"))
      .select(l("doc_id"), r("lang"))
    assert(df.queryExecution.optimizedPlan.toString.contains("Join"))
  }

  test("undeclared table keeps its self-join") {
    SelfJoinEliminationRule.ensure(spark)
    val l = Tables.load(spark, sf0001, "part").select("p_partkey", "p_type")
    val r = Tables.load(spark, sf0001, "part").select("p_partkey", "p_name")
    val df = l.join(r, l("p_partkey") === r("p_partkey"))
      .select(l("p_partkey"), col("p_type"), col("p_name"))
    assert(df.queryExecution.optimizedPlan.toString.contains("Join"))
  }

  test("same schema at two DIFFERENT paths keeps its join") {
    declare()
    // identical column names, distinct root paths → cannot fire (the
    // sf0.01 copy holds different rows under the same key space)
    val l = Tables.load(spark, sf0001, "documents").select("doc_id", "n_chars")
    val r = Tables.load(spark, sf001, "documents").select("doc_id", "lang")
    val df = l.join(r, l("doc_id") === r("doc_id"))
      .select(l("doc_id"), col("n_chars"), col("lang"))
    assert(df.queryExecution.optimizedPlan.toString.contains("Join"))
  }
}
