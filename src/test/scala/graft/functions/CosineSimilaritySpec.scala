package graft.functions

import graft.SparkSpec
import graft.functions.CosineSimilarity.cosine_sim
import graft.functions.GraftFunctions.cosineDecimal
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("known values, self-similarity, zero vector, length mismatch, null") {
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f)),        // orthogonal -> 0
      (Array(1f, 2f), Array(2f, 4f)),        // parallel -> 1
      (Array(1f, 1f), Array(1f, -1f)),       // -> 0
      (Array(0f, 0f), Array(1f, 2f))         // zero norm -> 0.0
    ).toDF("a", "b")
    val r = df.select(cosine_sim(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(math.abs(r(0)) < 1e-12)
    assert(math.abs(r(1) - 1.0) < 1e-12)
    assert(math.abs(r(2)) < 1e-12)
    assert(r(3) === 0.0)

    val mismatch = Seq((Array(1f, 2f), Array(1f))).toDF("a", "b")
      .select(cosine_sim(col("a"), col("b"))).collect()
    assert(mismatch.head.isNullAt(0))

    val withNull = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]]))
      .toDF("a", "b").select(cosine_sim(col("a"), col("b"))).collect()
    assert(withNull.head.isNullAt(0))
  }

  test("agrees with the decimal oracle path to 1e-5 on real embeddings") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(50)
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_v"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_v"))
    val both = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .select(
        cosine_sim(col("a_v"), col("b_v")).as("fast"),
        cosineDecimal(col("a_v"), col("b_v")).as("exact"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-5)
    }
  }

  test("SQL registration: cosine_sim callable from spark.sql") {
    CosineSimilarity.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0F, 2.0F), array(2.0F, 4.0F)) AS c")
      .head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("codegen path active: plan stays in WholeStageCodegen") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val plan = e.select(cosine_sim(col("embedding"), col("embedding")).as("c"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into WholeStageCodegen
    assert(plan.contains("*(1) Project"), plan)
  }
}
