package graft.functions

import graft.SparkSpec
import graft.functions.GraftFunctions.tokens
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class NGramsGenSpec extends SparkSpec {
  import spark.implicits._

  test("basic trigram emission in order") {
    val got = Seq("a b c d").toDF("t")
      .select(NGramsGen.ngrams(tokens(col("t")), 3).as("g"))
      .as[String].collect().toSeq
    assert(got === Seq("a b c", "b c d"))
  }

  test("array shorter than n emits nothing; n == len emits one") {
    val df = Seq("a b").toDF("t")
    assert(df.select(NGramsGen.ngrams(tokens(col("t")), 3).as("g"))
      .count() === 0)
    assert(df.select(NGramsGen.ngrams(tokens(col("t")), 2).as("g"))
      .as[String].collect().toSeq === Seq("a b"))
  }

  test("null input row emits nothing") {
    val df = Seq(Some("a b c"), None).toDF("t")
    assert(df.select(NGramsGen.ngrams(tokens(col("t")), 2).as("g"))
      .count() === 2) // only from the non-null row
  }

  test("n = 1 degenerates to explode") {
    val df = Seq("x y z").toDF("t")
    val viaGen = df.select(NGramsGen.ngrams(tokens(col("t")), 1).as("g"))
      .as[String].collect().toSeq
    val viaExplode = df.select(explode(tokens(col("t"))).as("g"))
      .as[String].collect().toSeq
    assert(viaGen === viaExplode)
  }

  test("machinery equivalence: generator == window-lead construction on real docs") {
    // the swap-safety proof: both constructions produce the identical
    // gram MULTISET per document over sf0.001 documents, for the n the
    // dedup family uses (8) and the shingle families use (3)
    val docs = graft.Tables.load(spark, sf0001, "documents")
    for (n <- Seq(3, 8)) {
      val viaGen = docs
        .select(col("doc_id"), NGramsGen.ngrams(tokens(col("text")), n).as("g"))
        .groupBy("doc_id", "g").count()
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val last = lead(col("tok"), n - 1).over(w)
      val viaWindow = docs
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
        .withColumn("tl", last)
        .withColumn("g", concat_ws(" ",
          col("tok") +: (1 until n - 1).map(k => lead(col("tok"), k).over(w))
            :+ col("tl"): _*))
        .filter(col("tl").isNotNull)
        .groupBy("doc_id", "g").count()
      assert(viaGen.except(viaWindow).count() === 0, s"gen-only rows at n=$n")
      assert(viaWindow.except(viaGen).count() === 0, s"window-only rows at n=$n")
    }
  }

  test("SQL registration path: ngrams() resolves through GraftExtensions") {
    // the battery session doesn't install the extensions; exercise the
    // injected builder directly as ExtCheck does in deployment
    val reg = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(reg)
    // builder path: literal n is extracted at resolution time
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val e = NGramsGen(
      Literal.create(Seq("a", "b", "c"), ArrayType(StringType)), 2)
    assert(e.elementSchema.fieldNames.toSeq === Seq("gram"))
    val rows = e.eval(null).iterator.toSeq
    assert(rows.map(_.getString(0)) === Seq("a b", "b c"))
  }
}
