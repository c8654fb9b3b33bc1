package graft.functions

import graft.SparkSpec
import graft.functions.NfcNormalize.nfc_norm
import org.apache.spark.sql.functions._

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("decomposed sequences recompose; ASCII and precomposed pass through") {
    val df = Seq(
      "éclair",      // decomposed é -> U+00E9
      "éclair",       // already NFC
      "plain ascii",       // ASCII fast path
      "Å"            // A + ring -> Å (U+00C5)
    ).toDF("s")
    val r = df.select(nfc_norm(col("s")).as("n"),
      length(col("s")).as("lr"), length(nfc_norm(col("s"))).as("ln"))
      .collect()
    assert(r(0).getString(0) === "éclair" && r(0).getInt(1) === 7 &&
      r(0).getInt(2) === 6)
    assert(r(1).getString(0) === "éclair")
    assert(r(2).getString(0) === "plain ascii")
    assert(r(3).getString(0) === "Å" && r(3).getInt(2) === 1)
  }

  test("null input stays null") {
    val r = Seq(Option.empty[String]).toDF("s")
      .select(nfc_norm(col("s"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("idempotent on already-normalized text (NFC is a fixpoint)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(100)
    val diff = docs.select(
        nfc_norm(col("text")).as("once"),
        nfc_norm(nfc_norm(col("text"))).as("twice"))
      .filter(col("once") =!= col("twice")).count()
    assert(diff === 0)
  }

  test("SQL registration: nfc callable from spark.sql") {
    NfcNormalize.register(spark)
    val r = spark.sql("SELECT nfc('é') AS n").head().getString(0)
    assert(r === "é")
  }

  test("property: idempotent and JDK-identical on arbitrary unicode") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // mix ASCII, precomposed accents, combining marks and multi-byte
    // chars — the inputs that stress both the fast path and recompose
    val charGen = Gen.frequency(
      (6, Gen.alphaNumChar.map(_.toString)),
      (2, Gen.oneOf("é", "Å", "ü", "ß", "ñ")),
      (2, Gen.oneOf("́", "̊", "̈")), // combining marks
      (1, Gen.oneOf("中", "𝔊", "Ω"))) // incl. surrogate pair
    val strGen = Gen.listOf(charGen).map(_.mkString)
    val samples = Gen.listOfN(200, strGen)
      .apply(Gen.Parameters.default, Seed(42L)).get
    val df = samples.toDF("s")
    val rows = df.select(col("s"), nfc_norm(col("s")).as("once"),
      nfc_norm(nfc_norm(col("s"))).as("twice")).collect()
    rows.foreach { r =>
      val (in, once, twice) = (r.getString(0), r.getString(1), r.getString(2))
      val jdk = java.text.Normalizer.normalize(
        in, java.text.Normalizer.Form.NFC)
      assert(once === jdk, s"engine != JDK for ${in.map(_.toInt)}")
      assert(twice === once, s"not idempotent for ${in.map(_.toInt)}")
    }
  }

  test("codegen path active: plan stays in WholeStageCodegen") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val plan = docs.select(nfc_norm(col("text")).as("n"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
