package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Randomized cross-check of the metadata-aggregate arithmetic
  * (planAgg + planGroupAgg) against Spark's own exact execution on
  * the same rows: seeded pseudo-random data with negatives, nulls, a
  * NULL group, and an all-null value column, committed per group so
  * every file is single-group. Every asserted query must (a) PLAN
  * metadata-only — a silent fallback would make the equality test
  * vacuous — and (b) equal the in-memory DataFrame's answer. The
  * mixed-layout twin asserts the refusal direction: same values,
  * real scan. Fixed specs pin known edges; this spec exists for the
  * edge nobody wrote down. */
class MetaAggPropertySpec extends SparkSpec {

  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)

  /** Seeded rows: (id, k group in 0..3 or NULL, v long with
    * negatives/nulls, w int, z all-null). java.util.Random(seed) is
    * deterministic across runs — no wall-clock in the data. */
  private def rows(seed: Long, n: Int): DataFrame = {
    val rnd = new java.util.Random(seed)
    val data = (0 until n).map { i =>
      val k: java.lang.Long =
        if (rnd.nextInt(10) == 0) null else rnd.nextInt(4).toLong
      val v: java.lang.Long =
        if (rnd.nextInt(7) == 0) null
        else rnd.nextLong() % 1000000L // negatives included
      val w: java.lang.Integer = rnd.nextInt(2000) - 1000
      (i.toLong, k, v, w)
    }
    import spark.implicits._
    data.toDF("id", "k", "v", "w")
      .withColumn("z", lit(null).cast("bigint"))
  }

  private def pushed(q: String): DataFrame = {
    val df = spark.sql(q)
    assert(df.queryExecution.executedPlan.toString
      .contains("graft-chain-agg"),
      s"expected metadata-only plan for: $q")
    df
  }

  test("seeded random data, per-group commits: global and grouped " +
    "COUNT/MIN/MAX/SUM answer metadata-only and equal Spark's exact " +
    "execution; a mixed twin refuses with equal values") {
    ensureCatalog()
    for (seed <- Seq(7L, 1234L, 998877L)) {
      val d = rows(seed, 300).localCheckpoint()
      val suf = s"${seed}_${System.nanoTime}"
      val root = Tables.matDir(s"maprop_$suf", spark, sf0001)
      val tbl = s"prp.t_$suf"
      spark.sql(
        s"""CREATE TABLE graft.$tbl (
           |  id BIGINT, k BIGINT, v BIGINT, w INT, z BIGINT)
           |USING graft LOCATION '$root'
           |TBLPROPERTIES ('cluster'='id|id', 'key'='id')""".stripMargin)
      // one INSERT per k value (NULL group included) -> file-constant
      val ks = d.select("k").distinct().collect()
        .map(r => if (r.isNullAt(0)) null else r.get(0))
      ks.foreach { kv =>
        val slice =
          if (kv == null) d.filter(col("k").isNull)
          else d.filter(col("k") === kv.asInstanceOf[Long])
        slice.createOrReplaceTempView(s"maprop_src_$suf")
        spark.sql(s"INSERT INTO graft.$tbl " +
          s"SELECT * FROM maprop_src_$suf")
      }

      // global asks
      val g = pushed(s"SELECT count(*) AS a, count(v) AS b, " +
        s"min(v) AS c, max(v) AS d, sum(v) AS e, sum(w) AS f, " +
        s"sum(z) AS g FROM graft.$tbl").collect().head
      val ge = d.agg(count(lit(1)), count(col("v")), min("v"),
        max("v"), sum("v"), sum("w"),
        sum("z").cast("bigint")).head
      assert(g.toSeq === ge.toSeq, s"global mismatch at seed $seed")

      // grouped asks (NULL group rides along)
      val q = s"SELECT k, count(*) AS a, count(v) AS b, min(v) AS c, " +
        s"max(v) AS d, sum(v) AS e, sum(w) AS f " +
        s"FROM graft.$tbl GROUP BY k ORDER BY k NULLS FIRST"
      val got = pushed(q).collect().map(_.toSeq).toSeq
      val want = d.groupBy("k")
        .agg(count(lit(1)).as("a"), count(col("v")).as("b"),
          min("v").as("c"), max("v").as("d"), sum("v").as("e"),
          sum("w").as("f"))
        .orderBy(asc_nulls_first("k")).collect().map(_.toSeq).toSeq
      assert(got === want, s"grouped mismatch at seed $seed")

      // the mixed twin: one commit, files span groups -> refusal,
      // identical values through the exact scan
      val root2 = Tables.matDir(s"maprop_mix_$suf", spark, sf0001)
      val tbl2 = s"prp.m_$suf"
      spark.sql(
        s"""CREATE TABLE graft.$tbl2 (
           |  id BIGINT, k BIGINT, v BIGINT, w INT, z BIGINT)
           |USING graft LOCATION '$root2'
           |TBLPROPERTIES ('cluster'='id|id', 'key'='id')""".stripMargin)
      d.createOrReplaceTempView(s"maprop_mix_src_$suf")
      spark.sql(s"INSERT INTO graft.$tbl2 " +
        s"SELECT * FROM maprop_mix_src_$suf")
      val mixed = spark.sql(s"SELECT k, count(*) AS a, sum(v) AS e " +
        s"FROM graft.$tbl2 GROUP BY k ORDER BY k NULLS FIRST")
      assert(!mixed.queryExecution.executedPlan.toString
        .contains("graft-chain-agg"))
      assert(mixed.collect().map(_.toSeq).toSeq ===
        d.groupBy("k").agg(count(lit(1)).as("a"), sum("v").as("e"))
          .orderBy(asc_nulls_first("k")).collect().map(_.toSeq).toSeq)
    }
  }
}
