package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Tables.cut — the loop-materialization seam: localCheckpoint by
  * default (gate scale), RELIABLE checkpoint when a checkpoint dir is
  * configured (the 100 TB posture: local checkpoint blocks die with
  * their executor; reliable ones survive). Rows must be identical
  * either way. */
class TablesCutSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("default: local checkpoint, same rows, lineage cut") {
    import spark.implicits._
    val df = (1L to 100L).toDF("x")
      .filter($"x" % 2 === 0)
    val cut = Tables.cut(df)
    assert(cut.count() == 50L)
    // a local checkpoint is not a reliable one
    assert(!cut.rdd.isCheckpointed)
    assert(cut.as[Long].collect().sorted.toSeq ==
      (2L to 100L by 2).toSeq)
  }

  test("with spark.graft.checkpoint.dir: reliable checkpoint to the " +
      "configured dir, same rows") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ckpt").toString
    spark.conf.set("spark.graft.checkpoint.dir", dir)
    try {
      val df = (1L to 10L).toDF("x").filter($"x" > 3)
      val cut = Tables.cut(df)
      assert(cut.as[Long].collect().sorted.toSeq == (4L to 10L).toSeq)
      // checkpoint() returns a frame rooted at the materialized RDD —
      // the lineage (the filter) is gone from the plan
      assert(cut.queryExecution.optimizedPlan.isInstanceOf[
        org.apache.spark.sql.execution.LogicalRDD])
      // blocks actually landed under the configured dir
      def files(p: java.io.File): Seq[java.io.File] =
        if (p.isDirectory) p.listFiles().toSeq.flatMap(files)
        else Seq(p)
      assert(files(new java.io.File(dir)).nonEmpty)
    } finally spark.conf.unset("spark.graft.checkpoint.dir")
  }
}
