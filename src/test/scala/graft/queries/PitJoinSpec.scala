package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Boundary semantics of the point-in-time lookup: the validity
  * interval is CLOSED-OPEN — [valid_from, valid_to), with NULL
  * valid_to meaning "current forever". The battery query exercises
  * this on real data; here the exact boundary (as_of == valid_to must
  * select the SUCCESSOR row, never both, never neither) is pinned on
  * a hand-built dimension where every case is enumerable. */
class PitJoinSpec extends SparkSpec {

  test("closed-open interval: as_of at a version boundary picks the successor") {
    import spark.implicits._
    // key 1: two versions (A until v1, then B); key 2: single current
    val dim = Seq(
      (1L, "A", 0L, Some(1L)),
      (1L, "B", 1L, None),
      (2L, "C", 0L, None)
    ).toDF("k", "seg", "valid_from", "valid_to")
    val facts = Seq((1L, 0L), (1L, 1L), (2L, 0L), (2L, 1L))
      .toDF("k", "as_of")
    val got = facts.alias("f").join(dim.alias("d"),
        col("f.k") === col("d.k") &&
          col("d.valid_from") <= col("f.as_of") &&
          (col("d.valid_to").isNull || col("d.valid_to") > col("f.as_of")))
      .select(col("f.k"), col("f.as_of"), col("d.seg"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(got === Set(
      (1L, 0L, "A"), // before the boundary: predecessor
      (1L, 1L, "B"), // AT the boundary: successor, exactly one row
      (2L, 0L, "C"), (2L, 1L, "C"))) // open-ended current row
  }

  test("q_pit_join: each (order, as_of) resolves to exactly one segment") {
    val rows = SparkEntry.queries("q_pit_join")(spark, sf001).collect()
    // total orders per observation must equal the orders table size —
    // a gap or a double-match in the interval logic breaks this
    val orders = graft.Tables.load(spark, sf001, "orders").count()
    val perObs = rows.groupBy(_.getLong(0))
      .map { case (v, rs) => v -> rs.map(_.getLong(2)).sum }
    assert(perObs === Map(0L -> orders, 1L -> orders),
      s"PIT join lost or duplicated facts: $perObs vs $orders")
  }
}
