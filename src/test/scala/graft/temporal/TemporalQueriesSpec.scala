package graft.temporal

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TemporalQueriesSpec extends SparkSpec {

  private def q(name: String) =
    TemporalQueries.all.find(_.name == name).get.fn(spark, sf0001)

  lazy val events = Tables.load(spark, sf0001, "events")
    .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
      col("event_type"))
    .collect()
    .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
    .toMap

  test("asof: every purchase appears exactly once") {
    val purchases = events.collect {
      case (id, (_, _, "purchase")) => id
    }.toSet
    val got = q("q_asof_join").select("purchase_id").collect().map(_.getLong(0))
    assert(got.length === got.distinct.length)
    assert(got.toSet === purchases)
  }

  test("asof: matched click is a prior-or-same-instant click by the same user") {
    q("q_asof_join").filter(col("asof_click_id").isNotNull).collect().foreach { r =>
      val (pUser, pUs, _) = events(r.getLong(0))
      val (cUser, cUs, cType) = events(r.getLong(3))
      assert(cType === "click")
      assert(cUser === pUser)
      assert(cUs <= pUs)
      assert(r.getLong(4) === pUs - cUs) // gap_us
    }
  }

  test("asof: no later click by the same user before the purchase (it IS the latest)") {
    val byUser = events.toSeq.groupBy { case (_, (u, _, _)) => u }
    q("q_asof_join").filter(col("asof_click_id").isNotNull)
      .limit(200).collect().foreach { r =>
        val (pUser, pUs, _) = events(r.getLong(0))
        val (_, cUs, _) = events(r.getLong(3))
        val later = byUser(pUser).filter { case (id, (_, us, t)) =>
          t == "click" && us <= pUs && us > cUs && id != r.getLong(3)
        }
        assert(later.isEmpty, s"purchase ${r.getLong(0)} has a later click")
      }
  }

  test("range window: counts match a brute-force recount") {
    val byUser = events.toSeq.groupBy { case (_, (u, _, _)) => u }
    q("q_window_range").limit(200).collect().foreach { r =>
      val (pUser, pUs, _) = events(r.getLong(0))
      val n = byUser(pUser).count { case (_, (_, us, t)) =>
        t == "click" && us >= pUs - 3600L * 1000 * 1000 && us < pUs
      }
      assert(r.getLong(3) === n.toLong, s"purchase ${r.getLong(0)}")
    }
  }

  test("interval join: binned plan ≡ naive theta join, and no nested loop") {
    // recompute the overlap set naively from the collected events map
    def ivals(t: String, m: Int) = events.toSeq.collect {
      case (id, (_, us, `t`)) => (id, us, us + (id % m + 1) * 60000000L)
    }
    val expected = (for {
      (aId, aS, aE) <- ivals("error", 7)
      (bId, bS, bE) <- ivals("click", 11)
      if aS <= bE && bS <= aE
    } yield (aId, bId, math.min(aE, bE) - math.max(aS, bS))).toSet
    val df = q("q_interval_join")
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === got.distinct.length, "duplicate pairs emitted")
    assert(got.toSet === expected)
    // the scale contract: an equi-join on bin, not a nested loop
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"interval join fell back to a nested loop:\n$plan")
  }

  test("asof is a window plan, not a join: no Join node, one hash shuffle") {
    for (name <- Seq("q_asof_join", "q_window_range")) {
      val plan = q(name).queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), s"$name plans a join:\n$plan")
      // exactly one hash-partitioning exchange (the user_id shuffle); the
      // only other exchange is the final presentation sort's range part.
      val hashEx = "hashpartitioning".r.findAllIn(plan).length
      assert(hashEx === 1, s"$name has $hashEx hash exchanges:\n$plan")
    }
  }
}
