package graft.temporal

import graft.Tables
import graft.queries.CoreQueries.Q
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal join operators over the `events` table — the two shapes a
  * training-data/feature pipeline needs beyond equi-joins:
  *
  *  - AS-OF join (q_asof_join): for each purchase, the latest click by
  *    the same user at or before the purchase time. Implemented with
  *    the UNION + window trick: tag both sides, union them, and carry
  *    the right side forward with last(ignoreNulls) over a rows frame.
  *    This is THE scale-correct as-of plan: ONE shuffle on the key and
  *    a per-partition sort — cost identical to any window — instead of
  *    a range join whose candidate set explodes with key frequency
  *    (an events×events theta-join is O(n_user²) per user). Skew is
  *    bounded by per-user event counts, same as sessionization.
  *  - Interval aggregation (q_window_range): clicks per user in the
  *    hour strictly before each purchase, via a RANGE window frame over
  *    the microsecond epoch — again one shuffle + sort, no self-join.
  *    The frame is value-based, so same-instant events are excluded
  *    deterministically without a tie-break.
  *
  * Cross-engine exactness: timestamps compare as unix MICROSECOND longs
  * (`unix_micros` / DuckDB `epoch_us`; the testdata is micro-precision,
  * so the NANOS→micros cast is lossless), and the as-of tie at equal
  * (ts) is broken by (side, event_id) identically in both engines.
  */
object TemporalQueries {

  private val HourUs = 3600L * 1000 * 1000

  /** events restricted to the two sides, with the columns both queries
    * need: microsecond epoch, side tag, and null-carried click ids. */
  private def tagged(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("is_p"),
        when(col("event_type") === "click", col("event_id")).as("click_id"),
        when(col("event_type") === "click", unix_micros(col("ts")))
          .as("click_us"))

  private val taggedSql =
    """t AS (
      |  SELECT event_id, user_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
      |    CASE WHEN event_type = 'click' THEN event_id END AS click_id,
      |    CASE WHEN event_type = 'click'
      |      THEN epoch_us(CAST(ts AS TIMESTAMP)) END AS click_us
      |  FROM events WHERE event_type IN ('click', 'purchase'))""".stripMargin

  val all: Seq[Q] = Seq(

    // AS-OF: latest click at-or-before each purchase, per user. A click
    // at the exact purchase instant counts (is_p sorts clicks first at
    // equal ts); among same-instant clicks the highest event_id wins —
    // the same total order on both engines.
    Q("q_asof_join",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy("ts_us", "is_p", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tagged(s, d)
          .withColumn("asof_click_id",
            last(col("click_id"), ignoreNulls = true).over(w))
          .withColumn("asof_click_us",
            last(col("click_us"), ignoreNulls = true).over(w))
          .filter(col("is_p") === 1)
          .select(
            col("event_id").as("purchase_id"), col("user_id"),
            col("ts_us").as("purchase_us"), col("asof_click_id"),
            (col("ts_us") - col("asof_click_us")).as("gap_us"))
          .orderBy("purchase_id")
      },
      Some(s"""WITH $taggedSql,
             |w AS (
             |  SELECT *,
             |    last_value(click_id IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY ts_us, is_p, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_click_id,
             |    last_value(click_us IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY ts_us, is_p, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_click_us
             |  FROM t)
             |SELECT event_id AS purchase_id, user_id, ts_us AS purchase_us,
             |  asof_click_id, ts_us - asof_click_us AS gap_us
             |FROM w WHERE is_p = 1 ORDER BY purchase_id""".stripMargin)),

    // Interval aggregation: clicks by the same user in the hour
    // STRICTLY before each purchase (value-based RANGE frame).
    Q("q_window_range",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts_us")
          .rangeBetween(-HourUs, -1L)
        tagged(s, d)
          .withColumn("n_clicks_1h",
            coalesce(sum(lit(1) - col("is_p")).over(w), lit(0))
              .cast(LongType))
          .filter(col("is_p") === 1)
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts_us").as("purchase_us"), col("n_clicks_1h"))
          .orderBy("purchase_id")
      },
      Some(s"""WITH $taggedSql
             |SELECT event_id AS purchase_id, user_id, ts_us AS purchase_us,
             |  CAST(coalesce(SUM(1 - is_p) OVER (
             |    PARTITION BY user_id ORDER BY ts_us
             |    RANGE BETWEEN $HourUs PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             |    AS n_clicks_1h
             |FROM t
             |QUALIFY is_p = 1
             |ORDER BY purchase_id""".stripMargin)),

    // RANGE JOIN across DIFFERENT keys: for each error event, how many
    // clicks — by ANY user — landed within ±10 minutes? No shared equi
    // key exists, so the naive plan is an O(n²) time-theta join (Spark
    // would emit BroadcastNestedLoopJoin). The scale shape is BINNING:
    // quantize time into windows-width bins, explode the (smaller)
    // error side into its bin and both neighbors, equi-join on bin —
    // any click within ±W of an error sits in one of those three bins,
    // and each qualifying click matches exactly ONE exploded row — then
    // verify |Δt| <= W exactly. Fan-out is a fixed 3×; the join is a
    // hash join on uniform bin keys; residual time-of-day hot bins are
    // AQE-skew-split territory, not plan failures. The DuckDB oracle
    // pays the theta-join cost instead (oracle-side only) — identical
    // result because binning at width >= W is lossless.
    Q("q_range_join",
      (s, d) => {
        val W = 600L * 1000 * 1000 // ±10 min in µs = the bin width
        val ev = Tables.load(s, d, "events")
          .select(col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val err = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("us").as("e_us"),
            floor(col("us") / W).as("b"))
          .withColumn("bin",
            explode(array(col("b") - 1, col("b"), col("b") + 1)))
        val clk = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("c_id"), col("us").as("c_us"),
            floor(col("us") / W).as("bin"))
        err.join(clk,
            err("bin") === clk("bin") &&
              abs(col("c_us") - col("e_us")) <= W,
            "left")
          .groupBy("event_id")
          .agg(count(col("c_id")).as("n_near"))
          .orderBy("event_id")
      },
      Some("""SELECT e.event_id, CAST(count(c.event_id) AS BIGINT) AS n_near
             |FROM events e LEFT JOIN events c
             |  ON c.event_type = 'click'
             |  AND abs(epoch_us(CAST(c.ts AS TIMESTAMP))
             |        - epoch_us(CAST(e.ts AS TIMESTAMP))) <= 600000000
             |WHERE e.event_type = 'error'
             |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin)),

    // the SAME cross-key range join written the way a user naively
    // would — a bare abs(Δt) <= W theta join, no manual binning — and
    // rewritten to the bin-and-probe plan AUTOMATICALLY by
    // [[graft.plans.RangeJoinRewriteRule]]: the engine, not the user,
    // supplies the scale shape (q_range_join above is the hand-written
    // reference of what the rewrite produces). Inner-join form, so the
    // output is errors that HAVE a nearby click; PlanShapeSpec asserts
    // the optimized plan has the 3-bin Generate + equi-join and no
    // BroadcastNestedLoopJoin, and RangeJoinRuleSpec property-tests
    // the rewrite's losslessness including negative values.
    Q("q_range_join_auto",
      (s, d) => {
        graft.plans.RangeJoinRewriteRule.enable(s)
        val W = 600L * 1000 * 1000 // ±10 min in µs
        val ev = Tables.load(s, d, "events")
          .select(col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val err = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("us").as("e_us"))
        val clk = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("c_id"), col("us").as("c_us"))
        err.join(clk, abs(col("c_us") - col("e_us")) <= lit(W))
          .groupBy("event_id")
          .agg(count(lit(1)).as("n_near"))
          .orderBy("event_id")
      },
      Some("""SELECT e.event_id, count(*) AS n_near
             |FROM events e JOIN events c
             |  ON c.event_type = 'click'
             |  AND abs(epoch_us(CAST(c.ts AS TIMESTAMP))
             |        - epoch_us(CAST(e.ts AS TIMESTAMP))) <= 600000000
             |WHERE e.event_type = 'error'
             |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin)),

    // INTERVAL-OVERLAP join — the third member of the temporal-join
    // family (as-of matches points to latest-point, range join matches
    // points within a distance; this matches INTERVALS that overlap:
    // [a_s,a_e] ∩ [b_s,b_e] ≠ ∅, the incident-correlation / genomics
    // shape). Naive form is a theta join (quadratic). Binned plan:
    // with bin width W ≥ max interval length, each interval covers at
    // most 2 bins; explode both sides to their covered bins (sequence
    // + explode, ≤2 rows each), hash-join on bin equality, verify the
    // exact overlap predicate. A pair sharing 2 bins would
    // dedup-duplicate — instead of DISTINCT, each pair is counted ONLY
    // in the bin holding the overlap's own start (greatest(a_s, b_s)
    // div W — inside both intervals whenever they overlap, hence among
    // the joined bins, and unique per pair) — the dedup-free guard
    // that keeps the join bijective and the plan distinct-free. Scale:
    // shuffle on uniform bin keys, ≤2× fan-out per side, never
    // all-pairs; the
    // synthetic intervals (1–7 / 1–11 min from event_id) bound W at
    // 12 min. Integer µs end-to-end — exact in both engines.
    Q("q_interval_join",
      (s, d) => {
        val W = 720L * 1000 * 1000 // 12 min in µs ≥ max interval length
        val ev = Tables.load(s, d, "events")
          .select(col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val a = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("a_id"), col("us").as("a_s"),
            (col("us") + (col("event_id") % 7 + 1) * 60000000L).as("a_e"))
          .withColumn("bin",
            explode(sequence(expr(s"a_s div $W"), expr(s"a_e div $W"))))
        val b = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("b_id"), col("us").as("b_s"),
            (col("us") + (col("event_id") % 11 + 1) * 60000000L).as("b_e"))
          .withColumn("bin",
            explode(sequence(expr(s"b_s div $W"), expr(s"b_e div $W"))))
        // equi-join on the shared bin; overlap-start bin covered by
        // BOTH intervals ⇒ the guard admits each true pair exactly once
        a.join(b, Seq("bin"))
          .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e") &&
            col("bin") === expr(s"greatest(a_s, b_s) div $W"))
          .select(col("a_id"), col("b_id"),
            (least(col("a_e"), col("b_e")) -
              greatest(col("a_s"), col("b_s"))).as("ov_us"))
          .orderBy("a_id", "b_id")
      },
      Some("""WITH a AS (
             |  SELECT event_id AS a_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS a_s,
             |    epoch_us(CAST(ts AS TIMESTAMP))
             |      + (event_id % 7 + 1) * 60000000 AS a_e
             |  FROM events WHERE event_type = 'error'),
             |b AS (
             |  SELECT event_id AS b_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS b_s,
             |    epoch_us(CAST(ts AS TIMESTAMP))
             |      + (event_id % 11 + 1) * 60000000 AS b_e
             |  FROM events WHERE event_type = 'click')
             |SELECT a_id, b_id,
             |  CAST(least(a_e, b_e) - greatest(a_s, b_s) AS BIGINT) AS ov_us
             |FROM a JOIN b ON a_s <= b_e AND b_s <= a_e
             |ORDER BY a_id, b_id""".stripMargin)),

    // EXPONENTIALLY-WEIGHTED moving average per user — the smoothing
    // primitive of every metric/drift monitor, in EXACT integer form:
    // the usual recursive s_t = α·v_t + (1-α)·s_{t-1} accumulates a
    // float whose value depends on history length, so two engines (or
    // two partitionings) disagree in the last bits. Here α = 1/2 and
    // the history is truncated at 8 lags (weight 2^-8 < 0.4% — below
    // any monitoring threshold), which turns the smoother into a
    // FINITE weighted window: num = Σ_i v_{t-i}·2^(7-i) and
    // den = Σ_i 2^(7-i) over the lags present, both exact BIGINTs on
    // cent-scaled values (the q_event_anomaly convention). num/den IS
    // the EWMA; reporting the exact rational hash-gates it (the
    // q_group_ols (num, den) convention). Plan: ONE window over the
    // per-user shuffle — 8 lag() reads of the same frame, no
    // self-join, no recursive state; at 100 TB this is the same
    // sessionization-shaped shuffle every per-user window pays.
    Q("q_ewma",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        val e = Tables.load(s, d, "events")
          .filter(col("user_id") < 25)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"),
            round(col("value") * 100).cast(LongType).as("cents"))
        val num = (0 to 7).map {
          case 0 => coalesce(col("cents"), lit(0L)) * lit(128L)
          case i => coalesce(lag(col("cents"), i).over(w), lit(0L)) *
            lit(1L << (7 - i))
        }.reduce(_ + _)
        val den = (0 to 7).map {
          case 0 => when(col("cents").isNotNull, lit(128L)).otherwise(lit(0L))
          case i => when(lag(col("cents"), i).over(w).isNotNull,
            lit(1L << (7 - i))).otherwise(lit(0L))
        }.reduce(_ + _)
        e.withColumn("num", num).withColumn("den", den)
          .select("user_id", "event_id", "cents", "num", "den")
          .orderBy("user_id", "event_id")
      },
      Some {
        val numSql = (0 to 7).map {
          case 0 => "coalesce(cents, 0) * 128"
          case i => s"coalesce(lag(cents, $i) OVER win, 0) * ${1L << (7 - i)}"
        }.mkString("\n|    + ")
        val denSql = (0 to 7).map {
          case 0 => "CASE WHEN cents IS NOT NULL THEN 128 ELSE 0 END"
          case i => s"CASE WHEN lag(cents, $i) OVER win IS NOT NULL " +
            s"THEN ${1L << (7 - i)} ELSE 0 END"
        }.mkString("\n|    + ")
        s"""WITH e AS (
           |  SELECT user_id, event_id,
           |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           |    CAST(round(value * 100) AS BIGINT) AS cents
           |  FROM events WHERE user_id < 25)
           |SELECT user_id, event_id, cents,
           |  CAST($numSql AS BIGINT) AS num,
           |  CAST($denSql AS BIGINT) AS den
           |FROM e
           |WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id)
           |ORDER BY user_id, event_id""".stripMargin
      })
  )
}
