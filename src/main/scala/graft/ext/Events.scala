package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Event-stream operators over `events` (batch forms; the streaming
  * twins live in graft.streaming and share the same column algebra).
  *
  * `props` is a JSON-string column — the "typed metadata for an opaque
  * payload" pattern (SURVEY.md §2.8b multimodal columns).
  * Window starts align to the epoch in both engines (Spark `window()`
  * and DuckDB `time_bucket`), so bucket boundaries hash-match.
  */
object Events {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  /** Exact decimal sum of `value`, as double (see Relational). */
  private def dsumVal = sum(col("value").cast(DecimalType(18, 2))).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // JSON-typed metadata extraction + aggregation.
    "e01_json_props" -> ((s, dir) => {
      ev(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n"))
    }),

    // Typed JSON decoding: from_json with a declared schema (the
    // struct-typed sibling of e01's get_json_object path). The
    // null-k filter used to be pushed below the parsing projection,
    // re-evaluating from_json per row in the Filter AND the Project
    // (guide §4.4's duplicated-evaluation shape — 2 parses/row in
    // the plan; Catalyst pushes a grouping-key filter through the
    // agg too, so post-agg filtering alone does not help). The
    // nondeterministic barrier column — never read, dropped by the
    // very next select — blocks predicate pushdown past the
    // projection (the §4.4 fix stated JVM-side; the barrier must be
    // REFERENCED in the filter — column pruning strips an unused
    // nondeterministic column before pushdown runs — so the condition
    // carries an `|| _barrier < 0` arm that is never true: the id is
    // non-negative by construction). ONE from_json per row; result
    // row-identical, oracle unchanged; measured 4.77 → 2.23 s at
    // sf1.
    "e05_props_struct" -> ((s, dir) => {
      ev(s, dir)
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("p"),
          monotonically_increasing_id().as("_barrier"))
        .select(col("p.k").as("k"), col("_barrier"))
        .filter(col("k").isNotNull || col("_barrier") < 0)
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
    }),

    // Tumbling 1-hour event-time windows (batch form of the
    // Structured Streaming windowed agg).
    "e02_tumbling_window" -> ((s, dir) => {
      ev(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsumVal.as("sum_value"))
        .select(col("w.start").as("wstart"), col("event_type"),
          col("n"), col("sum_value"))
    }),

    // Sliding 1-hour windows, 30-minute hop (each event in 2 windows).
    "e03_sliding_window" -> ((s, dir) => {
      ev(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"), dsumVal.as("sum_value"))
        .select(col("w.start").as("wstart"), col("n"), col("sum_value"))
    }),

    // Gap-based sessionization: a new session starts after >30 min of
    // user inactivity. lag + running sum over a per-user window — the
    // batch twin of flatMapGroupsWithState session tracking.
    "e04_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      ev(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            col("ts") > col("prev_ts") + expr("INTERVAL '30' MINUTE"), 1)
            .otherwise(0))
        .withColumn("sess",
          sum(col("new_sess")).over(
            byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("sess"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("t_start"), max(col("ts")).as("t_end"))
        .select(col("user_id"), col("sess").cast("long").as("sess"),
          col("n_events"), col("t_start"), col("t_end"))
    }),

    // As-of (temporal) join: for each click, the most recent
    // prior-or-equal purchase by the same user. Spark has no ASOF JOIN
    // operator; the scale-correct plan is NOT a range join (quadratic
    // in per-user event count) but a union + running `last(ignoreNulls)`
    // window — ONE hash shuffle on user_id, linear scan per user. The
    // oracle states the same semantics as a native DuckDB ASOF LEFT
    // JOIN, so the two independent formulations cross-check.
    // Tie discipline without a pre-dedupe shuffle: ordering the window
    // by (ts, side, event_id) means the running last() lands on the
    // max-event_id purchase among equal timestamps, and side=0 sorts
    // purchases before clicks at equal ts, reproducing ASOF's
    // `c.ts >= p.ts` inclusivity. The oracle dedupes its build side to
    // the same max-event_id row because SQL ASOF leaves ties
    // unspecified.
    "e06_asof_join" -> ((s, dir) => {
      val e = ev(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(0).as("side"),
          col("event_id").as("p_event_id"),
          lit(null).cast("long").as("event_id"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(1).as("side"),
          lit(null).cast("long").as("p_event_id"), col("event_id"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("side").asc, col("p_event_id").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, 0)
      purchases.unionByName(clicks)
        .withColumn("asof_id", last(col("p_event_id"), ignoreNulls = true).over(w))
        .withColumn("asof_ts",
          last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_id").as("p_event_id"),
          (unix_micros(col("ts")) - unix_micros(col("asof_ts")))
            .as("micros_since"))
    }),

    // Ordered-sequence funnel: signup → first subsequent click → first
    // subsequent purchase, per user, summarized to stage counts plus
    // total signup→purchase latency over completers. No self-joins:
    // two chained running-min windows resolve the "first X after first
    // Y" dependencies in one user_id shuffle (the per-user groupBy
    // reuses the same partitioning), and the final summary is a tiny
    // global partial-agg. Stage inclusivity at equal ts is defined by
    // the stage rank in the window order (signup < click < purchase),
    // matching the oracle's `>=` comparisons. All outputs are exact
    // integers — no float hashing risk.
    "e07_funnel" -> ((s, dir) => {
      val rank = when(col("event_type") === "signup", 0)
        .when(col("event_type") === "click", 1)
        .when(col("event_type") === "purchase", 2)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("rank").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      ev(s, dir)
        .withColumn("rank", rank).filter(col("rank").isNotNull)
        .withColumn("sig_run", min(when(col("rank") === 0, col("ts"))).over(w))
        .withColumn("clk_q",
          when(col("rank") === 1 && col("sig_run").isNotNull, col("ts")))
        .withColumn("clk_run", min(col("clk_q")).over(w))
        .withColumn("pur_q",
          when(col("rank") === 2 && col("clk_run").isNotNull, col("ts")))
        .groupBy(col("user_id"))
        .agg(min(when(col("rank") === 0, col("ts"))).as("t1"),
          min(col("clk_q")).as("t2"), min(col("pur_q")).as("t3"))
        .agg(count(col("t1")).as("n_signup"),
          count(col("t2")).as("n_click"),
          count(col("t3")).as("n_purchase"),
          sum(when(col("t3").isNotNull,
            unix_micros(col("t3")) - unix_micros(col("t1")))).as("sum_micros"))
    }),

    // Range (band) join: for each error event, how many purchases
    // (any user) landed within ±30 min. Spark plans a raw
    // |a.ts - b.ts| <= w predicate as a nested-loop join — quadratic
    // and broadcast-bound. The scale-correct shape is bucketing: with
    // bucket width == band width, every in-band pair collides when one
    // side is replicated to its 3 neighboring buckets, so the join is
    // a plain equi-join on the bucket id (shuffle linear in event
    // count), the exact |diff| <= w predicate verifies collisions, and
    // a left join restores zero-match errors. The oracle states the
    // same semantics as the direct theta join DuckDB can run exactly.
    "e08_band_join" -> ((s, dir) => {
      val w = 1800L * 1000000L // ±30 min in microseconds
      val err = ev(s, dir).filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), unix_micros(col("ts")).as("em"))
      val pur = ev(s, dir).filter(col("event_type") === "purchase")
        .select(unix_micros(col("ts")).as("pm"))
        .select(col("pm"), explode(array(
          expr(s"pm div $w") - 1, expr(s"pm div $w"),
          expr(s"pm div $w") + 1)).as("cell"))
      // One left join + conditional count: null pm (no collision) and
      // out-of-band collisions both count 0, so zero-match errors
      // survive without a second restoring join.
      err.withColumn("cell", expr(s"em div $w"))
        .join(pur, Seq("cell"), "left")
        .groupBy(col("e_id"))
        .agg(count(when(abs(col("em") - col("pm")) <= w, 1)).as("n_nearby"))
    }),

    // Cohort retention: users cohorted by first-active day (epoch-
    // aligned 1-day bucket, the e02 window/time_bucket parity), then
    // distinct active users per (cohort, day-offset ≤ 7) — the
    // product-analytics matrix every events warehouse serves. Shape:
    // the distinct (user, day) frontier materializes ONCE and feeds
    // both the per-user min (cohort assignment) and the offset join;
    // both sides of that join are hash-partitioned by user_id, so the
    // join adds no exchange, and the final count_distinct partial-
    // aggregates per (cohort, offset). Nothing is per-event after the
    // first distinct — state tracks users, not events.
    // Trending: per tumbling hour, the top-3 event types by count.
    // Two bounded aggregations — the (window, type) count is an
    // ordinary partial agg, then the per-window top-3 rides the
    // bounded-heap [[graft.functions.TopKAgg]] (≤ 3 structs per
    // window per task enter the final shuffle). The window-function
    // formulation (rank over a per-window sort) would shuffle and
    // sort every (window, type) row globally; the heap keeps the
    // plan Window-free (PlanSpec pins it). Ties break to the LARGER
    // event_type (struct max-ordering) — deterministic in both
    // engines (binary string comparison; ASCII values).
    "e10_trending" -> ((s, dir) => {
      val counts = ev(s, dir)
        .groupBy(window(col("ts"), "1 hour").getField("start").as("wstart"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
      counts.groupBy(col("wstart"))
        .agg(graft.functions.TopKAgg.topK(
          struct(col("n"), col("event_type")), 3).as("top"))
        .select(col("wstart"), posexplode(col("top")))
        .select(col("wstart"), (col("pos") + 1).cast("int").as("rk"),
          col("col.event_type").as("event_type"), col("col.n").as("n"))
    }),

    "e09_cohort_retention" -> ((s, dir) => {
      val days = graft.ops.Subplan.once(ev(s, dir)
        .select(col("user_id"),
          window(col("ts"), "1 day").getField("start").as("day"))
        .distinct())
      val cohort = days.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      days.join(cohort, "user_id")
        .select(col("user_id"), col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"))
        .filter(col("day_offset") <= 7)
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(count_distinct(col("user_id")).as("n_active"))
    })
  )

  val oracle: Map[String, String] = Map(
    "e01_json_props" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n
        |FROM events GROUP BY event_type""".stripMargin,
    "e05_props_struct" ->
      """WITH p AS (SELECT event_id,
        |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |  FROM events)
        |SELECT k % 10 AS k_bucket, COUNT(*) AS n,
        |  CAST(MIN(k) AS INTEGER) AS min_k, CAST(MAX(k) AS INTEGER) AS max_k
        |FROM p WHERE k IS NOT NULL GROUP BY k % 10""".stripMargin,
    "e02_tumbling_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY wstart, event_type""".stripMargin,
    "e03_sliding_window" ->
      """WITH hopped AS (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts)
        |           - k * INTERVAL '30 minutes' AS wstart, value
        |  FROM events, unnest(generate_series(0, 1)) u(k))
        |SELECT wstart, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM hopped GROUP BY wstart""".stripMargin,
    "e04_sessionize" ->
      """WITH lagged AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC) AS prev_ts
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_ts IS NULL
        |           OR ts > prev_ts + INTERVAL '30 minutes' THEN 1
        |         ELSE 0 END AS new_sess
        |  FROM lagged),
        |sessed AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess
        |  FROM flagged)
        |SELECT user_id, sess, COUNT(*) AS n_events,
        |  MIN(ts) AS t_start, MAX(ts) AS t_end
        |FROM sessed GROUP BY user_id, sess""".stripMargin,
    "e06_asof_join" ->
      """WITH p AS (
        |  SELECT user_id, ts, MAX(event_id) AS p_event_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
        |c AS (
        |  SELECT event_id, user_id, ts
        |  FROM events WHERE event_type = 'click')
        |SELECT c.event_id, c.user_id, c.ts, p.p_event_id,
        |  epoch_us(c.ts) - epoch_us(p.ts) AS micros_since
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,
    "e07_funnel" ->
      """WITH s AS (
        |  SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts >= s.t1 GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.t2 GROUP BY e.user_id)
        |SELECT (SELECT COUNT(*) FROM s) AS n_signup,
        |  (SELECT COUNT(*) FROM c) AS n_click,
        |  (SELECT COUNT(*) FROM p) AS n_purchase,
        |  CAST((SELECT SUM(epoch_us(p.t3) - epoch_us(s.t1))
        |     FROM p JOIN s USING (user_id)) AS BIGINT) AS sum_micros""".stripMargin,
    "e08_band_join" ->
      """WITH e AS (
        |  SELECT event_id AS e_id, epoch_us(ts) AS em
        |  FROM events WHERE event_type = 'error'),
        |p AS (
        |  SELECT epoch_us(ts) AS pm FROM events WHERE event_type = 'purchase')
        |SELECT e.e_id, COUNT(p.pm) AS n_nearby
        |FROM e LEFT JOIN p ON abs(p.pm - e.em) <= 1800000000
        |GROUP BY e.e_id""".stripMargin,
    "e09_cohort_retention" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |    time_bucket(INTERVAL '1 day', ts) AS day
        |  FROM events),
        |coh AS (SELECT user_id, MIN(day) AS cohort_day
        |  FROM days GROUP BY user_id)
        |SELECT c.cohort_day,
        |  CAST(date_diff('day', c.cohort_day, d.day) AS INTEGER) AS day_offset,
        |  COUNT(DISTINCT d.user_id) AS n_active
        |FROM days d JOIN coh c USING (user_id)
        |WHERE date_diff('day', c.cohort_day, d.day) <= 7
        |GROUP BY c.cohort_day, day_offset""".stripMargin,
    // The window-rank restatement of the heap: ties to the LARGER
    // event_type, matching top_k's struct max-ordering.
    "e10_trending" ->
      """WITH c AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart,
        |    event_type, COUNT(*) AS n
        |  FROM events GROUP BY wstart, event_type),
        |r AS (SELECT wstart, event_type, n,
        |    row_number() OVER (PARTITION BY wstart
        |      ORDER BY n DESC, event_type DESC) AS rk
        |  FROM c)
        |SELECT wstart, CAST(rk AS INTEGER) AS rk, event_type, n
        |FROM r WHERE rk <= 3""".stripMargin
  )
}
