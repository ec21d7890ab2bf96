package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

/** Temporal join entries (SURVEY.md §2.6 joins, the two shapes Spark
  * has no built-in for): as-of join and range join over the `events`
  * table, each checked against an explicit DuckDB re-derivation.
  *
  * Scale notes: q22 is one exchange of (purchases+views) rows and a
  * per-user sorted carry — per-key history length never multiplies
  * (the naive `rt <= lt` join materializes every prior view per
  * purchase before picking the max). q23 equi-joins on a time bucket,
  * so the plan is a hash-partitioned SortMergeJoin AQE can skew-split —
  * never the BroadcastNestedLoopJoin Spark would pick for a raw
  * inequality join (TemporalJoinsSpec pins both plans).
  */
object TemporalQueries {
  import Tables._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_asof_join" -> { (s, dir) =>
      // For each purchase, the most recent view (at-or-before, same
      // user), tie-broken by event_id; per-user match stats. Gap stays
      // in integer microseconds — exact in both engines.
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
      TemporalJoins.asOfJoin(
          purchases, views,
          leftKey = col("user_id"), rightKey = col("user_id"),
          leftTime = col("ts"), rightTime = col("ts"),
          rightTieBreak = col("event_id"),
          payload = Seq(col("event_id").as("v_id"), col("ts").as("v_ts")))
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_purchases"),
          count(col("as_of.v_id")).as("n_matched"),
          coalesce(sum(unix_micros(col("ts")) -
            unix_micros(col("as_of.v_ts"))), lit(0L)).as("sum_gap_us"),
          coalesce(sum(col("as_of.v_id")), lit(0L)).as("sum_view_id"))
        .orderBy(col("user_id"))
    },
    "q23_range_join" -> { (s, dir) =>
      // Each error opens a 10-minute half-open window; count clicks
      // (any user) inside it, then histogram errors by click count.
      // Bucket width = window width → each interval explodes to ≤2
      // bucket rows.
      val ev = t(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL '10' MINUTE")).as("w_end"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("ts").as("click_ts"))
      val counts = TemporalJoins.rangeJoin(
          clicks, errors, pointTime = col("click_ts"),
          intervalStart = col("w_start"), intervalEnd = col("w_end"),
          bucketSeconds = 600L)
        .groupBy(col("err_id")).agg(count(lit(1)).as("n_clicks"))
      errors.join(counts, Seq("err_id"), "left")
        .select(coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
        .groupBy(col("n_clicks")).agg(count(lit(1)).as("n_errors"))
        .orderBy(col("n_clicks"))
    },
    "q29_asof_forward" -> { (s, dir) =>
      // forward as-of: for each purchase, the EARLIEST view at-or-after
      // (same user) — the other merge_asof direction, same one-exchange
      // plan with the traversal reversed
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
      TemporalJoins.asOfJoin(
          purchases, views,
          leftKey = col("user_id"), rightKey = col("user_id"),
          leftTime = col("ts"), rightTime = col("ts"),
          rightTieBreak = col("event_id"),
          payload = Seq(col("event_id").as("v_id"), col("ts").as("v_ts")),
          direction = "forward")
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_purchases"),
          count(col("as_of.v_id")).as("n_matched"),
          coalesce(sum(unix_micros(col("as_of.v_ts")) -
            unix_micros(col("ts"))), lit(0L)).as("sum_gap_us"),
          coalesce(sum(col("as_of.v_id")), lit(0L)).as("sum_view_id"))
        .orderBy(col("user_id"))
    },
    "q26_funnel" -> { (s, dir) =>
      // view → click → purchase within 24 h of the first view,
      // anchored-earliest semantics: ONE exchange keyed on user + a
      // per-user linear fold (the oracle re-derives it as iterated
      // conditional minima — n joins the Spark plan never pays).
      graft.operators.Funnel.funnel(t(s, dir, "events"),
          Seq("view", "click", "purchase"),
          maxSpanSeconds = Some(86400L))
        .select(col("user").as("user_id"), col("depth").cast("long"),
          col("step_1"), col("step_2"), col("step_3"))
        .orderBy(col("user_id"))
    },
    "q27_retention" -> { (s, dir) =>
      // daily cohort retention: ONE user-keyed exchange + an
      // output-sized (cohort, delta) aggregation + a broadcast of the
      // one-row-per-cohort sizes; the rate is a single IEEE division
      // of exact longs, so it hash-matches DuckDB bit-for-bit
      graft.operators.Retention.cohortRetention(
          t(s, dir, "events"), col("ts"), col("user_id"),
          periodSeconds = 86400L)
        .orderBy(col("cohort_start"), col("periods_since"))
    },
    "q33_sessions" -> { (s, dir) =>
      // batch sessionization (the batch twin of streaming_session): a
      // session breaks when the same-user gap exceeds 30 min; ids are
      // a running sum of break flags. ONE user-keyed exchange — both
      // window passes and the final aggregation share the user_id
      // partitioning, so Catalyst plans a single sort and no second
      // shuffle; gaps stay in integer microseconds (exact in both
      // engines), ties broken by event_id.
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events").select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_s", when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) >
            lit(1800L * 1000000L), 1L).otherwise(0L))
        .withColumn("sess", sum(col("new_s")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("t_start"), max(col("ts")).as("t_end"),
          (unix_micros(max(col("ts"))) -
            unix_micros(min(col("ts")))).as("dur_us"))
        .orderBy(col("user_id"), col("sess"))
    },
    "q31_gap_fill" -> { (s, dir) =>
      // time-series resample + forward fill: hourly event counts per
      // type on a COMPLETE per-type hour grid. The grid is
      // sequence/explode over one (min,max) agg row per type — its
      // size is bounded by types × hours, never by event count — and
      // the fill is a per-type running last-non-null window over that
      // bounded grid, so the only event-sized work is the first
      // partial-agg shuffle. Hour = integer DIV of epoch micros (a
      // double divide could misround a boundary).
      import org.apache.spark.sql.expressions.Window
      val withH = t(s, dir, "events").select(col("event_type"),
        expr("unix_micros(ts) DIV 3600000000").as("h"))
      val counts = withH.groupBy(col("event_type"), col("h"))
        .agg(count(lit(1)).as("n"))
      val grid = counts.groupBy(col("event_type"))
        .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
        .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("h"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(counts, Seq("event_type", "h"), "left")
        .select(col("event_type"), col("h"), col("n"),
          last(col("n"), ignoreNulls = true).over(w).as("filled"))
        .orderBy(col("event_type"), col("h"))
    })

  val oracle: Map[String, String] = Map(
    "q22_asof_join" ->
      """WITH u AS (
           SELECT user_id AS k, ts, 0 AS side, event_id,
                  NULL::BIGINT AS p_id, NULL::TIMESTAMP AS p_ts
           FROM events WHERE event_type = 'view'
           UNION ALL
           SELECT user_id, ts, 1, event_id, event_id, ts
           FROM events WHERE event_type = 'purchase'),
         w AS (
           SELECT *,
             last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
               OVER win AS v_id,
             last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
               OVER win AS v_ts
           FROM u
           WINDOW win AS (PARTITION BY k ORDER BY ts, side, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT k AS user_id, COUNT(*) AS n_purchases,
                COUNT(v_id) AS n_matched,
                COALESCE(SUM(date_diff('microsecond', v_ts, ts)), 0)::BIGINT
                  AS sum_gap_us,
                COALESCE(SUM(v_id), 0)::BIGINT AS sum_view_id
         FROM w WHERE side = 1 GROUP BY k ORDER BY user_id""",
    "q23_range_join" ->
      """WITH e AS (SELECT event_id, ts FROM events WHERE event_type = 'error'),
         c AS (SELECT ts FROM events WHERE event_type = 'click'),
         j AS (SELECT e.event_id,
                      COUNT(c.ts)::BIGINT AS n_clicks
               FROM e LEFT JOIN c
                 ON c.ts >= e.ts AND c.ts < e.ts + INTERVAL 10 MINUTE
               GROUP BY e.event_id)
         SELECT n_clicks, COUNT(*) AS n_errors
         FROM j GROUP BY n_clicks ORDER BY n_clicks""",
    "q29_asof_forward" ->
      """WITH u AS (
           SELECT user_id AS k, ts, 0 AS side, event_id,
                  NULL::BIGINT AS p_id, NULL::TIMESTAMP AS p_ts
           FROM events WHERE event_type = 'view'
           UNION ALL
           SELECT user_id, ts, 1, event_id, event_id, ts
           FROM events WHERE event_type = 'purchase'),
         w AS (
           SELECT *,
             last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
               OVER win AS v_id,
             last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
               OVER win AS v_ts
           FROM u
           WINDOW win AS (PARTITION BY k ORDER BY ts DESC, side, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT k AS user_id, COUNT(*) AS n_purchases,
                COUNT(v_id) AS n_matched,
                COALESCE(SUM(date_diff('microsecond', ts, v_ts)), 0)::BIGINT
                  AS sum_gap_us,
                COALESCE(SUM(v_id), 0)::BIGINT AS sum_view_id
         FROM w WHERE side = 1 GROUP BY k ORDER BY user_id""",
    "q26_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                     WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
                JOIN s1 USING (user_id)
                WHERE e.event_type = 'click' AND e.ts > s1.t1
                  AND e.ts <= s1.t1 + INTERVAL 24 HOUR GROUP BY 1),
         s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
                JOIN s2 USING (user_id) JOIN s1 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                  AND e.ts <= s1.t1 + INTERVAL 24 HOUR GROUP BY 1)
         SELECT u.user_id,
                (CASE WHEN t3 IS NOT NULL THEN 3
                      WHEN t2 IS NOT NULL THEN 2
                      WHEN t1 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS depth,
                t1 AS step_1, t2 AS step_2, t3 AS step_3
         FROM (SELECT DISTINCT user_id FROM events
               WHERE event_type IN ('view','click','purchase')) u
         LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
         LEFT JOIN s3 USING (user_id)
         ORDER BY user_id""",
    "q27_retention" ->
      """WITH up AS (
           SELECT DISTINCT user_id,
                  epoch_us(ts) // 86400000000 AS per
           FROM events),
         c AS (SELECT user_id, min(per) AS cohort FROM up GROUP BY 1),
         m AS (SELECT c.cohort, up.per - c.cohort AS delta,
                      count(*)::BIGINT AS active_users
               FROM up JOIN c USING (user_id) GROUP BY 1, 2),
         s AS (SELECT cohort, active_users AS cohort_size FROM m
               WHERE delta = 0)
         SELECT make_timestamp(m.cohort * 86400000000) AS cohort_start,
                m.delta AS periods_since, m.active_users, s.cohort_size,
                m.active_users::DOUBLE / s.cohort_size AS retention
         FROM m JOIN s USING (cohort)
         ORDER BY cohort_start, periods_since""",
    "q33_sessions" ->
      """WITH f AS (SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         g AS (SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS sess
           FROM f)
         SELECT user_id, sess, COUNT(*)::BIGINT AS n_events,
                min(ts) AS t_start, max(ts) AS t_end,
                date_diff('microsecond', min(ts), max(ts))::BIGINT AS dur_us
         FROM g GROUP BY 1, 2 ORDER BY user_id, sess""",
    "q31_gap_fill" ->
      """WITH b AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h,
                           COUNT(*)::BIGINT AS n
                    FROM events GROUP BY 1, 2),
         g AS (SELECT event_type, unnest(generate_series(min(h), max(h))) AS h
               FROM b GROUP BY event_type)
         SELECT g.event_type, g.h, b.n,
                last_value(b.n IGNORE NULLS) OVER (
                  PARTITION BY g.event_type ORDER BY g.h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
         FROM g LEFT JOIN b USING (event_type, h)
         ORDER BY event_type, h""")
}
