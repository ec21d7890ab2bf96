package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention analysis — the standard "weekly cohorts × weeks
  * since first activity" matrix over an event log.
  *
  * Semantics: each user's cohort is the period (fixed-width bucket of
  * event time, anchored at the epoch) of their FIRST qualifying event;
  * for every later period in which the user is active, they count
  * toward (cohort, period − cohort). `retention` is active/size for
  * the cohort — the single IEEE division of two exact longs, so it is
  * bit-reproducible across engines.
  *
  * Scale shape (the 100 TB contract): ONE exchange keyed on the user
  * collapses the log to per-user (cohort, active-period-set) — the
  * map side pre-aggregates (user, period) pairs, so the shuffle
  * carries at most |users|×|periods| rows, never the raw log. The
  * exploded pairs then aggregate on (cohort, delta) — output-sized —
  * and cohort sizes join back via BROADCAST (one row per cohort).
  * No window function, no self-join of the log, nothing driver-side.
  *
  * Period bucketing is exact integer division of epoch microseconds
  * (`div`), not a double divide — a double mantissa holds 2^53 and
  * late-epoch microsecond values sit near 2^50.6, close enough that a
  * derived expression could silently round on a boundary.
  */
object Retention {

  /** Retention matrix: (cohort_start timestamp, periods_since,
    * active_users, cohort_size, retention).
    *
    * @param events        event log
    * @param tsCol         event-time column (timestamp)
    * @param userCol       user key column
    * @param periodSeconds cohort bucket width (default 7 days)
    */
  def cohortRetention(
      events: DataFrame,
      tsCol: Column,
      userCol: Column,
      periodSeconds: Long = 7L * 86400L): DataFrame = {
    val periodUs = periodSeconds * 1000000L
    // map side: distinct (user, period) via the partial aggregation of
    // groupBy — the exchange carries user-period pairs only
    val userPeriods = events
      .select(userCol.as("u"), unix_micros(tsCol).as("_us"))
      .select(col("u"), expr(s"_us div ${periodUs}L").as("per"))
      .groupBy(col("u"), col("per")).agg(count(lit(1)).as("_n"))
      .drop("_n")
    // one exchange on user: cohort = min period, actives = period set
    val perUser = userPeriods
      .groupBy(col("u"))
      .agg(min(col("per")).as("cohort"),
        collect_set(col("per")).as("periods"))
    val pairs = perUser
      .select(col("cohort"),
        explode(col("periods")).as("per"))
      .select(col("cohort"), (col("per") - col("cohort")).as("delta"))
    val matrix = pairs.groupBy(col("cohort"), col("delta"))
      .agg(count(lit(1)).as("active_users"))
    // one row per cohort — always broadcastable
    val sizes = matrix.filter(col("delta") === 0L)
      .select(col("cohort"), col("active_users").as("cohort_size"))
    matrix.join(broadcast(sizes), Seq("cohort"))
      .select(
        timestamp_micros(col("cohort") * periodUs).as("cohort_start"),
        col("delta").as("periods_since"),
        col("active_users"),
        col("cohort_size"),
        (col("active_users").cast("double") /
          col("cohort_size").cast("double")).as("retention"))
  }
}
