package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-sequence (funnel) analysis over an event log: for each
  * user, how far through a fixed step sequence (e.g. view → click →
  * purchase) their events progress, and when each step was reached.
  *
  * Semantics — anchored earliest-first: step 1 matches the user's
  * FIRST event of the first step type; step k+1 matches the first
  * event of its type STRICTLY after step k's match (and, when
  * `maxSpanSeconds` is set, no later than step 1's match + span).
  * Anchoring at the first occurrence is the fixed, engine-independent
  * definition funnel tools use; it makes the result a deterministic
  * function of the event set, reproducible by iterated conditional
  * minima in any SQL engine (the oracle re-derives it that way).
  *
  * Physical shape at 100 TB: one map-side filter to the step types
  * (usually a tiny fraction of the log), ONE exchange keyed on the
  * user, and a per-user linear fold over the time-sorted events
  * (`array_sort` + `aggregate` HOF — no Window, no per-step join
  * cascade that would re-shuffle the log once per step). Per-user
  * state is just that user's step-typed events; the fold is O(events
  * per user). An n-step funnel costs the same single shuffle as a
  * 2-step one.
  */
object Funnel {

  /** Per-user funnel depth + step timestamps. Returns
    * (user, depth, step_1 … step_n timestamps, nulls past depth).
    *
    * `tieCol` breaks equal-timestamp order deterministically (events
    * at the same instant match in `tieCol` order).
    */
  def funnel(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", tieCol: String = "event_id",
      maxSpanSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val n = steps.size
    val stepArr = array(steps.map(lit): _*)
    val ev = events
      .filter(col(typeCol).isin(steps.distinct: _*))
      .select(col(userCol).as("user"),
        struct(col(tsCol).as("ts"), col(tieCol).as("tie"),
          col(typeCol).as("et")).as("e"))
    val packed = ev.groupBy(col("user"))
      .agg(array_sort(collect_list(col("e"))).as("evs"))
    // fold: times = timestamps of matched steps so far (size = depth)
    val zero = array().cast("array<timestamp>")
    val folded = packed.select(col("user"),
      aggregate(col("evs"), zero, (acc, e) => {
        val depth = size(acc)
        val wantType = e.getField("et") === element_at(stepArr, depth + 1)
        val afterPrev = depth === 0 ||
          e.getField("ts") > element_at(acc, -1)
        val inSpan = maxSpanSeconds match {
          case None => lit(true)
          case Some(s) => depth === 0 ||
            e.getField("ts") <= element_at(acc, 1) + expr(s"INTERVAL $s SECONDS")
        }
        when(depth < n && wantType && afterPrev && inSpan,
          concat(acc, array(e.getField("ts")))).otherwise(acc)
      }).as("times"))
    val stepCols = (1 to n).map { i =>
      when(size(col("times")) >= i, element_at(col("times"), i))
        .as(s"step_$i")
    }
    folded.select(col("user") +: size(col("times")).as("depth") +: stepCols: _*)
  }

  /** Funnel conversion summary: users reaching at least each step. */
  def conversion(perUser: DataFrame, n: Int): DataFrame = {
    val flags = (1 to n).map(i =>
      sum(when(col("depth") >= i, 1L).otherwise(0L)).as(s"reached_$i"))
    perUser.agg(count(lit(1)).as("users"), flags: _*)
  }
}
