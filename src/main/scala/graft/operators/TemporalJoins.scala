package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins, composed from
  * relational primitives so Catalyst/AQE keep optimizing them (the
  * preferred strategy over a custom SparkPlan — both shapes reduce to
  * one equi-shuffle plus codegen'd per-row work).
  *
  * == As-of join ==
  * The naive formulation — `left JOIN right ON key AND rt <= lt` then
  * keep the max-rt row — explodes to the full history per probe before
  * aggregating (a purchase with 1,000 prior views materializes 1,000
  * pairs). [[asOfJoin]] instead unions both sides and carries the most
  * recent right payload forward with one per-key window: one shuffle on
  * the key, per-partition sort, zero intermediate blowup. At 100 TB the
  * cost is exactly one exchange of (left+right) rows; per-key history
  * length never multiplies.
  *
  * == Range join ==
  * Spark plans a pure inequality join (no equi-key) as
  * BroadcastNestedLoopJoin — quadratic work and a broadcast of a whole
  * side. [[rangeJoin]] bins time into fixed-width buckets, explodes each
  * interval to the buckets it overlaps (ceil(width/W)+1 of them), and
  * equi-joins points on bucket before the exact bounds filter. Work is
  * O(pairs-in-same-bucket), shuffle is hash-partitioned, and AQE can
  * split a hot bucket like any skewed equi-join key.
  */
object TemporalJoins {

  /** For each left row, attach the payload of the most recent right row
    * with the same key and `rightTime <= leftTime` (inclusive; the
    * standard as-of semantics — DuckDB `ASOF JOIN`, kdb+ `aj`). Left
    * rows with no prior right row get a null payload (left-outer).
    *
    * Ties on `rightTime` within a key are broken deterministically by
    * `rightTieBreak` (largest wins) — a distributed engine must not
    * leave the pick to partition order.
    *
    * @param payload right-side columns to carry; emitted on the result
    *                as a struct column named `as_of` (null = no match)
    * @param toleranceSeconds max lookback (backward) / lookahead
    *                (forward): a carried right row further than this
    *                many seconds from the left time is treated as
    *                no-match (pandas merge_asof semantics);
    *                None = unbounded
    * @param direction "backward" (most recent right ≤ left time, the
    *                default) or "forward" (earliest right ≥ left time
    *                — pandas merge_asof direction='forward'); both
    *                inclusive, both tie-broken by largest
    *                `rightTieBreak` at equal right time
    * @return all left columns + `as_of`
    */
  def asOfJoin(left: DataFrame, right: DataFrame, leftKey: Column,
      rightKey: Column, leftTime: Column, rightTime: Column,
      rightTieBreak: Column, payload: Seq[Column],
      toleranceSeconds: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val fwd = direction == "forward"
    // side 0 (right) sorts before side 1 (left) at equal time, making
    // the carry inclusive; __tie orders equal-time right rows so
    // last() picks the max tie-break. The forward direction is the
    // SAME carry over time reversed (descending traversal): last
    // non-null right then = earliest right at-or-after.
    val r = right.select(
      rightKey.as("__k"), rightTime.as("__t"), lit(0).as("__side"),
      rightTieBreak.cast("long").as("__tie"),
      struct(payload: _*).as("__payload"))
    val l = left.select(
      (left.columns.map(col) :+ leftKey.as("__k") :+ leftTime.as("__t") :+
        lit(1).as("__side") :+ lit(null).cast("long").as("__tie")): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(if (fwd) col("__t").desc else col("__t").asc,
        col("__side"), col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r.withColumns(
        left.columns.map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap),
        allowMissingColumns = true)
      .withColumn("as_of", last(col("__payload"), ignoreNulls = true).over(w))
    val bounded = toleranceSeconds.fold(carried) { tol =>
      // the carried right TIME rides the same window, so the lookback/
      // lookahead bound is a plain post-filter — no second join
      carried
        .withColumn("__rt", last(when(col("__side") === 0, col("__t")),
          ignoreNulls = true).over(w))
        .withColumn("as_of", when(
          if (fwd) col("__rt") <= col("__t") + expr(s"INTERVAL '$tol' SECOND")
          else col("__rt") >= col("__t") - expr(s"INTERVAL '$tol' SECOND"),
          col("as_of")))
        .drop("__rt")
    }
    bounded
      .filter(col("__side") === 1)
      .drop("__k", "__t", "__side", "__tie", "__payload")
  }

  /** Inner-join `points` to every `intervals` row whose
    * `[intervalStart, intervalEnd)` half-open window contains
    * `pointTime`. `bucketSeconds` is the binning width — pick it at or
    * above the typical interval width so most intervals explode to ≤2
    * buckets (any width still joins correctly, it just replicates the
    * interval row across more buckets).
    *
    * @return all interval columns + all point columns (names must not
    *         collide; select/alias before calling)
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, pointTime: Column,
      intervalStart: Column, intervalEnd: Column,
      bucketSeconds: Long): DataFrame = {
    val w = bucketSeconds * 1000000L
    // half-open end: bucket of the last contained microsecond
    val iv = intervals.withColumn("__b", explode(sequence(
      floorDiv(unix_micros(intervalStart), w),
      floorDiv(unix_micros(intervalEnd) - 1, w))))
    val pt = points
      .withColumn("__b", floorDiv(unix_micros(pointTime), w))
      .withColumn("__t", pointTime)
    iv.join(pt, Seq("__b"))
      .filter(col("__t") >= intervalStart && col("__t") < intervalEnd)
      .drop("__b", "__t")
  }

  /** Exact floor division of a long column: subtracting the positive
    * `pmod` leaves an exact multiple of d (floor semantics for negative
    * pre-epoch micros too), and the decimal division of that multiple
    * is exact — double division would lose low bits past 2^53.
    */
  private def floorDiv(c: Column, d: Long): Column =
    ((c - pmod(c, lit(d))).cast("decimal(38,0)") / lit(d)).cast("long")
}
