package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints over a table — the validation
  * gate of a production pipeline (schema drift, null creep, broken
  * foreign keys surface here before they poison a training run).
  *
  * The scale contract: every per-table check is ONE aggregation
  * expression, and a whole suite of them evaluates in a SINGLE scan
  * of the table ([[singlePass]] packs all numerators/denominators
  * into one `agg(...)` row, then unpivots driver-side — the one-row
  * result is the only thing that leaves the executors). Referential
  * integrity is the exception that genuinely needs a second relation:
  * it compiles to an anti-join COUNT whose child side is
  * null-filtered map-side (and is exactly the shape Spark's runtime
  * bloom-filter rewrite prefilters at 100 TB).
  *
  * Every metric is (num, den) exact longs plus one IEEE division —
  * bit-reproducible across engines, like every ratio in this engine.
  */
object Constraints {

  /** One check: name + numerator/denominator aggregate expressions. */
  final case class Check(name: String, num: Column, den: Column)

  /** Fraction of rows with `c` non-null. */
  def completeness(name: String, c: Column): Check =
    Check(name, count(c), count(lit(1)))

  /** Distinct values over total (1.0 = unique column). */
  def uniqueness(name: String, c: Column): Check =
    Check(name, count_distinct(c), count(lit(1)))

  /** Fraction of rows satisfying `pred` (null predicate = fail). */
  def satisfies(name: String, pred: Column): Check =
    Check(name, count(when(pred, lit(1))), count(lit(1)))

  /** Run all checks in ONE scan; returns
    * (check_name, num, den, ratio) rows, one per check.
    */
  def singlePass(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val aggs = checks.flatMap { ch =>
      Seq(ch.num.cast("long").as(ch.name + "__num"),
        ch.den.cast("long").as(ch.name + "__den"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val triples = checks.map { ch =>
      struct(lit(ch.name).as("check_name"),
        col(ch.name + "__num").as("num"),
        col(ch.name + "__den").as("den"))
    }
    row.select(explode(array(triples: _*)).as("t"))
      .select(col("t.check_name").as("check_name"),
        col("t.num").as("num"), col("t.den").as("den"),
        (col("t.num").cast("double") / col("t.den").cast("double")).as("ratio"))
  }

  /** Referential integrity: child keys present in the parent key set.
    * num = child rows whose non-null key HAS a parent, den = child
    * rows with a non-null key (nulls are [[completeness]]'s job).
    * The violation side is an anti-join count — at scale the parent
    * key set prefilters via the runtime bloom rewrite or an explicit
    * [[Dedup.incrementalNewBloom]]-style blob.
    */
  def refIntegrity(name: String, child: DataFrame, childKey: Column,
      parent: DataFrame, parentKey: Column): DataFrame = {
    val c = child.select(childKey.as("k")).filter(col("k").isNotNull)
    val p = parent.select(parentKey.as("k")).distinct()
    val den = c.count()
    val orphans = c.join(p, Seq("k"), "left_anti").count()
    val num = den - orphans
    c.sparkSession.range(1).select(
      lit(name).as("check_name"), lit(num).as("num"), lit(den).as("den"),
      (lit(num).cast("double") / lit(den).cast("double")).as("ratio"))
  }
}
