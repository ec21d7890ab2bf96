package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the query inventory.
  *
  * Cross-engine determinism policy (Spark vs the DuckDB oracle):
  * floating-point SUM is order-dependent, so every money/quantity
  * aggregate is computed in exact DECIMAL arithmetic (associative,
  * engine-order-independent) and cast to DOUBLE only at the very end.
  * A scale-4 decimal has no representable-midpoint ties for binary
  * doubles, so double->decimal rounding agrees between engines.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS), which Spark 4 rejects as a
    * timestamp type. Read it as a nanos long and convert to a microsecond
    * TimestampType column (the data is µs-granular, so this is lossless
    * and agrees with DuckDB's native nanos read). Exact integer `div`,
    * not `/`: float division of 1.7e18-scale nanos exceeds double's
    * 53-bit exact range and can truncate a µs low on boundaries.
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true` in the
    * session builder (set by Verify/Bench/test harnesses; asserted here
    * rather than mutated so a library session is never side-effected).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "session must be built with spark.sql.legacy.parquet.nanosAsLong=true to read events")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Exact-decimal view of a 2dp double column. */
  def dec(c: Column): Column = c.cast(DecimalType(12, 4))

  /** Deterministic double output of a decimal aggregate. */
  def d(c: Column): Column = c.cast("double")
}
