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
  /** File schema memo, one entry per parquet path per JVM: the input
    * fixtures are immutable, but a bare `spark.read.parquet(path)` pays
    * a footer-inference pass PER CALL — a per-invocation driver tax
    * every table-reading entry paid (optimization guide §6). The memo
    * caches metadata only (never rows or results); each read still
    * scans the file.
    */
  private val schemaMemo = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  /** Memoized physical schema of an immutable parquet fixture. */
  def fileSchema(spark: SparkSession,
      path: String): org.apache.spark.sql.types.StructType =
    schemaMemo.computeIfAbsent(path, _ => spark.read.parquet(path).schema)

  private def readFixed(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(fileSchema(spark, path)).parquet(path)

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else readFixed(spark, s"$dir/$name.parquet")

  /** events.parquet has carried its `ts` column as TIMESTAMP(NANOS) in
    * some generator versions (which Spark 4 rejects as a timestamp type)
    * and TIMESTAMP(MICROS) in others, so the loader adapts to the file's
    * physical schema and always yields a session-zone TimestampType
    * column:
    *  - nanos → read as long (`spark.sql.legacy.parquet.nanosAsLong=true`,
    *    asserted, not mutated — a library session is never side-effected)
    *    and convert with exact integer `div` (float division of
    *    1.7e18-scale nanos exceeds double's 53-bit exact range and can
    *    truncate a µs low on boundaries);
    *  - micros → arrives as TIMESTAMP_NTZ (no zone in the file); cast to
    *    TimestampType, value-preserving because every harness pins
    *    `spark.sql.session.timeZone=UTC`, matching DuckDB's zoneless read.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = readFixed(spark, s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        require(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
          "session must be built with spark.sql.legacy.parquet.nanosAsLong=true to read events")
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Exact-decimal view of a 2dp double column. */
  def dec(c: Column): Column = c.cast(DecimalType(12, 4))

  /** Deterministic double output of a decimal aggregate. */
  def d(c: Column): Column = c.cast("double")
}
