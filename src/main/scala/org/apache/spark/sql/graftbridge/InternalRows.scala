package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge into Spark's `private[sql]` internal-row constructor
  * (`SparkSession.internalCreateDataFrame`, package-private since the
  * first releases — see the Spark source). Lives under
  * `org.apache.spark.sql` for visibility only; no Spark behavior is
  * modified.
  *
  * Why: `Dataset.mapPartitions` over deeply nested case classes
  * (Seq[Quad] of 4-field Terms) pays the ExpressionEncoder
  * serializer on every row — MapObjects loops re-walking each object
  * graph. A parser that already knows its output shape can emit
  * `InternalRow`s directly and skip that entire layer; the input side
  * (`queryExecution.toRdd`) likewise skips the deserializer.
  */
object InternalRows {
  /** Wrap an RDD of already-internal rows as a DataFrame. The rows
    * must match `schema` exactly (UTF8String for strings, GenericArrayData
    * for arrays, InternalRow for structs) — this is the caller's
    * contract, exactly as for Spark's own internal operators.
    */
  def toDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
