package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.{bridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable Misra-Gries state: ≤ capacity counters plus the total
  * number of non-null items observed. The counter for a surviving item
  * is a LOWER BOUND on its true count, under-counting by at most
  * total/(capacity+1) — the classic frequent-items guarantee, which
  * merging preserves (Agarwal et al., "Mergeable Summaries", PODS'12).
  */
final class MGBuffer(val counts: mutable.HashMap[UTF8String, Long],
    var total: Long)

/** Misra-Gries frequent-items summary as a mergeable Catalyst
  * aggregate — the 100 TB heavy-hitter path. Each partition keeps at
  * most `capacity` counters; only those O(capacity) pairs ride the
  * partial-agg shuffle, never the distinct-item set (exact
  * COUNT(*) GROUP BY item shuffles every distinct value — unbounded at
  * corpus scale). Any item with true frequency > total/(capacity+1) is
  * GUARANTEED to survive the merged summary, so a second exact pass
  * over the ≤ capacity candidates turns the sketch into an exact
  * answer ([[graft.pipeline.CorpusStats.heavyHitters]]).
  *
  * Returns struct(total: long, items: array&lt;struct&lt;item, lb&gt;&gt;) —
  * total rides along so candidate generation and corpus sizing are ONE
  * scan; `lb` is the summary's lower-bound count, items sorted
  * (-lb, item) for deterministic output.
  */
case class MisraGriesSummary(child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] with UnaryLike[Expression] {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def createAggregationBuffer(): MGBuffer =
    new MGBuffer(mutable.HashMap.empty, 0L)

  override def update(buffer: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val w = v.asInstanceOf[UTF8String]
      buffer.total += 1
      buffer.counts.get(w) match {
        case Some(c) => buffer.counts.update(w, c + 1)
        case None if buffer.counts.size < capacity =>
          // the incoming UTF8String may view a reused row buffer
          buffer.counts.put(w.clone(), 1L)
        case None =>
          // classic MG decrement-all on a full miss; O(capacity), and
          // amortized each decrement "spends" one prior increment
          val dead = buffer.counts.iterator.collect {
            case (k, c) if c <= 1L => k
          }.toList
          buffer.counts.mapValuesInPlace((_, c) => c - 1L)
          dead.foreach(buffer.counts.remove)
      }
    }
    buffer
  }

  override def merge(buffer: MGBuffer, other: MGBuffer): MGBuffer = {
    buffer.total += other.total
    other.counts.foreach { case (k, c) =>
      buffer.counts.update(k, buffer.counts.getOrElse(k, 0L) + c)
    }
    val over = buffer.counts.size - capacity
    if (over > 0) {
      // subtract the (capacity+1)-th largest count from every counter
      // and drop the non-positive — the error-preserving MG merge
      val m = buffer.counts.values.toArray.sorted.apply(over - 1)
      val dead = buffer.counts.iterator.collect {
        case (k, c) if c <= m => k
      }.toList
      buffer.counts.mapValuesInPlace((_, c) => c - m)
      dead.foreach(buffer.counts.remove)
    }
    buffer
  }

  override def eval(buffer: MGBuffer): Any = {
    val items = buffer.counts.toArray
      .sortBy { case (k, c) => (-c, k) }
      .map { case (k, c) => InternalRow(k, c) }
    InternalRow(buffer.total, new GenericArrayData(items))
  }

  override def serialize(buffer: MGBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buffer.total)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreach { case (k, c) =>
      val b = k.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val total = in.readLong()
    val n = in.readInt()
    val m = mutable.HashMap.empty[UTF8String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.put(UTF8String.fromBytes(b), in.readLong())
    }
    new MGBuffer(m, total)
  }

  override def dataType: DataType = MisraGriesSummary.resultType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): MisraGriesSummary =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesSummary =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MisraGriesSummary =
    copy(child = c)
  override def prettyName: String = "misra_gries"
}

object MisraGriesSummary {
  val resultType: StructType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = true),
      StructField("lb", LongType, nullable = false))),
      containsNull = false), nullable = false)))
}

object FreqSketch {

  /** Misra-Gries summary aggregate over a string column: at most
    * `capacity` (item, lower-bound) counters plus the non-null total.
    * Guaranteed superset of every item with count > total/(capacity+1).
    */
  def misraGries(c: Column, capacity: Int): Column =
    ExpressionUtils.column(
      MisraGriesSummary(ExpressionUtils.expression(c), capacity)
        .toAggregateExpression())
}
