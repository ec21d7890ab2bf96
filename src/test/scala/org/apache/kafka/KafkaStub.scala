// Test-scope STUB of the public org.apache.kafka.clients consumer API
// surface that graft.connect.KafkaEventSource binds to reflectively.
// The production container ships no kafka-clients jar, so these
// classes stand in — same fully-qualified names, same public method
// signatures — backed by graft.StubBroker, an in-JVM log. This lets
// the suite drive the adapter's FULL contract (subscribe/assignment,
// policy seeks, buffered poll, lag math, commitSync fold, topic
// listing) through the exact reflective call paths production takes.
// NOT a reimplementation of Kafka: single-consumer, no rebalancing,
// no network — the minimum honest broker semantics the contract needs.
package org.apache.kafka.common {
  final class TopicPartition(t: String, p: Int) {
    def topic(): String = t
    def partition(): Int = p
    override def equals(o: Any): Boolean = o match {
      case x: TopicPartition => x.topic() == t && x.partition() == p
      case _ => false
    }
    override def hashCode(): Int = (t, p).hashCode()
    override def toString: String = s"$t-$p"
  }
}

package org.apache.kafka.common.header {
  trait Header {
    def key(): String
    def value(): Array[Byte]
  }
}

package org.apache.kafka.clients.consumer {
  import org.apache.kafka.common.TopicPartition
  import org.apache.kafka.common.header.Header

  trait ConsumerRebalanceListener {
    def onPartitionsAssigned(partitions: java.util.Collection[TopicPartition]): Unit
    def onPartitionsRevoked(partitions: java.util.Collection[TopicPartition]): Unit
  }

  final class OffsetAndMetadata(off: Long) {
    def offset(): Long = off
  }

  final class ConsumerRecord(
      t: String, p: Int, off: Long,
      k: Array[Byte], v: Array[Byte], hs: Seq[(String, Array[Byte])]) {
    def topic(): String = t
    def partition(): Int = p
    def offset(): Long = off
    def key(): Array[Byte] = k
    def value(): Array[Byte] = v
    def headers(): java.lang.Iterable[Header] = {
      val l = new java.util.ArrayList[Header]()
      hs.foreach { case (hk, hv) =>
        l.add(new Header { def key(): String = hk; def value(): Array[Byte] = hv })
      }
      l
    }
  }

  final class ConsumerRecords(recs: Seq[ConsumerRecord])
      extends java.lang.Iterable[ConsumerRecord] {
    override def iterator(): java.util.Iterator[ConsumerRecord] = {
      val l = new java.util.ArrayList[ConsumerRecord]()
      recs.foreach(l.add)
      l.iterator()
    }
    def count(): Int = recs.size
  }

  final class KafkaConsumer(props: java.util.Properties) {
    graft.StubBroker.lastConsumerProps = props.clone().asInstanceOf[java.util.Properties]
    private val groupId = props.getProperty("group.id", "")
    private val maxPoll =
      Option(props.getProperty("max.poll.records")).map(_.toInt).getOrElse(500)
    private var subscribed: Seq[String] = Seq.empty
    private var listener: ConsumerRebalanceListener = null
    private val positions =
      scala.collection.mutable.LinkedHashMap[TopicPartition, Long]()
    private var closed = false
    private def broker = graft.StubBroker

    /** Assign every broker partition of the subscribed topics not yet
      * assigned; position = committed or 0; fires the rebalance
      * listener for the new ones (a late-created partition is thereby
      * assigned at the NEXT poll, like a real rebalance).
      */
    private def assignNew(): Unit = {
      val fresh = new java.util.ArrayList[TopicPartition]()
      subscribed.foreach { t =>
        broker.partitionsOf(t).foreach { p =>
          val tp = new TopicPartition(t, p)
          if (!positions.contains(tp)) {
            positions(tp) = broker.committed(groupId, t, p).getOrElse(0L)
            fresh.add(tp)
          }
        }
      }
      if (!fresh.isEmpty && listener != null)
        listener.onPartitionsAssigned(fresh)
    }

    def subscribe(topics: java.util.Collection[String]): Unit =
      subscribe(topics, null)

    def subscribe(topics: java.util.Collection[String],
        l: ConsumerRebalanceListener): Unit = {
      val it = topics.iterator()
      val b = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) b += it.next()
      subscribed = b.toSeq
      listener = l
      // deferAssignment models the real consumer's asynchronous group
      // join: the rebalance then completes inside the first poll(),
      // which ALSO returns post-seek records from that same invocation
      if (!broker.deferAssignment) assignNew()
    }

    def assignment(): java.util.Set[TopicPartition] = {
      val s = new java.util.LinkedHashSet[TopicPartition]()
      positions.keys.foreach(s.add)
      s
    }

    def poll(timeout: java.time.Duration): ConsumerRecords = {
      require(!closed, "consumer closed")
      assignNew() // late-created partitions join at the next poll
      val out = scala.collection.mutable.ArrayBuffer[ConsumerRecord]()
      positions.foreach { case (tp, pos) =>
        val recs = broker.fetch(tp.topic(), tp.partition(), pos,
          maxPoll - out.size)
        recs.foreach { r =>
          out += new ConsumerRecord(r.topic, r.partition, r.offset,
            r.key, r.value, r.headers)
        }
        if (recs.nonEmpty) positions(tp) = recs.map(_.offset).max + 1
      }
      new ConsumerRecords(out.toSeq)
    }

    def seekToBeginning(tps: java.util.Collection[TopicPartition]): Unit = {
      val it = tps.iterator()
      while (it.hasNext) { val tp = it.next(); positions(tp) = 0L }
    }

    def seekToEnd(tps: java.util.Collection[TopicPartition]): Unit = {
      val it = tps.iterator()
      while (it.hasNext) {
        val tp = it.next()
        positions(tp) = broker.endOffset(tp.topic(), tp.partition())
      }
    }

    def seek(tp: TopicPartition, offset: Long): Unit = positions(tp) = offset

    def position(tp: TopicPartition): Long = positions.getOrElse(tp, 0L)

    def endOffsets(tps: java.util.Collection[TopicPartition])
        : java.util.Map[TopicPartition, java.lang.Long] = {
      val m = new java.util.LinkedHashMap[TopicPartition, java.lang.Long]()
      val it = tps.iterator()
      while (it.hasNext) {
        val tp = it.next()
        m.put(tp, java.lang.Long.valueOf(broker.endOffset(tp.topic(), tp.partition())))
      }
      m
    }

    def commitSync(
        offsets: java.util.Map[TopicPartition, OffsetAndMetadata]): Unit = {
      val it = offsets.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        broker.commit(groupId, e.getKey.topic(), e.getKey.partition(),
          e.getValue.offset())
      }
    }

    def listTopics(): java.util.Map[String, java.util.List[AnyRef]] = {
      val m = new java.util.LinkedHashMap[String, java.util.List[AnyRef]]()
      broker.topics.foreach(t => m.put(t, new java.util.ArrayList[AnyRef]()))
      m
    }

    def close(): Unit = closed = true
  }
}
