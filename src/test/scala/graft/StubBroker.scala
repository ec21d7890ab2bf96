package graft

import scala.collection.mutable

/** The in-JVM log behind the test-scope kafka-clients stub
  * (org.apache.kafka.KafkaStub.scala): append-only records per
  * (topic, partition) plus per-group committed offsets. Reset between
  * tests.
  */
object StubBroker {
  final case class Rec(topic: String, partition: Int, offset: Long,
      key: Array[Byte], value: Array[Byte],
      headers: Seq[(String, Array[Byte])])

  private val logs = mutable.LinkedHashMap[(String, Int), mutable.ArrayBuffer[Rec]]()
  private val commits = mutable.LinkedHashMap[(String, String, Int), Long]()

  /** When true, `subscribe()` does NOT assign partitions — the first
    * `poll()` completes the "rebalance" (listener callbacks + policy
    * seeks) and returns records in the SAME invocation, as a real
    * consumer can when the group coordinator answers mid-poll. This is
    * the shape that exposed the startup-loop record drop: the adapter
    * must buffer those records, not discard the poll result.
    */
  @volatile var deferAssignment: Boolean = false

  /** Constructor `Properties` of the most recently created consumer —
    * lets contract tests assert security/client props (sasl.jaas.config,
    * ssl.*) survive the TTL-config → assembler → factory → reflective
    * constructor chain verbatim.
    */
  @volatile var lastConsumerProps: java.util.Properties = null

  def reset(): Unit = synchronized {
    logs.clear(); commits.clear()
    deferAssignment = false; lastConsumerProps = null
  }

  def createTopic(topic: String, partitions: Int = 1): Unit = synchronized {
    (0 until partitions).foreach(p =>
      logs.getOrElseUpdate((topic, p), mutable.ArrayBuffer[Rec]()))
  }

  def send(topic: String, partition: Int, value: Array[Byte],
      headers: Seq[(String, Array[Byte])] = Seq.empty,
      key: Array[Byte] = null): Long = synchronized {
    val log = logs.getOrElseUpdate((topic, partition), mutable.ArrayBuffer[Rec]())
    val off = log.size.toLong
    log += Rec(topic, partition, off, key, value, headers)
    off
  }

  def topics: Seq[String] = synchronized(logs.keys.map(_._1).toSeq.distinct)

  def partitionsOf(topic: String): Seq[Int] =
    synchronized(logs.keys.collect { case (t, p) if t == topic => p }.toSeq.sorted)

  def fetch(topic: String, partition: Int, from: Long, max: Int): Seq[Rec] =
    synchronized {
      if (max <= 0) Seq.empty
      else logs.get((topic, partition))
        .map(_.view.filter(_.offset >= from).take(max).toSeq)
        .getOrElse(Seq.empty)
    }

  def endOffset(topic: String, partition: Int): Long =
    synchronized(logs.get((topic, partition)).map(_.size.toLong).getOrElse(0L))

  def commit(group: String, topic: String, partition: Int, offset: Long): Unit =
    synchronized { commits((group, topic, partition)) = offset }

  def committed(group: String, topic: String, partition: Int): Option[Long] =
    synchronized(commits.get((group, topic, partition)))
}
