package graft.connect

/** A streamed event — the engine's `Event<Bytes, RdfPayload>`
  * (reference: FusekiProjector.java:140; wire schema FIXTURES.md §1).
  * Payload decode is deferred to [[graft.rdf.RdfParse]] (lazy
  * materialization contract, FusekiProjector.java:493-508).
  */
final case class Event(
    topic: String,
    partition: Int,
    offset: Long,
    key: Array[Byte],
    value: Array[Byte],
    headers: Map[String, String]) {

  def contentType: String = headers.collectFirst {
    case (k, v) if k.equalsIgnoreCase("Content-Type") => v
  }.orNull

  /** Payload size used by the bytes-threshold batching rule
    * (event.value().sizeInBytes(), FusekiProjector.java:404-405).
    */
  def sizeInBytes: Long = if (value == null) 0L else value.length.toLong

  def withHeaders(extra: Seq[(String, String)]): Event =
    copy(headers = headers ++ extra)
}

/** Pull-based event source — the engine's `KafkaEventSource` facade
  * (reference builds one at FKS.java:117-127). Implementations:
  * [[MemoryEventSource]] (tests / synthetic lag), [[FileEventSource]]
  * (the reference ecosystem's event-source-file, pom.xml:141).
  *
  * == Kafka adapter contract ==
  *
  * Implemented by [[KafkaEventSource]], which binds to the public
  * kafka-clients consumer API REFLECTIVELY (the build container ships
  * no kafka-clients jar; the adapter activates at runtime when one is
  * present — `KafkaEventSource.isAvailable`). This is the exact
  * consumer mapping behind this trait (reference wiring
  * FKS.java:117-127), exercised end-to-end by KafkaSpec against a
  * stub of the same public API:
  *
  *  - '''construction''': one `KafkaConsumer[Bytes, Bytes]` with
  *    `group.id` = the connector's consumerGroupId and the connector's
  *    `max.poll.records`/extra props; subscribe to the topics, then
  *    apply the read policy on assignment — Replay → `seekToBeginning`,
  *    Sync → `seek` to each partition's stored next-to-read offset
  *    from the [[OffsetStore]], Latest → `seekToEnd` (FKS.java:105-112;
  *    [[ReadPolicy]]). Record value bytes and headers pass through
  *    undecoded — materialization stays lazy ([[graft.rdf.RdfParse]]).
  *  - '''poll()''': serve one buffered record from the last
  *    `Consumer.poll(timeout)` batch as an [[Event]]; when the buffer
  *    drains, issue the next `Consumer.poll`. Returns None when that
  *    also comes back empty — the engine's poll thread handles idle
  *    backoff, the adapter must not spin internally.
  *  - '''remaining()''': `Σ endOffsets(p) − position(p)` over the
  *    currently assigned partitions; None before assignment or when
  *    the cluster query fails (the reference's `remaining()` may be
  *    null — TestFusekiProjector.java:187-198). May hit the network;
  *    only the lag-mode rules consult it, never the hot loop.
  *  - '''availableImmediately()''': records left in the CURRENT
  *    buffered batch — a pure memory check, no consumer call ever
  *    (it gates batch maximization inside the commit decision tree,
  *    FusekiProjector.java:422-434, so it must not block).
  *  - '''processed(events)''': fold the events to per-partition
  *    `max(offset) + 1` (KafkaEventSource.determineCommitOffsetsFromEvents,
  *    FusekiProjector.java:528-529) and `commitSync` that map; the
  *    engine separately persists the same next-to-read offsets in the
  *    [[OffsetStore]] state file (commit-on-processed + external
  *    offset store, FKS.java:121-122).
  */
trait EventSource {
  /** Next event, or None if nothing is buffered right now. */
  def poll(): Option[Event]

  /** Kafka lag: events known to exist but not yet polled; None when
    * unknown (reference `remaining()` may be null —
    * TestFusekiProjector.java:187-198 RemainingNullEventSource).
    */
  def remaining(): Option[Long]

  /** Whether more events are already buffered in memory
    * (`availableImmediately()`, FusekiProjector.java:422-434).
    */
  def availableImmediately(): Boolean

  /** Mark events processed — commits their offsets upstream
    * (`source.processed(events)`, FusekiProjector.java:528-529).
    */
  def processed(events: Seq[Event]): Unit
}

/** In-memory source with scriptable lag, mirroring the reference's
  * RemainingVolumeSource (RemainingVolumeSource.java:13-86) used to
  * drive high-lag / low-volume mode tests.
  */
final class MemoryEventSource(
    initial: Seq[Event] = Seq.empty,
    remainingFn: Option[() => Option[Long]] = None) extends EventSource {

  private val queue = scala.collection.mutable.Queue[Event](initial: _*)
  private val committed = scala.collection.mutable.ArrayBuffer[Event]()

  def enqueue(events: Event*): Unit = queue.enqueueAll(events)

  override def poll(): Option[Event] =
    if (queue.isEmpty) None else Some(queue.dequeue())

  override def remaining(): Option[Long] =
    remainingFn.map(f => f()).getOrElse(Some(queue.size.toLong))

  override def availableImmediately(): Boolean = queue.nonEmpty

  override def processed(events: Seq[Event]): Unit = committed ++= events

  def processedEvents: Seq[Event] = committed.toSeq
}

object FileEventSource {
  /** Content type from file extension — the reference test producer's
    * dispatch (FKLib.ctForFile, FKLib.java:55-69): .rdfp → rdf-patch,
    * .ru → SPARQL Update (unsupported payload ⇒ DLQ downstream), else
    * the RIOT language of the filename.
    */
  def contentTypeForFile(name: String): String = {
    val ext = name.substring(name.lastIndexOf('.') + 1).toLowerCase
    ext match {
      case "rdfp" => "application/rdf-patch"
      case "ru"   => "application/sparql-update"
      case "ttl"  => "text/turtle"
      case "nt"   => "application/n-triples"
      case "nq"   => "application/n-quads"
      case "trig" => "application/trig"
      case _      => "application/n-quads"
    }
  }
}

/** Whole-file events in filename order (FKLib.sendFiles,
  * FKLib.java:80-122): one event per file, Content-Type by extension.
  */
final class FileEventSource(topic: String, files: Seq[java.nio.file.Path]) extends EventSource {
  private var idx = 0
  private val committed = scala.collection.mutable.ArrayBuffer[Event]()

  override def poll(): Option[Event] = {
    if (idx >= files.size) None
    else {
      val f = files(idx)
      val ev = Event(topic, 0, idx.toLong, Array.empty,
        java.nio.file.Files.readAllBytes(f),
        Map("Content-Type" -> FileEventSource.contentTypeForFile(f.getFileName.toString)))
      idx += 1
      Some(ev)
    }
  }

  override def remaining(): Option[Long] = Some((files.size - idx).toLong)
  override def availableImmediately(): Boolean = idx < files.size
  override def processed(events: Seq[Event]): Unit = committed ++= events
  def processedEvents: Seq[Event] = committed.toSeq
}
