package graft.connect

import java.nio.file.Paths
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable

/** Kafka read-position policy (FKS.java:109-112, README.md:169-173):
  * replay wins over sync; neither → latest.
  */
sealed trait ReadPolicy
object ReadPolicy {
  case object Replay extends ReadPolicy
  case object Sync extends ReadPolicy
  case object Latest extends ReadPolicy

  def forConfig(c: ConnectorConfig): ReadPolicy =
    if (c.replayTopic) Replay else if (c.syncTopic) Sync else Latest
}

/** Topic → connector registry (FKRegistry.java:33-99): at most one
  * connector per topic; reverse dataset → topics lookup for admin
  * operations (FKS.findTopics, FKS.java:232-248).
  */
final class ConnectorRegistry {
  private val byTopic = mutable.LinkedHashMap[String, ConnectorConfig]()

  def register(c: ConnectorConfig): Unit = synchronized {
    c.topics.foreach { t =>
      if (byTopic.contains(t))
        throw new ConfigException(s"Multiple connectors configured for Kafka topic $t")
    }
    c.topics.foreach(t => byTopic(t) = c)
  }

  def unregister(c: ConnectorConfig): Unit = synchronized {
    c.topics.foreach(byTopic.remove)
  }

  def connectorForTopic(topic: String): Option[ConnectorConfig] =
    synchronized(byTopic.get(topic))

  def topicsForDataset(datasetName: String): Seq[String] = synchronized {
    byTopic.collect { case (t, c) if c.datasetName == datasetName => t }.toSeq
  }

  def datasets: Seq[String] = synchronized(byTopic.values.map(_.datasetName).toSeq.distinct)
}

/** Builds an [[EventSource]] for a connector given its read policy and
  * (for Sync) the offsets to resume from — the engine's
  * KafkaRdfPayloadSource builder seam (FKS.java:117-127).
  */
trait EventSourceFactory {
  def create(config: ConnectorConfig, policy: ReadPolicy,
      startOffsets: Map[(String, Int), Long]): EventSource
}

/** A started connector: its projector (for pause/resume/monitoring),
  * offset store, and poll thread.
  */
final class RunningConnector(
    val config: ConnectorConfig,
    val projector: Projector,
    val offsets: OffsetStore,
    source: EventSource,
    pollIdleMs: Long) {

  private val stopRequested = new AtomicBoolean(false)
  @volatile private[connect] var failure: Throwable = _

  private[connect] val thread: Thread = new Thread(() => {
    try {
      while (!stopRequested.get()) {
        source.poll() match {
          case Some(e) => projector.project(e)
          case None =>
            projector.stalled()
            Thread.sleep(pollIdleMs)
        }
      }
    } catch {
      case _: InterruptedException => ()
      case t: Throwable => failure = t
    }
  }, s"graft-connector-${config.consumerGroupId}")
  thread.setDaemon(true)

  def isAlive: Boolean = thread.isAlive
  def stop(): Unit = {
    stopRequested.set(true)
    projector.requestResume() // unblock a paused projector so it can exit
    thread.interrupt()
    thread.join(2000)
  }
}

/** Module lifecycle: validate → register → start one poll thread per
  * connector — the reference's FMod_FusekiKafka.prepare/
  * serverBeforeStarting/serverStopped (FMod_FusekiKafka.java:87-229)
  * plus FKS.addConnectorToServer/startTopicPoll (FKS.java:84-138,
  * 295-353).
  */
final class Engine(
    sourceFactory: EventSourceFactory,
    sinkFactory: ConnectorConfig => BatchSink,
    dlqFactory: ConnectorConfig => Option[DlqSink] = _ => None,
    topicExists: String => Boolean = _ => true,
    pollIdleMs: Long = 50L,
    startupHealthWaitMs: Long = 200L,
    topicCheckTimeoutMs: Long = 5000L,
    topicCheckRetryMs: Long = 100L) {

  val registry = new ConnectorRegistry
  private val running = mutable.ArrayBuffer[RunningConnector]()

  /** Start all connectors. Fails fast on duplicate consumer group ids
    * (FMod_FusekiKafka.java:177-182), topics already claimed by another
    * connector, missing topics under fk:startupTopicCheck
    * (FKS.checkTopicsExistAtStartup, FKS.java:140-194), or a connector
    * thread dying within the startup health window (FKS.java:338-348).
    */
  def start(configs: Seq[ConnectorConfig]): Seq[RunningConnector] = synchronized {
    val dupGroups = configs.groupBy(_.consumerGroupId).filter(_._2.size > 1).keys
    if (dupGroups.nonEmpty)
      throw new ConfigException(
        s"Multiple Kafka connectors configured with the same consumer group id(s): ${dupGroups.mkString(", ")}")
    configs.foreach(registry.register)
    val started = configs.map { c =>
      if (c.checkTopicAtStartup) {
        // retry-poll until the topics appear or the window closes —
        // topics created concurrently with server startup pass
        // (FKS.checkTopicsExistAtStartup: 5 s window, 100 ms sleeps,
        // FKS.java:66-67,160-173)
        val deadline = System.nanoTime() + topicCheckTimeoutMs * 1000000L
        var missing = c.topics.filterNot(topicExists)
        while (missing.nonEmpty && System.nanoTime() < deadline) {
          Thread.sleep(topicCheckRetryMs)
          missing = c.topics.filterNot(topicExists)
        }
        if (missing.nonEmpty)
          throw new ConfigException(
            s"Kafka topic(s) ${missing.mkString(", ")} do not exist on the configured cluster")
      }
      val offsets = new OffsetStore(c.datasetName, Paths.get(c.stateFile), c.consumerGroupId)
      val policy = ReadPolicy.forConfig(c)
      val startOffsets = policy match {
        case ReadPolicy.Sync =>
          c.topics.flatMap(t => offsets.loadOffset(t, 0).map((t, 0) -> _)).toMap
        case _ => Map.empty[(String, Int), Long]
      }
      val source = sourceFactory.create(c, policy, startOffsets)
      val projector = new Projector(source, sinkFactory(c), c.projectorConfig,
        offsets = Some(offsets), dlq = dlqFactory(c))
      val rc = new RunningConnector(c, projector, offsets, source, pollIdleMs)
      rc.thread.start()
      rc
    }
    // startup health gate: give each thread a moment to fail fast
    Thread.sleep(startupHealthWaitMs)
    started.find(rc => rc.failure != null).foreach { rc =>
      stopAll(started)
      throw new ProjectorException(
        s"Connector for ${rc.config.topics.mkString(",")} failed at startup", rc.failure)
    }
    running ++= started
    started
  }

  def stop(): Unit = synchronized {
    stopAll(running.toSeq)
    running.foreach(rc => registry.unregister(rc.config))
    running.clear()
  }

  private def stopAll(rcs: Seq[RunningConnector]): Unit = rcs.foreach(_.stop())

  /** Pause every projector feeding `datasetName` and wait for each to
    * reach its safe point (FKS.pauseProjectors/waitForPause,
    * FKS.java:375-448).
    */
  def pauseDataset(datasetName: String, timeoutMs: Long = 5000L): Boolean = synchronized {
    val rcs = running.filter(_.config.datasetName == datasetName)
    rcs.foreach(_.projector.requestPause())
    val deadline = System.currentTimeMillis() + timeoutMs
    rcs.forall { rc =>
      while (!rc.projector.isAtPausePoint && System.currentTimeMillis() < deadline)
        Thread.sleep(10)
      rc.projector.isAtPausePoint
    }
  }

  def resumeDataset(datasetName: String): Unit = synchronized {
    running.filter(_.config.datasetName == datasetName)
      .foreach(_.projector.requestResume())
  }

  /** Restore live offsets for a dataset from an external state file —
    * the reference's FKS.restoreOffsetForDataset (FKS.java:456-475):
    * takes the per-(topic,partition) MAX across whatever consumer
    * groups the external file contains, writes them into each running
    * connector's own store, and flushes. Connectors must be paused
    * first ([[pauseDataset]]) so no commit races the restore; they pick
    * the offsets up on their next (re)start under the Sync policy.
    */
  def restoreOffsets(datasetName: String, externalStateFile: java.nio.file.Path): Map[(String, Int), Long] = synchronized {
    val rcs = running.filter(_.config.datasetName == datasetName)
    require(rcs.forall(_.projector.isAtPausePoint),
      s"projectors for $datasetName must be paused before an offset restore")
    val external = new OffsetStore(datasetName, externalStateFile, "restore")
    val restored = external.maxOffsetsByPartition
    rcs.foreach { rc =>
      restored.foreach { case ((t, p), off) => rc.offsets.saveOffset(t, p, off) }
      rc.offsets.flush()
    }
    restored
  }

  /** Dataset lookup with the deprecated trailing-segment fallback
    * (FKS.findDataset, FKS.java:203-227): exact match first, else
    * retry with the last path segment removed.
    */
  def findDataset(uriPath: String): Option[String] = {
    val known = registry.datasets.toSet
    if (known.contains(uriPath)) Some(uriPath)
    else {
      val cut = uriPath.lastIndexOf('/')
      if (cut > 0) Some(uriPath.substring(0, cut)).filter(known.contains) else None
    }
  }
}
