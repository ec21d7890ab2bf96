package graft.connect

import java.nio.file.{Files, Paths}
import java.time.Duration

import scala.jdk.CollectionConverters._

import graft.rdf.{Quad, Term, TurtleParser}

/** Connector configuration — the reference's KConnectorDesc
  * (KConnectorDesc.java:90-135 construction + validation; typed getters
  * :144-328). Construction validates: non-empty topics, DLQ topic not
  * an input topic (loop prevention, KConnectorDesc.java:116-119), and a
  * non-blank dataset name.
  */
final case class ConnectorConfig(
    topics: Seq[String],
    bootstrapServers: String,
    datasetName: String,
    stateFile: String,
    syncTopic: Boolean,
    replayTopic: Boolean,
    checkTopicAtStartup: Boolean,
    dlqTopic: Option[String],
    kafkaProps: Map[String, String]) {

  require(topics.nonEmpty, "topics cannot be empty")
  dlqTopic.filter(_.trim.nonEmpty).foreach { d =>
    if (topics.contains(d))
      throw new ConfigException(
        s"Can't configure the DLQ topic as $d as this is also an input topic!")
  }
  if (datasetName == null || datasetName.trim.isEmpty)
    throw new ConfigException("Connector built with no local dispatch path")

  def consumerGroupId: String = kafkaProps("group.id")

  /** Typed getter with parser + validator + default-with-fallthrough —
    * the reference's fromKafkaProperties (KConnectorDesc.java:144-190):
    * the FIRST key whose value parses and validates wins; unparseable
    * or invalid values fall through to the next key / the default.
    */
  private def prop[T](keys: Seq[String], parse: String => T, valid: T => Boolean,
      default: T): T =
    keys.iterator.flatMap { k =>
      kafkaProps.get(k).flatMap { raw =>
        try Some(parse(raw)).filter(valid)
        catch { case _: Exception => None }
      }
    }.nextOption().getOrElse(default)

  def maxPollRecords: Int =
    prop(Seq("max.poll.records"), _.toInt, (_: Int) > 0, 5000)

  /** fuseki.kafka.batch.size → max.poll.records → 5000. */
  def batchSize: Int =
    prop(Seq("fuseki.kafka.batch.size", "max.poll.records"), _.toInt, (_: Int) > 0, 5000)

  /** fuseki.kafka.batch.size.bytes → fetch.max.bytes →
    * max.partition.fetch.bytes → 50 MiB.
    */
  def batchSizeBytes: Long =
    prop(Seq("fuseki.kafka.batch.size.bytes", "fetch.max.bytes", "max.partition.fetch.bytes"),
      _.toLong, (_: Long) > 0, 50L * 1024 * 1024)

  def batchSizeTrackingWindow: Int =
    prop(Seq("fuseki.kafka.batch.size.tracking"), _.toInt, (_: Int) > 0, 25)

  def lowVolumeBatchSizeThreshold: Int =
    prop(Seq("fuseki.kafka.low.volume.threshold"), _.toInt, (_: Int) >= 0, 10)

  def highLagThreshold: Long =
    prop(Seq("fuseki.kafka.high.lag.threshold"), _.toLong, (_: Long) > 0, 10000L)

  /** ISO-8601, e.g. PT5M; invalid/zero/negative → default (the
    * reference's isValidDuration, SysJenaKafka.java:146-156).
    */
  def maxTransactionDuration: Duration =
    prop(Seq("fuseki.kafka.max.transaction.duration"), Duration.parse,
      (d: Duration) => !d.isNegative && !d.isZero, Duration.ofMinutes(5))

  /** The projector tunables assembled from this configuration. */
  def projectorConfig: ProjectorConfig = ProjectorConfig(
    batchSize = batchSize,
    batchSizeBytes = batchSizeBytes,
    maxTransactionDurationMs = maxTransactionDuration.toMillis,
    batchSizeTrackingWindow = batchSizeTrackingWindow,
    lowVolumeBatchSizeThreshold = lowVolumeBatchSizeThreshold,
    highLagThreshold = highLagThreshold)
}

/** fk:Connector / fk:Cluster assembler over the engine's own Turtle
  * parser — the reference's KafkaConnectorAssembler
  * (KafkaConnectorAssembler.java:183-432). Same vocabulary, same
  * required/optional split, same error modes (the bad-assem-*.ttl
  * corpus), same cluster-inheritance precedence:
  * cluster-inline < cluster-file < connector-inline < connector-file,
  * with only bootstrapServers / config / configFile inherited and
  * groupId deliberately NOT inherited.
  */
object ConnectorAssembler {

  val NS = "http://jena.apache.org/fuseki/kafka#"
  private val T_CONNECTOR = NS + "Connector"
  private def p(local: String) = NS + local

  val DEFAULT_GROUP_ID = "JenaFusekiKafka"

  /** Assemble every fk:Connector in a TTL config document. */
  def assemble(ttl: String): Seq[ConnectorConfig] = {
    val g = TurtleParser.parseTurtle(ttl)
    connectorNodes(g).map(assembleNode(g, _))
  }

  def connectorNodes(g: Seq[Quad]): Seq[Term] =
    g.filter(q => q.predicate.lex == Term.RDF_TYPE && q.obj.isIri && q.obj.lex == T_CONNECTOR)
      .map(_.subject).distinct

  def assembleNode(g: Seq[Quad], node: Term): ConnectorConfig = {
    val topics = getStrings(g, node, p("topic")).map(resolve(p("topic"), _))
    val datasetName = canonical(datasetNameOf(g, node))
    val cluster = getZeroOrOneObj(g, node, p("cluster"))

    val bootstrap = getStringOrDefault(g, node, p("bootstrapServers"), null) match {
      case null => cluster.map(c => getStringOrDefault(g, c, p("bootstrapServers"), null)).orNull
      case v => v
    }
    if (bootstrap == null || bootstrap.trim.isEmpty)
      throw new ConfigException(
        s"${show(node)} <${p("bootstrapServers")}> : No bootstrap servers configured on the connector or its referenced fk:cluster")
    val bootstrapResolved = resolve(p("bootstrapServers"), bootstrap)

    val syncTopic = getBooleanOrDefault(g, node, p("syncTopic"), default = true)
    val replayTopic = getBooleanOrDefault(g, node, p("replayTopic"), default = false)
    val startupCheck = getBooleanOrDefault(g, node, p("startupTopicCheck"), default = false)

    var stateFile = resolve(p("stateFile"), getString(g, node, p("stateFile")))
    if (stateFile.startsWith("file:")) stateFile = iriToFilename(stateFile)

    val groupId = resolve(p("groupId"),
      getStringOrDefault(g, node, p("groupId"), DEFAULT_GROUP_ID))
    val dlqTopic = Option(getStringOrDefault(g, node, p("dlqTopic"), null))
      .map(resolve(p("dlqTopic"), _))

    ConnectorConfig(topics, bootstrapResolved, datasetName, stateFile, syncTopic,
      replayTopic, startupCheck, dlqTopic,
      consumerProps(g, node, cluster, bootstrapResolved, groupId))
  }

  /** Baseline consumer properties (SysJenaKafka.consumerProperties,
    * SysJenaKafka.java:131-145) + group id + the four config layers in
    * increasing precedence.
    */
  private def consumerProps(g: Seq[Quad], node: Term, cluster: Option[Term],
      bootstrap: String, groupId: String): Map[String, String] = {
    val props = scala.collection.mutable.LinkedHashMap[String, String](
      "enable.auto.commit" -> "false",
      "max.partition.fetch.bytes" -> (50 * 1024 * 1024).toString,
      "fetch.max.bytes" -> (50 * 1024 * 1024).toString,
      "max.poll.records" -> "5000",
      "bootstrap.servers" -> bootstrap,
      "group.id" -> groupId)
    cluster.foreach { c =>
      applyInlineConfig(g, c, props)
      applyConfigFiles(g, c, props)
    }
    applyInlineConfig(g, node, props)
    applyConfigFiles(g, node, props)
    props.toMap
  }

  /** fk:config ("key" "value") RDF-list pairs
    * (applyInlineKafkaConfig, KafkaConnectorAssembler.java:301-319).
    */
  private def applyInlineConfig(g: Seq[Quad], node: Term,
      props: scala.collection.mutable.Map[String, String]): Unit =
    objectsOf(g, node, p("config")).foreach { head =>
      listOf(g, head) match {
        case Seq(k, v) if k.isLit && v.isLit => props(k.lex) = v.lex
        case other =>
          throw new ConfigException(
            s"${show(node)} <${p("config")}> : fk:config must be a (key value) pair, got ${other.size} elements")
      }
    }

  /** fk:configFile as literal / file: URI / env: URI
    * (applyKafkaConfigFiles, KafkaConnectorAssembler.java:325-374):
    * empty resolution is ignored with a warning, a missing or
    * unreadable file is an error.
    */
  private def applyConfigFiles(g: Seq[Quad], node: Term,
      props: scala.collection.mutable.Map[String, String]): Unit =
    objectsOf(g, node, p("configFile")).foreach { o =>
      val fileName =
        if (o.isIri && o.lex.startsWith("file:")) iriToFilename(o.lex)
        else if (o.isIri && o.lex.startsWith("env:")) EnvVariables.resolve(o.lex, p("configFile"))
        else if (o.isLit) EnvVariables.resolve(o.lex, p("configFile"))
        else throw new ConfigException(
          s"${show(node)} <${p("configFile")}> : Properties file MUST be specified as a file URI or a literal")
      if (fileName != null && fileName.trim.nonEmpty) {
        val path = Paths.get(fileName)
        if (!Files.isReadable(path))
          throw new ConfigException(
            s"${show(node)} <${p("configFile")}> : Properties file '$fileName' not found")
        val loaded = new java.util.Properties()
        val in = Files.newInputStream(path)
        try loaded.load(in) finally in.close()
        loaded.asScala.foreach { case (k, v) => props(k.toString) = v.toString }
      }
    }

  /** Dataset name resolution (datasetName,
    * KafkaConnectorAssembler.java:379-411): exactly one
    * fk:fusekiServiceName, a non-blank simple string.
    */
  private def datasetNameOf(g: Seq[Quad], node: Term): String = {
    val vs = objectsOf(g, node, p("fusekiServiceName"))
    if (vs.size > 1) throw new ConfigException(s"Multiple datasetNames: ${show(node)}")
    vs.headOption match {
      case None => throw new ConfigException(s"Dataset name is blank: ${show(node)}")
      case Some(n) if !isSimpleString(n) =>
        throw new ConfigException(s"Dataset name is not a string: ${show(node)}")
      case Some(n) if n.lex.trim.isEmpty =>
        throw new ConfigException(s"Dataset name is blank: ${show(node)}")
      case Some(n) => n.lex
    }
  }

  /** Copy of DataAccessPoint.canonical
    * (KafkaConnectorAssembler.java:414-432).
    */
  def canonical(datasetPath: String): String = datasetPath match {
    case null => null
    case "" => "/"
    case "/" => "/"
    case s =>
      val withLead = if (s.startsWith("/")) s else "/" + s
      if (withLead.endsWith("/")) withLead.dropRight(1) else withLead
  }

  /** file: IRI → local filename (IRILib.IRIToFilename equivalent). */
  private def iriToFilename(iri: String): String = {
    val rest = iri.stripPrefix("file://").stripPrefix("file:")
    if (rest.startsWith("/")) rest else rest
  }

  // --- graph access (Assem2 semantics, Assem2.java:50-107) ------------------

  private def isSimpleString(t: Term): Boolean =
    t.isLit && t.datatype == null && t.lang == null

  private def objectsOf(g: Seq[Quad], node: Term, prop: String): Seq[Term] =
    g.filter(q => q.subject == node && q.predicate.lex == prop).map(_.obj)

  private def getZeroOrOneObj(g: Seq[Quad], node: Term, prop: String): Option[Term] = {
    val vs = objectsOf(g, node, prop)
    if (vs.size > 1) throw new ConfigException(
      s"${show(node)} <$prop> : Multiple values for single-valued property")
    vs.headOption
  }

  /** Required simple string (Assem2.getString). */
  private def getString(g: Seq[Quad], node: Term, prop: String): String =
    getZeroOrOneObj(g, node, prop) match {
      case Some(t) if isSimpleString(t) => t.lex
      case Some(_) => throw new ConfigException(s"${show(node)} <$prop> : Not a string")
      case None => throw new ConfigException(s"${show(node)} <$prop> : Missing required string")
    }

  /** Optional simple string with default (Assem2.getStringOrDft). */
  private def getStringOrDefault(g: Seq[Quad], node: Term, prop: String,
      default: String): String =
    getZeroOrOneObj(g, node, prop) match {
      case None => default
      case Some(t) if isSimpleString(t) => t.lex
      case Some(_) => throw new ConfigException(
        s"${show(node)} <$prop> : Not a single-valued string for subject-property")
    }

  /** Required multi-valued string (Assem2.getStrings): at least one
    * simple-string value.
    */
  private def getStrings(g: Seq[Quad], node: Term, prop: String): Seq[String] = {
    val vs = objectsOf(g, node, prop).filter(isSimpleString).map(_.lex)
    if (vs.isEmpty) throw new ConfigException(
      s"${show(node)} <$prop> : No simple string values found for subject-property")
    vs
  }

  /** Optional xsd:boolean with default (Assem2.getBooleanOrDft): only
    * true/false literals accepted.
    */
  private def getBooleanOrDefault(g: Seq[Quad], node: Term, prop: String,
      default: Boolean): Boolean =
    getZeroOrOneObj(g, node, prop) match {
      case None => default
      case Some(t) if t.isLit && t.datatype == Term.XSD_BOOLEAN && t.lex == "true" => true
      case Some(t) if t.isLit && t.datatype == Term.XSD_BOOLEAN && t.lex == "false" => false
      case Some(_) => throw new ConfigException(
        s"${show(node)} <$prop> : Not a single-valued boolean for subject-property")
    }

  /** Walk an rdf:first/rdf:rest list from its head node. */
  private def listOf(g: Seq[Quad], head: Term): Seq[Term] = {
    val out = scala.collection.mutable.ArrayBuffer[Term]()
    var cur = head
    var guard = 0
    while (!(cur.isIri && cur.lex == Term.RDF_NIL) && guard < 1000) {
      out ++= objectsOf(g, cur, Term.RDF_FIRST).headOption
      cur = objectsOf(g, cur, Term.RDF_REST).headOption.getOrElse(Term.iri(Term.RDF_NIL))
      guard += 1
    }
    out.toSeq
  }

  private def resolve(prop: String, value: String): String =
    EnvVariables.resolve(value, prop)

  private def show(node: Term): String = node.toNT
}
