package graft.rdf

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** JSON-LD parser (no Jena on the classpath — a hand-rolled expansion
  * over Jackson's tree model, which ships with Spark). The reference
  * accepts "any syntax supported by Apache Jena" per event
  * Content-Type (README.md:13); JSON-LD is the syntax REST producers
  * actually emit, so the dispatch table carries it.
  *
  * Supported subset:
  *   - inline `@context`: prefix → IRI string mappings, `@vocab`, and
  *     term definitions `{"@id": …, "@type": "@id" | datatype-IRI}`
  *   - node objects with `@id` (IRI or `_:` blank; absent → fresh
  *     blank), `@type` (string or array) → rdf:type triples
  *   - value objects `{"@value", "@type", "@language"}`; bare JSON
  *     strings → plain literals, integral numbers → xsd:integer,
  *     other numbers → xsd:double, booleans → xsd:boolean
  *   - arrays fan out to one triple per element; nested node objects
  *     link via their `@id` / fresh blank and recurse
  *   - `@graph`: top-level `{"@graph": […]}` (default graph), or with
  *     a sibling `@id` → that NAMED graph (quads)
  *   - `@list` value objects → rdf:first/rdf:rest cons chains ending
  *     in rdf:nil (empty list → rdf:nil directly; lists nest)
  *   - `@set` value objects → equivalent to the bare array (§4.3.1)
  *   - `@reverse`: `{"@reverse": {"prop": nodes}}` emits
  *     (node, prop, subject) — values must be node objects or IRIs
  *     (a literal under @reverse is a parse error, per spec)
  *   - array `@context`: inline objects merged left-to-right (later
  *     definitions shadow earlier ones; a null member resets)
  *   - string (remote) contexts against a PRELOADED registry: the
  *     offline documentLoader pattern — vendored context documents
  *     keyed by their URL, passed as a plain map (broadcast-friendly;
  *     no executor ever fetches). A URL absent from the registry is a
  *     parse error → DLQ, same as before; registered contexts may
  *     themselves reference registered URLs (cycles rejected).
  * Out of scope (parse error → DLQ): live remote fetch (no network
  *   I/O in a parse path, ever), `@index`, `@included`, IRI-keyed id
  *   maps.
  */
object JsonLdParser {

  private val XSD = "http://www.w3.org/2001/XMLSchema#"

  def parse(doc: String): Seq[Quad] = parse(doc, Map.empty)

  /** Parse with a preloaded context registry: URL → JSON source of the
    * context document (either a bare context object or a wrapper with
    * an `@context` member, as published context documents are).
    */
  def parse(doc: String, contexts: Map[String, String]): Seq[Quad] = {
    val root =
      try new ObjectMapper().readTree(doc)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new RdfParseException(s"json-ld: ${e.getMessage}")
      }
    if (root == null) throw new RdfParseException("json-ld: empty document")
    new JsonLdParser(contexts).parseRoot(root)
  }
}

final class JsonLdParser(registry: Map[String, String] = Map.empty) {
  import JsonLdParser._

  private val quads = scala.collection.mutable.ArrayBuffer[Quad]()
  private var genid = 0
  private def freshBlank(): Term = { genid += 1; Term.blank(s"genid$genid") }

  // context state: prefix/term → IRI, term → type coercion
  private var mappings = Map.empty[String, String]
  private var coercions = Map.empty[String, String] // term → "@id" | datatype IRI
  private var vocab: String = null

  def parseRoot(root: JsonNode): Seq[Quad] = {
    if (root.isArray) root.elements().asScala.foreach(parseNode(_, null))
    else if (root.isObject) {
      readContext(root)
      if (root.has("@graph")) {
        // named graph when the wrapper itself has an @id — a blank
        // node label stays a BLANK graph name, never an IRI
        val g = if (root.has("@id")) subjectOf(root) else null
        val items = root.get("@graph")
        if (!items.isArray)
          throw new RdfParseException("json-ld: @graph must be an array")
        items.elements().asScala.foreach(parseNode(_, g))
      } else parseNode(root, null)
    } else throw new RdfParseException("json-ld: root must be object or array")
    quads.toSeq
  }

  private def readContext(obj: JsonNode): Unit = {
    val ctx = obj.get("@context")
    if (ctx == null) return
    applyContext(ctx, Set.empty)
  }

  private def applyContext(ctx: JsonNode, seen: Set[String]): Unit =
    if (ctx.isArray) {
      // array form (§3.1): member contexts merge LEFT-TO-RIGHT, later
      // definitions shadowing earlier ones; a null member resets the
      // active context
      ctx.elements().asScala.foreach { m =>
        if (m.isNull) { mappings = Map.empty; coercions = Map.empty; vocab = null }
        else applyContext(m, seen)
      }
    } else if (ctx.isTextual) {
      // remote reference → preloaded registry, never the network
      val url = ctx.asText()
      if (seen.contains(url))
        throw new RdfParseException(s"json-ld: context cycle at '$url'")
      val src = registry.getOrElse(url, throw new RdfParseException(
        s"json-ld: remote context '$url' not in the preloaded registry"))
      val doc =
        try new ObjectMapper().readTree(src)
        catch {
          case e: com.fasterxml.jackson.core.JacksonException =>
            throw new RdfParseException(
              s"json-ld: registered context '$url': ${e.getMessage}")
        }
      // published context documents wrap the context in "@context"
      val inner = if (doc != null && doc.has("@context")) doc.get("@context") else doc
      if (inner == null) throw new RdfParseException(
        s"json-ld: registered context '$url' is empty")
      applyContext(inner, seen + url)
    } else readOneContext(ctx)

  private def readOneContext(ctx: JsonNode): Unit = {
    if (!ctx.isObject)
      throw new RdfParseException("json-ld: only inline object @context supported")
    ctx.properties().asScala.foreach { e =>
      val term = e.getKey
      val v = e.getValue
      if (term == "@vocab") vocab = v.asText()
      else if (v.isTextual) mappings += term -> v.asText()
      else if (v.isObject) {
        val id = Option(v.get("@id")).map(_.asText())
          .getOrElse(throw new RdfParseException(
            s"json-ld: term definition for '$term' needs @id"))
        mappings += term -> id
        Option(v.get("@type")).foreach(t => coercions += term -> t.asText())
      } else throw new RdfParseException(s"json-ld: bad context entry '$term'")
    }
  }

  /** Term or compact IRI → absolute IRI (also applies @vocab). */
  private def expandIri(s: String): String =
    if (s.startsWith("_:")) s // blank label, handled by caller
    else mappings.get(s) match {
      case Some(iri) => iri
      case None =>
        val colon = s.indexOf(':')
        if (colon > 0) {
          val pfx = s.substring(0, colon)
          mappings.get(pfx) match {
            case Some(ns) => ns + s.substring(colon + 1)
            case None => s // already absolute (http:, urn:, …)
          }
        } else if (vocab != null) vocab + s
        else s
    }

  private def subjectOf(node: JsonNode): Term =
    if (node.has("@id")) {
      val id = node.get("@id").asText()
      if (id.startsWith("_:")) Term.blank(id.substring(2)) else Term.iri(expandIri(id))
    } else freshBlank()

  /** Emit the triples of one node object; returns its subject.
    * `g` is the enclosing graph name as a TERM (IRI or blank; null =
    * default graph), so blank-node graph labels survive as blanks.
    */
  private def parseNode(node: JsonNode, g: Term): Term = {
    if (!node.isObject)
      throw new RdfParseException("json-ld: node must be a JSON object")
    // a @context scopes to its SUBTREE (JSON-LD §3.1): save the outer
    // mappings and restore them afterwards, so a nested node's terms
    // don't silently re-expand later siblings with the wrong IRIs
    val (m0, c0, v0) = (mappings, coercions, vocab)
    try {
      readContext(node)
      val subject = subjectOf(node)
      node.properties().asScala.foreach { e =>
        val key = e.getKey
        val v = e.getValue
        key match {
          case "@context" | "@id" => ()
          case "@type" =>
            val types = if (v.isArray) v.elements().asScala.toSeq else Seq(v)
            types.foreach(t => quads += Quad(g, subject,
              Term.iri(Term.RDF_TYPE), Term.iri(expandIri(t.asText()))))
          case "@graph" =>
            // nested named graph: this node's @id (IRI or blank)
            // scopes the contents
            val inner = if (v.isArray) v.elements().asScala.toSeq else Seq(v)
            inner.foreach(parseNode(_, subject))
          case "@reverse" =>
            if (!v.isObject)
              throw new RdfParseException("json-ld: @reverse must be an object")
            v.properties().asScala.foreach { re =>
              val pred = Term.iri(expandIri(re.getKey))
              val nodes =
                if (re.getValue.isArray) re.getValue.elements().asScala.toSeq
                else Seq(re.getValue)
              nodes.foreach { nv =>
                val node = objectOf(re.getKey, nv, g)
                if (node.isLit) throw new RdfParseException(
                  "json-ld: @reverse value must be a node, not a literal")
                quads += Quad(g, node, pred, subject)
              }
            }
          case k if k.startsWith("@") =>
            throw new RdfParseException(s"json-ld: keyword '$k' not supported")
          case term =>
            val pred = Term.iri(expandIri(term))
            // {"@set": [...]} is equivalent to the bare array (§4.3.1)
            val vv = if (v.isObject && v.has("@set")) v.get("@set") else v
            val values = if (vv.isArray) vv.elements().asScala.toSeq else Seq(vv)
            values.foreach(value =>
              quads += Quad(g, subject, pred, objectOf(term, value, g)))
        }
      }
      subject
    } finally {
      mappings = m0; coercions = c0; vocab = v0
    }
  }

  private def objectOf(term: String, v: JsonNode, g: Term): Term = {
    val coerced = coercions.get(term)
    if (v.isTextual) {
      if (coerced.contains("@id")) {
        val s = v.asText()
        if (s.startsWith("_:")) Term.blank(s.substring(2)) else Term.iri(expandIri(s))
      } else coerced match {
        case Some(dt) => Term.typed(v.asText(), expandIri(dt))
        case None => Term.lit(v.asText())
      }
    } else if (v.isIntegralNumber) Term.typed(v.asText(), XSD + "integer")
    else if (v.isNumber) Term.typed(v.asText(), XSD + "double")
    else if (v.isBoolean) Term.typed(v.asText(), XSD + "boolean")
    else if (v.isObject) {
      if (v.has("@list")) {
        val arr = v.get("@list")
        if (!arr.isArray)
          throw new RdfParseException("json-ld: @list must be an array")
        listChain(arr.elements().asScala.toSeq.map(objectOf(term, _, g)), g)
      } else if (v.has("@value")) {
        val lex = v.get("@value") match {
          case n if n.isTextual || n.isNumber || n.isBoolean => n.asText()
          case _ => throw new RdfParseException("json-ld: bad @value")
        }
        (Option(v.get("@type")), Option(v.get("@language"))) match {
          case (Some(_), Some(_)) =>
            throw new RdfParseException("json-ld: @type with @language")
          case (Some(t), None) => Term.typed(lex, expandIri(t.asText()))
          case (None, Some(l)) => Term.langLit(lex, l.asText())
          case (None, None) =>
            if (v.get("@value").isIntegralNumber) Term.typed(lex, XSD + "integer")
            else if (v.get("@value").isNumber) Term.typed(lex, XSD + "double")
            else if (v.get("@value").isBoolean) Term.typed(lex, XSD + "boolean")
            else Term.lit(lex)
        }
      } else parseNode(v, g) // nested node object
    } else throw new RdfParseException(s"json-ld: unsupported value $v")
  }

  /** Emit the rdf:first/rdf:rest cons cells of a @list in graph `g`;
    * returns the list head (rdf:nil for an empty list).
    */
  private def listChain(items: Seq[Term], g: Term): Term =
    if (items.isEmpty) Term.iri(Term.RDF_NIL)
    else {
      val cells = items.map(_ => freshBlank())
      cells.zip(items).zipWithIndex.foreach { case ((cell, item), i) =>
        quads += Quad(g, cell, Term.iri(Term.RDF_FIRST), item)
        quads += Quad(g, cell, Term.iri(Term.RDF_REST),
          if (i == items.size - 1) Term.iri(Term.RDF_NIL) else cells(i + 1))
      }
      cells.head
    }
}
