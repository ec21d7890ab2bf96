package graft.rdf

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

/** RDF/XML parser (no Jena on the classpath — hand-rolled over the
  * JDK's StAX cursor API). The reference accepts "any syntax supported
  * by Apache Jena" per event Content-Type (README.md:13,
  * FusekiProjector.java:502-508); RDF/XML is the historic default
  * interchange syntax, so the dispatch table carries it.
  *
  * Supported subset (the striped syntax of the W3C spec):
  *   - `rdf:RDF` root, or a single node element as the document root
  *   - node elements: `rdf:Description` or a typed node element
  *     (element QName becomes an `rdf:type` triple)
  *   - node identification: `rdf:about` (resolved against the base
  *     when one is set), `rdf:nodeID`, `rdf:ID` (fragment against the
  *     base — `xml:base` on the root element or the parse-time `base`
  *     argument; a parse error when neither is set), or anonymous
  *     blank
  *   - property attributes on node elements (non-rdf attributes)
  *   - property elements with `rdf:resource` / `rdf:nodeID` object,
  *     `rdf:datatype` typed text, `xml:lang` (inherited) language
  *     text, plain text, a nested node element,
  *     `rdf:parseType="Resource"` (anonymous blank with nested
  *     property elements), `rdf:parseType="Collection"` (nested
  *     node elements chained as an rdf:first/rdf:rest list ending in
  *     rdf:nil; empty → rdf:nil directly), or
  *     `rdf:parseType="Literal"` (content re-serialized as the
  *     lexical form of an rdf:XMLLiteral typed literal)
  *   - containers: `rdf:li` property elements number themselves
  *     `rdf:_1, rdf:_2, …` per enclosing node element (rdf:Seq/Bag/
  *     Alt are ordinary typed nodes)
  *   - reification: `rdf:ID` on a property element asserts the
  *     statement AND the four reification triples (`#id rdf:type
  *     rdf:Statement` + rdf:subject/predicate/object) against the
  *     base, for every object form (text, resource, nested node,
  *     all three parseTypes); `rdf:ID` values are document-unique
  *     across node and property elements (spec §7.2.34)
  * Out of scope (rejected with a parse error, routed to the DLQ):
  *   `rdf:bagID` (dropped in the revised 2004 syntax).
  *
  * RDF/XML carries no named graphs: every quad lands in the default
  * graph (graph = null).
  */
object RdfXmlParser {

  val RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val XML_NS = "http://www.w3.org/XML/1998/namespace"

  def parse(doc: String, base: String = null): Seq[Quad] =
    new RdfXmlParser(doc, base).parse()
}

final class RdfXmlParser(doc: String, base0: String = null) {
  import RdfXmlParser._

  private val quads = scala.collection.mutable.ArrayBuffer[Quad]()
  private var genid = 0
  private def freshBlank(): Term = { genid += 1; Term.blank(s"genid$genid") }

  // rdf:ID values are unique per document (spec §7.2.34) — one
  // namespace shared by node identification and reification ids
  private val usedIds = scala.collection.mutable.HashSet[String]()
  private def idIri(v: String): Term = {
    // a fragment is only meaningful against a base document IRI
    if (base == null) throw new RdfParseException(
      "rdf/xml: rdf:ID needs a base IRI (xml:base or a parse-time base)")
    if (!usedIds.add(v))
      throw new RdfParseException(s"rdf/xml: duplicate rdf:ID '$v'")
    Term.iri(resolve("#" + v))
  }

  // parse-time base, overridden by xml:base on the root element
  private var base: String = base0

  /** Resolve a (possibly relative) IRI reference against the base;
    * without a base the reference passes through unchanged (absolute
    * IRIs dominate event payloads, which have no document URL).
    */
  private def resolve(ref: String): String =
    if (base == null) ref
    else try java.net.URI.create(base).resolve(ref).toString
    catch {
      case _: IllegalArgumentException => throw new RdfParseException(
        s"rdf/xml: cannot resolve '$ref' against base '$base'")
    }

  /** Pick up `xml:base` from the current (root) element. */
  private def readXmlBase(): Unit = {
    var i = 0
    while (i < reader.getAttributeCount) {
      if (reader.getAttributeLocalName(i) == "base" &&
          reader.getAttributeNamespace(i) == XML_NS)
        base = reader.getAttributeValue(i)
      i += 1
    }
  }

  private val reader: XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    // no DTDs, no external entities — payloads are untrusted bytes
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    f.createXMLStreamReader(new java.io.StringReader(doc))
  }

  def parse(): Seq[Quad] =
    try {
      parseDoc()
      quads.toSeq
    } catch {
      case e: javax.xml.stream.XMLStreamException =>
        throw new RdfParseException(s"rdf/xml: ${e.getMessage}")
    } finally reader.close()

  private def parseDoc(): Unit = {
    while (reader.hasNext) {
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          readXmlBase()
          if (reader.getNamespaceURI == RDF_NS && reader.getLocalName == "RDF") {
            val lang = xmlLang(null)
            // children are node elements until </rdf:RDF>
            var done = false
            while (!done && reader.hasNext) {
              reader.next() match {
                case XMLStreamConstants.START_ELEMENT => parseNodeElement(lang)
                case XMLStreamConstants.END_ELEMENT => done = true
                case _ => ()
              }
            }
          } else parseNodeElement(xmlLang(null)) // bare node-element root
          return
        case _ => ()
      }
    }
    throw new RdfParseException("rdf/xml: no root element")
  }

  /** Positioned ON the node element's START_ELEMENT; consumes through
    * its END_ELEMENT; returns the node's subject term.
    */
  private def parseNodeElement(inheritedLang: String): Term = {
    val ns = reader.getNamespaceURI
    val local = reader.getLocalName
    val lang = xmlLang(inheritedLang)

    var subject: Term = null
    val propAttrs = scala.collection.mutable.ArrayBuffer[(Term, Term)]()
    var i = 0
    while (i < reader.getAttributeCount) {
      val ans = reader.getAttributeNamespace(i)
      val aln = reader.getAttributeLocalName(i)
      val v = reader.getAttributeValue(i)
      if (ans == RDF_NS) aln match {
        case "about" => subject = Term.iri(resolve(v))
        case "nodeID" => subject = Term.blank(v)
        case "ID" => subject = idIri(v)
        case other => throw new RdfParseException(
          s"rdf/xml: unsupported node attribute rdf:$other")
      } else if (ans == XML_NS || aln == "lang") () // handled via xmlLang
      else propAttrs += ((Term.iri(Option(ans).getOrElse("") + aln),
        if (lang != null) Term.langLit(v, lang) else Term.lit(v)))
      i += 1
    }
    if (subject == null) subject = freshBlank()

    if (!(ns == RDF_NS && local == "Description"))
      quads += Quad(null, subject, Term.iri(Term.RDF_TYPE),
        Term.iri(Option(ns).getOrElse("") + local))
    propAttrs.foreach { case (p, o) => quads += Quad(null, subject, p, o) }

    var done = false
    val li = new LiCounter
    while (!done && reader.hasNext) {
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          parsePropertyElement(subject, lang, li)
        case XMLStreamConstants.END_ELEMENT => done = true
        case _ => ()
      }
    }
    subject
  }

  /** rdf:li numbering state — one counter per enclosing node element
    * (the spec's membership-property expansion: li → rdf:_1, _2, …).
    */
  private final class LiCounter { private var n = 0; def next(): Int = { n += 1; n } }

  /** Positioned ON the property element's START_ELEMENT; consumes
    * through its END_ELEMENT.
    */
  private def parsePropertyElement(subject: Term, inheritedLang: String,
      li: LiCounter): Unit = {
    val ns = Option(reader.getNamespaceURI).getOrElse("")
    val local = reader.getLocalName
    val pred =
      if (ns == RDF_NS && local == "li") Term.iri(RDF_NS + "_" + li.next())
      else Term.iri(ns + local)
    val lang = xmlLang(inheritedLang)

    var resource: String = null
    var nodeId: String = null
    var datatype: String = null
    var parseType: String = null
    var rdfId: String = null
    var i = 0
    while (i < reader.getAttributeCount) {
      val ans = reader.getAttributeNamespace(i)
      val aln = reader.getAttributeLocalName(i)
      val v = reader.getAttributeValue(i)
      if (ans == RDF_NS) aln match {
        case "resource" => resource = v
        case "nodeID" => nodeId = v
        case "datatype" => datatype = v
        case "parseType" => parseType = v
        case "ID" => rdfId = v
        case other => throw new RdfParseException(
          s"rdf/xml: unsupported property attribute rdf:$other")
      }
      i += 1
    }

    /** Assert the statement; with `rdf:ID` also assert its
      * reification quad (type/subject/predicate/object).
      */
    def statement(obj: Term): Unit = {
      quads += Quad(null, subject, pred, obj)
      if (rdfId != null) {
        val st = idIri(rdfId)
        quads += Quad(null, st, Term.iri(Term.RDF_TYPE),
          Term.iri(RDF_NS + "Statement"))
        quads += Quad(null, st, Term.iri(RDF_NS + "subject"), subject)
        quads += Quad(null, st, Term.iri(RDF_NS + "predicate"), pred)
        quads += Quad(null, st, Term.iri(RDF_NS + "object"), obj)
      }
    }

    if (parseType != null && parseType != "Resource" &&
        parseType != "Collection" && parseType != "Literal")
      throw new RdfParseException(s"rdf/xml: parseType='$parseType' not supported")

    if (parseType == "Literal") {
      // the element content, re-serialized, is the lexical form of an
      // rdf:XMLLiteral typed literal — datatype/lang attributes do not
      // apply inside parseType="Literal"
      statement(Term.typed(readXmlLiteral(), RDF_NS + "XMLLiteral"))
    } else if (resource != null || nodeId != null) {
      val obj = if (resource != null) Term.iri(resolve(resource)) else Term.blank(nodeId)
      statement(obj)
      skipToEnd()
    } else if (parseType == "Collection") {
      // nested node elements become an rdf:first/rdf:rest cons chain
      val items = scala.collection.mutable.ArrayBuffer[Term]()
      var done = false
      while (!done && reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT => items += parseNodeElement(lang)
          case XMLStreamConstants.END_ELEMENT => done = true
          case XMLStreamConstants.CHARACTERS =>
            if (reader.getText.trim.nonEmpty) throw new RdfParseException(
              "rdf/xml: text content inside parseType='Collection'")
          case _ => ()
        }
      }
      statement(listChain(items.toSeq))
    } else if (parseType == "Resource") {
      // anonymous node whose property elements follow inline
      val b = freshBlank()
      statement(b)
      var done = false
      val innerLi = new LiCounter
      while (!done && reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            parsePropertyElement(b, lang, innerLi)
          case XMLStreamConstants.END_ELEMENT => done = true
          case _ => ()
        }
      }
    } else {
      // text literal or one nested node element
      val text = new StringBuilder
      var nested: Term = null
      var done = false
      while (!done && reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            text.append(reader.getText)
          case XMLStreamConstants.START_ELEMENT =>
            if (nested != null) throw new RdfParseException(
              "rdf/xml: multiple nested node elements in one property")
            nested = parseNodeElement(lang)
          case XMLStreamConstants.END_ELEMENT => done = true
          case _ => ()
        }
      }
      if (nested != null) {
        if (text.toString.trim.nonEmpty) throw new RdfParseException(
          "rdf/xml: mixed text and node element content")
        statement(nested)
      } else {
        val lex = text.toString
        val obj =
          if (datatype != null) Term.typed(lex, datatype)
          else if (lang != null) Term.langLit(lex, lang)
          else Term.lit(lex)
        statement(obj)
      }
    }
  }

  /** Re-serialize the current property element's content with the
    * same StAX cursor — the lexical form of an `rdf:XMLLiteral`.
    * Positioned just after the property element's START_ELEMENT;
    * consumes through its END_ELEMENT.
    *
    * Serialization notes: prefixes declared on ANCESTOR elements but
    * used inside the literal are re-declared on the first element that
    * uses them (the literal must be self-contained, as in the spec's
    * canonicalized form); text and attribute values re-escape; CDATA
    * flattens to escaped text; comments survive.
    */
  private def readXmlLiteral(): String = {
    val sb = new StringBuilder
    def escText(s: String) = s.replace("&", "&amp;")
      .replace("<", "&lt;").replace(">", "&gt;")
    def escAttr(s: String) = escText(s).replace("\"", "&quot;")
    def qname(prefix: String, local: String) =
      if (prefix == null || prefix.isEmpty) local else s"$prefix:$local"
    // (prefix, uri) pairs already declared inside the literal
    val scope = scala.collection.mutable.ArrayBuffer[Set[(String, String)]]()
    var depth = 1
    while (depth > 0 && reader.hasNext) {
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          depth += 1
          val decls = scala.collection.mutable.LinkedHashMap[String, String]()
          var j = 0
          while (j < reader.getNamespaceCount) {
            decls(Option(reader.getNamespacePrefix(j)).getOrElse("")) =
              reader.getNamespaceURI(j)
            j += 1
          }
          def need(prefix: String, uri: String): Unit =
            if (uri != null && uri.nonEmpty && !decls.contains(prefix) &&
                !scope.exists(_.contains((prefix, uri))))
              decls(prefix) = uri
          need(Option(reader.getPrefix).getOrElse(""),
            Option(reader.getNamespaceURI).getOrElse(""))
          var i = 0
          while (i < reader.getAttributeCount) {
            val p = Option(reader.getAttributePrefix(i)).getOrElse("")
            if (p.nonEmpty) need(p, reader.getAttributeNamespace(i))
            i += 1
          }
          sb.append('<').append(qname(reader.getPrefix, reader.getLocalName))
          decls.foreach { case (p, u) =>
            sb.append(' ').append(if (p.isEmpty) "xmlns" else s"xmlns:$p")
              .append("=\"").append(escAttr(u)).append('"')
          }
          i = 0
          while (i < reader.getAttributeCount) {
            sb.append(' ')
              .append(qname(reader.getAttributePrefix(i),
                reader.getAttributeLocalName(i)))
              .append("=\"").append(escAttr(reader.getAttributeValue(i)))
              .append('"')
            i += 1
          }
          sb.append('>')
          scope += decls.map { case (p, u) => (p, u) }.toSet
        case XMLStreamConstants.END_ELEMENT =>
          depth -= 1
          if (depth > 0) {
            sb.append("</")
              .append(qname(reader.getPrefix, reader.getLocalName)).append('>')
            scope.remove(scope.length - 1)
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          sb.append(escText(reader.getText))
        case XMLStreamConstants.COMMENT =>
          sb.append("<!--").append(reader.getText).append("-->")
        case _ => ()
      }
    }
    sb.toString
  }

  /** Emit the rdf:first/rdf:rest cons cells of a collection; returns
    * the list head (rdf:nil for an empty collection).
    */
  private def listChain(items: Seq[Term]): Term =
    if (items.isEmpty) Term.iri(Term.RDF_NIL)
    else {
      val cells = items.map(_ => freshBlank())
      cells.zip(items).zipWithIndex.foreach { case ((cell, item), i) =>
        quads += Quad(null, cell, Term.iri(Term.RDF_FIRST), item)
        quads += Quad(null, cell, Term.iri(Term.RDF_REST),
          if (i == items.size - 1) Term.iri(Term.RDF_NIL) else cells(i + 1))
      }
      cells.head
    }

  /** Consume to the current element's END_ELEMENT, requiring no child
    * elements and only whitespace text.
    */
  private def skipToEnd(): Unit = {
    var done = false
    while (!done && reader.hasNext) {
      reader.next() match {
        case XMLStreamConstants.END_ELEMENT => done = true
        case XMLStreamConstants.START_ELEMENT =>
          throw new RdfParseException(
            "rdf/xml: unexpected element inside rdf:resource property")
        case XMLStreamConstants.CHARACTERS =>
          if (reader.getText.trim.nonEmpty) throw new RdfParseException(
            "rdf/xml: unexpected text inside rdf:resource property")
        case _ => ()
      }
    }
  }

  /** xml:lang on the current element, else the inherited value. */
  private def xmlLang(inherited: String): String = {
    var i = 0
    while (i < reader.getAttributeCount) {
      if (reader.getAttributeLocalName(i) == "lang" &&
          (reader.getAttributeNamespace(i) == XML_NS ||
           reader.getAttributeNamespace(i) == null))
        return {
          val v = reader.getAttributeValue(i)
          if (v.isEmpty) null else v
        }
      i += 1
    }
    inherited
  }
}
