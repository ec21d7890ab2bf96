package graft.sparql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.rdf.{RdfParseException, Term}

/** SPARQL-subset → DataFrame compiler (SURVEY.md §3.3, §7 phase 6):
  * enough of the language to answer every query the reference itself
  * issues — the verification count
  * `SELECT (count(*) AS ?C) { { ?s ?p ?o } UNION { GRAPH ?g { ?s ?p ?o } } }`
  * (DockerTestConfigFK.java:392-394) and the assembler's config probes
  * (OPTIONAL-free BGPs) — plus BGP joins, GRAPH blocks, FILTER
  * equality, ORDER BY and LIMIT.
  *
  * Compilation is fully declarative: each triple pattern becomes a
  * filtered projection of the quads DataFrame (constant terms are
  * null-safe field comparisons, so Catalyst pushes them into the
  * parquet scan), a BGP is an equi-join chain on shared variables, and
  * UNION is unionByName — Catalyst then plans joins/aggregations as it
  * would any relational query (broadcast for small pattern sides, AQE
  * at scale).
  */
object Sparql {

  // --- AST ------------------------------------------------------------------

  sealed trait Node
  final case class Var(name: String) extends Node
  final case class Const(term: Term) extends Node

  final case class TriplePattern(graph: Option[Node], s: Node, p: Node, o: Node)

  sealed trait Pattern
  final case class Bgp(patterns: Seq[TriplePattern], filters: Seq[Filter]) extends Pattern
  final case class Union(branches: Seq[Pattern]) extends Pattern

  final case class Filter(v: String, op: String, value: Term)

  sealed trait Projection
  final case class CountStar(as: String) extends Projection
  final case class SelectVars(vars: Seq[String]) extends Projection
  case object SelectAll extends Projection

  final case class Query(projection: Projection, pattern: Pattern,
      orderBy: Seq[String], limit: Option[Int], distinct: Boolean)

  /** Compile + run a query against a quads DataFrame (columns graph,
    * subject, predicate, obj — [[graft.store.QuadStore.quads]]).
    */
  def execute(quads: DataFrame, queryText: String): DataFrame = {
    val q = parse(queryText)
    val bound = compile(quads, q.pattern)
    val projected = q.projection match {
      case CountStar(as) => bound.agg(count(lit(1)).as(as))
      case SelectVars(vs) => bound.select(vs.map(col): _*)
      case SelectAll => bound
    }
    val distinct = if (q.distinct) projected.dropDuplicates() else projected
    val ordered = if (q.orderBy.nonEmpty)
      distinct.orderBy(q.orderBy.map(v => col(v).getField("lex")): _*)
    else distinct
    q.limit.fold(ordered)(ordered.limit)
  }

  // --- compiler -------------------------------------------------------------

  private def compile(quads: DataFrame, pattern: Pattern): DataFrame = pattern match {
    case Union(branches) =>
      // branches may bind different variable sets (e.g. ?g only under
      // GRAPH); SPARQL leaves the others unbound → null columns
      branches.map(compile(quads, _)).reduce(_.unionByName(_, allowMissingColumns = true))
    case Bgp(patterns, filters) =>
      val dfs = patterns.map(compilePattern(quads, _))
      val joined = dfs.reduceLeft { (acc, next) =>
        val shared = acc.columns.toSet intersect next.columns.toSet
        if (shared.isEmpty) acc.crossJoin(next)
        else {
          val a = acc.alias("l")
          val b = next.alias("r")
          val cond = shared.map(c => col(s"l.$c") <=> col(s"r.$c")).reduce(_ && _)
          val keep = acc.columns.map(c => col(s"l.$c")) ++
            next.columns.filterNot(shared.contains).map(c => col(s"r.$c"))
          a.join(b, cond).select(keep: _*)
        }
      }
      filters.foldLeft(joined) { (df, f) =>
        val c = col(f.v)
        val t = termLit(f.value)
        f.op match {
          // SPARQL VALUE equality, not structural: "01"^^xsd:integer
          // equals "1"^^xsd:integer (graft.functions.TermValueEquals)
          case "=" => df.filter(graft.functions.TermOps.termValueEquals(c, t))
          case "!=" => df.filter(!graft.functions.TermOps.termValueEquals(c, t))
          // ordering is VALUE-space too: "9"^^xsd:integer < "10"^^xsd:integer
          // (numeric by BigDecimal; the lexical order is inverted there).
          // SPARQL `<` is a type error (row dropped) for incomparable
          // operand kinds; the constant side is known here, so the guard
          // compiles to a pushable column predicate.
          case "<" =>
            df.filter(comparableWith(c, f.value) &&
              graft.functions.TermOps.termValueCompare(c, t) < 0)
          case ">" =>
            df.filter(comparableWith(c, f.value) &&
              graft.functions.TermOps.termValueCompare(c, t) > 0)
          case other => throw new RdfParseException(s"unsupported FILTER op '$other'")
        }
      }
  }

  /** SPARQL ordering comparability (spec §17.3, operator mapping):
    * numeric-vs-numeric and string-vs-string compare; anything else is
    * a type error, i.e. FILTER false. One side is a constant, so this
    * resolves to a plain datatype/lang predicate on the column.
    */
  private def comparableWith(c: Column, t: Term): Column = {
    import graft.functions.TermOps.NUMERIC_DATATYPES
    val isLit = c.getField("termType") === Term.LIT
    if (t.termType == Term.LIT && t.datatype != null &&
        NUMERIC_DATATYPES.contains(t.datatype))
      isLit && c.getField("datatype").isin(NUMERIC_DATATYPES.toSeq: _*)
    else if (t.termType == Term.LIT && t.lang == null &&
        (t.datatype == null || t.datatype == Term.XSD_STRING))
      isLit && c.getField("lang").isNull &&
        (c.getField("datatype").isNull || c.getField("datatype") === Term.XSD_STRING)
    else lit(true) // IRI/blank/lang-tagged: total order (extension)
  }

  private def termLit(t: Term): Column =
    struct(lit(t.termType).as("termType"), lit(t.lex).as("lex"),
      lit(t.datatype).cast("string").as("datatype"), lit(t.lang).cast("string").as("lang"))

  /** One triple pattern → filtered projection with one column per
    * variable. Constant terms become null-safe comparisons on the term
    * struct fields (pushable); the default graph is `graph IS NULL`,
    * `GRAPH ?g` binds only named graphs (SPARQL dataset semantics).
    */
  private def compilePattern(quads: DataFrame, tp: TriplePattern): DataFrame = {
    var df = tp.graph match {
      case None => quads.filter(col("graph").isNull)
      case Some(Const(t)) => quads.filter(col("graph") <=> termLit(t))
      case Some(Var(_)) => quads.filter(col("graph").isNotNull)
    }
    val slots: Seq[(String, Node)] = Seq(
      "subject" -> tp.s, "predicate" -> tp.p, "obj" -> tp.o) ++
      tp.graph.collect { case v: Var => "graph" -> (v: Node) }
    slots.foreach {
      case (c, Const(t)) => df = df.filter(col(c) <=> termLit(t))
      case _ => ()
    }
    // bind variables; repeated vars within the pattern force equality
    val varSlots = slots.collect { case (c, Var(n)) => (c, n) }
    varSlots.groupBy(_._2).values.filter(_.size > 1).foreach { dup =>
      dup.sliding(2).foreach {
        case Seq((c1, _), (c2, _)) => df = df.filter(col(c1) <=> col(c2))
        case _ => ()
      }
    }
    val proj = varSlots.map { case (c, n) => (n, col(c)) }.toMap
    df.select(proj.toSeq.map { case (n, c) => c.as(n) }: _*)
  }

  // --- parser ---------------------------------------------------------------

  def parse(text: String): Query = new Parser(text).parseQuery()

  private final class Parser(text: String) {
    private var pos = 0

    def parseQuery(): Query = {
      keyword("SELECT")
      val distinct = tryKeyword("DISTINCT")
      val projection = parseProjection()
      tryKeyword("WHERE")
      val pattern = parseGroup()
      val orderBy =
        if (tryKeyword("ORDER")) { keyword("BY"); parseVarList() } else Seq.empty
      val limit = if (tryKeyword("LIMIT")) Some(parseInt()) else None
      skipWs()
      if (pos < text.length) fail(s"trailing content: '${text.substring(pos).take(20)}'")
      Query(projection, pattern, orderBy, limit, distinct)
    }

    private def parseProjection(): Projection = {
      skipWs()
      if (peek == '(') {
        pos += 1
        keyword("COUNT"); expect('('); expect('*'); expect(')')
        keyword("AS")
        val v = parseVar()
        expect(')')
        CountStar(v)
      } else if (peek == '*') { pos += 1; SelectAll }
      else SelectVars(parseVarList())
    }

    private def parseVarList(): Seq[String] = {
      val vs = scala.collection.mutable.ArrayBuffer[String]()
      skipWs()
      while (pos < text.length && peek == '?') { vs += parseVar(); skipWs() }
      if (vs.isEmpty) fail("expected at least one ?variable")
      vs.toSeq
    }

    private def parseGroup(): Pattern = {
      expect('{')
      skipWs()
      // UNION of sub-groups?
      if (peek == '{') {
        val branches = scala.collection.mutable.ArrayBuffer[Pattern]()
        branches += parseGroup()
        while (tryKeyword("UNION")) branches += parseGroup()
        expect('}')
        if (branches.size == 1) branches.head else Union(branches.toSeq)
      } else {
        val tps = scala.collection.mutable.ArrayBuffer[TriplePattern]()
        val filters = scala.collection.mutable.ArrayBuffer[Filter]()
        var done = false
        while (!done) {
          skipWs()
          if (pos >= text.length) fail("unterminated group pattern")
          else if (peek == '}') { pos += 1; done = true }
          else if (tryKeyword("GRAPH")) {
            val g = parseNode()
            val inner = parseGroup()
            inner match {
              case Bgp(ps, fs) =>
                tps ++= ps.map(_.copy(graph = Some(g)))
                filters ++= fs
              case _ => fail("GRAPH block must contain a basic pattern")
            }
          } else if (tryKeyword("FILTER")) {
            expect('(')
            val v = parseVar()
            skipWs()
            val op =
              if (tryToken("!=")) "!=" else if (tryToken("=")) "="
              else if (tryToken("<")) "<" else if (tryToken(">")) ">"
              else fail("expected comparison operator")
            val value = parseNode() match {
              case Const(t) => t
              case _ => fail("FILTER value must be a constant")
            }
            expect(')')
            filters += Filter(v, op, value)
          } else {
            val s = parseNode(); val p = parseNode(); val o = parseNode()
            tps += TriplePattern(None, s, p, o)
            skipWs()
            if (pos < text.length && peek == '.') pos += 1
          }
        }
        Bgp(tps.toSeq, filters.toSeq)
      }
    }

    private def parseNode(): Node = {
      skipWs()
      peek match {
        case '?' => Var(parseVar())
        case '<' =>
          pos += 1
          val end = text.indexOf('>', pos)
          if (end < 0) fail("unterminated IRI")
          val iri = text.substring(pos, end); pos = end + 1
          Const(Term.iri(iri))
        case '"' =>
          pos += 1
          val sb = new StringBuilder
          while (pos < text.length && text.charAt(pos) != '"') {
            if (text.charAt(pos) == '\\') pos += 1
            sb.append(text.charAt(pos)); pos += 1
          }
          if (pos >= text.length) fail("unterminated literal")
          pos += 1
          if (pos + 1 < text.length && text.charAt(pos) == '^' && text.charAt(pos + 1) == '^') {
            pos += 2
            parseNode() match {
              case Const(dt) if dt.isIri => Const(Term.typed(sb.toString, dt.lex))
              case _ => fail("datatype must be an IRI")
            }
          } else if (pos < text.length && text.charAt(pos) == '@') {
            pos += 1
            val start = pos
            while (pos < text.length && (text.charAt(pos).isLetterOrDigit || text.charAt(pos) == '-')) pos += 1
            Const(Term.langLit(sb.toString, text.substring(start, pos)))
          } else Const(Term.lit(sb.toString))
        case 'a' if pos + 1 < text.length && text.charAt(pos + 1).isWhitespace =>
          pos += 1
          Const(Term.iri(Term.RDF_TYPE))
        case c => fail(s"unexpected character '$c'")
      }
    }

    private def parseVar(): String = {
      skipWs()
      if (peek != '?') fail("expected ?variable")
      pos += 1
      val start = pos
      while (pos < text.length && (text.charAt(pos).isLetterOrDigit || text.charAt(pos) == '_')) pos += 1
      if (pos == start) fail("empty variable name")
      text.substring(start, pos)
    }

    private def parseInt(): Int = {
      skipWs()
      val start = pos
      while (pos < text.length && text.charAt(pos).isDigit) pos += 1
      if (pos == start) fail("expected integer")
      text.substring(start, pos).toInt
    }

    private def peek: Char = if (pos < text.length) text.charAt(pos) else ' '
    private def skipWs(): Unit =
      while (pos < text.length && text.charAt(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      skipWs()
      if (pos >= text.length || text.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }
    private def keyword(kw: String): Unit =
      if (!tryKeyword(kw)) fail(s"expected $kw")
    private def tryKeyword(kw: String): Boolean = {
      skipWs()
      if (text.regionMatches(true, pos, kw, 0, kw.length) &&
          (pos + kw.length >= text.length ||
           !text.charAt(pos + kw.length).isLetterOrDigit)) {
        pos += kw.length; true
      } else false
    }
    private def tryToken(tok: String): Boolean = {
      skipWs()
      if (text.startsWith(tok, pos)) { pos += tok.length; true } else false
    }
    private def fail(msg: String): Nothing =
      throw new RdfParseException(s"SPARQL parse error at $pos: $msg")
  }
}
