package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame

import graft.rdf.{Term, TurtleParser}
import graft.sparql.Sparql

/** Quad row for the conformance dataset builder (top-level so Spark
  * can derive its encoder).
  */
final case class ConformanceQuad(graph: Term, subject: Term,
    predicate: Term, obj: Term)

/** SPARQL 1.1 evaluation conformance — a vendored subset of the public
  * W3C rdf-tests evaluation corpus (data-r2 + data-sparql11 families),
  * re-authored as inline fixtures: each case is (data, query, expected
  * solutions), with the expected solutions taken from the spec's
  * defined semantics. The hand-picked sparql_* verify entries are deep
  * but self-chosen; this suite is the BREADTH check — basic graph
  * patterns, OPTIONAL/UNION scoping, FILTER builtins, negation
  * (MINUS vs NOT EXISTS divergence), property paths, aggregates,
  * subqueries, VALUES, CONSTRUCT/ASK forms, and dataset clauses.
  *
  * Comparison is bag (multiset) equality over rendered solution rows
  * (order-insensitive unless the query orders), with blank-node labels
  * compared up to bijection per the spec's isomorphism rule.
  */
class ConformanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val PRELUDE =
    """@prefix : <http://example/> .
      |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
      |@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
      |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
      |@prefix foaf: <http://xmlns.com/foaf/0.1/> .
      |""".stripMargin

  private val QPRELUDE =
    """PREFIX : <http://example/>
      |PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
      |PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
      |PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
      |PREFIX foaf: <http://xmlns.com/foaf/0.1/>
      |""".stripMargin

  /** Build the queried dataset: default-graph turtle + named graphs. */
  private def dataset(data: String, named: (String, String)*): DataFrame = {
    import spark.implicits._
    val dflt = TurtleParser.parseTurtle(PRELUDE + data)
      .map(q => ConformanceQuad(null, q.subject, q.predicate, q.obj))
    val rest = named.flatMap { case (g, doc) =>
      TurtleParser.parseTurtle(PRELUDE + doc)
        .map(q => ConformanceQuad(Term.iri(g), q.subject, q.predicate, q.obj))
    }
    (dflt ++ rest).toDF()
  }

  /** Render one result cell: term structs to N-Triples, raw aggregate
    * values (the top-level SELECT contract) to canonical lexical form.
    */
  private def render(v: Any): String = v match {
    case null => "UNDEF"
    case r: org.apache.spark.sql.Row if r.length == 4 =>
      Term(r.getString(0), r.getString(1), r.getString(2), r.getString(3)).toNT
    case d: java.math.BigDecimal =>
      val s = d.stripTrailingZeros
      if (s.scale <= 0) s.toBigInteger.toString else s.toPlainString
    case d: Double => if (d == math.rint(d) && !d.isInfinite) d.toLong.toString else d.toString
    case other => other.toString
  }

  private def rowsOf(df: DataFrame): Seq[Map[String, String]] = {
    val cols = df.columns.toSeq
    df.collect().toSeq.map { r =>
      cols.zipWithIndex.flatMap { case (c, i) =>
        val v = r.get(i)
        if (v == null) None else Some(c -> render(v))
      }.toMap
    }
  }

  /** Blank-label bijection: rewrite _:x labels to _:c<n> in first-use
    * order over the canonically sorted row rendering, on both sides.
    */
  private def canon(rows: Seq[Map[String, String]]): Seq[Seq[(String, String)]] = {
    val sorted = rows.map(_.toSeq.sortBy(_._1)).sortBy(_.toString)
    val ren = scala.collection.mutable.LinkedHashMap[String, String]()
    val B = "_:([A-Za-z0-9:_\\-\\.]+)".r
    def mapTerm(t: String): String = B.replaceAllIn(t, m => {
      val label = ren.getOrElseUpdate(m.group(1), s"c${ren.size}")
      java.util.regex.Matcher.quoteReplacement(s"_:$label")
    })
    sorted.map(_.map { case (k, v) => (k, mapTerm(v)) })
  }

  private def expand(tok: String): String = tok
    .replace("^^xsd:", "^^<http://www.w3.org/2001/XMLSchema#>")
    .replaceAll("\\^\\^<(http://www\\.w3\\.org/2001/XMLSchema#)>([A-Za-z]+)", "^^<$1$2>")

  /** Expected-row DSL: `"x" -> ":a"` (prefixed IRI), full `<iri>`,
    * `"lit"`, `"1"^^xsd:integer`, `"x"@en`, `_:b`, raw `3` for
    * top-level aggregate values.
    */
  private def r(pairs: (String, String)*): Map[String, String] =
    pairs.map { case (k, v0) =>
      val v = v0 match {
        case p if p.startsWith(":") => s"<http://example/${p.drop(1)}>"
        case p if p.startsWith("foaf:") =>
          s"<http://xmlns.com/foaf/0.1/${p.drop(5)}>"
        case p if p.startsWith("rdf:") =>
          s"<http://www.w3.org/1999/02/22-rdf-syntax-ns#${p.drop(4)}>"
        case p => expand(p)
      }
      k -> v
    }.toMap

  private def checkRows(df: DataFrame, expected: Seq[Map[String, String]],
      ordered: Boolean = false): Unit = {
    val got = rowsOf(df)
    if (ordered) {
      val g = {
        val ren = canon(got.map(identity))
        got.map(_.toSeq.sortBy(_._1)).map(_.toString) // keep order, no blank canon on ordered
      }
      val e = expected.map(_.toSeq.sortBy(_._1)).map(_.toString)
      assert(g == e, s"\nexpected(ordered): $e\ngot: $g")
    } else {
      val g = canon(got)
      val e = canon(expected)
      assert(g == e, s"\nexpected: $e\ngot: $g")
    }
  }

  private def run(data: String, query: String): DataFrame =
    Sparql.execute(dataset(data), QPRELUDE + query)

  private def evalCase(name: String, data: String, query: String,
      expected: Seq[Map[String, String]], ordered: Boolean = false): Unit =
    test(name) { checkRows(run(data, query), expected, ordered) }

  private def askCase(name: String, data: String, query: String, expected: Boolean): Unit =
    test(name) {
      assert(run(data, query).collect().head.getBoolean(0) == expected)
    }

  /** CONSTRUCT result compared as a SET of rendered triples. */
  private def graphCase(name: String, data: String, query: String,
      expected: Seq[String]): Unit =
    test(name) {
      val got = run(data, query).collect().toSeq.map { row =>
        (1 to 3).map(i => render(row.get(i))).mkString(" ")
      }
      val exp = expected.map(s => r("t" -> s"DUMMY")).map(_ => "") // unused
      val expRendered = expected.map { line =>
        line.split("\\s+", 3).map(tok => r("x" -> tok)("x")).mkString(" ")
      }
      assert(canon(got.map(t => Map("t" -> t))) == canon(expRendered.map(t => Map("t" -> t))),
        s"\nexpected: ${expRendered.sorted}\ngot: ${got.sorted}")
    }

  // ==========================================================================
  // basic: basic graph patterns (data-r2/basic, dawg-triple-pattern)
  // ==========================================================================

  private val BASIC = ":x :p :v1 . :x :p :v2 . :y :p :v1 . :y :q \"a\" ."

  evalCase("basic: single triple pattern, all vars", BASIC,
    "SELECT ?s ?o { ?s :q ?o }", Seq(r("s" -> ":y", "o" -> "\"a\"")))

  evalCase("basic: bag semantics keeps duplicates across join", BASIC,
    "SELECT ?s { ?s :p ?o }",
    Seq(r("s" -> ":x"), r("s" -> ":x"), r("s" -> ":y")))

  evalCase("basic: DISTINCT collapses", BASIC,
    "SELECT DISTINCT ?s { ?s :p ?o }", Seq(r("s" -> ":x"), r("s" -> ":y")))

  evalCase("basic: REDUCED permits collapse (compare as set)", BASIC,
    "SELECT REDUCED ?s { ?s :p ?o . ?s :p ?o2 } ",
    Seq(r("s" -> ":x"), r("s" -> ":y")))

  evalCase("basic: join on shared variable", BASIC,
    "SELECT ?s { ?s :p :v1 . ?s :p :v2 }", Seq(r("s" -> ":x")))

  evalCase("basic: no match yields empty", BASIC,
    "SELECT ?s { ?s :nope ?o }", Seq.empty)

  evalCase("basic: constant subject+object", BASIC,
    "SELECT ?p { :y ?p \"a\" }", Seq(r("p" -> ":q")))

  evalCase("basic: integer literal term match", ":n :v 1 . :m :v 01 .",
    "SELECT ?s { ?s :v 1 }", Seq(r("s" -> ":n")))

  evalCase("basic: decimal literal distinct from integer in simple entailment",
    ":n :v 1.0 . :m :v 1 .",
    "SELECT ?s { ?s :v 1.0 }", Seq(r("s" -> ":n")))

  evalCase("basic: boolean literal", ":n :ok true . :m :ok false .",
    "SELECT ?s { ?s :ok true }", Seq(r("s" -> ":n")))

  evalCase("basic: lang-tagged constant requires tag match",
    ":a :label \"chat\"@fr . :b :label \"chat\" .",
    "SELECT ?s { ?s :label \"chat\"@fr }", Seq(r("s" -> ":a")))

  evalCase("basic: typed-literal constant", ":a :v \"abc\"^^:dt . :b :v \"abc\" .",
    "SELECT ?s { ?s :v \"abc\"^^:dt }", Seq(r("s" -> ":a")))

  evalCase("basic: blank node in data is a regular term",
    ":x :p _:b . _:b :q \"v\" .",
    "SELECT ?o { :x :p ?b . ?b :q ?o }", Seq(r("o" -> "\"v\"")))

  evalCase("basic: blank node projected (bijection-compared)",
    ":x :p _:b1 . :y :p _:b2 .",
    "SELECT ?o { ?s :p ?o }", Seq(r("o" -> "_:a"), r("o" -> "_:b")))

  evalCase("basic: rdf:type keyword a", ":c a :Klass . :d a :Other .",
    "SELECT ?s { ?s a :Klass }", Seq(r("s" -> ":c")))

  evalCase("basic: multiple patterns over same predicate (cartesian guard)",
    ":x :p :v1 . :x :p :v2 .",
    "SELECT ?a ?b { ?x :p ?a . ?x :p ?b }",
    Seq(r("a" -> ":v1", "b" -> ":v1"), r("a" -> ":v1", "b" -> ":v2"),
      r("a" -> ":v2", "b" -> ":v1"), r("a" -> ":v2", "b" -> ":v2")))

  // ==========================================================================
  // optional: left joins and scoping (data-r2/optional, optional-filter)
  // ==========================================================================

  private val OPT =
    """:a foaf:name "Alice" . :a foaf:mbox <mailto:alice@example> .
      |:b foaf:name "Bob" .""".stripMargin

  evalCase("optional: extends when present, leaves unbound when absent", OPT,
    "SELECT ?name ?mbox { ?x foaf:name ?name OPTIONAL { ?x foaf:mbox ?mbox } }",
    Seq(r("name" -> "\"Alice\"", "mbox" -> "<mailto:alice@example>"),
      r("name" -> "\"Bob\"")))

  evalCase("optional: two optionals, independent", OPT + "\n:b :nick \"Bobby\" .",
    "SELECT ?name ?mbox ?nick { ?x foaf:name ?name OPTIONAL { ?x foaf:mbox ?mbox } OPTIONAL { ?x :nick ?nick } }",
    Seq(r("name" -> "\"Alice\"", "mbox" -> "<mailto:alice@example>"),
      r("name" -> "\"Bob\"", "nick" -> "\"Bobby\"")))

  evalCase("optional: filter inside optional (dawg-optional-filter-001)",
    """:book1 :title "TitleA" . :book1 :price 15 .
      |:book2 :title "TitleB" . :book2 :price 25 .""".stripMargin,
    "SELECT ?title ?price { ?x :title ?title OPTIONAL { ?x :price ?price FILTER(?price < 20) } }",
    Seq(r("title" -> "\"TitleA\"", "price" -> "\"15\"^^xsd:integer"),
      r("title" -> "\"TitleB\"")))

  evalCase("optional: join inside optional must bind all or nothing",
    ":a :p 1 . :a :q 2 .",
    "SELECT ?x ?y ?z { ?x :p ?y OPTIONAL { ?x :q ?z . ?x :r ?w } }",
    Seq(r("x" -> ":a", "y" -> "\"1\"^^xsd:integer")))

  evalCase("optional: nested optional",
    ":a :p 1 . :a :q 2 . :b :p 3 .",
    "SELECT ?x ?y ?z { ?x :p ?y OPTIONAL { ?x :q ?z OPTIONAL { ?x :r ?w } } }",
    Seq(r("x" -> ":a", "y" -> "\"1\"^^xsd:integer", "z" -> "\"2\"^^xsd:integer"),
      r("x" -> ":b", "y" -> "\"3\"^^xsd:integer")))

  evalCase("optional: shared var join with left (compatible only)",
    ":a :p :v . :v :q :w . :b :p :u .",
    "SELECT ?x ?o { ?x :p ?o OPTIONAL { ?o :q ?w } }",
    Seq(r("x" -> ":a", "o" -> ":v"), r("x" -> ":b", "o" -> ":u")))

  // ==========================================================================
  // union (data-r2/algebra + union)
  // ==========================================================================

  evalCase("union: branches evaluated independently",
    ":a :p 1 . :b :q 2 .",
    "SELECT ?s { { ?s :p ?o } UNION { ?s :q ?o } }",
    Seq(r("s" -> ":a"), r("s" -> ":b")))

  evalCase("union: disjoint variables leave others unbound",
    ":a :p 1 . :b :q 2 .",
    "SELECT ?x ?y { { ?x :p ?o } UNION { ?y :q ?o } }",
    Seq(r("x" -> ":a"), r("y" -> ":b")))

  evalCase("union: duplicates preserved (bag)",
    ":a :p 1 . :a :q 1 .",
    "SELECT ?s { { ?s ?p 1 } UNION { ?s ?p 1 } }",
    Seq(r("s" -> ":a"), r("s" -> ":a"), r("s" -> ":a"), r("s" -> ":a")))

  evalCase("union: three-way",
    ":a :p 1 . :b :q 2 . :c :r 3 .",
    "SELECT ?s { { ?s :p ?o } UNION { ?s :q ?o } UNION { ?s :r ?o } }",
    Seq(r("s" -> ":a"), r("s" -> ":b"), r("s" -> ":c")))

  evalCase("union then join with outer pattern",
    ":a :p 1 . :b :q 2 . :a :name \"A\" . :b :name \"B\" .",
    "SELECT ?s ?n { ?s :name ?n { { ?s :p ?o } UNION { ?s :q ?o } } }",
    Seq(r("s" -> ":a", "n" -> "\"A\""), r("s" -> ":b", "n" -> "\"B\"")))

  // ==========================================================================
  // filter: EBV, comparisons, builtins (data-r2/expr-ops, expr-builtin)
  // ==========================================================================

  private val NUM = ":i1 :v 1 . :i2 :v 2 . :i3 :v 3 . :d1 :v 2.5 . :dbl :v 1.5e0 ."

  evalCase("filter: numeric less-than crosses datatypes", NUM,
    "SELECT ?s { ?s :v ?v FILTER(?v < 2) }",
    Seq(r("s" -> ":i1"), r("s" -> ":dbl")))

  evalCase("filter: numeric equality value-space (1 = 1.0e0)",
    ":a :v 1 . :b :v 1.0e0 . :c :v 2 .",
    "SELECT ?s { ?s :v ?v FILTER(?v = 1) }",
    Seq(r("s" -> ":a"), r("s" -> ":b")))

  evalCase("filter: != drops equal values", NUM,
    "SELECT ?s { ?s :v ?v FILTER(?v != 2) }",
    Seq(r("s" -> ":i1"), r("s" -> ":i3"), r("s" -> ":d1"), r("s" -> ":dbl")))

  evalCase("filter: && and ||", NUM,
    "SELECT ?s { ?s :v ?v FILTER(?v > 1 && ?v < 3) }",
    Seq(r("s" -> ":i2"), r("s" -> ":d1"), r("s" -> ":dbl")))

  evalCase("filter: ! negation", NUM,
    "SELECT ?s { ?s :v ?v FILTER(!(?v < 3)) }", Seq(r("s" -> ":i3")))

  evalCase("filter: arithmetic in condition", NUM,
    "SELECT ?s { ?s :v ?v FILTER(?v * 2 = 5) }", Seq(r("s" -> ":d1")))

  evalCase("filter: unbound comparison is error → row dropped",
    ":a :p 1 . :b :q 2 .",
    "SELECT ?s { ?s :p ?v OPTIONAL { ?s :q ?w } FILTER(?w > 0) }",
    Seq.empty)

  evalCase("filter: BOUND guards optional",
    ":a :p 1 . :a :q 2 . :b :p 3 .",
    "SELECT ?s { ?s :p ?v OPTIONAL { ?s :q ?w } FILTER(BOUND(?w)) }",
    Seq(r("s" -> ":a")))

  evalCase("filter: !BOUND finds the gap (dawg negation idiom)",
    ":a :p 1 . :a :q 2 . :b :p 3 .",
    "SELECT ?s { ?s :p ?v OPTIONAL { ?s :q ?w } FILTER(!BOUND(?w)) }",
    Seq(r("s" -> ":b")))

  evalCase("filter: STR of IRI and literal",
    ":a :p :obj . :b :p \"obj2\" .",
    "SELECT ?s { ?s :p ?o FILTER(STR(?o) = \"http://example/obj\" || STR(?o) = \"obj2\") }",
    Seq(r("s" -> ":a"), r("s" -> ":b")))

  evalCase("filter: LANG and LANGMATCHES",
    ":a :l \"x\"@en . :b :l \"x\"@en-GB . :c :l \"x\"@fr . :d :l \"x\" .",
    "SELECT ?s { ?s :l ?o FILTER LANGMATCHES(LANG(?o), \"en\") }",
    Seq(r("s" -> ":a"), r("s" -> ":b")))

  evalCase("filter: LANGMATCHES * matches any non-empty tag",
    ":a :l \"x\"@en . :b :l \"x\" .",
    "SELECT ?s { ?s :l ?o FILTER LANGMATCHES(LANG(?o), \"*\") }",
    Seq(r("s" -> ":a")))

  evalCase("filter: DATATYPE of typed/plain literal",
    ":a :v 1 . :b :v \"s\" .",
    "SELECT ?s { ?s :v ?o FILTER(DATATYPE(?o) = xsd:integer) }",
    Seq(r("s" -> ":a")))

  evalCase("filter: DATATYPE of plain literal is xsd:string",
    ":a :v \"s\" .",
    "SELECT ?s { ?s :v ?o FILTER(DATATYPE(?o) = xsd:string) }",
    Seq(r("s" -> ":a")))

  evalCase("filter: isIRI / isLiteral / isBlank partition terms",
    ":a :p :iri . :a :p \"lit\" . :a :p _:bn .",
    "SELECT ?o { :a :p ?o FILTER(isIRI(?o)) }", Seq(r("o" -> ":iri")))

  evalCase("filter: isLiteral",
    ":a :p :iri . :a :p \"lit\" . :a :p _:bn .",
    "SELECT ?o { :a :p ?o FILTER(isLiteral(?o)) }", Seq(r("o" -> "\"lit\"")))

  evalCase("filter: isBlank",
    ":a :p :iri . :a :p \"lit\" . :a :p _:bn .",
    "SELECT ?o { :a :p ?o FILTER(isBlank(?o)) }", Seq(r("o" -> "_:x")))

  evalCase("filter: isNumeric",
    ":a :p 1 . :a :p \"1\" . :a :p 2.0e0 .",
    "SELECT ?o { :a :p ?o FILTER(isNumeric(?o)) }",
    Seq(r("o" -> "\"1\"^^xsd:integer"), r("o" -> "\"2.0e0\"^^xsd:double")))

  evalCase("filter: sameTerm is term identity not value equality",
    ":a :v 1 . :b :v 1.0e0 .",
    "SELECT ?s { ?s :v ?o FILTER(sameTerm(?o, 1)) }", Seq(r("s" -> ":a")))

  evalCase("filter: REGEX basic", ":a :n \"Alice\" . :b :n \"Bob\" .",
    "SELECT ?s { ?s :n ?n FILTER REGEX(?n, \"^Ali\") }", Seq(r("s" -> ":a")))

  evalCase("filter: REGEX case-insensitive flag", ":a :n \"Alice\" . :b :n \"bob\" .",
    "SELECT ?s { ?s :n ?n FILTER REGEX(?n, \"^ali\", \"i\") }", Seq(r("s" -> ":a")))

  evalCase("filter: IN and NOT IN",
    ":a :v 1 . :b :v 2 . :c :v 3 .",
    "SELECT ?s { ?s :v ?v FILTER(?v IN (1, 3)) }",
    Seq(r("s" -> ":a"), r("s" -> ":c")))

  evalCase("filter: NOT IN",
    ":a :v 1 . :b :v 2 . :c :v 3 .",
    "SELECT ?s { ?s :v ?v FILTER(?v NOT IN (1, 3)) }", Seq(r("s" -> ":b")))

  evalCase("filter: EBV of literal string (non-empty true, empty false)",
    ":a :v \"x\" . :b :v \"\" .",
    "SELECT ?s { ?s :v ?v FILTER(?v) }", Seq(r("s" -> ":a")))

  evalCase("filter: EBV of numeric zero is false",
    ":a :v 0 . :b :v 1 .",
    "SELECT ?s { ?s :v ?v FILTER(?v) }", Seq(r("s" -> ":b")))

  // ==========================================================================
  // string builtins (data-sparql11/functions)
  // ==========================================================================

  private val STRS = ":a :s \"foobar\" . :b :s \"ABC\" ."

  evalCase("fn: STRLEN", STRS,
    "SELECT ?x { ?x :s ?s FILTER(STRLEN(?s) = 6) }", Seq(r("x" -> ":a")))

  evalCase("fn: SUBSTR 2-arg (1-based)", STRS,
    "SELECT ?x { ?x :s ?s FILTER(SUBSTR(?s, 4) = \"bar\") }", Seq(r("x" -> ":a")))

  evalCase("fn: SUBSTR 3-arg", STRS,
    "SELECT ?x { ?x :s ?s FILTER(SUBSTR(?s, 1, 3) = \"foo\") }", Seq(r("x" -> ":a")))

  evalCase("fn: UCASE / LCASE", STRS,
    "SELECT ?x { ?x :s ?s FILTER(UCASE(?s) = \"FOOBAR\" || LCASE(?s) = \"abc\") }",
    Seq(r("x" -> ":a"), r("x" -> ":b")))

  evalCase("fn: STRSTARTS / STRENDS / CONTAINS", STRS,
    "SELECT ?x { ?x :s ?s FILTER(STRSTARTS(?s, \"foo\") && STRENDS(?s, \"bar\") && CONTAINS(?s, \"oob\")) }",
    Seq(r("x" -> ":a")))

  evalCase("fn: STRBEFORE / STRAFTER", ":a :s \"abc\" .",
    "SELECT (STRBEFORE(?s, \"b\") AS ?pre) (STRAFTER(?s, \"b\") AS ?post) { :a :s ?s }",
    Seq(r("pre" -> "\"a\"", "post" -> "\"c\"")))

  evalCase("fn: STRBEFORE no-match gives empty string", ":a :s \"abc\" .",
    "SELECT (STRBEFORE(?s, \"z\") AS ?pre) { :a :s ?s }",
    Seq(r("pre" -> "\"\"")))

  evalCase("fn: CONCAT", ":a :x \"foo\" . :a :y \"bar\" .",
    "SELECT (CONCAT(?x, ?y) AS ?xy) { :a :x ?x . :a :y ?y }",
    Seq(r("xy" -> "\"foobar\"")))

  evalCase("fn: REPLACE", ":a :s \"banana\" .",
    "SELECT (REPLACE(?s, \"na\", \"NA\") AS ?o) { :a :s ?s }",
    Seq(r("o" -> "\"baNANA\"")))

  evalCase("fn: ENCODE_FOR_URI", ":a :s \"Los Angeles\" .",
    "SELECT (ENCODE_FOR_URI(?s) AS ?o) { :a :s ?s }",
    Seq(r("o" -> "\"Los%20Angeles\"")))

  // ==========================================================================
  // numeric builtins
  // ==========================================================================

  evalCase("fn: ABS", ":a :v -1.5 .",
    "SELECT ?s { ?s :v ?v FILTER(ABS(?v) = 1.5) }", Seq(r("s" -> ":a")))

  evalCase("fn: CEIL / FLOOR", ":a :v 1.4 .",
    "SELECT ?s { ?s :v ?v FILTER(CEIL(?v) = 2 && FLOOR(?v) = 1) }",
    Seq(r("s" -> ":a")))

  evalCase("fn: ROUND half up", ":a :v 2.5 . :b :v 2.4 .",
    "SELECT ?s { ?s :v ?v FILTER(ROUND(?v) = 3) }", Seq(r("s" -> ":a")))

  evalCase("fn: unary minus", ":a :v 3 .",
    "SELECT ?s { ?s :v ?v FILTER(-?v = -3) }", Seq(r("s" -> ":a")))

  evalCase("fn: integer division stays exact via decimal",
    ":a :v 5 .",
    "SELECT ?s { ?s :v ?v FILTER(?v / 2 = 2.5) }", Seq(r("s" -> ":a")))

  // ==========================================================================
  // conditional / constructor builtins
  // ==========================================================================

  evalCase("fn: IF selects by condition", ":a :v 1 . :b :v 2 .",
    "SELECT ?s (IF(?v = 1, \"one\", \"other\") AS ?t) { ?s :v ?v }",
    Seq(r("s" -> ":a", "t" -> "\"one\""), r("s" -> ":b", "t" -> "\"other\"")))

  evalCase("fn: COALESCE first bound", ":a :p 1 . :b :q 2 .",
    "SELECT ?s (COALESCE(?x, ?y, \"none\") AS ?v) { { ?s :p ?x } UNION { ?s :q ?y } }",
    Seq(r("s" -> ":a", "v" -> "\"1\"^^xsd:integer"),
      r("s" -> ":b", "v" -> "\"2\"^^xsd:integer")))

  evalCase("fn: IRI constructor", ":a :s \"http://example/new\" .",
    "SELECT (IRI(?s) AS ?u) { :a :s ?s }", Seq(r("u" -> ":new")))

  evalCase("fn: STRDT builds typed literal", ":a :s \"123\" .",
    "SELECT ?s { :a :s ?v FILTER(STRDT(STR(?v), xsd:integer) = 123) BIND(:a AS ?s) }",
    Seq(r("s" -> ":a")))

  evalCase("fn: STRLANG builds tagged literal", ":a :s \"chat\" .",
    "SELECT (STRLANG(?v, \"fr\") AS ?o) { :a :s ?v }",
    Seq(r("o" -> "\"chat\"@fr")))

  evalCase("fn: xsd:integer cast of string", ":a :s \"42\" .",
    "SELECT ?s { ?s :s ?v FILTER(xsd:integer(?v) = 42) }", Seq(r("s" -> ":a")))

  evalCase("fn: xsd:boolean cast", ":a :s \"true\" .",
    "SELECT ?s { ?s :s ?v FILTER(xsd:boolean(?v)) }", Seq(r("s" -> ":a")))

  // ==========================================================================
  // BIND and expression projection
  // ==========================================================================

  evalCase("bind: introduces a new binding", ":a :v 2 .",
    "SELECT ?s ?w { ?s :v ?v BIND(?v * 10 AS ?w) }",
    Seq(r("s" -> ":a", "w" -> "\"20\"^^xsd:integer")))

  evalCase("bind: error leaves var unbound, row survives", ":a :v \"x\" .",
    "SELECT ?s ?w { ?s :v ?v BIND(?v + 1 AS ?w) }",
    Seq(r("s" -> ":a")))

  evalCase("select expr: arithmetic projection", ":a :v 3 .",
    "SELECT (?v + 1 AS ?w) { ?s :v ?v }",
    Seq(r("w" -> "\"4\"^^xsd:integer")))

  // ==========================================================================
  // negation: MINUS vs NOT EXISTS (data-sparql11/negation)
  // ==========================================================================

  private val NEG =
    """:a :p 1 . :a :q 2 .
      |:b :p 3 .""".stripMargin

  evalCase("negation: FILTER NOT EXISTS", NEG,
    "SELECT ?s { ?s :p ?v FILTER NOT EXISTS { ?s :q ?w } }",
    Seq(r("s" -> ":b")))

  evalCase("negation: FILTER EXISTS", NEG,
    "SELECT ?s { ?s :p ?v FILTER EXISTS { ?s :q ?w } }",
    Seq(r("s" -> ":a")))

  evalCase("negation: MINUS removes compatible", NEG,
    "SELECT ?s { ?s :p ?v MINUS { ?s :q ?w } }",
    Seq(r("s" -> ":b")))

  evalCase("negation: MINUS with disjoint domains removes nothing (spec §8.3.3)",
    ":a :p 1 .",
    "SELECT ?s { ?s :p ?v MINUS { ?x :q ?y } }",
    Seq(r("s" -> ":a")))

  evalCase("negation: NOT EXISTS with disjoint pattern still correlates via evaluation",
    ":a :p 1 . :x :q 2 .",
    "SELECT ?s { ?s :p ?v FILTER NOT EXISTS { ?x :q ?y } }",
    Seq.empty)

  evalCase("negation: MINUS full-minuend (subtract-whole)",
    ":a :p :b . :a :q :b .",
    "SELECT ?s ?o { ?s :p ?o MINUS { ?s :q ?o } }",
    Seq.empty)

  // ==========================================================================
  // aggregates (data-sparql11/aggregates)
  // ==========================================================================

  private val AGG =
    """:x :p 1 . :x :p 2 . :x :p 3 .
      |:y :p 4 . :y :p 5 .""".stripMargin

  evalCase("agg: COUNT(*) grouped", AGG,
    "SELECT ?s (COUNT(*) AS ?n) { ?s :p ?v } GROUP BY ?s",
    Seq(r("s" -> ":x", "n" -> "3"), r("s" -> ":y", "n" -> "2")))

  evalCase("agg: COUNT(?v) skips unbound", ":x :p 1 . :x :r 9 . :y :p 2 .",
    "SELECT ?s (COUNT(?w) AS ?n) { ?s :p ?v OPTIONAL { ?s :r ?w } } GROUP BY ?s",
    Seq(r("s" -> ":x", "n" -> "1"), r("s" -> ":y", "n" -> "0")))

  evalCase("agg: SUM / AVG / MIN / MAX", AGG,
    "SELECT ?s (SUM(?v) AS ?sum) (AVG(?v) AS ?avg) (MIN(?v) AS ?min) (MAX(?v) AS ?max) { ?s :p ?v } GROUP BY ?s",
    Seq(r("s" -> ":x", "sum" -> "6", "avg" -> "2",
        "min" -> "\"1\"^^xsd:integer", "max" -> "\"3\"^^xsd:integer"),
      r("s" -> ":y", "sum" -> "9", "avg" -> "4.5",
        "min" -> "\"4\"^^xsd:integer", "max" -> "\"5\"^^xsd:integer")))

  evalCase("agg: COUNT DISTINCT", ":x :p 1 . :x :p 1 . :x :p 2 .",
    "SELECT (COUNT(DISTINCT ?v) AS ?n) { ?s :p ?v }",
    Seq(r("n" -> "2")))

  evalCase("agg: implicit single group over whole pattern", AGG,
    "SELECT (COUNT(*) AS ?n) { ?s :p ?v }", Seq(r("n" -> "5")))

  evalCase("agg: empty pattern COUNT is one row of zero", AGG,
    "SELECT (COUNT(*) AS ?n) { ?s :nope ?v }", Seq(r("n" -> "0")))

  evalCase("agg: HAVING filters groups", AGG,
    "SELECT ?s { ?s :p ?v } GROUP BY ?s HAVING (COUNT(*) > 2)",
    Seq(r("s" -> ":x")))

  evalCase("agg: GROUP_CONCAT with separator", ":x :p \"a\" . :x :p \"b\" .",
    "SELECT (GROUP_CONCAT(?v ; separator=\"|\") AS ?c) { ?s :p ?v }",
    Seq(r("c" -> "a|b"))) // top-level aggregates return raw values

  evalCase("agg: SAMPLE returns one of the values", ":x :p \"only\" .",
    "SELECT (SAMPLE(?v) AS ?c) { ?s :p ?v }",
    Seq(r("c" -> "only"))) // top-level aggregates return raw values

  evalCase("agg: GROUP BY expression", ":a :v 1 . :b :v 2 . :c :v 3 .",
    "SELECT ?even (COUNT(*) AS ?n) { ?s :v ?v BIND((?v = 2) AS ?even) } GROUP BY ?even",
    Seq(r("even" -> "\"true\"^^xsd:boolean", "n" -> "1"),
      r("even" -> "\"false\"^^xsd:boolean", "n" -> "2")))

  // ==========================================================================
  // ORDER BY / LIMIT / OFFSET (data-r2/sort, solution-seq)
  // ==========================================================================

  private val SORT = ":a :v 2 . :b :v 1 . :c :v 3 ."

  evalCase("sort: ascending by value", SORT,
    "SELECT ?s { ?s :v ?v } ORDER BY ?v",
    Seq(r("s" -> ":b"), r("s" -> ":a"), r("s" -> ":c")), ordered = true)

  evalCase("sort: DESC", SORT,
    "SELECT ?s { ?s :v ?v } ORDER BY DESC(?v)",
    Seq(r("s" -> ":c"), r("s" -> ":a"), r("s" -> ":b")), ordered = true)

  evalCase("sort: by expression", SORT,
    "SELECT ?s { ?s :v ?v } ORDER BY (0 - ?v)",
    Seq(r("s" -> ":c"), r("s" -> ":a"), r("s" -> ":b")), ordered = true)

  evalCase("sort: LIMIT", SORT,
    "SELECT ?s { ?s :v ?v } ORDER BY ?v LIMIT 2",
    Seq(r("s" -> ":b"), r("s" -> ":a")), ordered = true)

  evalCase("sort: OFFSET + LIMIT", SORT,
    "SELECT ?s { ?s :v ?v } ORDER BY ?v OFFSET 1 LIMIT 1",
    Seq(r("s" -> ":a")), ordered = true)

  evalCase("sort: unbound sorts first (spec ordering)",
    ":a :v 1 . :b :w 9 . :b :v 2 .",
    "SELECT ?s ?w { ?s :v ?v OPTIONAL { ?s :w ?w } } ORDER BY ?w ?v",
    Seq(r("s" -> ":a"), r("s" -> ":b", "w" -> "\"9\"^^xsd:integer")), ordered = true)

  // ==========================================================================
  // VALUES (data-sparql11/bindings)
  // ==========================================================================

  evalCase("values: inline single var", ":a :v 1 . :b :v 2 .",
    "SELECT ?s { ?s :v ?v VALUES ?s { :a } }", Seq(r("s" -> ":a")))

  evalCase("values: two vars with UNDEF wildcard", ":a :v 1 . :b :v 2 .",
    "SELECT ?s ?v { ?s :v ?v VALUES (?s ?v) { (:a 1) (:b UNDEF) } }",
    Seq(r("s" -> ":a", "v" -> "\"1\"^^xsd:integer"),
      r("s" -> ":b", "v" -> "\"2\"^^xsd:integer")))

  evalCase("values: trailing VALUES block (post-query)", ":a :v 1 . :b :v 2 .",
    "SELECT ?s { ?s :v ?v } VALUES ?s { :b }", Seq(r("s" -> ":b")))

  // ==========================================================================
  // subqueries (data-sparql11/subquery)
  // ==========================================================================

  evalCase("subquery: inner aggregate joins outer",
    """:x :p 1 . :x :p 2 . :y :p 5 .
      |:x :name "X" . :y :name "Y" .""".stripMargin,
    """SELECT ?n ?mx { ?s :name ?n { SELECT ?s (MAX(?v) AS ?mx) { ?s :p ?v } GROUP BY ?s } }""",
    Seq(r("n" -> "\"X\"", "mx" -> "\"2\"^^xsd:integer"),
      r("n" -> "\"Y\"", "mx" -> "\"5\"^^xsd:integer")))

  evalCase("subquery: projection restricts visible vars",
    ":a :p :b . :b :q :c .",
    "SELECT ?z { { SELECT ?y { ?x :p ?y } } ?y :q ?z }",
    Seq(r("z" -> ":c")))

  // ==========================================================================
  // property paths (data-sparql11/property-path)
  // ==========================================================================

  private val PATH = ":a :p :b . :b :p :c . :c :p :d ."

  evalCase("path: sequence", PATH,
    "SELECT ?x { :a :p/:p ?x }", Seq(r("x" -> ":c")))

  evalCase("path: inverse", PATH,
    "SELECT ?x { :b ^:p ?x }", Seq(r("x" -> ":a")))

  evalCase("path: alternative", ":a :p 1 . :a :q 2 .",
    "SELECT ?v { :a :p|:q ?v }",
    Seq(r("v" -> "\"1\"^^xsd:integer"), r("v" -> "\"2\"^^xsd:integer")))

  evalCase("path: one-or-more", PATH,
    "SELECT ?x { :a :p+ ?x }",
    Seq(r("x" -> ":b"), r("x" -> ":c"), r("x" -> ":d")))

  evalCase("path: zero-or-more includes the start node", PATH,
    "SELECT ?x { :a :p* ?x }",
    Seq(r("x" -> ":a"), r("x" -> ":b"), r("x" -> ":c"), r("x" -> ":d")))

  evalCase("path: zero-or-one", PATH,
    "SELECT ?x { :a :p? ?x }", Seq(r("x" -> ":a"), r("x" -> ":b")))

  evalCase("path: cycle terminates and yields distinct nodes",
    ":a :p :b . :b :p :a .",
    "SELECT ?x { :a :p+ ?x }", Seq(r("x" -> ":a"), r("x" -> ":b")))

  evalCase("path: negated property set", ":a :p 1 . :a :q 2 .",
    "SELECT ?v { :a !:p ?v }", Seq(r("v" -> "\"2\"^^xsd:integer")))

  evalCase("path: negated set with inverse", ":a :p :b . :c :q :a .",
    "SELECT ?x { :a !(:nope|^:q) ?x }", Seq(r("x" -> ":b")))

  evalCase("path: sequence with inverse step", ":a :p :b . :c :q :b .",
    "SELECT ?x { :a :p/^:q ?x }", Seq(r("x" -> ":c")))

  evalCase("path: fixed repetition {2}", PATH,
    "SELECT ?x { :a :p{2} ?x }", Seq(r("x" -> ":c")))

  evalCase("path: bounded repetition {1,2}", PATH,
    "SELECT ?x { :a :p{1,2} ?x }", Seq(r("x" -> ":b"), r("x" -> ":c")))

  evalCase("path: var-to-var zero-or-more over all nodes",
    ":a :p :b .",
    "SELECT ?x ?y { ?x :p* ?y }",
    Seq(r("x" -> ":a", "y" -> ":a"), r("x" -> ":b", "y" -> ":b"),
      r("x" -> ":a", "y" -> ":b")))

  // ==========================================================================
  // GRAPH / dataset clauses (data-r2/graph, dataset)
  // ==========================================================================

  test("graph: GRAPH ?g binds graph name") {
    val df = dataset(":a :p 1 .", "http://example/g1" -> ":b :q 2 .")
    checkRows(Sparql.execute(df, QPRELUDE + "SELECT ?g ?s { GRAPH ?g { ?s ?p ?o } }"),
      Seq(r("g" -> ":g1", "s" -> ":b")))
  }

  test("graph: GRAPH <g> scopes to that graph") {
    val df = dataset(":a :p 1 .",
      "http://example/g1" -> ":b :q 2 .", "http://example/g2" -> ":c :q 3 .")
    checkRows(Sparql.execute(df, QPRELUDE + "SELECT ?s { GRAPH :g1 { ?s ?p ?o } }"),
      Seq(r("s" -> ":b")))
  }

  test("graph: default graph excludes named graphs") {
    val df = dataset(":a :p 1 .", "http://example/g1" -> ":b :q 2 .")
    checkRows(Sparql.execute(df, QPRELUDE + "SELECT ?s { ?s ?p ?o }"),
      Seq(r("s" -> ":a")))
  }

  test("dataset: FROM merges into default graph") {
    val df = dataset(":a :p 1 .", "http://example/g1" -> ":b :q 2 .")
    checkRows(Sparql.execute(df,
      QPRELUDE + "SELECT ?s FROM :g1 { ?s ?p ?o }"),
      Seq(r("s" -> ":b")))
  }

  test("dataset: FROM NAMED restricts GRAPH visibility") {
    val df = dataset(":a :p 1 .",
      "http://example/g1" -> ":b :q 2 .", "http://example/g2" -> ":c :q 3 .")
    checkRows(Sparql.execute(df,
      QPRELUDE + "SELECT ?s FROM NAMED :g2 { GRAPH ?g { ?s ?p ?o } }"),
      Seq(r("s" -> ":c")))
  }

  // --- full group patterns inside GRAPH (§18.2.5.1 per-graph eval) --------

  test("graph: OPTIONAL inside constant GRAPH extends within that graph only") {
    val df = dataset("",
      "http://example/g1" -> ":a :p :o1 . :a :q :x . :b :p :o2 .",
      "http://example/g2" -> ":a :q :y .")
    checkRows(Sparql.execute(df, QPRELUDE +
      "SELECT ?s ?v { GRAPH :g1 { ?s :p ?o OPTIONAL { ?s :q ?v } } }"),
      Seq(r("s" -> ":a", "v" -> ":x"), r("s" -> ":b")))
  }

  test("graph: OPTIONAL inside GRAPH ?g evaluates per graph") {
    val df = dataset("",
      "http://example/g1" -> ":a :p :o1 . :a :q :x .",
      "http://example/g2" -> ":a :p :o2 .")
    checkRows(Sparql.execute(df, QPRELUDE +
      "SELECT ?g ?v { GRAPH ?g { ?s :p ?o OPTIONAL { ?s :q ?v } } }"),
      Seq(r("g" -> ":g1", "v" -> ":x"), r("g" -> ":g2")))
  }

  test("graph: leading OPTIONAL under GRAPH ?g still binds ?g on bare rows") {
    // §18.2.5.1: the group evaluates once per named graph, so the
    // graph with no :q match contributes the bare row {g → g2}
    val df = dataset("",
      "http://example/g1" -> ":a :q :x .",
      "http://example/g2" -> ":b :r :y .")
    checkRows(Sparql.execute(df, QPRELUDE +
      "SELECT ?g ?v { GRAPH ?g { OPTIONAL { ?s :q ?v } } }"),
      Seq(r("g" -> ":g1", "v" -> ":x"), r("g" -> ":g2")))
  }

  test("graph: FILTER inside a GRAPH group scopes to that group") {
    // ?x is bound OUTSIDE the GRAPH group; §17.2 scope makes the inner
    // comparison an error for every row, emptying the group — a
    // hoisted filter would wrongly see ?x and pass
    val df = dataset(":d :num :x .", "http://example/g1" -> ":a :p :o1 .")
    checkRows(Sparql.execute(df, QPRELUDE +
      "SELECT ?s { :d :num ?x GRAPH :g1 { ?s :p ?o FILTER(?x = :x) } }"),
      Seq.empty)
    // control: the same filter over an inner-bound variable works
    checkRows(Sparql.execute(df, QPRELUDE +
      "SELECT ?s { GRAPH :g1 { ?s :p ?o FILTER(?o = :o1) } }"),
      Seq(r("s" -> ":a")))
  }

  test("graph: UNION inside GRAPH ?g binds the graph per branch") {
    val df = dataset("",
      "http://example/g1" -> ":a :p :x .",
      "http://example/g2" -> ":b :q :y .")
    checkRows(Sparql.execute(df, QPRELUDE +
      "SELECT ?g ?s { GRAPH ?g { { ?s :p ?o } UNION { ?s :q ?o } } }"),
      Seq(r("g" -> ":g1", "s" -> ":a"), r("g" -> ":g2", "s" -> ":b")))
  }

  test("graph: BIND inside GRAPH ?g sees the graph binding") {
    val df = dataset("", "http://example/g1" -> ":a :p :x .")
    checkRows(Sparql.execute(df, QPRELUDE +
      "SELECT ?w { GRAPH ?g { ?s :p ?o BIND(?g AS ?w) } }"),
      Seq(r("w" -> ":g1")))
  }

  test("graph: VALUES inside GRAPH ?g joins every named graph") {
    // eval(VALUES, gi) is the same rows for every graph, then each is
    // joined with {g → gi} — so the data crosses the graph names
    val df = dataset("",
      "http://example/g1" -> ":a :p :x .",
      "http://example/g2" -> ":b :q :y .")
    checkRows(Sparql.execute(df, QPRELUDE +
      "SELECT ?g ?v { GRAPH ?g { VALUES ?v { :k } } }"),
      Seq(r("g" -> ":g1", "v" -> ":k"), r("g" -> ":g2", "v" -> ":k")))
  }

  test("graph: nested GRAPH resets the active graph") {
    // eval(Graph(:g2, P), gi) ignores gi, so the outer ?g crosses
    // every named graph name
    val df = dataset("",
      "http://example/g1" -> ":a :p :x .",
      "http://example/g2" -> ":b :q :y .")
    checkRows(Sparql.execute(df, QPRELUDE +
      "SELECT ?g ?s { GRAPH ?g { GRAPH :g2 { ?s ?p ?o } } }"),
      Seq(r("g" -> ":g1", "s" -> ":b"), r("g" -> ":g2", "s" -> ":b")))
  }

  test("graph: MINUS inside a constant GRAPH subtracts within that graph") {
    val df = dataset("",
      "http://example/g1" -> ":a :p :x . :b :p :y . :a :q :z .",
      "http://example/g2" -> ":b :q :w .")
    checkRows(Sparql.execute(df, QPRELUDE +
      "SELECT ?s { GRAPH :g1 { ?s :p ?o MINUS { ?s :q ?z2 } } }"),
      Seq(r("s" -> ":b")))
  }

  test("graph: sub-SELECT inside a constant GRAPH aggregates that graph only") {
    val df = dataset("",
      "http://example/g1" -> ":a :p :x . :a :p :y . :b :p :z .",
      "http://example/g2" -> ":a :p :w .")
    checkRows(Sparql.execute(df, QPRELUDE +
      "SELECT ?s ?c { GRAPH :g1 { { SELECT ?s (COUNT(*) AS ?c) WHERE { ?s :p ?o } GROUP BY ?s } } }"),
      Seq(r("s" -> ":a", "c" -> "\"2\"^^xsd:integer"),
        r("s" -> ":b", "c" -> "\"1\"^^xsd:integer")))
  }

  test("graph: FILTER NOT EXISTS inside GRAPH ?g probes the same graph") {
    val df = dataset("",
      "http://example/g1" -> ":a :p :x . :a :q :x . :b :p :y .",
      "http://example/g2" -> ":c :p :z .")
    checkRows(Sparql.execute(df, QPRELUDE +
      "SELECT ?g ?s { GRAPH ?g { ?s :p ?o FILTER NOT EXISTS { ?s :q ?o2 } } }"),
      Seq(r("g" -> ":g1", "s" -> ":b"), r("g" -> ":g2", "s" -> ":c")))
  }

  test("graph: MINUS inside GRAPH ?g subtracts within each graph only") {
    val df = dataset("",
      "http://example/g1" -> ":a :p :x . :b :p :y . :a :q :z .",
      "http://example/g2" -> ":a :p :w . :b :q :v .")
    // :a has a same-graph :q only in g1; :b only in g2
    checkRows(Sparql.execute(df, QPRELUDE +
      "SELECT ?g ?s { GRAPH ?g { ?s :p ?o MINUS { ?s :q ?z2 } } }"),
      Seq(r("g" -> ":g1", "s" -> ":b"), r("g" -> ":g2", "s" -> ":a")))
  }

  test("graph: domain-disjoint MINUS inside GRAPH ?g removes nothing") {
    // §18.5: the sides share no variable (the graph binding does not
    // count — it is added by the GRAPH evaluation, not the patterns),
    // so nothing subtracts even though :x :r :y exists in g1
    val df = dataset("",
      "http://example/g1" -> ":a :p :x . :x :r :y .")
    checkRows(Sparql.execute(df, QPRELUDE +
      "SELECT ?g ?s { GRAPH ?g { ?s :p ?o MINUS { ?x2 :r ?y2 } } }"),
      Seq(r("g" -> ":g1", "s" -> ":a")))
  }

  test("graph: EXISTS embedded in a FILTER expression scopes to the active graph") {
    // :a has a :q in g1 only; :b has one in g2 only — the embedded
    // EXISTS probes the row's own graph, and the || arm rescues :c
    val df = dataset("",
      "http://example/g1" -> ":a :p :x . :a :q :z . :b :p :y . :c :p :k .",
      "http://example/g2" -> ":b :q :w .")
    checkRows(Sparql.execute(df, QPRELUDE +
      "SELECT ?g ?s { GRAPH ?g { ?s :p ?o FILTER(EXISTS { ?s :q ?o2 } || ?o = :k) } }"),
      Seq(r("g" -> ":g1", "s" -> ":a"), r("g" -> ":g1", "s" -> ":c")))
    checkRows(Sparql.execute(df, QPRELUDE +
      "SELECT ?s { GRAPH :g1 { ?s :p ?o FILTER(!(EXISTS { ?s :q ?o2 })) } }"),
      Seq(r("s" -> ":b"), r("s" -> ":c")))
  }

  test("graph: sub-SELECT inside GRAPH ?g evaluates per graph") {
    val df = dataset("",
      "http://example/g1" -> ":a :p :x . :a :p :y . :b :p :z .",
      "http://example/g2" -> ":a :p :w .")
    checkRows(Sparql.execute(df, QPRELUDE +
      "SELECT ?g ?s { GRAPH ?g { { SELECT DISTINCT ?s WHERE { ?s :p ?o } } } }"),
      Seq(r("g" -> ":g1", "s" -> ":a"), r("g" -> ":g1", "s" -> ":b"),
        r("g" -> ":g2", "s" -> ":a")))
    checkRows(Sparql.execute(df, QPRELUDE +
      "SELECT ?g ?s ?c { GRAPH ?g { { SELECT ?s (COUNT(*) AS ?c) WHERE { ?s :p ?o } GROUP BY ?s } } }"),
      Seq(r("g" -> ":g1", "s" -> ":a", "c" -> "\"2\"^^xsd:integer"),
        r("g" -> ":g1", "s" -> ":b", "c" -> "\"1\"^^xsd:integer"),
        r("g" -> ":g2", "s" -> ":a", "c" -> "\"1\"^^xsd:integer")))
  }

  test("graph: unsupported GRAPH group shapes are clean errors") {
    val df = dataset("", "http://example/g1" -> ":a :p :x .")
    Seq(
      // ungrouped aggregate head: §18.2.4 gives EVERY graph a row
      // (count 0 for a no-match graph) — grouping on ?g cannot
      "SELECT * { GRAPH ?g { { SELECT (COUNT(*) AS ?c) WHERE { ?s :p ?o } } } }",
      // a per-graph slice is not one global slice
      "SELECT * { GRAPH ?g { { SELECT ?s WHERE { ?s :p ?o } LIMIT 1 } } }",
      // the rewrite would capture the subquery's own ?g
      "SELECT * { GRAPH ?g { { SELECT ?g WHERE { ?g :p ?o } } } }")
      .foreach { q =>
        val thrown = intercept[Exception] {
          Sparql.execute(df, QPRELUDE + q).collect()
        }
        assert(thrown.isInstanceOf[graft.rdf.RdfParseException],
          s"expected RdfParseException for [$q], got $thrown")
      }
  }

  // ==========================================================================
  // ASK / CONSTRUCT forms
  // ==========================================================================

  askCase("ask: true on match", ":a :p 1 .", "ASK { :a :p ?v }", expected = true)
  askCase("ask: false on no match", ":a :p 1 .", "ASK { :a :q ?v }", expected = false)
  askCase("ask: with filter", ":a :p 5 .", "ASK { :a :p ?v FILTER(?v > 4) }", expected = true)

  graphCase("construct: template instantiation per solution",
    ":a :p 1 . :b :p 2 .",
    "CONSTRUCT { ?s :copied ?v } WHERE { ?s :p ?v }",
    Seq(":a :copied \"1\"^^xsd:integer", ":b :copied \"2\"^^xsd:integer"))

  graphCase("construct: constructed graph is a set (dedup)",
    ":a :p 1 . :a :q 1 .",
    "CONSTRUCT { ?s :one 1 } WHERE { { ?s :p 1 } UNION { ?s :q 1 } }",
    Seq(":a :one \"1\"^^xsd:integer"))

  graphCase("construct: unbound template slot skips the triple",
    ":a :p 1 . :b :p 2 . :a :q 9 .",
    "CONSTRUCT { ?s :w ?w } WHERE { ?s :p ?v OPTIONAL { ?s :q ?w } }",
    Seq(":a :w \"9\"^^xsd:integer"))

  graphCase("construct: CONSTRUCT WHERE shorthand",
    ":a :p 1 .",
    "CONSTRUCT WHERE { ?s :p ?v }",
    Seq(":a :p \"1\"^^xsd:integer"))

  graphCase("construct: §16.2 ill-formed literal subject skips the solution",
    ":a :p \"lit\" . :a :p :b .",
    "CONSTRUCT { ?o :inv ?s } WHERE { ?s :p ?o }",
    Seq(":b :inv :a"))

  graphCase("construct: §16.2 ill-formed non-IRI predicate skips the solution",
    ":a :p \"lit\" . :a :p :b .",
    "CONSTRUCT { ?s ?o :tag } WHERE { ?s :p ?o }",
    Seq(":a :b :tag"))

  // ==========================================================================
  // date/time accessors (data-sparql11/functions on xsd:dateTime)
  // ==========================================================================

  private val DT = ":e :when \"2011-01-10T14:45:13.815-05:00\"^^xsd:dateTime ."

  evalCase("fn: YEAR / MONTH / DAY", DT,
    "SELECT ?s { ?s :when ?t FILTER(YEAR(?t) = 2011 && MONTH(?t) = 1 && DAY(?t) = 10) }",
    Seq(r("s" -> ":e")))

  evalCase("fn: HOURS / MINUTES keep the lexical timezone", DT,
    "SELECT ?s { ?s :when ?t FILTER(HOURS(?t) = 14 && MINUTES(?t) = 45) }",
    Seq(r("s" -> ":e")))

  evalCase("fn: TZ returns the literal's zone string", DT,
    "SELECT (TZ(?t) AS ?z) { ?s :when ?t }",
    Seq(r("z" -> "\"-05:00\"")))

  // ==========================================================================
  // hash functions (data-sparql11/functions md5-01, sha1-01, sha256-01)
  // ==========================================================================

  evalCase("fn: MD5 of \"abc\"", ":a :s \"abc\" .",
    "SELECT (MD5(?v) AS ?h) { :a :s ?v }",
    Seq(r("h" -> "\"900150983cd24fb0d6963f7d28e17f72\"")))

  evalCase("fn: SHA1 of \"abc\"", ":a :s \"abc\" .",
    "SELECT (SHA1(?v) AS ?h) { :a :s ?v }",
    Seq(r("h" -> "\"a9993e364706816aba3e25717850c26c9cd0d89d\"")))

  evalCase("fn: SHA256 of \"abc\"", ":a :s \"abc\" .",
    "SELECT (SHA256(?v) AS ?h) { :a :s ?v }",
    Seq(r("h" -> "\"ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad\"")))

  // ==========================================================================
  // string functions: lang-tag propagation rules (§17.4.3)
  // ==========================================================================

  evalCase("fn: UCASE preserves the language tag",
    ":a :s \"foo\"@en .",
    "SELECT (UCASE(?v) AS ?u) { :a :s ?v }",
    Seq(r("u" -> "\"FOO\"@en")))

  evalCase("fn: SUBSTR preserves the language tag",
    ":a :s \"hello\"@fr .",
    "SELECT (SUBSTR(?v, 2, 3) AS ?u) { :a :s ?v }",
    Seq(r("u" -> "\"ell\"@fr")))

  evalCase("fn: CONCAT of same-tagged literals keeps the tag",
    ":a :x \"ab\"@en . :a :y \"cd\"@en .",
    "SELECT (CONCAT(?x, ?y) AS ?u) { :a :x ?x . :a :y ?y }",
    Seq(r("u" -> "\"abcd\"@en")))

  evalCase("fn: CONCAT of mixed tags drops to simple literal",
    ":a :x \"ab\"@en . :a :y \"cd\"@fr .",
    "SELECT (CONCAT(?x, ?y) AS ?u) { :a :x ?x . :a :y ?y }",
    Seq(r("u" -> "\"abcd\"")))

  evalCase("fn: REPLACE with capture group reference",
    ":a :s \"abcd\" .",
    "SELECT (REPLACE(?v, \"(b)c\", \"$1X\") AS ?u) { :a :s ?v }",
    Seq(r("u" -> "\"abXd\"")))

  evalCase("fn: STRAFTER with lang-tagged arguments keeps the tag",
    ":a :s \"abc\"@en .",
    "SELECT (STRAFTER(?v, \"a\") AS ?u) { :a :s ?v }",
    Seq(r("u" -> "\"bc\"@en")))

  // ==========================================================================
  // algebra scoping edge cases (data-r2/algebra)
  // ==========================================================================

  evalCase("algebra: filter sees whole group regardless of position",
    ":a :p 1 . :a :q 2 .",
    "SELECT ?s { ?s :p ?v FILTER(?w = 2) ?s :q ?w }",
    Seq(r("s" -> ":a")))

  evalCase("algebra: nested group braces keep filter scope local (opt-filter-2 shape)",
    """:x1 :p 1 . :x1 :q 5 .
      |:x2 :p 2 . :x2 :q 20 .""".stripMargin,
    "SELECT ?x { { ?x :p ?v } { ?x :q ?w FILTER(?w > 10) } }",
    Seq(r("x" -> ":x2")))

  evalCase("algebra: BIND is scoped to the preceding group part",
    ":a :p 1 . :a :q 9 .",
    "SELECT ?s ?b { ?s :p ?v BIND(?v + 1 AS ?b) ?s :q ?w }",
    Seq(r("s" -> ":a", "b" -> "\"2\"^^xsd:integer")))

  evalCase("algebra: join of two unions",
    ":a :p 1 . :a :q 2 .",
    "SELECT ?s { { { ?s :p ?o1 } UNION { ?s :r ?o1 } } { { ?s :q ?o2 } UNION { ?s :r ?o2 } } }",
    Seq(r("s" -> ":a")))

  evalCase("algebra: empty group pattern yields the unit solution",
    ":a :p 1 .",
    "SELECT (1 + 1 AS ?x) { }",
    Seq(r("x" -> "\"2\"^^xsd:integer")))

  evalCase("algebra: OPTIONAL against empty left is empty",
    ":a :p 1 .",
    "SELECT ?s ?w { ?s :nope ?v OPTIONAL { ?s :p ?w } }",
    Seq.empty)

  // ==========================================================================
  // ORDER BY across term kinds (§15.1 total order extension)
  // ==========================================================================

  evalCase("sort: unbound < blank < IRI < literal kinds",
    ":iri :v :obj . :lit :v \"x\" . :bn :v _:b .",
    "SELECT ?s { ?s :v ?o } ORDER BY ?o ?s",
    Seq(r("s" -> ":bn"), r("s" -> ":iri"), r("s" -> ":lit")), ordered = true)

  evalCase("sort: string literals by codepoint",
    ":a :v \"b\" . :b :v \"a\" . :c :v \"c\" .",
    "SELECT ?s { ?s :v ?o } ORDER BY ?o",
    Seq(r("s" -> ":b"), r("s" -> ":a"), r("s" -> ":c")), ordered = true)

  evalCase("sort: multiple keys with mixed direction",
    ":a :g 1 . :a :v 1 . :b :g 1 . :b :v 2 . :c :g 2 . :c :v 3 .",
    "SELECT ?s { ?s :g ?g . ?s :v ?v } ORDER BY ?g DESC(?v)",
    Seq(r("s" -> ":b"), r("s" -> ":a"), r("s" -> ":c")), ordered = true)

  // ==========================================================================
  // more negation: NOT EXISTS inside OPTIONAL, MINUS chains
  // ==========================================================================

  evalCase("negation: NOT EXISTS referencing optional-bound var",
    ":a :p 1 . :a :q 1 . :b :p 2 .",
    "SELECT ?s { ?s :p ?v FILTER NOT EXISTS { ?s :q ?v } }",
    Seq(r("s" -> ":b")))

  evalCase("negation: EXISTS sees outer bindings (correlation)",
    ":a :p 1 . :a :q 1 . :b :p 2 . :b :q 3 .",
    "SELECT ?s { ?s :p ?v FILTER EXISTS { ?s :q ?v } }",
    Seq(r("s" -> ":a")))

  evalCase("negation: MINUS then MINUS chains",
    ":a :p 1 . :b :p 2 . :c :p 3 . :a :x 0 . :b :y 0 .",
    "SELECT ?s { ?s :p ?v MINUS { ?s :x ?o } MINUS { ?s :y ?o } }",
    Seq(r("s" -> ":c")))

  evalCase("negation: NOT EXISTS with path inside",
    ":a :p :b . :b :p :c . :z :q 1 .",
    "SELECT ?s { ?s :q 1 FILTER NOT EXISTS { :a :p+ ?s } }",
    Seq(r("s" -> ":z")))

  // ==========================================================================
  // paths in graphs / further path shapes
  // ==========================================================================

  test("path: path inside GRAPH block scopes to the graph") {
    val df = dataset(":a :p :b .",
      "http://example/g1" -> ":a :p :c . :c :p :d .")
    checkRows(Sparql.execute(df,
      QPRELUDE + "SELECT ?x { GRAPH :g1 { :a :p+ ?x } }"),
      Seq(r("x" -> ":c"), r("x" -> ":d")))
  }

  test("path: GRAPH ?var evaluates path per graph") {
    val df = dataset("",
      "http://example/g1" -> ":a :p :b .",
      "http://example/g2" -> ":b :p :c .")
    checkRows(Sparql.execute(df,
      QPRELUDE + "SELECT ?g ?x { GRAPH ?g { :a :p* ?x } }"),
      // per-graph closure: g1 reaches a,b; in g2 :a is not a node but
      // zero-length paths still match the constant subject itself
      Seq(r("g" -> ":g1", "x" -> ":a"), r("g" -> ":g1", "x" -> ":b"),
        r("g" -> ":g2", "x" -> ":a")))
  }

  evalCase("path: alternative under closure",
    ":a :p :b . :b :q :c .",
    "SELECT ?x { :a (:p|:q)+ ?x }",
    Seq(r("x" -> ":b"), r("x" -> ":c")))

  evalCase("path: grouped sequence with closure",
    ":a :p :m . :m :q :b . :b :p :n . :n :q :c .",
    "SELECT ?x { :a (:p/:q)+ ?x }",
    Seq(r("x" -> ":b"), r("x" -> ":c")))

  evalCase("path: inverse of a sequence",
    ":a :p :m . :m :q :b .",
    "SELECT ?x { :b ^(:p/:q) ?x }",
    Seq(r("x" -> ":a")))

  evalCase("path: object-to-subject direction with constant object",
    PATH,
    "SELECT ?x { ?x :p+ :d }",
    Seq(r("x" -> ":a"), r("x" -> ":b"), r("x" -> ":c")))

  // seeded (constant-endpoint) closure edges: both-constant, cycles,
  // zero-length on a term absent from the graph, dead-end seeds
  askCase("path: both endpoints constant, reachable", PATH,
    "ASK { :a :p+ :d }", expected = true)

  askCase("path: both endpoints constant, wrong direction", PATH,
    "ASK { :d :p+ :a }", expected = false)

  askCase("path: zero-or-more matches a term absent from the graph", PATH,
    "ASK { :nowhere :p* :nowhere }", expected = true)

  askCase("path: one-or-more from an absent seed is empty", PATH,
    "ASK { :nowhere :p+ ?x }", expected = false)

  evalCase("path: seeded closure over a cycle reaches the seed itself",
    ":a :p :b . :b :p :a .",
    "SELECT ?x { :a :p+ ?x }",
    Seq(r("x" -> ":a"), r("x" -> ":b")))

  evalCase("path: seeded star over a cycle stays distinct",
    ":a :p :b . :b :p :a .",
    "SELECT ?x { :a :p* ?x }",
    Seq(r("x" -> ":a"), r("x" -> ":b")))

  // ==========================================================================
  // aggregates: further cases
  // ==========================================================================

  evalCase("agg: MIN/MAX over strings use codepoint order",
    ":x :s \"b\" . :x :s \"a\" . :x :s \"c\" .",
    "SELECT (MIN(?v) AS ?lo) (MAX(?v) AS ?hi) { ?s :s ?v }",
    Seq(r("lo" -> "\"a\"", "hi" -> "\"c\"")))

  evalCase("agg: AVG of decimals stays exact",
    ":x :v 1.5 . :x :v 2.5 .",
    "SELECT (AVG(?v) AS ?a) { ?s :v ?v }",
    Seq(r("a" -> "2")))

  evalCase("agg: grouping key with unbound (optional) groups the gap",
    ":a :p 1 . :a :g :one . :b :p 2 .",
    "SELECT ?g (COUNT(*) AS ?n) { ?s :p ?v OPTIONAL { ?s :g ?g } } GROUP BY ?g",
    Seq(r("g" -> ":one", "n" -> "1"), r("n" -> "1")))

  evalCase("agg: HAVING over aggregate expression",
    AGG,
    "SELECT ?s { ?s :p ?v } GROUP BY ?s HAVING (SUM(?v) >= 9)",
    Seq(r("s" -> ":y")))

  evalCase("agg: aggregate inside projection expression",
    AGG,
    "SELECT (COUNT(*) * 2 AS ?n2) { ?s :p ?v }",
    Seq(r("n2" -> "\"10\"^^xsd:integer"))) // expression-embedded aggregates are term-typed

  // ==========================================================================
  // subqueries: further cases
  // ==========================================================================

  evalCase("subquery: LIMIT inside subquery bounds the inner bag",
    ":a :v 1 . :b :v 2 . :c :v 3 .",
    "SELECT (COUNT(*) AS ?n) { { SELECT ?s { ?s :v ?o } ORDER BY ?o LIMIT 2 } }",
    Seq(r("n" -> "2")))

  evalCase("subquery: DISTINCT inside",
    ":a :p 1 . :a :q 1 .",
    "SELECT (COUNT(*) AS ?n) { { SELECT DISTINCT ?s { { ?s :p ?x } UNION { ?s :q ?x } } } }",
    Seq(r("n" -> "1")))

  // ==========================================================================
  // VALUES: further cases
  // ==========================================================================

  evalCase("values: unmatched row contributes nothing",
    ":a :v 1 .",
    "SELECT ?s { ?s :v ?o VALUES ?s { :a :zzz } }",
    Seq(r("s" -> ":a")))

  evalCase("values: literal datatype must match the data term",
    ":a :v 1 . :b :v \"1\" .",
    "SELECT ?s { ?s :v ?o VALUES ?o { 1 } }",
    Seq(r("s" -> ":a")))

  // found by the differential fuzzer (seed 20260815, case 403): a
  // GROUP BY variable the pattern never binds yields one all-null
  // group key, which §18.3 makes compatible with EVERY trailing-VALUES
  // row — it must not join as a sure-bound (equality) key
  evalCase("values: trailing VALUES joins an unbound group key as compatible",
    ":s1 :p0 \"a\" .",
    """SELECT ?a (COUNT(?b) AS ?n) { :s1 :p0 ?b } GROUP BY ?a
      |VALUES ?a { "b" :s3 }""".stripMargin,
    Seq(r("a" -> "\"b\"", "n" -> "1"), r("a" -> ":s3", "n" -> "1")))

  // ==========================================================================
  // DESCRIBE smoke (form coverage; result is implementation-defined
  // but must include the resource's outgoing triples)
  // ==========================================================================

  test("describe: constant IRI returns its triples") {
    val got = run(":a :p 1 . :a :q 2 . :b :p 3 .", "DESCRIBE :a")
      .collect()
    assert(got.length == 2)
  }

  // ==========================================================================
  // IF/COALESCE error propagation
  // ==========================================================================

  evalCase("fn: IF with error condition drops binding",
    ":a :v \"str\" .",
    "SELECT ?s (IF(?v > 0, 1, 2) AS ?x) { ?s :v ?v }",
    Seq(r("s" -> ":a")))

  evalCase("fn: COALESCE over only errors is unbound",
    ":a :v \"x\" .",
    "SELECT ?s (COALESCE(?v + 1, ?unbound) AS ?c) { ?s :v ?v }",
    Seq(r("s" -> ":a")))

  evalCase("fn: BOUND on never-mentioned variable is false",
    ":a :p 1 .",
    "SELECT ?s { ?s :p ?v FILTER(!BOUND(?nope)) }",
    Seq(r("s" -> ":a")))

  // ==========================================================================
  // blank node labels in patterns (§4.1.4: non-distinguished variables)
  // and in CONSTRUCT templates (§16.2.1: fresh per solution)
  // ==========================================================================

  evalCase("bnode-pattern: label matches ANY term, not just blanks",
    ":x :q \"a\" . :y :q \"b\" .",
    "SELECT ?o { _:who :q ?o }",
    Seq(r("o" -> "\"a\""), r("o" -> "\"b\"")))

  evalCase("bnode-pattern: shared label joins like a variable",
    ":x :p :v1 . :x :q :v2 . :y :p :v1 .",
    "SELECT ?a ?b { _:n :p ?a . _:n :q ?b }",
    Seq(r("a" -> ":v1", "b" -> ":v2")))

  evalCase("bnode-pattern: label is not selectable (absent from *)",
    ":x :q \"a\" .",
    "SELECT * { _:who :q ?o }",
    Seq(r("o" -> "\"a\"")))

  test("construct: template blank is fresh per solution, co-referenced") {
    val got = run(":a :p 1 . :b :p 2 .",
      "CONSTRUCT { ?s :stmt _:v . _:v :val ?o } WHERE { ?s :p ?o }")
      .collect().toSeq
    assert(got.length == 4)
    def nt(row: org.apache.spark.sql.Row, i: Int): String = {
      val s = row.getStruct(i)
      Term(s.getString(0), s.getString(1), s.getString(2), s.getString(3)).toNT
    }
    val stmt = got.filter(r => nt(r, 2).contains("stmt"))
      .map(r => nt(r, 1) -> nt(r, 3)).toMap
    val vals = got.filter(r => nt(r, 2).contains("val"))
      .map(r => nt(r, 1) -> nt(r, 3)).toMap
    // two distinct blanks, each linking its subject to its value
    assert(stmt.values.toSet.size == 2)
    assert(vals(stmt("<http://example/a>")) ==
      "\"1\"^^<http://www.w3.org/2001/XMLSchema#integer>")
    assert(vals(stmt("<http://example/b>")) ==
      "\"2\"^^<http://www.w3.org/2001/XMLSchema#integer>")
  }

  // ==========================================================================
  // aggregates over empty groups (§18.5.1: Sum([])=0, Avg([])=0,
  // Min/Max([]) = error → unbound) and aggregate type errors
  // ==========================================================================

  evalCase("agg-empty: SUM of no solutions is 0",
    ":a :q 1 .",
    "SELECT (SUM(?v) AS ?s) { ?x :nope ?v }",
    Seq(r("s" -> "0")))

  evalCase("agg-empty: AVG of no solutions is 0",
    ":a :q 1 .",
    "SELECT (AVG(?v) AS ?s) { ?x :nope ?v }",
    Seq(r("s" -> "0")))

  evalCase("agg-empty: MAX of no solutions is unbound",
    ":a :q 1 .",
    "SELECT (MAX(?v) AS ?m) { ?x :nope ?v }",
    Seq(Map.empty[String, String]))

  evalCase("agg-error: SUM over a non-numeric value is an error → unbound",
    ":a :p 1 . :b :p \"oops\" .",
    "SELECT (SUM(?v) AS ?s) { ?x :p ?v }",
    Seq(Map.empty[String, String]))

  evalCase("agg-error: MAX over a group with an unbound value is an error",
    ":a :p 1 . :a :q 2 .",
    "SELECT (MAX(?v) AS ?m) { ?s :p ?x OPTIONAL { ?s :missing ?v } }",
    Seq(Map.empty[String, String]))

  evalCase("agg-error: MIN over a group with an unbound value is an error",
    ":a :p 1 .",
    "SELECT (MIN(?v) AS ?m) { ?s :p ?x OPTIONAL { ?s :missing ?v } }",
    Seq(Map.empty[String, String]))

  evalCase("agg-error: GROUP_CONCAT over an unbound value is an error",
    ":a :p \"x\" .",
    "SELECT (GROUP_CONCAT(?v) AS ?c) { ?s :p ?x OPTIONAL { ?s :missing ?v } }",
    Seq(Map.empty[String, String]))

  evalCase("agg-empty: GROUP_CONCAT of no solutions is the empty string",
    ":a :q 1 .",
    "SELECT (GROUP_CONCAT(?v) AS ?c) { ?x :nope ?v }",
    Seq(r("c" -> ""))) // fn:string-join of an empty sequence

  evalCase("agg: GROUP_CONCAT default separator is a single space",
    ":x :p \"a\" . :x :p \"b\" .",
    "SELECT (GROUP_CONCAT(?v) AS ?c) { ?s :p ?v } GROUP BY ?s",
    Seq(r("c" -> "a b"))) // raw top-level aggregate value

  evalCase("agg: GROUP_CONCAT(DISTINCT)",
    ":x :p \"a\" . :x :q \"a\" . :x :r \"b\" .",
    "SELECT (GROUP_CONCAT(DISTINCT ?v; SEPARATOR=\",\") AS ?c) { :x ?p ?v }",
    Seq(r("c" -> "a,b"))) // raw top-level aggregate value

  evalCase("agg: HAVING with implicit whole-pattern group",
    ":a :p 1 . :b :p 2 .",
    "SELECT (COUNT(*) AS ?n) { ?s :p ?v } HAVING (COUNT(*) > 1)",
    Seq(r("n" -> "2")))

  // ==========================================================================
  // three-valued logic and IN error semantics (§17.4.1.9 IN is
  // chained ||; TRUE || error = TRUE, FALSE && error = FALSE)
  // ==========================================================================

  evalCase("3vl: TRUE || error is TRUE",
    ":a :v 1 .",
    "SELECT ?s { ?s :v ?v FILTER(?v = 1 || ?v/0 = 1) }",
    Seq(r("s" -> ":a")))

  evalCase("3vl: FALSE && error is FALSE (row dropped, no crash)",
    ":a :v 1 .",
    "SELECT ?s { ?s :v ?v FILTER(?v = 2 && ?v/0 = 1) }",
    Seq.empty)

  evalCase("3vl: error || FALSE is error → dropped",
    ":a :v 1 .",
    "SELECT ?s { ?s :v ?v FILTER(?v/0 = 1 || ?v = 2) }",
    Seq.empty)

  evalCase("3vl: IN finds a match before the error operand",
    ":a :v 2 .",
    "SELECT ?s { ?s :v ?v FILTER(?v IN (1, 2, ?v/0)) }",
    Seq(r("s" -> ":a")))

  evalCase("3vl: IN with only an error operand is an error → dropped",
    ":a :v 3 .",
    "SELECT ?s { ?s :v ?v FILTER(?v IN (?v/0)) }",
    Seq.empty)

  evalCase("3vl: division by zero in BIND leaves var unbound",
    ":a :v 1 .",
    "SELECT ?s ?d { ?s :v ?v BIND(?v/0 AS ?d) }",
    Seq(r("s" -> ":a")))

  // ==========================================================================
  // numeric type promotion (§17.3 / XPath op:numeric-*): the RESULT
  // datatype, not just the value
  // ==========================================================================

  evalCase("promote: integer + integer stays integer",
    ":a :v 1 .",
    "SELECT ?dt { ?s :v ?v BIND(DATATYPE(?v + 1) AS ?dt) }",
    Seq(r("dt" -> "<http://www.w3.org/2001/XMLSchema#integer>")))

  evalCase("promote: integer / integer is decimal even when exact",
    ":a :v 4 .",
    "SELECT ?dt ?q { ?s :v ?v BIND(?v / 2 AS ?q) BIND(DATATYPE(?q) AS ?dt) }",
    Seq(r("dt" -> "<http://www.w3.org/2001/XMLSchema#decimal>",
      "q" -> "\"2\"^^xsd:decimal")))

  evalCase("promote: integer + decimal is decimal",
    ":a :v 1 .",
    "SELECT ?dt { ?s :v ?v BIND(DATATYPE(?v + 1.5) AS ?dt) }",
    Seq(r("dt" -> "<http://www.w3.org/2001/XMLSchema#decimal>")))

  evalCase("promote: integer + double is double",
    ":a :v 1 .",
    "SELECT ?dt { ?s :v ?v BIND(DATATYPE(?v + 1.0e0) AS ?dt) }",
    Seq(r("dt" -> "<http://www.w3.org/2001/XMLSchema#double>")))

  evalCase("promote: division value is exact decimal (1/2 = 0.5)",
    ":a :v 1 .",
    "SELECT ?q { ?s :v ?v BIND(?v / 2 AS ?q) }",
    Seq(r("q" -> "\"0.5\"^^xsd:decimal")))

  // ==========================================================================
  // language ranges and dateTime ordering
  // ==========================================================================

  evalCase("lang: LANGMATCHES range en matches en-US (prefix rule)",
    ":a :l \"color\"@en-US . :b :l \"couleur\"@fr .",
    "SELECT ?s { ?s :l ?v FILTER(LANGMATCHES(LANG(?v), \"en\")) }",
    Seq(r("s" -> ":a")))

  evalCase("lang: LANGMATCHES en does not match enx",
    ":a :l \"x\"@enx .",
    "SELECT ?s { ?s :l ?v FILTER(LANGMATCHES(LANG(?v), \"en\")) }",
    Seq.empty)

  evalCase("datetime: comparison within xsd:dateTime",
    """:a :t "2024-01-01T00:00:00Z"^^xsd:dateTime .
      |:b :t "2024-06-01T00:00:00Z"^^xsd:dateTime .""".stripMargin,
    "SELECT ?s { ?s :t ?v FILTER(?v < \"2024-03-01T00:00:00Z\"^^xsd:dateTime) }",
    Seq(r("s" -> ":a")))

  evalCase("datetime: equality across timezone representations",
    """:a :t "2024-01-01T12:00:00Z"^^xsd:dateTime .
      |:b :t "2024-01-01T14:00:00+02:00"^^xsd:dateTime .""".stripMargin,
    "SELECT ?s { ?s :t ?v FILTER(?v = \"2024-01-01T12:00:00Z\"^^xsd:dateTime) }",
    Seq(r("s" -> ":a"), r("s" -> ":b")))

  // ==========================================================================
  // projection validity (§19.8 grammar notes: a GROUP BY query may
  // only project group keys and aggregates) and STRDT errors
  // ==========================================================================

  test("ill-formed: projecting a non-group variable is a clean error") {
    intercept[graft.rdf.RdfParseException] {
      run(":a :p 1 .", "SELECT ?s { ?s :p ?v } GROUP BY ?v").collect()
    }
  }

  evalCase("select-expr: a later expression may use an earlier alias (§18.2.4.4)",
    ":a :v 3 .",
    "SELECT (?v + 1 AS ?y) (?y * 2 AS ?z) { ?s :v ?v }",
    Seq(r("y" -> "\"4\"^^xsd:integer", "z" -> "\"8\"^^xsd:integer")))

  test("select-expr: nested aggregate calls are a clean error") {
    intercept[graft.rdf.RdfParseException] {
      run(":a :p 1 .", "SELECT (SUM(COUNT(?v)) AS ?n) { ?s :p ?v }").collect()
    }
  }

  // ==========================================================================
  // negative syntax (re-authored from the W3C syntax-query negative
  // family): each must raise a clean parse error, never a partial
  // parse, a silent empty result, or an engine crash
  // ==========================================================================

  test("negative syntax: ill-formed queries are clean parse errors") {
    val bad = Seq(
      "SELECT ?x { ?x :p }",                       // triple missing object
      "SELECT ?x { ?x :p ?y",                      // unclosed group
      "SELECT { ?s :p ?o }",                       // no projection
      "SELECT (COUNT(*) ?c) { ?s :p ?o }",         // missing AS
      "SELECT (1 AS ?x) (2 AS ?x) { ?s :p ?o }",   // duplicate alias
      "SELECT * { ?s :p \"abc }",                  // unterminated string
      "SELECT * { ?s :p ?o . MINUS }",             // MINUS without group
      "SELECT * { GRAPH { ?s :p ?o } }",           // GRAPH without name
      "SELECT * { BIND(1) }",                      // BIND missing AS
      "SELECT * { ?s :p ?o } GROUP BY",            // empty GROUP BY
      "SELECT * { ?s :p ?o } ORDER",               // dangling keyword
      "SELECT * { ?s :p ?o } LIMIT x",             // non-integer LIMIT
      "SELECT * { FILTER(?x = ) }",                // bad expression
      "SELECT * { ?s :p ?o FILTER NOT EXISTS }",   // NOT EXISTS w/o group
      "SELECT * { ?s :p ?o FILTER regex(?o) }",    // REGEX arity
      "SELECT ?x { ?s :p ?x FILTER(COUNT(?x) > 1) }", // aggregate in FILTER
      "ASK { ?s :p ?o } GROUP BY ?s HAVING",       // empty HAVING
      "SELECT * { VALUES { (1) } }",               // VALUES without vars
      "SELECT * { ?s :p 1 . } OFFSET -1",          // negative OFFSET
      "PREFIX : SELECT * { ?s :p ?o }")            // malformed PREFIX
    bad.foreach { q =>
      val thrown = intercept[Exception] {
        run(":a :p 1 .", q).collect()
      }
      assert(thrown.isInstanceOf[graft.rdf.RdfParseException],
        s"expected RdfParseException for [$q], got $thrown")
    }
  }

  evalCase("fn: sameTerm is syntactic — \"01\" and \"1\" differ as terms",
    """:a :v "01"^^xsd:integer . :b :v "1"^^xsd:integer .""",
    "SELECT ?s { ?s :v ?v FILTER(SAMETERM(?v, \"1\"^^xsd:integer)) }",
    Seq(r("s" -> ":b")))

  evalCase("fn: = is value-space — \"01\" equals \"1\"",
    """:a :v "01"^^xsd:integer . :b :v "1"^^xsd:integer .""",
    "SELECT ?s { ?s :v ?v FILTER(?v = \"1\"^^xsd:integer) }",
    Seq(r("s" -> ":a"), r("s" -> ":b")))

  evalCase("fn: isBLANK / isIRI / isLITERAL partition the term kinds",
    "_:x :p :a . :a :p \"lit\" .",
    """SELECT ?kind {
      |  ?s :p ?o
      |  BIND(IF(isBLANK(?s), "blank",
      |        IF(isIRI(?o), "iri", IF(isLITERAL(?o), "lit", "?"))) AS ?kind)
      |}""".stripMargin,
    Seq(r("kind" -> "\"blank\""), r("kind" -> "\"lit\"")))

  evalCase("fn: IF propagates a condition error → unbound",
    ":a :v 1 .",
    "SELECT ?s ?x { ?s :v ?v BIND(IF(?v/0 = 1, \"t\", \"f\") AS ?x) }",
    Seq(r("s" -> ":a")))

  evalCase("fn: COALESCE skips errors and unbound, first success wins",
    ":a :v 1 .",
    "SELECT ?x { ?s :v ?v BIND(COALESCE(?nope, ?v/0, ?v + 1, 99) AS ?x) }",
    Seq(r("x" -> "\"2\"^^xsd:integer")))

  evalCase("fn: COALESCE with no successful branch is an error → unbound",
    ":a :v 1 .",
    "SELECT ?s ?x { ?s :v ?v BIND(COALESCE(?nope, ?v/0) AS ?x) }",
    Seq(r("s" -> ":a")))

  evalCase("fn: STRDT on a lang-tagged literal is an error → unbound",
    ":a :s \"chat\"@fr .",
    "SELECT ?s ?d { ?s :s ?v BIND(STRDT(?v, xsd:string) AS ?d) }",
    Seq(r("s" -> ":a")))

  evalCase("fn: IRI of a non-string is an error → unbound",
    ":a :v 1 .",
    "SELECT ?s ?i { ?s :v ?v BIND(IRI(?v) AS ?i) }",
    Seq(r("s" -> ":a")))
}
