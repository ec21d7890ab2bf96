package graft.sparql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.Checkpoints
import graft.rdf.{RdfParseException, Term}

/** SPARQL-subset → DataFrame compiler (SURVEY.md §3.3, §7 phase 6):
  * enough of the language to answer every query the reference itself
  * issues — the verification count
  * `SELECT (count(*) AS ?C) { { ?s ?p ?o } UNION { GRAPH ?g { ?s ?p ?o } } }`
  * (DockerTestConfigFK.java:392-394) and the assembler's config probes
  * — plus BGP joins, GRAPH blocks, UNION, OPTIONAL,
  * BIND(COALESCE/STR/LANG/DATATYPE), VALUES, property paths
  * (`/ | ^ + * ?` — transitive closure as a distributed fixpoint),
  * FILTER (value-space `=`/`!=`/`<`/`>`/`<=`/`>=`, `&&`/`||`/`!`,
  * var-vs-var, REGEX/CONTAINS/STRSTARTS/STRENDS/BOUND/type tests),
  * GROUP BY with COUNT/SUM/MIN/MAX/AVG, PREFIX prologues and prefixed
  * names, ORDER BY in value space, LIMIT/OFFSET, DISTINCT, and the
  * ASK / CONSTRUCT / DESCRIBE query forms. SPARQL Update lives in
  * [[SparqlUpdate]].
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
  /** SPARQL-star quoted-triple pattern with at least one variable
    * inside (an all-constant `<<…>>` folds to [[Const]] of a quoted
    * [[Term]] at parse time, keeping the pushable leaf-field match).
    */
  final case class QTriple(s: Node, p: Node, o: Node) extends Node

  final case class TriplePattern(graph: Option[Node], s: Node, p: Node, o: Node)

  /** A group `{ ... }` is an ORDERED element list: SPARQL scopes BIND
    * over the bindings produced so far, and OPTIONAL left-joins the
    * group-so-far, so order is semantics, not syntax.
    */
  sealed trait Pattern
  final case class Group(elems: Seq[GroupElem]) extends Pattern
  final case class Union(branches: Seq[Pattern]) extends Pattern

  sealed trait GroupElem
  final case class PatElem(tp: TriplePattern) extends GroupElem
  final case class FilterElem(f: FExpr) extends GroupElem
  final case class OptElem(inner: Pattern) extends GroupElem
  final case class BindElem(expr: VExpr, as: String) extends GroupElem
  /** `VALUES` inline data: one row per binding tuple; None = UNDEF.
    * An UNDEF cell leaves the variable unbound, which join
    * compatibility then treats as a wildcard (see [[joinShared]]).
    */
  final case class ValuesElem(vars: Seq[String], rows: Seq[Seq[Option[Term]]])
    extends GroupElem
  /** `MINUS { ... }` (spec §18.5): positional like OPTIONAL — removes
    * solutions compatible with some right-side solution that shares at
    * least one BOUND variable; disjoint-domain solutions survive
    * (the observable difference from NOT EXISTS).
    */
  final case class MinusElem(inner: Pattern) extends GroupElem
  /** `FILTER [NOT] EXISTS { ... }` (spec §8.1.1): scope is the whole
    * group like any FILTER; compiled to a semi (anti) join on
    * shared-variable compatibility.
    */
  final case class ExistsElem(inner: Pattern, positive: Boolean) extends GroupElem
  /** A nested group graph pattern `{ ... }` (possibly a UNION chain),
    * joined with the group-so-far. FILTERs inside scope to the nested
    * group only — which is exactly why it stays a separate element
    * instead of being spliced into the outer group.
    */
  final case class NestedElem(p: Pattern) extends GroupElem
  /** A sub-SELECT `{ SELECT ... }` (spec §12): evaluated bottom-up in
    * isolation, its projected variables joined with the group-so-far.
    */
  final case class SubSelectElem(q: Query) extends GroupElem

  /** Property-path expressions (SPARQL §9). Sequence, alternative and
    * inverse desugar to joins/unions at compile time; `+` and `*`
    * compile to a distributed transitive-closure fixpoint (doubling
    * joins — O(log diameter) rounds, each fully parallel).
    */
  sealed trait PathExpr
  final case class PLink(iri: Term) extends PathExpr
  final case class PInv(p: PathExpr) extends PathExpr
  final case class PSeq(l: PathExpr, r: PathExpr) extends PathExpr
  final case class PAlt(l: PathExpr, r: PathExpr) extends PathExpr
  final case class PPlus(p: PathExpr) extends PathExpr
  final case class PStar(p: PathExpr) extends PathExpr
  final case class POpt(p: PathExpr) extends PathExpr
  /** Negated property set `!(iri1|…|^irij|…)` (§9.1): forward edges
    * whose predicate is NOT in `fwd` (when `fwd` was listed), plus
    * reverse edges whose predicate is NOT in `inv` (when `inv` was
    * listed) — `!ex:p` is forward-only, `!^ex:p` reverse-only.
    */
  final case class PNeg(fwd: Seq[Term], inv: Seq[Term]) extends PathExpr

  /** A triple whose predicate is a non-trivial path. Evaluates against
    * the default graph, a constant GRAPH context, or `GRAPH ?var`
    * (per-graph semantics: the pair relation carries the graph column
    * and every join/closure keys on it).
    */
  final case class PathElem(graph: Option[Node], s: Node, path: PathExpr,
      o: Node) extends GroupElem

  /** FILTER expressions: comparisons over value expressions composed
    * with `&&` / `||` (SPARQL `ConditionalAndExpression`).
    */
  sealed trait FExpr
  final case class FCmp(l: VExpr, op: String, r: VExpr) extends FExpr
  final case class FAnd(l: FExpr, r: FExpr) extends FExpr
  final case class FOr(l: FExpr, r: FExpr) extends FExpr
  final case class FNot(e: FExpr) extends FExpr
  /** REGEX(?v, "pat" [, "flags"]) — flags subset: i. */
  final case class FRegex(v: Node, pattern: String, flags: String) extends FExpr
  /** CONTAINS / STRSTARTS / STRENDS over the lexical form. */
  final case class FStrFn(func: String, v: Node, arg: String) extends FExpr
  /** BOUND / isIRI / isBLANK / isLITERAL / isNUMERIC. */
  final case class FTest(func: String, v: String) extends FExpr
  /** `expr [NOT] IN (e1, …, en)` — value-equality disjunction (§17.4.1.9). */
  final case class FIn(e: VExpr, items: Seq[VExpr], positive: Boolean) extends FExpr
  /** sameTerm(a, b) — STRUCTURAL identity, unlike `=` (§17.4.1.8). */
  final case class FSameTerm(l: VExpr, r: VExpr) extends FExpr
  /** LANGMATCHES(tag, range) with basic-range semantics (§17.4.3.1). */
  final case class FLangMatches(tag: VExpr, range: String) extends FExpr
  /** A bare expression in boolean position → effective boolean value
    * (§17.2.2): boolean literals by value, numerics by != 0, strings by
    * non-emptiness; anything else is a type error (row dropped).
    */
  final case class FEbv(e: VExpr) extends FExpr
  /** `[NOT] EXISTS { pattern }` as an EXPRESSION operand (§17.4.1.4 —
    * inside `||` / `&&` / `!` / IF conditions of a FILTER), beyond the
    * standalone `FILTER [NOT] EXISTS` form. Rewritten before
    * compilation into a boolean mark column ([[rewriteExists]]); it
    * never reaches [[compileFilter]] directly.
    */
  final case class FExists(inner: Pattern, positive: Boolean) extends FExpr
  /** Internal: a precomputed boolean mark column (see [[FExists]]). */
  final case class FFlag(name: String, positive: Boolean) extends FExpr

  /** Value expressions usable in BIND, SELECT expressions and FILTER
    * comparison operands.
    */
  sealed trait VExpr
  final case class VVar(name: String) extends VExpr
  final case class VConst(term: Term) extends VExpr
  final case class VCoalesce(args: Seq[VExpr]) extends VExpr
  /** STR / LANG / DATATYPE accessors (spec §17.4.2). */
  final case class VFn(func: String, arg: VExpr) extends VExpr
  /** Arithmetic `+ - * /` over NUMERIC literal values (§17.3 operator
    * mapping): integer op integer stays xsd:integer except division,
    * which is always xsd:decimal; any other numeric mix is xsd:decimal.
    * Non-numeric operands and division by zero are expression errors
    * (unbound result / dropped filter row).
    */
  final case class VBin(op: String, l: VExpr, r: VExpr) extends VExpr
  /** N-ary scalar functions (§17.4.3-5): STRLEN UCASE LCASE CONCAT
    * SUBSTR REPLACE STRBEFORE STRAFTER ABS ROUND CEIL FLOOR IRI
    * ENCODE_FOR_URI STRDT STRLANG, the hash functions MD5/SHA1/
    * SHA256/SHA384/SHA512, and the date/time accessors YEAR MONTH DAY
    * HOURS MINUTES SECONDS TZ.
    */
  final case class VFnN(func: String, args: Seq[VExpr]) extends VExpr
  /** IF(cond, then, else) — an error in `cond` is an error (§17.4.1.2). */
  final case class VIf(cond: FExpr, t: VExpr, e: VExpr) extends VExpr
  /** An XSD casting constructor `xsd:integer(expr)` etc. (§17.5 /
    * XPath §17): validates the source value and produces a canonical
    * typed literal, or an expression error.
    */
  final case class VCast(datatype: String, arg: VExpr) extends VExpr

  /** An aggregate call inside a value expression — the post-grouping
    * expression form (`SELECT (SUM(?a)/SUM(?b) AS ?r)`,
    * `ORDER BY DESC(SUM(?a) + 1)`, spec §18.4: aggregates project into
    * the expression scope of a grouped query). Compiled as a hidden
    * term-typed aggregate column the surrounding expression reads.
    */
  final case class VAgg(func: String, arg: Option[VExpr],
      isDistinct: Boolean = false, separator: String = " ") extends VExpr

  sealed trait Projection
  case object SelectAll extends Projection
  final case class SelectItems(items: Seq[SelectItem]) extends Projection
  sealed trait SelectItem
  final case class ItemVar(name: String) extends SelectItem
  /** `(expr AS ?x)` — a projected value expression (spec §16.1.2). */
  final case class ItemExpr(expr: VExpr, as: String) extends SelectItem
  /** `(FUNC([DISTINCT] ?v) AS ?x)` for FUNC ∈ COUNT, SUM, MIN, MAX,
    * AVG, GROUP_CONCAT, SAMPLE; COUNT also takes `*`. COUNT(?v) counts
    * rows where ?v is bound, per SPARQL aggregate semantics; the
    * numeric aggregates operate on the NUMERIC VALUE of literal
    * bindings (exact DECIMAL accumulation — cross-engine-stable for
    * integer inputs; a bare double sum would drift). GROUP_CONCAT
    * joins lexical forms SORTED ascending (the spec leaves order
    * undefined; sorting makes the engine deterministic), SAMPLE
    * returns the lexically-least value for the same reason.
    */
  final case class ItemAgg(func: String, arg: Option[VExpr], as: String,
      isDistinct: Boolean = false, separator: String = " ")
    extends SelectItem

  // HAVING constraints are plain FILTER expressions over the grouped
  // solution — aggregate calls inside them ride the same hidden-column
  // machinery as expression projections (VAgg)

  /** One ORDER BY key (spec §15.1): `?v`, `ASC(expr)`, `DESC(expr)` or
    * a bracketted expression — in a grouped query the expression may
    * contain aggregate calls ([[VAgg]]).
    */
  final case class OrderKey(expr: VExpr, descending: Boolean = false)

  final case class Query(projection: Projection, pattern: Pattern,
      groupBy: Seq[String], having: Seq[FExpr], orderBy: Seq[OrderKey],
      limit: Option[Int], offset: Option[Int], distinct: Boolean,
      from: Seq[Term] = Seq.empty, fromNamed: Seq[Term] = Seq.empty,
      // `GROUP BY (expr AS ?x)` keys: bound onto the solution before
      // aggregation; their aliases also appear in `groupBy`
      groupExprs: Seq[(VExpr, String)] = Seq.empty,
      // trailing VALUES of a GROUPED query (§18.2.4.3): joined after
      // aggregation+HAVING, not into the WHERE pattern — the parser
      // nests it into the pattern only for ungrouped queries, where
      // the two placements are equivalent
      trailingValues: Option[ValuesElem] = None)

  /** Query forms (SPARQL §16): SELECT bindings, ASK boolean,
    * CONSTRUCT instantiated quads.
    */
  sealed trait Request
  final case class SelectReq(q: Query) extends Request
  final case class AskReq(pattern: Pattern) extends Request
  final case class ConstructReq(tpl: Seq[TriplePattern], pattern: Pattern,
      orderBy: Seq[OrderKey] = Seq.empty, limit: Option[Int] = None,
      offset: Option[Int] = None) extends Request
  /** DESCRIBE: resources by IRI and/or variables bound by WHERE. */
  /** `all` = `DESCRIBE *`: every variable the WHERE pattern binds. */
  final case class DescribeReq(nodes: Seq[Node], pattern: Option[Pattern],
      all: Boolean = false)
    extends Request

  /** Per-query evaluation context for the nondeterministic builtins
    * (§17.4.2 / §17.4.5): `NOW()` reads the injected clock — one fixed
    * instant for the whole query, per spec — and `UUID()`/`STRUUID()`/
    * `BNODE()`/`RAND()` derive per-row values from `seed` (each call
    * site gets its own stream). A fixed context makes the query's
    * output reproducible — the oracle-safe form; the no-context
    * [[execute]] overload draws a fresh clock and seed per query,
    * which is the ARQ behavior.
    */
  final case class EvalContext(
      now: java.time.Instant = java.time.Instant.now(),
      seed: Long = scala.util.Random.nextLong()) {
    private val sites = new java.util.concurrent.atomic.AtomicInteger(0)
    /** A distinct deterministic sub-seed per builtin call site. */
    private[sparql] def nextSiteSeed(): Long =
      seed + 0x9e3779b97f4a7c15L * sites.incrementAndGet()
  }

  // compile-scoped: compileExpr runs eagerly inside execute's dynamic
  // extent, so every builtin in the query reads ONE context; None
  // means "draw a fresh one per query" (clock advances between calls)
  private val evalCtx =
    new scala.util.DynamicVariable[Option[EvalContext]](None)

  private def currentCtx: EvalContext =
    evalCtx.value.getOrElse(EvalContext())

  /** [[execute]] with an explicit clock/seed for the nondeterministic
    * builtins — reproducible output for tests and oracles.
    */
  def execute(quads: DataFrame, queryText: String, ctx: EvalContext): DataFrame =
    evalCtx.withValue(Some(ctx))(execute(quads, queryText))

  /** Compile + run a query against a quads DataFrame (columns graph,
    * subject, predicate, obj — [[graft.store.QuadStore.quads]]).
    * SELECT yields one column per projected variable; ASK a single
    * `ask BOOLEAN` row; CONSTRUCT distinct quads columns.
    */
  def execute(quads: DataFrame, queryText: String): DataFrame = {
    def run(): DataFrame = executeParsed(quads, queryText)
    if (evalCtx.value.isDefined) run()
    else evalCtx.withValue(Some(EvalContext()))(run())
  }

  /** The query form of a request — `"select"`, `"ask"`, `"construct"`
    * or `"describe"` — parsed from the full grammar (not a keyword
    * sniff: a prologue may precede the form keyword). The protocol
    * layer ([[graft.server.SparqlHttp]]) picks the response
    * serialization family from this.
    */
  def queryForm(queryText: String): String =
    new Parser(queryText).parseRequest() match {
      case _: SelectReq => "select"
      case _: AskReq => "ask"
      case _: ConstructReq => "construct"
      case _: DescribeReq => "describe"
    }

  /** Protocol-level dataset construction (SPARQL Protocol §2.1.4
    * `default-graph-uri` / `named-graph-uri`): same semantics as the
    * query-level FROM / FROM NAMED clauses.
    */
  def datasetOf(quads: DataFrame, defaultGraphs: Seq[Term],
      namedGraphs: Seq[Term]): DataFrame =
    applyDatasetClause(quads, defaultGraphs, namedGraphs)

  private def executeParsed(quads: DataFrame, queryText: String): DataFrame =
    new Parser(queryText).parseRequest() match {
      case SelectReq(q) => executeSelect(quads, q)
      case AskReq(pattern) =>
        // declarative existence check: LIMIT 1 stops the scan at the
        // first solution, the aggregate turns presence into a boolean
        compile(quads, pattern).select(lit(1).as("x")).limit(1)
          .agg((count(lit(1)) > 0).as("ask"))
      case ConstructReq(tpl, pattern, orderBy, limit, offset) =>
        val sols0 = compile(quads, pattern)
        // solution modifiers apply BEFORE instantiation (§16.2):
        // ORDER BY only observably matters with LIMIT/OFFSET since the
        // constructed graph is a set — value-space keys as in SELECT
        val cset = sols0.columns.toSet
        def resolve(n: String): Column =
          if (cset.contains(n)) col(n) else lit(null).cast(TERM_STRUCT)
        val ordered =
          if (orderBy.isEmpty) sols0
          else sols0.orderBy(orderBy.flatMap { k =>
            sortKeys(compileExpr(k.expr, resolve))
              .map(c => if (k.descending) c.desc else c.asc)
          }: _*)
        val offsetted = offset.fold(ordered)(ordered.offset)
        val sols = limit.fold(offsetted)(offsetted.limit)
        instantiate(sols, tpl).reduceOption(_.unionByName(_))
          .map(_.dropDuplicates()) // a constructed graph is a SET of quads
          .getOrElse(quads.limit(0).select(
            Seq("graph", "subject", "predicate", "obj").map(col): _*))
      case DescribeReq(nodes, pattern, all) =>
        // minimal (non-CBD) description: every quad whose subject is a
        // described resource. Constant IRIs become pushable subject
        // filters; WHERE-bound variables a distinct semi-join.
        val consts = nodes.collect { case Const(t) => t }
        val constPart = consts
          .map(t => quads.filter(termEqFields("subject", t)))
          .reduceOption(_.unionByName(_))
        val explicitVars = nodes.collect { case Var(n) => n }
        val varPart = pattern.filter(_ => all || explicitVars.nonEmpty).flatMap { p =>
          val sols = compile(quads, p)
          // DESCRIBE *: every visible variable the pattern bound
          val varNames =
            if (all) sols.columns.filterNot(_.startsWith("#")).toSeq
            else explicitVars
          varNames.filter(sols.columns.contains)
            .map(n => sols.select(col(n).as("s")).filter(col("s").isNotNull))
            .reduceOption(_.unionByName(_)).map(_.distinct())
            .map { subjects =>
              quads.join(subjects, quads("subject") <=> subjects("s"), "left_semi")
            }
        }
        (constPart.toSeq ++ varPart.toSeq).reduceOption(_.unionByName(_))
          .map(_.dropDuplicates())
          .getOrElse(quads.limit(0))
    }

  private def executeSelect(quads: DataFrame, q: Query): DataFrame =
    executeSelectSol(quads, q, asTerms = false).df

  /** Evaluate a SELECT query. On the sub-SELECT path (`asTerms`, spec
    * §12) aggregate results must be RDF terms so they can join with
    * outer bindings: MIN/MAX return the ORIGINAL term of the extreme
    * value (`min_by`/`max_by` over the numeric value — semantically
    * exact, an aggregate returns one of its inputs), while COUNT/SUM/
    * AVG build canonical-lexical numeric literals (integer when the
    * value is whole). The top level keeps raw SQL values — the
    * driver-facing contract of the existing verify entries.
    */
  /** FROM / FROM NAMED (spec §13.2): with any dataset clause present,
    * the queried dataset is EXACTLY what the clauses name — the
    * default graph becomes the set-union merge of the FROM graphs
    * (re-labelled to the default graph), and only FROM NAMED graphs
    * remain visible to GRAPH patterns. Pure filters + a union over the
    * same scan — the graph-constant predicates push to parquet.
    */
  private[sparql] def applyDatasetClause(quads: DataFrame, from: Seq[Term],
      fromNamed: Seq[Term]): DataFrame =
    if (from.isEmpty && fromNamed.isEmpty) quads
    else {
      val gType = quads.schema("graph").dataType
      val dflt =
        if (from.isEmpty) quads.limit(0)
        else quads.filter(from.map(termEqFields("graph", _)).reduce(_ || _))
          .withColumn("graph", lit(null).cast(gType))
          .dropDuplicates() // graph MERGE is a set union
      val named =
        if (fromNamed.isEmpty) quads.limit(0)
        else quads.filter(fromNamed.map(termEqFields("graph", _)).reduce(_ || _))
      dflt.unionByName(named)
    }

  private def executeSelectSol(quads0: DataFrame, q: Query, asTerms: Boolean): Sol = {
    val quads = applyDatasetClause(quads0, q.from, q.fromNamed)
    val boundSol = compileSol(quads, q.pattern)
    val bound = q.groupExprs.foldLeft(boundSol.df) { case (d, (e, as)) =>
      d.withColumn(as, compileVExpr(d, TERM_STRUCT, e))
    }
    def numVal(v: String) = col(v).getField("lex").try_cast("decimal(28,10)")
    def intTerm(c: Column) = struct(lit(Term.LIT).as("termType"),
      c.cast("string").as("lex"),
      lit(Term.XSD_INTEGER).cast("string").as("datatype"),
      lit(null).cast("string").as("lang"))
    // canonical lex: whole values render as xsd:integer ("24", not
    // "24.0000000000"), so a SUM over integers joins/compares cleanly
    def numTerm(c: Column) = when(c.isNull, lit(null).cast(TERM_STRUCT))
      .when(c % 1 === 0, intTerm(c.cast("long")))
      .otherwise(struct(lit(Term.LIT).as("termType"),
        regexp_replace(c.cast("string"), "0+$", "").as("lex"),
        lit(Term.XSD_DECIMAL).cast("string").as("datatype"),
        lit(null).cast("string").as("lang")))
    var maybe: Set[String] = Set.empty
    // ORDER BY keys as evaluated against the projected solution; the
    // aggregate branch rewrites embedded aggregate calls to hidden
    // '#agg*' columns it carries through the projection
    var orderKeys: Seq[OrderKey] = q.orderBy
    val projected = q.projection match {
      case SelectAll =>
        maybe = boundSol.maybe
        bound
      case SelectItems(items)
          if q.groupBy.isEmpty && q.having.isEmpty &&
            !items.exists {
              case _: ItemAgg => true
              case ItemExpr(e, _) => aggsOfV(e).nonEmpty
              case _ => false
            } && !q.orderBy.exists(k => aggsOfV(k.expr).nonEmpty) =>
        val names = items.collect { case ItemVar(n) => n }
        // a projected expression is maybe-unbound unless it cannot error
        val exprMaybe = items.collect {
          case ItemExpr(e, as) => e match {
            case VConst(_) => None
            case VVar(n) if bound.columns.contains(n) &&
              !boundSol.maybe.contains(n) => None
            case _ => Some(as)
          }
        }.flatten
        maybe = (boundSol.maybe intersect names.toSet) ++ exprMaybe
        // a projected expression may reference EARLIER aliases
        // (`SELECT (?a+1 AS ?b) (?b*2 AS ?c)` — ARQ's extend chain):
        // each alias binds onto the working solution left-to-right
        var work = bound
        items.foreach {
          case ItemExpr(e, as) =>
            if (work.columns.contains(as))
              throw new RdfParseException(s"SELECT expression would rebind ?$as")
            val cset = work.columns.toSet
            work = work.withColumn(as, compileExpr(e,
              n => if (cset.contains(n)) col(n) else lit(null).cast(TERM_STRUCT)))
          case _ => ()
        }
        val cols = items.map {
          case ItemVar(n) =>
            // projecting a variable no pattern binds is legal: unbound
            (if (work.columns.contains(n)) col(n)
             else lit(null).cast(TERM_STRUCT)).as(n)
          case ItemExpr(_, as) => col(as)
          case i => throw new RdfParseException(s"unexpected item $i")
        }
        // ORDER BY evaluates over the PRE-projection solution (§15.1)
        // extended with the aliases above: a key referencing variables
        // the projection drops is computed here as a hidden column.
        // DISTINCT queries must order by projected expressions
        // (§15.3.1), so those stay downstream
        val projNames = items.collect {
          case ItemVar(n) => n
          case ItemExpr(_, as) => as
        }.toSet
        val wCols = work.columns.toSet
        val preOrd = scala.collection.mutable.ArrayBuffer[Column]()
        if (!q.distinct) orderKeys = q.orderBy.zipWithIndex.map { case (k, i) =>
          k.expr match {
            case VVar(n) if projNames.contains(n) => k
            case e if varsOfV(e).subsetOf(wCols) =>
              preOrd += compileExpr(e,
                n => if (wCols.contains(n)) col(n)
                     else lit(null).cast(TERM_STRUCT)).as(s"#ord$i")
              k.copy(expr = VVar(s"#ord$i"))
            case _ => k // unknown variables: post-projection (null keys)
          }
        }
        work.select(cols ++ preOrd: _*)
      case SelectItems(items) =>
        // aggregation query: plain projected vars must be GROUP BY keys
        // (SPARQL §18.2.4); COUNT(?v) counts bound rows, COUNT(*) all.
        // An expression projection may mix aggregate calls and group
        // keys (`(SUM(?a)/SUM(?b) AS ?r)`, §18.4) — anything else free
        // in it is an error
        // trailing-VALUES variables join the GROUPED solution
        // (§18.2.4.3), so they are projectable alongside group keys
        val tvVars = q.trailingValues.map(_.vars.toSet).getOrElse(Set.empty)
        items.collect {
          case ItemVar(n) if !q.groupBy.contains(n) && !tvVars.contains(n) => n
        }.foreach(n => throw new RdfParseException(
          s"projected variable ?$n is not in GROUP BY"))
        items.collect { case ItemExpr(e, as) =>
          val frees = varsOfV(substAggs(e, _ => VConst(Term.lit(""))))
          (frees -- q.groupBy -- tvVars).foreach(n => throw new RdfParseException(
            s"?$n in expression projection ?$as is neither aggregated nor a GROUP BY key"))
        }
        // raw (SQL-typed) aggregate — also the HAVING form. Arguments
        // are full value expressions (SUM(?a * ?b), MAX(STRLEN(?s)))
        // compiled against the bound solution's columns.
        val boundCols = bound.columns.toSet
        def argCol(e: VExpr): Column = compileExpr(e,
          n => if (boundCols.contains(n)) col(n) else lit(null).cast(TERM_STRUCT))
        def argVal(e: VExpr): Column =
          argCol(e).getField("lex").try_cast("decimal(28,10)")
        def rawAgg(func: String, arg: Option[VExpr], isDistinct: Boolean,
            separator: String): Column = func match {
          case "COUNT" =>
            if (isDistinct) arg.map(e => count_distinct(argCol(e))).getOrElse {
              // COUNT(DISTINCT *): distinct solution tuples — the
              // binding columns packed as one (never-null) struct
              if (bound.columns.isEmpty) count_distinct(lit(1))
              else count_distinct(struct(bound.columns.toIndexedSeq.map(col): _*))
            }
            else arg.fold(count(lit(1)))(e => count(argCol(e)))
          case "SUM" =>
            if (isDistinct) sum_distinct(argVal(arg.get)) else sum(argVal(arg.get))
          case "AVG" =>
            // AVG(DISTINCT) = SUM(DISTINCT)/COUNT(DISTINCT) over the
            // numeric values (§18.5.1.5 Avg is Sum/Count over Dx)
            if (isDistinct)
              sum_distinct(argVal(arg.get)) / count_distinct(argVal(arg.get))
            else avg(argVal(arg.get))
          case "MIN" => min(argVal(arg.get))
          case "MAX" => max(argVal(arg.get))
          case "GROUP_CONCAT" =>
            val lex = argCol(arg.get).getField("lex")
            array_join(array_sort(
              if (isDistinct) collect_set(lex) else collect_list(lex)), separator)
          case "SAMPLE" => min(argCol(arg.get).getField("lex"))
          case other => throw new RdfParseException(s"unsupported aggregate $other")
        }
        def strTerm(c: Column) = struct(lit(Term.LIT).as("termType"),
          c.as("lex"), lit(null).cast("string").as("datatype"),
          lit(null).cast("string").as("lang"))
        // term-typed aggregate — the sub-SELECT form, and the form
        // expressions read: MIN/MAX return the ORIGINAL extreme term,
        // COUNT/SUM/AVG canonical numeric literals
        def termAgg(func: String, arg: Option[VExpr], isDistinct: Boolean,
            sep: String): Column = func match {
          case "COUNT" => intTerm(rawAgg(func, arg, isDistinct, sep))
          case "SUM" | "AVG" => numTerm(rawAgg(func, arg, isDistinct, sep))
          case "MIN" => min_by(argCol(arg.get), argVal(arg.get))
          case "MAX" => max_by(argCol(arg.get), argVal(arg.get))
          case "GROUP_CONCAT" => strTerm(rawAgg(func, arg, isDistinct, sep))
          case "SAMPLE" => min_by(argCol(arg.get), argCol(arg.get).getField("lex"))
          case other => throw new RdfParseException(s"unsupported aggregate $other")
        }
        val aggCols = items.collect { case ItemAgg(func, arg, as, isDistinct, sep) =>
          (if (asTerms) termAgg(func, arg, isDistinct, sep)
           else rawAgg(func, arg, isDistinct, sep)).as(as)
        }
        // aggregate calls embedded in expressions (projection + ORDER
        // BY) become hidden term-typed columns, deduplicated by call
        val hidden = scala.collection.mutable.LinkedHashMap[VAgg, String]()
        def hiddenName(a: VAgg): String =
          hidden.getOrElseUpdate(a, s"#agg${hidden.size}")
        (items.collect { case ItemExpr(e, _) => e } ++ q.orderBy.map(_.expr))
          .foreach(e => aggsOfV(e).foreach(hiddenName))
        q.having.foreach(f => aggsOfF(f).foreach(hiddenName))
        val hiddenCols = hidden.toSeq.map { case (a, n) =>
          termAgg(a.func, a.arg, a.isDistinct, a.separator).as(n)
        }
        // a non-COUNT aggregate over no numeric bindings is null ⇒
        // its alias is maybe-unbound for join compatibility; an
        // expression projection may evaluate to error likewise
        val tvUndef = q.trailingValues.map(v => v.vars.zipWithIndex.collect {
          case (n, i) if v.rows.exists(_(i).isEmpty) => n
        }.toSet).getOrElse(Set.empty)
        maybe = (boundSol.maybe intersect q.groupBy.toSet) ++ tvUndef ++
          items.collect {
            case ItemAgg(func, _, as, _, _)
                if func != "COUNT" && func != "GROUP_CONCAT" => as
            case ItemExpr(_, as) => as
          }
        val allAggs = aggCols ++ hiddenCols
        val grouped =
          if (allAggs.isEmpty) // pure-key projection over a grouped query
            bound.select(q.groupBy.map(col): _*).dropDuplicates()
          else if (q.groupBy.isEmpty) bound.agg(allAggs.head, allAggs.tail: _*)
          else bound.groupBy(q.groupBy.map(col): _*).agg(allAggs.head, allAggs.tail: _*)
        // HAVING: FILTER semantics over the grouped solution — group
        // keys resolve directly, aggregate calls via the hidden columns
        val kept0 = q.having.foldLeft(grouped) { (d, f) =>
          val cset = d.columns.toSet
          d.filter(compileFilter(substAggsF(f, a => VVar(hiddenName(a))),
            n => if (cset.contains(n)) col(n) else lit(null).cast(TERM_STRUCT)))
        }
        // §18.2.4.3: the trailing VALUES data joins the grouped,
        // HAVING-filtered solution — before select expressions — via
        // the standard compatibility join (shared group keys; UNDEF
        // rows are maybe-unbound on the data side)
        val kept = q.trailingValues match {
          case Some(ValuesElem(vvars, vrows)) =>
            val data = vrows.map { r =>
              unitDf(quads).select(vvars.zip(r).map {
                case (v, Some(t)) => termLit(t).as(v)
                case (v, None) => lit(null).cast(TERM_STRUCT).as(v)
              }: _*)
            }.reduce(_.unionByName(_))
            joinShared(Sol(kept0, boundSol.maybe intersect q.groupBy.toSet),
              Sol(data, tvUndef), "inner").df
          case None => kept0
        }
        val keptCols = kept.columns.toSet
        def keptResolve(n: String): Column =
          if (keptCols.contains(n)) col(n) else lit(null).cast(TERM_STRUCT)
        // ORDER BY aggregate calls read the hidden columns, which must
        // survive the projection — they are dropped after the sort
        orderKeys = q.orderBy.map(k =>
          k.copy(expr = substAggs(k.expr, a => VVar(hiddenName(a)))))
        val orderHidden = q.orderBy.flatMap(k => aggsOfV(k.expr))
          .distinct.map(a => col(hiddenName(a)))
        kept.select((items.map {
          case ItemVar(n) => col(n)
          case ItemAgg(_, _, as, _, _) => col(as)
          case ItemExpr(e, as) =>
            compileExpr(substAggs(e, a => VVar(hiddenName(a))), keptResolve).as(as)
        } ++ orderHidden): _*)
    }
    // hidden '#'-prefixed sort columns are invisible to DISTINCT and
    // dropped once the sort is done
    val visible = projected.columns.filterNot(_.startsWith("#")).toIndexedSeq
    val distinct =
      if (!q.distinct) projected
      else if (visible.length == projected.columns.length) projected.dropDuplicates()
      else projected.dropDuplicates(visible)
    var sortInput = distinct
    val sortCols: Seq[Column] = orderKeys.zipWithIndex.flatMap { case (k, i) =>
      val keyCols: Seq[Column] = k.expr match {
        case VVar(n) if sortInput.columns.contains(n) =>
          sortInput.schema(n).dataType match {
            case _: org.apache.spark.sql.types.StructType => sortKeys(col(n))
            case _ => Seq(col(n)) // raw SQL aggregate alias (top level)
          }
        case e =>
          // expression key: materialize as a hidden column so the sort
          // stays a plain Exchange+Sort over precomputed keys
          val name = s"#ord$i"
          val cset = sortInput.columns.toSet
          sortInput = sortInput.withColumn(name, compileExpr(e,
            n => if (cset.contains(n)) col(n) else lit(null).cast(TERM_STRUCT)))
          sortKeys(col(name))
      }
      keyCols.map(c => if (k.descending) c.desc else c.asc)
    }
    val ordered = if (sortCols.isEmpty) sortInput else sortInput.orderBy(sortCols: _*)
    val offsetted = q.offset.fold(ordered)(ordered.offset)
    val limited = q.limit.fold(offsetted)(offsetted.limit)
    val hiddenLeft = limited.columns.filter(_.startsWith("#")).toIndexedSeq
    Sol(if (hiddenLeft.isEmpty) limited else limited.drop(hiddenLeft: _*), maybe)
  }

  /** ORDER BY keys in VALUE space (spec §15.1): unbound < blank < IRI
    * < literal, numeric literals by numeric value (lexical order would
    * put "10" before "9"), other literals by lexical form — the same
    * type-grouped total order the FILTER comparators use. Plain
    * columns, so the sort stays a regular Exchange+Sort (TopK with
    * LIMIT), no custom ordering physical op.
    */
  private def sortKeys(c: Column): Seq[Column] = {
    val rank = when(c.isNull, 0)
      .when(c.getField("termType") === Term.BLANK, 1)
      .when(c.getField("termType") === Term.IRI, 2)
      .when(c.getField("termType") === Term.TRIPLE, 4) // after literals (spec leaves triples unordered; lex keeps it total)
      .otherwise(3)
    // numeric order via TWO keys: a double primary (monotonic cast,
    // covers the full range — "1e30" is real data the exact key can't
    // hold) and an exact DECIMAL secondary that breaks the ties the
    // double's 53-bit mantissa collapses (integers beyond 2^53 — the
    // same value space the FILTER comparators use). Values outside
    // decimal(38,10) tie-break by lexical form only.
    val lexv = c.getField("lex")
    val numd = when(isNumericLit(c), lexv.try_cast("double"))
      .otherwise(lit(null).cast("double"))
    val numv = when(isNumericLit(c), lexv.try_cast("decimal(38,10)"))
      .otherwise(lit(null).cast("decimal(38,10)"))
    Seq(rank, numd, numv, lexv)
  }

  // --- compiler -------------------------------------------------------------

  /** The empty solution: one row, no bindings — the identity of the
    * SPARQL join, and what `{ OPTIONAL {..} BIND(..) }` starts from
    * (the reference's dataset-name probe is exactly that shape,
    * KafkaConnectorAssembler.java:380-411).
    */
  private def unitDf(quads: DataFrame): DataFrame =
    quads.sparkSession.range(1).drop("id")

  /** A compiled binding set plus the variables that may be UNBOUND
    * (null) in some row — introduced by OPTIONAL, UNION branch gaps,
    * VALUES UNDEF, or a BIND that can evaluate to error. Joins need
    * the distinction: SPARQL join compatibility (§18.3) treats an
    * unbound variable as compatible with anything, so a maybe-unbound
    * shared variable joins with an OR-null condition and merges via
    * COALESCE, while sure-bound variables keep plain null-safe
    * equality — which Catalyst plans as hash-join keys. Only patterns
    * that CAN produce unbound pay the non-equi price.
    */
  private final case class Sol(df: DataFrame, maybe: Set[String])

  private def compile(quads: DataFrame, pattern: Pattern): DataFrame =
    compileSol(quads, pattern).df

  private def compileSol(quads: DataFrame, pattern: Pattern): Sol = pattern match {
    case Union(branches) =>
      // branches may bind different variable sets (e.g. ?g only under
      // GRAPH); SPARQL leaves the others unbound → null columns
      val sols = branches.map(compileSol(quads, _))
      val allVars = sols.flatMap(_.df.columns).toSet
      val df = sols.map(_.df).reduce(_.unionByName(_, allowMissingColumns = true))
      Sol(df, sols.flatMap(s => s.maybe ++ (allVars -- s.df.columns)).toSet)
    case Group(elems) =>
      val termType = quads.schema("subject").dataType
      // acc == None until the first binding element, so a leading
      // OPTIONAL/BIND operates on the empty solution, not on zero rows
      var acc: Option[Sol] = None
      def cur: Sol = acc.getOrElse(Sol(unitDf(quads), Set.empty))
      // FILTER scopes over the WHOLE group regardless of position
      // (spec §17.2) — binding elements first, filters at the end; a
      // filter variable no element binds is an error ⇒ row dropped
      val filters = elems.collect { case FilterElem(f) => f }
      val existsElems = elems.collect { case e: ExistsElem => e }
      val bindingElems = elems.filterNot(e =>
        e.isInstanceOf[FilterElem] || e.isInstanceOf[ExistsElem])
      bindingElems.foreach {
        case PatElem(tp) =>
          val next = Sol(compilePattern(quads, tp), Set.empty)
          acc = Some(acc.fold(next)(d => joinShared(d, next, "inner")))
        case OptElem(inner) =>
          // LeftJoin-condition semantics (§18.2.2.2): an inner filter
          // whose variables are NOT all bound inside the optional
          // group becomes part of the left-join condition, evaluated
          // with the left solution visible — compiling it inside the
          // group would read those outer variables as unbound
          val (innerSol, joinFilters) = inner match {
            case Group(es) =>
              val fs = es.collect { case FilterElem(f) => f }
              val rest = es.filterNot(_.isInstanceOf[FilterElem])
              val sol0 = compileSol(quads, Group(rest))
              val (local, joined) =
                fs.partition(f => varsOf(f).subsetOf(sol0.df.columns.toSet))
              // EXISTS operands inside an OPTIONAL's filters: §18.2.2.2
              // evaluates the filter as part of the LeftJoin condition
              // with the LEFT solution visible. The local rewrite sees
              // only the optional group's bindings, so an EXISTS whose
              // inner pattern could correlate with an OUTER variable —
              // or one in a filter that itself references outer
              // variables (compiled into the join condition, where no
              // mark column exists) — gets a clear error instead of a
              // silently-uncorrelated answer.
              val outerCols = cur.df.columns.toSet
              val innerCols = sol0.df.columns.toSet
              fs.foreach { f =>
                val exs = existsOf(f)
                if (exs.nonEmpty) {
                  if (!varsOf(f).subsetOf(innerCols))
                    throw new RdfParseException(
                      "EXISTS inside an OPTIONAL filter that also references " +
                      "variables bound outside the optional group is not " +
                      "supported — lift the filter out of the OPTIONAL")
                  exs.foreach { ex =>
                    val corr = patternVars(ex.inner)
                      .intersect(outerCols) -- innerCols
                    if (corr.nonEmpty)
                      throw new RdfParseException(
                        "EXISTS inside OPTIONAL correlating with outer " +
                        s"variable(s) ${corr.map("?" + _).mkString(", ")} is " +
                        "not supported — lift the filter out of the OPTIONAL")
                  }
                }
              }
              (local.foldLeft(sol0)((a, f) => applyFilter(quads, a, f)),
                joined)
            case other => (compileSol(quads, other), Seq.empty[FExpr])
          }
          acc = Some(joinShared(cur, innerSol, "left_outer", joinFilters))
        case BindElem(expr, as) =>
          val base = cur
          if (base.df.columns.contains(as))
            throw new RdfParseException(s"BIND would rebind ?$as")
          // the bound value is sure only when the expression cannot
          // evaluate to error/null
          val sure = expr match {
            case VConst(_) => true
            case VVar(n) => base.df.columns.contains(n) && !base.maybe.contains(n)
            case _ => false
          }
          acc = Some(Sol(base.df.withColumn(as, compileVExpr(base.df, termType, expr)),
            if (sure) base.maybe else base.maybe + as))
        case MinusElem(inner) =>
          acc = Some(minusJoin(cur, compileSol(quads, inner)))
        case NestedElem(p) =>
          val inner = compileSol(quads, p)
          acc = Some(acc.fold(inner)(d => joinShared(d, inner, "inner")))
        case SubSelectElem(q) =>
          val inner = executeSelectSol(quads, q, asTerms = true)
          acc = Some(acc.fold(inner)(d => joinShared(d, inner, "inner")))
        case FilterElem(_) | ExistsElem(_, _) => () // handled below
        case ValuesElem(vars, rows) =>
          val df = rows.map { r =>
            unitDf(quads).select(vars.zip(r).map {
              case (v, Some(t)) => termLit(t).as(v)
              case (v, None) => lit(null).cast(termType).as(v)
            }: _*)
          }.reduce(_.unionByName(_))
          val undef = vars.zipWithIndex
            .collect { case (v, i) if rows.exists(_(i).isEmpty) => v }.toSet
          val data = Sol(df, undef)
          acc = Some(acc.fold(data)(d => joinShared(d, data, "inner")))
        case PathElem(graph, s, path, o) =>
          var pairs = pathPairs(quads, graph, path)
          // (constant quoted triples arrive as Const and filter like
          // any term; a variable-carrying QTriple endpoint is out of
          // this subset — fail loudly rather than dropping it)
          Seq(s, o).foreach {
            case QTriple(_, _, _) => throw new RdfParseException(
              "quoted-triple patterns are not supported as property-path endpoints")
            case _ => ()
          }
          s match {
            case Const(t) => pairs = pairs.filter(col("ps") <=> termLit(t))
            case _ => ()
          }
          o match {
            case Const(t) => pairs = pairs.filter(col("po") <=> termLit(t))
            case _ => ()
          }
          // endpoint slots plus, under GRAPH ?var, the graph binding;
          // a repeated variable forces equality and projects once
          val slots = Seq(s -> "ps", o -> "po") ++
            graph.collect { case v: Var => (v: Node) -> "pg" }
          val varSlots = slots.collect { case (Var(n), c) => (n, c) }
          varSlots.groupBy(_._1).values.filter(_.size > 1).foreach { dup =>
            dup.sliding(2).foreach {
              case Seq((_, c1), (_, c2)) => pairs = pairs.filter(col(c1) <=> col(c2))
              case _ => ()
            }
          }
          val proj = varSlots.toMap
          val bound = Sol(
            pairs.select(proj.toSeq.map { case (n, c) => col(c).as(n) }: _*),
            Set.empty)
          acc = Some(acc.fold(bound)(d => joinShared(d, bound, "inner")))
      }
      filters.foreach(f => acc = Some(applyFilter(quads, cur, f)))
      existsElems.foreach(e =>
        acc = Some(existsJoin(cur, compileSol(quads, e.inner), e.positive)))
      cur
  }

  /** Shared-variable join compatibility (§18.3) as a join condition:
    * sure-bound vars are plain null-safe equality (hash-join keys);
    * maybe-unbound vars add the unbound-matches-anything disjuncts.
    */
  private def compatCond(l: Sol, r: Sol): Column = {
    val shared = l.df.columns.toSet intersect r.df.columns.toSet
    shared.toSeq.map { c =>
      if (l.maybe.contains(c) || r.maybe.contains(c))
        col(s"l.$c") <=> col(s"r.$c") ||
          col(s"l.$c").isNull || col(s"r.$c").isNull
      else col(s"l.$c") <=> col(s"r.$c")
    }.reduceOption(_ && _).getOrElse(lit(true))
  }

  /** FILTER EXISTS / NOT EXISTS → left_semi / left_anti join. With no
    * shared variables the condition degenerates to `true`, i.e. pure
    * pattern-nonemptiness — exactly the spec's substitution semantics
    * for that case.
    */
  private def existsJoin(l: Sol, r: Sol, positive: Boolean): Sol =
    Sol(l.df.alias("l").join(r.df.alias("r"), compatCond(l, r),
      if (positive) "left_semi" else "left_anti"), l.maybe)

  /** MINUS (§18.5): anti join, but a right solution only removes a left
    * one when at least one shared variable is bound on BOTH sides; with
    * no shared variables nothing is removed. When every shared var is
    * sure-bound the overlap guard is identically true and is omitted,
    * keeping the anti join hash-joinable.
    */
  private def minusJoin(l: Sol, r: Sol): Sol = {
    val shared = l.df.columns.toSet intersect r.df.columns.toSet
    if (shared.isEmpty) l
    else {
      val allSure = shared.forall(c => !l.maybe.contains(c) && !r.maybe.contains(c))
      val cond =
        if (allSure) compatCond(l, r)
        else compatCond(l, r) && shared.toSeq
          .map(c => col(s"l.$c").isNotNull && col(s"r.$c").isNotNull)
          .reduce(_ || _)
      Sol(l.df.alias("l").join(r.df.alias("r"), cond, "left_anti"), l.maybe)
    }
  }

  /** The quads a path evaluates over: default graph, one constant
    * graph, or — for `GRAPH ?var` — every named graph (path semantics
    * then apply PER GRAPH; the pair relation carries a `pg` column and
    * every join/closure below adds it to its keys).
    */
  private def scopedQuads(quads: DataFrame, graph: Option[Node]): DataFrame =
    graph match {
      case None => quads.filter(col("graph").isNull)
      case Some(Const(g)) => quads.filter(termEqFields("graph", g))
      case Some(Var(_)) => quads.filter(col("graph").isNotNull)
      case Some(QTriple(_, _, _)) => quads.limit(0) // graph label is never a triple
    }

  private def pathGrouped(graph: Option[Node]): Boolean =
    graph.exists(_.isInstanceOf[Var])

  /** Evaluate a path expression to a (ps, po) pair relation — plus a
    * leading `pg` graph column when evaluating under `GRAPH ?var`.
    */
  private def pathPairs(quads: DataFrame, graph: Option[Node],
      p: PathExpr): DataFrame = {
    val grouped = pathGrouped(graph)
    val pg: Seq[Column] = if (grouped) Seq(col("graph").as("pg")) else Seq.empty
    p match {
      case PLink(t) =>
        scopedQuads(quads, graph).filter(termEqFields("predicate", t))
          .select(pg ++ Seq(col("subject").as("ps"), col("obj").as("po")): _*)
      case PInv(i) =>
        val keep = if (grouped) Seq(col("pg")) else Seq.empty
        pathPairs(quads, graph, i)
          .select(keep ++ Seq(col("po").as("ps"), col("ps").as("po")): _*)
      case PSeq(l, r) =>
        val a = pathPairs(quads, graph, l).alias("l")
        val b = pathPairs(quads, graph, r).alias("r")
        val cond =
          if (grouped) col("l.po") <=> col("r.ps") && col("l.pg") <=> col("r.pg")
          else col("l.po") <=> col("r.ps")
        val keep = (if (grouped) Seq(col("l.pg").as("pg")) else Seq.empty) ++
          Seq(col("l.ps").as("ps"), col("r.po").as("po"))
        a.join(b, cond).select(keep: _*)
      case PAlt(l, r) =>
        pathPairs(quads, graph, l).unionByName(pathPairs(quads, graph, r)).distinct()
      case PPlus(i) => closure(pathPairs(quads, graph, i))
      case PStar(i) =>
        closure(pathPairs(quads, graph, i))
          .unionByName(identityPairs(quads, graph)).distinct()
      case POpt(i) =>
        pathPairs(quads, graph, i)
          .unionByName(identityPairs(quads, graph)).distinct()
      case PNeg(fwd, inv) =>
        val scoped = scopedQuads(quads, graph)
        def excluding(terms: Seq[Term]) =
          scoped.filter(!terms.map(termEqFields("predicate", _)).reduce(_ || _))
        val parts =
          (if (fwd.nonEmpty)
            Seq(excluding(fwd).select(
              pg ++ Seq(col("subject").as("ps"), col("obj").as("po")): _*))
          else Seq.empty) ++
          (if (inv.nonEmpty)
            Seq(excluding(inv).select(
              pg ++ Seq(col("obj").as("ps"), col("subject").as("po")): _*))
          else Seq.empty)
        parts.reduce(_.unionByName(_))
    }
  }

  /** Zero-length path: every node of the (scoped) graph to itself
    * (spec: all terms; restricted here to terms occurring as subject
    * or object, the practically queryable set). Under `GRAPH ?var`
    * the node set is per graph.
    */
  private def identityPairs(quads: DataFrame, graph: Option[Node]): DataFrame = {
    val scoped = scopedQuads(quads, graph)
    if (pathGrouped(graph))
      scoped.select(col("graph").as("pg"), col("subject").as("n"))
        .unionByName(scoped.select(col("graph").as("pg"), col("obj").as("n")))
        .distinct()
        .select(col("pg"), col("n").as("ps"), col("n").as("po"))
    else
      scoped.select(col("subject").as("n"))
        .unionByName(scoped.select(col("obj").as("n"))).distinct()
        .select(col("n").as("ps"), col("n").as("po"))
  }

  /** Distributed transitive closure by doubling: each round joins the
    * closure with itself, so diameter d needs ⌈log2 d⌉ rounds, every
    * round a fully-parallel join + distinct. The driver only CONTROLS
    * the loop (a count per round decides the fixpoint — an aggregate,
    * not a collect); `localCheckpoint` truncates the growing lineage
    * so round N's plan does not replay rounds 1..N-1. On a cluster the
    * same loop runs with a reliable checkpoint dir.
    *
    * Block-manager hygiene: each round's checkpoint is eagerly
    * materialized by its `count()`, so the SUPERSEDED round's blocks
    * are dead the moment the next round exists — they are unpersisted
    * immediately (at closure sizes proportional to the data, leaking
    * one copy per doubling round pins O(rounds × closure) storage for
    * the JVM lifetime). Only the fixpoint result stays pinned, because
    * the caller's plan still reads it; it is registered in
    * [[liveClosures]] so [[releaseClosures]] can free it once the
    * query's result has been consumed.
    */
  private def closure(edges: DataFrame): DataFrame = {
    // a `pg` column means per-graph closure (GRAPH ?var): the graph
    // simply joins along, so one fixpoint loop covers every graph in
    // parallel rather than looping per graph
    val grouped = edges.columns.contains("pg")
    var cur = edges.distinct().localCheckpoint()
    var size = cur.count()
    var fixed = false
    while (!fixed) {
      val cond =
        if (grouped) col("l.po") <=> col("r.ps") && col("l.pg") <=> col("r.pg")
        else col("l.po") <=> col("r.ps")
      val keep = (if (grouped) Seq(col("l.pg").as("pg")) else Seq.empty) ++
        Seq(col("l.ps").as("ps"), col("r.po").as("po"))
      val next = cur.alias("l")
        .join(cur.alias("r"), cond)
        .select(keep: _*)
        .unionByName(cur).distinct().localCheckpoint()
      val n = next.count()
      if (n == size) { Checkpoints.unpersist(next); fixed = true }
      else { size = n; Checkpoints.unpersist(cur); cur = next }
    }
    Option(closureScope.get()) match {
      case Some(scope) => scope += cur
      case None => liveClosures.synchronized { liveClosures += cur }
    }
    cur
  }

  private val closureScope =
    new ThreadLocal[scala.collection.mutable.ArrayBuffer[DataFrame]]()

  /** Run `f` with every closure fixpoint materialized on THIS thread
    * collected into a scope freed when `f` completes — the per-request
    * discipline for long-running multi-tenant callers (the HTTP
    * server wraps each request): one request's path queries cannot pin
    * blocks past their response, and releasing them never touches a
    * concurrent request's still-streaming closures, which the global
    * [[releaseClosures]] would. The compile AND the result consumption
    * must both happen inside `f` (both do, for a request handler).
    */
  def withClosureScope[T](f: => T): T = {
    val outer = closureScope.get()
    val mine = scala.collection.mutable.ArrayBuffer[DataFrame]()
    closureScope.set(mine)
    try f
    finally {
      closureScope.set(outer)
      mine.foreach(Checkpoints.unpersist(_))
    }
  }

  /** Fixpoint results whose checkpoint blocks are still pinned (the
    * caller's lazy plan reads them). A long-running session — or the
    * bench harness between entries — calls [[releaseClosures]] after
    * consuming results to return the block manager to its pre-query
    * footprint.
    */
  private val liveClosures = scala.collection.mutable.ArrayBuffer[DataFrame]()

  /** Unpersist every closure checkpoint still pinned by past path
    * queries. Safe once their results have been consumed; a plan that
    * still references one would recompute from a freed checkpoint and
    * fail, so call between queries, not mid-consumption.
    */
  def releaseClosures(): Unit = liveClosures.synchronized {
    liveClosures.foreach(Checkpoints.unpersist(_))
    liveClosures.clear()
  }

  /** SPARQL join of two binding sets (`left_outer` for OPTIONAL).
    * Sure-bound shared variables join with null-safe equality
    * (default-graph bindings are NULL structs, so `<=>` rather than
    * `=` is load-bearing) — Catalyst treats these as hash-join keys.
    * MAYBE-unbound shared variables use full join compatibility
    * (§18.3: unbound matches anything): `l <=> r || l IS NULL ||
    * r IS NULL`, merged with COALESCE. With no shared variables the
    * condition degenerates to `true` — a cross join, or for OPTIONAL
    * the guaranteed-at-least-one-row extension.
    */
  private def joinShared(l: Sol, r: Sol, how: String,
      extraFilters: Seq[FExpr] = Seq.empty): Sol = {
    val shared = l.df.columns.toSet intersect r.df.columns.toSet
    def eitherMaybe(c: String) = l.maybe.contains(c) || r.maybe.contains(c)
    val a = l.df.alias("l")
    val b = r.df.alias("r")
    val conds = shared.toSeq.map { c =>
      if (eitherMaybe(c))
        col(s"l.$c") <=> col(s"r.$c") ||
          col(s"l.$c").isNull || col(s"r.$c").isNull
      else col(s"l.$c") <=> col(s"r.$c")
    }
    // extra join-level filters (OPTIONAL's LeftJoin condition) see the
    // MERGED candidate solution: shared vars take the merged value,
    // left-only from l, right-only from r
    val mergedResolve: String => Column = n =>
      if (shared.contains(n) && l.maybe.contains(n))
        coalesce(col(s"l.$n"), col(s"r.$n"))
      else if (l.df.columns.contains(n)) col(s"l.$n")
      else if (r.df.columns.contains(n)) col(s"r.$n")
      else lit(null).cast(TERM_STRUCT)
    val cond = (conds ++ extraFilters.map(compileFilter(_, mergedResolve)))
      .reduceOption(_ && _).getOrElse(lit(true))
    val keep = l.df.columns.map { c =>
      if (shared.contains(c) && l.maybe.contains(c))
        coalesce(col(s"l.$c"), col(s"r.$c")).as(c)
      else col(s"l.$c")
    } ++ r.df.columns.filterNot(shared.contains).map(c => col(s"r.$c"))
    val df = a.join(b, cond, how).select(keep: _*)
    // post-join unboundness: an inner join fills a maybe var from the
    // other side unless BOTH sides can be unbound; a left join keeps
    // the left status and makes every right-only var optional
    val maybe = how match {
      case "left_outer" => l.maybe ++ (r.df.columns.toSet -- shared)
      case _ =>
        l.maybe.filter(v => !shared.contains(v) || r.maybe.contains(v)) ++
          r.maybe.filter(v => !shared.contains(v) || l.maybe.contains(v))
    }
    Sol(df, maybe)
  }

  private def compileVExpr(base: DataFrame,
      termType: org.apache.spark.sql.types.DataType, e: VExpr): Column = {
    val cols = base.columns.toSet
    compileExpr(e,
      n => if (cols.contains(n)) col(n) else lit(null).cast(TERM_STRUCT))
  }

  /** XSD integer-family datatypes (arithmetic result stays integer). */
  private val INTEGER_DATATYPES: Seq[String] = Seq(
    Term.XSD_INTEGER, Term.XSD + "int", Term.XSD + "long",
    Term.XSD + "short", Term.XSD + "byte",
    Term.XSD + "nonNegativeInteger", Term.XSD + "positiveInteger")

  private def nullTerm: Column = lit(null).cast(TERM_STRUCT)

  /** Canonical lexical form of a decimal value: strip a trailing
    * fraction of zeros ("10.5000" → "10.5", "10.000" → "10") so the
    * engine's arithmetic lexicals are deterministic.
    */
  private def decLex(c: Column): Column = {
    val s = c.cast("string")
    when(s.contains("."),
      regexp_replace(regexp_replace(s, "0+$", ""), "\\.$", ""))
      .otherwise(s)
  }

  private def plainStrTerm(lex: Column): Column =
    when(lex.isNull, nullTerm).otherwise(
      struct(lit(Term.LIT).as("termType"), lex.as("lex"),
        lit(null).cast("string").as("datatype"),
        lit(null).cast("string").as("lang")))

  private def numericTerm(v: Column, dt: Column): Column =
    when(v.isNull, nullTerm).otherwise(
      struct(lit(Term.LIT).as("termType"),
        when(dt === Term.XSD_INTEGER, v.cast("decimal(38,0)").cast("string"))
          .otherwise(decLex(v)).as("lex"),
        dt.as("datatype"), lit(null).cast("string").as("lang")))

  /** Numeric VALUE of a term column (null for non-numeric terms —
    * SPARQL expression error). try_cast, not cast: under ANSI mode
    * (Spark 4 default) a data-controlled lexical outside the decimal
    * carrier ("1e30"^^xsd:double) would otherwise throw at runtime
    * instead of being an expression error — same for every other
    * lexical→numeric cast in this file.
    */
  private def numValueOf(c: Column): Column =
    when(isNumericLit(c), c.getField("lex").try_cast("decimal(38,10)"))
      .otherwise(lit(null).cast("decimal(38,10)"))

  private def compileExpr(e: VExpr, resolve: String => Column): Column = e match {
    // an unbound variable is a typed-null term, so COALESCE skips it
    case VVar(n) => resolve(n)
    // aggregate calls are rewritten to hidden columns by the grouped
    // projection before compilation ever sees them
    case _: VAgg => throw new RdfParseException(
      "aggregate call is only allowed in the projection/ORDER BY of a grouped query")
    case VConst(t) => termLit(t)
    case VCoalesce(args) => coalesce(args.map(compileExpr(_, resolve)): _*)
    case VFn(func, arg) =>
      val a = compileExpr(arg, resolve)
      def strTerm(lex: Column) =
        when(a.isNull, nullTerm).otherwise(plainStrTerm(lex))
      func match {
        case "STR" => strTerm(a.getField("lex"))
        case "LANG" =>
          // only defined for literals; "" when no language tag. An
          // RDF 1.2 base direction (`en--ltr`) is NOT part of the
          // language — LANG strips it (LANGDIR reads it)
          when(a.getField("termType") === Term.LIT,
            strTerm(regexp_replace(coalesce(a.getField("lang"), lit("")),
              "--(ltr|rtl)$", "")))
            .otherwise(nullTerm)
        case "DATATYPE" =>
          // lang-tagged → rdf:langString, lang+dir → rdf:dirLangString
          // (RDF 1.1 §3.3 / RDF 1.2), else the stated datatype, else
          // xsd:string
          val lg = a.getField("lang")
          val dt = when(lg.isNotNull,
              when(lg.rlike("--(ltr|rtl)$"), Term.RDF_DIRLANGSTRING)
                .otherwise(Term.RDF_LANGSTRING))
            .otherwise(coalesce(a.getField("datatype"), lit(Term.XSD_STRING)))
          when(a.getField("termType") === Term.LIT,
            struct(lit(Term.IRI).as("termType"), dt.as("lex"),
              lit(null).cast("string").as("datatype"),
              lit(null).cast("string").as("lang")))
            .otherwise(nullTerm)
        case other => throw new RdfParseException(s"unsupported function $other")
      }
    case VBin(op, l, r) =>
      if (!Seq("+", "-", "*", "/").contains(op))
        throw new RdfParseException(s"unsupported operator $op")
      // ONE codegen'd Catalyst expression (§17.3 semantics inside,
      // incl. div-by-zero → error): the equivalent when/cast/regexp
      // column tree was ~40 nodes PER OPERATOR, which made
      // expression-heavy queries analysis/codegen-bound
      graft.functions.TermOps.termArith(op,
        compileExpr(l, resolve), compileExpr(r, resolve))
    case VIf(cond, t, f) =>
      val c = compileFilter(cond, resolve)
      // an error in the condition is an error in the result
      when(c === true, compileExpr(t, resolve))
        .when(c === false, compileExpr(f, resolve))
        .otherwise(nullTerm)
    case VCast(dt, arg) =>
      // §17.5 XPath casting: validate the source, emit the canonical
      // typed literal, error (null) on anything outside the cast table
      val a = compileExpr(arg, resolve)
      val lexC = a.getField("lex")
      val isLit = a.getField("termType") === Term.LIT
      val srcNum = isNumericLit(a)
      val srcBool = isLit && a.getField("datatype") === Term.XSD_BOOLEAN
      val srcStr = isPlainString(a)
      val truthy = lexC.isin("true", "1")
      val falsy = lexC.isin("false", "0")
      // a null lexical form (decimal(38,0)/(38,10) overflow of an
      // in-range source, >38-digit strings) is a cast ERROR, not a
      // malformed literal-with-null-lex
      def typed(lex: Column, dtIri: String) = when(lex.isNotNull, struct(
        lit(Term.LIT).as("termType"), lex.as("lex"),
        lit(dtIri).cast("string").as("datatype"),
        lit(null).cast("string").as("lang"))).otherwise(nullTerm)
      dt match {
        case Term.XSD_STRING =>
          // the lexical form of any literal, as xsd:string (= plain
          // in RDF 1.1 value space — valueEq treats them alike)
          when(isLit, typed(lexC, Term.XSD_STRING)).otherwise(nullTerm)
        case Term.XSD_BOOLEAN =>
          when((srcBool || srcStr) && truthy, typed(lit("true"), Term.XSD_BOOLEAN))
            .when((srcBool || srcStr) && falsy, typed(lit("false"), Term.XSD_BOOLEAN))
            .when(srcNum, typed(when(numValueOf(a) =!= 0, "true")
              .otherwise("false"), Term.XSD_BOOLEAN))
            .otherwise(nullTerm)
        case Term.XSD_INTEGER =>
          // numeric sources truncate toward zero (XPath casting);
          // string sources must be integer lexicals (canonicalized)
          val v = numValueOf(a)
          val trunc = when(v >= 0, floor(v)).otherwise(ceil(v)).cast("decimal(38,0)")
          when(srcNum, typed(trunc.cast("string"), Term.XSD_INTEGER))
            .when(srcBool, typed(when(truthy, "1").otherwise("0"), Term.XSD_INTEGER))
            .when(srcStr && lexC.rlike("^[+-]?\\d+$"),
              typed(lexC.try_cast("decimal(38,0)").cast("string"), Term.XSD_INTEGER))
            .otherwise(nullTerm)
        case Term.XSD_DECIMAL =>
          when(srcNum, typed(decLex(numValueOf(a)), Term.XSD_DECIMAL))
            .when(srcBool, typed(when(truthy, "1").otherwise("0"), Term.XSD_DECIMAL))
            .when(srcStr && lexC.rlike("^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)$"),
              typed(decLex(lexC.try_cast("decimal(38,10)")), Term.XSD_DECIMAL))
            .otherwise(nullTerm)
        case Term.XSD_DOUBLE | Term.XSD_FLOAT =>
          // lexical form is the JVM double repr — deterministic
          // engine-wide, not XSD-canonical-with-exponent
          val d = when(srcNum || srcStr, lexC.try_cast("double"))
            .when(srcBool, when(truthy, 1.0d).otherwise(0.0d))
          when(d.isNotNull, typed(d.cast("string"), dt)).otherwise(nullTerm)
        case Term.XSD_DATETIME =>
          when(isLit && lexC.rlike(
              "^-?\\d{4,}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?(Z|[+-]\\d{2}:\\d{2})?$"),
            typed(lexC, Term.XSD_DATETIME)).otherwise(nullTerm)
        case Term.XSD_DATE =>
          when(isLit && lexC.rlike("^-?\\d{4,}-\\d{2}-\\d{2}(Z|[+-]\\d{2}:\\d{2})?$"),
            typed(lexC, Term.XSD_DATE)).otherwise(nullTerm)
        case other => throw new RdfParseException(s"unsupported cast target <$other>")
      }
    case VFnN(func, args) =>
      def a(i: Int) = compileExpr(args(i), resolve)
      def lex(i: Int) = a(i).getField("lex")
      // string functions are defined on literals only (§17.4.3)
      def onLit(i: Int)(c: Column) =
        when(a(i).getField("termType") === Term.LIT, c).otherwise(nullTerm)
      // result carries the argument's lang/datatype (UCASE/LCASE/...)
      def likeArg(i: Int)(l: Column) = onLit(i)(
        struct(lit(Term.LIT).as("termType"), l.as("lex"),
          a(i).getField("datatype").as("datatype"),
          a(i).getField("lang").as("lang")))
      def intTerm(v: Column) = when(v.isNull, nullTerm).otherwise(
        struct(lit(Term.LIT).as("termType"), v.cast("string").as("lex"),
          lit(Term.XSD_INTEGER).cast("string").as("datatype"),
          lit(null).cast("string").as("lang")))
      // STRBEFORE/STRAFTER take their separator as a parse-time string
      def sepArg: String = args(1) match {
        case VConst(t) if t.isLit => t.lex
        case _ => throw new RdfParseException(s"$func needs a constant separator")
      }
      func match {
        case "STRLEN" => onLit(0)(intTerm(length(lex(0)).cast("long")))
        // RFC 3986 percent-encoding of everything but the unreserved
        // set, UTF-8 bytes uppercase-hex (§17.4.3.4). Pure column ops:
        // per-character transform, multi-byte chars hex-encoded from
        // their UTF-8 encoding. (Astral chars split into surrogates by
        // split('') are out of this subset's scope.)
        case "ENCODE_FOR_URI" =>
          onLit(0)(plainStrTerm(array_join(
            transform(split(lex(0), ""), c =>
              when(c.rlike("^[A-Za-z0-9\\-_.~]$"), c)
                .otherwise(regexp_replace(upper(hex(encode(c, "UTF-8"))),
                  "(..)", "%$1"))), "")))
        case "UCASE" => likeArg(0)(upper(lex(0)))
        case "LCASE" => likeArg(0)(lower(lex(0)))
        case "CONCAT" =>
          // all args must be literals; result is a simple literal
          val ok = args.indices.map(i => a(i).getField("termType") === Term.LIT)
            .reduce(_ && _)
          when(ok, plainStrTerm(concat(args.indices.map(lex): _*)))
            .otherwise(nullTerm)
        case "SUBSTR" =>
          // XPath fn:substring (§17.4.3.3): keep positions p with
          // round(start) <= p < round(start) + round(len). A start
          // before 1 SHORTENS the window — it never wraps to the
          // string end the way Spark's negative-start substr does
          def clampPos(c: Column) = greatest(least(floor(c + 0.5),
            lit(Int.MaxValue.toDouble)), lit(Int.MinValue.toDouble)).cast("long")
          val s0 = clampPos(numValueOf(a(1)))
          val l0 = if (args.size > 2) clampPos(numValueOf(a(2)))
            else lit(Int.MaxValue.toLong)
          val from = greatest(s0, lit(1L))
          val len = greatest(s0 + l0 - from, lit(0L))
          likeArg(0)(lex(0).substr(from.cast("int"),
            least(len, lit(Int.MaxValue.toLong)).cast("int")))
        case "REPLACE" =>
          (args(1), args(2)) match {
            case (VConst(p), VConst(r)) if p.isLit && r.isLit =>
              likeArg(0)(regexp_replace(lex(0), p.lex, r.lex))
            case _ => throw new RdfParseException(
              "REPLACE needs constant pattern and replacement")
          }
        case "STRBEFORE" =>
          val sep = sepArg
          onLit(0)(plainStrTerm(
            if (sep.isEmpty) lit("")
            else when(instr(lex(0), sep) > 0,
              substring_index(lex(0), sep, 1)).otherwise(lit(""))))
        case "STRAFTER" =>
          val sep = sepArg
          onLit(0)(plainStrTerm(
            if (sep.isEmpty) lex(0)
            else {
              val p = locate(sep, lex(0))
              when(p > 0, lex(0).substr(p + sep.length, lit(Int.MaxValue)))
                .otherwise(lit(""))
            }))
        case "ABS" => numericTerm(abs(numValueOf(a(0))),
          when(a(0).getField("datatype").isin(INTEGER_DATATYPES: _*),
            lit(Term.XSD_INTEGER)).otherwise(lit(Term.XSD_DECIMAL)))
        // XPath fn:round: half rounds toward positive infinity
        // (round(-2.5) = -2), which is floor(x + 0.5)
        case "ROUND" => numericTerm(
          floor(numValueOf(a(0)) + lit(0.5)).cast("decimal(38,10)"),
          when(a(0).getField("datatype").isin(INTEGER_DATATYPES: _*),
            lit(Term.XSD_INTEGER)).otherwise(lit(Term.XSD_DECIMAL)))
        case "CEIL" => numericTerm(ceil(numValueOf(a(0))).cast("decimal(38,10)"),
          when(a(0).getField("datatype").isin(INTEGER_DATATYPES: _*),
            lit(Term.XSD_INTEGER)).otherwise(lit(Term.XSD_DECIMAL)))
        case "FLOOR" => numericTerm(floor(numValueOf(a(0))).cast("decimal(38,10)"),
          when(a(0).getField("datatype").isin(INTEGER_DATATYPES: _*),
            lit(Term.XSD_INTEGER)).otherwise(lit(Term.XSD_DECIMAL)))
        case "IRI" | "URI" =>
          when(a(0).isNotNull, struct(lit(Term.IRI).as("termType"),
            lex(0).as("lex"), lit(null).cast("string").as("datatype"),
            lit(null).cast("string").as("lang"))).otherwise(nullTerm)
        // §17.4.4 hash functions: hex digest of the UTF-8 bytes of a
        // simple / xsd:string literal's lexical form, as a simple
        // literal (Spark's md5/sha1/sha2 emit lowercase hex already)
        case "MD5" | "SHA1" | "SHA256" | "SHA384" | "SHA512" =>
          val okStr = a(0).getField("termType") === Term.LIT &&
            a(0).getField("lang").isNull &&
            (a(0).getField("datatype").isNull ||
             a(0).getField("datatype") === Term.XSD_STRING)
          val digest = func match {
            case "MD5" => md5(encode(lex(0), "UTF-8"))
            case "SHA1" => sha1(encode(lex(0), "UTF-8"))
            case other => sha2(encode(lex(0), "UTF-8"), other.drop(3).toInt)
          }
          when(okStr, plainStrTerm(digest)).otherwise(nullTerm)
        // SPARQL-star quoted-triple accessors/constructor: components
        // parse out of the canonical lex (TermStar expression, null =
        // expression error on a non-triple term); TRIPLE() re-quotes
        // three bound terms
        // RDF 1.2 / SPARQL 1.2 direction accessors and constructor
        case "LANGDIR" =>
          // "" for a literal with no direction; error on non-literals
          when(a(0).getField("termType") === Term.LIT,
            plainStrTerm(regexp_extract(
              coalesce(a(0).getField("lang"), lit("")), "--(ltr|rtl)$", 1)))
            .otherwise(nullTerm)
        case "STRLANGDIR" =>
          if (args.length != 3)
            throw new RdfParseException("STRLANGDIR takes exactly 3 arguments")
          // simple-literal lex + language + direction ("ltr"/"rtl")
          val okLex = isPlainString(a(0))
          val lang = a(1).getField("lex")
          val dir = a(2).getField("lex")
          when(okLex && isPlainString(a(1)) && isPlainString(a(2)) &&
              lang =!= "" && dir.isin("ltr", "rtl"),
            struct(lit(Term.LIT).as("termType"), lex(0).as("lex"),
              lit(null).cast("string").as("datatype"),
              concat(lang, lit("--"), dir).as("lang")))
            .otherwise(nullTerm)
        case "SUBJECT" => graft.functions.TermStar.componentOf(a(0), 0)
        case "PREDICATE" => graft.functions.TermStar.componentOf(a(0), 1)
        case "OBJECT" => graft.functions.TermStar.componentOf(a(0), 2)
        case "TRIPLE" =>
          if (args.length != 3)
            throw new RdfParseException("TRIPLE takes exactly 3 arguments")
          graft.functions.TermStar.quotedOf(a(0), a(1), a(2))
        // §17.4.5 date/time accessors, evaluated on the LEXICAL form of
        // xsd:dateTime (YEAR/MONTH/DAY/TZ also xsd:date) — no timezone
        // conversion, exactly the component the literal spells
        case "YEAR" | "MONTH" | "DAY" | "HOURS" | "MINUTES" | "SECONDS" | "TZ"
           | "TIMEZONE" =>
          val dt = a(0).getField("datatype")
          val okType = func match {
            case "YEAR" | "MONTH" | "DAY" | "TZ" | "TIMEZONE" =>
              dt === Term.XSD_DATETIME || dt === Term.XSD_DATE
            case _ => dt === Term.XSD_DATETIME
          }
          val ok = a(0).getField("termType") === Term.LIT && okType
          def part(pattern: String) = regexp_extract(lex(0), pattern, 1)
          func match {
            case "TZ" => // "" when the literal carries no zone (spec)
              when(ok, plainStrTerm(part("(Z|[+-]\\d{2}:\\d{2})$")))
                .otherwise(nullTerm)
            case "TIMEZONE" =>
              // xsd:dayTimeDuration in canonical form: Z/±00:00 → PT0S,
              // else [-]PT<h>H[<m>M] with zero components omitted; a
              // literal with NO zone is an expression error (§17.4.5.7)
              val zone = part("(Z|[+-]\\d{2}:\\d{2})$")
              val hh = regexp_extract(zone, "^[+-](\\d{2}):", 1).try_cast("int")
              val mm = regexp_extract(zone, ":(\\d{2})$", 1).try_cast("int")
              val durLex =
                when(zone === "Z" || (hh === 0 && mm === 0), lit("PT0S"))
                  .otherwise(concat(
                    when(zone.startsWith("-"), lit("-")).otherwise(lit("")),
                    lit("PT"),
                    when(hh > 0, concat(hh.cast("string"), lit("H"))).otherwise(lit("")),
                    when(mm > 0, concat(mm.cast("string"), lit("M"))).otherwise(lit(""))))
              when(ok && zone =!= "",
                struct(lit(Term.LIT).as("termType"), durLex.as("lex"),
                  lit(Term.XSD + "dayTimeDuration").as("datatype"),
                  lit(null).cast("string").as("lang")))
                .otherwise(nullTerm)
            case "SECONDS" =>
              val sec = part("T\\d{2}:\\d{2}:(\\d{2}(?:\\.\\d+)?)")
              when(ok && sec =!= "",
                numericTerm(sec.cast("decimal(12,6)"), lit(Term.XSD_DECIMAL)))
                .otherwise(nullTerm)
            case other =>
              val p = other match {
                case "YEAR" => "^(-?\\d{4,})-"
                case "MONTH" => "^-?\\d{4,}-(\\d{2})"
                case "DAY" => "^-?\\d{4,}-\\d{2}-(\\d{2})"
                case "HOURS" => "T(\\d{2}):"
                case "MINUTES" => "T\\d{2}:(\\d{2})"
              }
              val v = part(p)
              when(ok && v =!= "", intTerm(v.try_cast("long"))).otherwise(nullTerm)
          }
        // literal constructors (§17.4.2.8-9): the lexical form must be
        // a simple literal, the datatype an IRI / the tag a literal
        case "STRDT" =>
          when(a(0).getField("termType") === Term.LIT &&
              a(1).getField("termType") === Term.IRI,
            struct(lit(Term.LIT).as("termType"), lex(0).as("lex"),
              lex(1).as("datatype"), lit(null).cast("string").as("lang")))
            .otherwise(nullTerm)
        case "STRLANG" =>
          when(a(0).getField("termType") === Term.LIT &&
              a(1).getField("termType") === Term.LIT && length(lex(1)) > 0,
            struct(lit(Term.LIT).as("termType"), lex(0).as("lex"),
              lit(null).cast("string").as("datatype"), lex(1).as("lang")))
            .otherwise(nullTerm)

        // --- nondeterministic builtins (§17.4.2 / §17.4.5): values
        // come from the query's EvalContext so a fixed clock/seed
        // reproduces the output bit-for-bit (oracle-safe) -------------
        case "NOW" =>
          // ONE instant for the whole query (§17.4.5.1) — compiled to
          // a literal from the context clock
          val lexNow = java.time.format.DateTimeFormatter.ISO_INSTANT
            .format(currentCtx.now)
          struct(lit(Term.LIT).as("termType"), lit(lexNow).as("lex"),
            lit(Term.XSD_DATETIME).cast("string").as("datatype"),
            lit(null).cast("string").as("lang"))
        case "RAND" =>
          // xsd:double in [0,1), a distinct seeded stream per call site
          struct(lit(Term.LIT).as("termType"),
            rand(currentCtx.nextSiteSeed()).cast("string").as("lex"),
            lit(Term.XSD_DOUBLE).cast("string").as("datatype"),
            lit(null).cast("string").as("lang"))
        case "UUID" =>
          struct(lit(Term.IRI).as("termType"),
            concat(lit("urn:uuid:"), uuidLex(currentCtx)).as("lex"),
            lit(null).cast("string").as("datatype"),
            lit(null).cast("string").as("lang"))
        case "STRUUID" => plainStrTerm(uuidLex(currentCtx))
        case "BNODE" if args.isEmpty =>
          struct(lit(Term.BLANK).as("termType"),
            concat(lit("gen"),
              lower(hex(xxhash64(rand(currentCtx.nextSiteSeed()))))).as("lex"),
            lit(null).cast("string").as("datatype"),
            lit(null).cast("string").as("lang"))
        case "BNODE" =>
          // BNODE(str): one label per distinct literal (stable across
          // solutions — a CONSTRUCT-templating-friendly reading of
          // §17.4.2.9, which scopes freshness per solution; ARQ's
          // per-row map is not reproducible under distribution)
          when(a(0).getField("termType") === Term.LIT &&
              a(0).getField("lang").isNull &&
              (a(0).getField("datatype").isNull ||
                a(0).getField("datatype") === Term.XSD_STRING),
            struct(lit(Term.BLANK).as("termType"),
              concat(lit("b"), lower(hex(xxhash64(lex(0),
                lit(currentCtx.seed))))).as("lex"),
              lit(null).cast("string").as("datatype"),
              lit(null).cast("string").as("lang")))
            .otherwise(nullTerm)
        case other => throw new RdfParseException(s"unsupported function $other")
      }
  }

  /** A v4-shaped UUID lexical, one fresh value per row: 122 random
    * bits drawn from two seeded per-call-site streams. Reproducible
    * given the context seed and a stable partitioning of the input —
    * the property the oracle entries rely on.
    */
  private def uuidLex(ctx: EvalContext): Column = {
    val h1 = lpad(hex(xxhash64(rand(ctx.nextSiteSeed()))), 16, "0")
    val h2 = lpad(hex(xxhash64(rand(ctx.nextSiteSeed()))), 16, "0")
    lower(concat(
      substring(h1, 1, 8), lit("-"), substring(h1, 9, 4), lit("-4"),
      substring(h1, 13, 3), lit("-a"), substring(h2, 1, 3), lit("-"),
      substring(h2, 4, 12)))
  }

  private def applyFilter(quads: DataFrame, sol: Sol, f: FExpr): Sol = {
    val (marked, nf, flags) = rewriteExists(quads, sol, f)
    val cols = marked.df.columns.toSet
    val filtered = marked.df.filter(compileFilter(nf,
      n => if (cols.contains(n)) col(n) else lit(null).cast(TERM_STRUCT)))
    Sol(flags.foldLeft(filtered)(_.drop(_)), sol.maybe)
  }

  /** Rewrite `[NOT] EXISTS` operands (anywhere in the expression tree,
    * including IF conditions) into boolean mark columns over the
    * solution: one left-semi probe of the inner pattern per EXISTS,
    * joined back on the DISTINCT shared-variable bindings — every
    * join is an equi/compat join, no solution row ever duplicates.
    */
  private def rewriteExists(quads: DataFrame, sol0: Sol,
      f0: FExpr): (Sol, FExpr, Seq[String]) = {
    var sol = sol0
    val flags = scala.collection.mutable.ArrayBuffer[String]()
    def fw(f: FExpr): FExpr = f match {
      case FExists(inner, positive) =>
        val flag = s"#exists${flags.size}"
        sol = markExists(quads, sol, inner, flag)
        flags += flag
        FFlag(flag, positive)
      case FAnd(a, b) => FAnd(fw(a), fw(b))
      case FOr(a, b) => FOr(fw(a), fw(b))
      case FNot(e) => FNot(fw(e))
      case FCmp(l, op, r) => FCmp(vw(l), op, vw(r))
      case FIn(e, items, p) => FIn(vw(e), items.map(vw), p)
      case FSameTerm(l, r) => FSameTerm(vw(l), vw(r))
      case FEbv(e) => FEbv(vw(e))
      case other => other
    }
    def vw(v: VExpr): VExpr = v match {
      case VIf(c, t, e) => VIf(fw(c), vw(t), vw(e))
      case VCoalesce(args) => VCoalesce(args.map(vw))
      case VFn(fn, a) => VFn(fn, vw(a))
      case VBin(op, l, r) => VBin(op, vw(l), vw(r))
      case VFnN(fn, args) => VFnN(fn, args.map(vw))
      case VCast(dt, a) => VCast(dt, vw(a))
      case other => other
    }
    val nf = fw(f0)
    (sol, nf, flags.toSeq)
  }

  /** Collect the `[NOT] EXISTS` operands anywhere in a filter
    * expression (including IF conditions).
    */
  private def existsOf(f: FExpr): Seq[FExists] = {
    def fw(f: FExpr): Seq[FExists] = f match {
      case e: FExists => Seq(e)
      case FAnd(a, b) => fw(a) ++ fw(b)
      case FOr(a, b) => fw(a) ++ fw(b)
      case FNot(e) => fw(e)
      case FCmp(l, _, r) => vw(l) ++ vw(r)
      case FIn(e, items, _) => (e +: items).flatMap(vw)
      case FSameTerm(l, r) => vw(l) ++ vw(r)
      case FEbv(e) => vw(e)
      case _ => Seq.empty
    }
    def vw(v: VExpr): Seq[FExists] = v match {
      case VIf(c, t, e) => fw(c) ++ vw(t) ++ vw(e)
      case VCoalesce(args) => args.flatMap(vw)
      case VFn(_, a) => vw(a)
      case VBin(_, l, r) => vw(l) ++ vw(r)
      case VFnN(_, args) => args.flatMap(vw)
      case VCast(_, a) => vw(a)
      case _ => Seq.empty
    }
    fw(f)
  }

  /** Variables a pattern can bind (for EXISTS scope checks). */
  private def patternVars(p: Pattern): Set[String] = {
    def nodeVars(n: Node): Set[String] = n match {
      case Var(v) => Set(v)
      case QTriple(s, pp, o) => nodeVars(s) ++ nodeVars(pp) ++ nodeVars(o)
      case _ => Set.empty
    }
    def tpVars(tp: TriplePattern): Set[String] =
      Seq(tp.s, tp.p, tp.o).flatMap(nodeVars).toSet ++
        tp.graph.toSeq.flatMap(nodeVars)
    p match {
      case Group(elems) => elems.flatMap {
        case PatElem(tp) => tpVars(tp)
        case OptElem(inner) => patternVars(inner)
        case BindElem(_, as) => Set(as)
        case NestedElem(pp) => patternVars(pp)
        case SubSelectElem(q) => q.projection match {
          case SelectAll => patternVars(q.pattern)
          case SelectItems(items) => items.collect {
            case ItemVar(n) => n
            case ItemExpr(_, as) => as
            case ItemAgg(_, _, as, _, _) => as
          }.toSet
        }
        case ValuesElem(vars, _) => vars.toSet
        case PathElem(g, s, _, o) =>
          Seq(s, o).flatMap(nodeVars).toSet ++
            g.toSeq.flatMap(nodeVars)
        case MinusElem(_) => Set.empty[String]
        case ExistsElem(_, _) => Set.empty[String]
        case FilterElem(_) => Set.empty[String]
      }.toSet
      case Union(branches) => branches.flatMap(patternVars).toSet
    }
  }

  /** Attach `flag` = whether the inner pattern has at least one
    * solution compatible (§18.3) with the row's bindings. Probe shape:
    * distinct shared-variable bindings → left-semi against the inner
    * solution (compat condition) → equi-join back (null-safe, at most
    * one hit row per distinct binding) — hash-joinable at scale, and
    * the inner pattern evaluates once, not per row.
    */
  private def markExists(quads: DataFrame, sol: Sol, inner: Pattern,
      flag: String): Sol = {
    val innerSol = compileSol(quads, inner)
    val shared = sol.df.columns.filterNot(_.startsWith("#"))
      .filter(innerSol.df.columns.contains).toSeq
    val marked =
      if (shared.isEmpty) {
        // no shared bindings: pure pattern-nonemptiness, one row or none
        val any = innerSol.df.limit(1).select(lit(true).as(flag))
        sol.df.join(any, lit(true), "left_outer")
          .withColumn(flag, coalesce(col(flag), lit(false)))
      } else {
        val key = sol.df.select(shared.map(col): _*).distinct()
        val keySol = Sol(key, sol.maybe.intersect(shared.toSet))
        val hits = keySol.df.alias("l")
          .join(innerSol.df.alias("r"), compatCond(keySol, innerSol), "left_semi")
          .withColumn(flag, lit(true))
        val a = sol.df.alias("a")
        val b = hits.alias("b")
        val cond = shared.map(c => col(s"a.$c") <=> col(s"b.$c")).reduce(_ && _)
        a.join(b, cond, "left_outer")
          .select(sol.df.columns.map(c => col(s"a.$c")) :+
            coalesce(col(s"b.$flag"), lit(false)).as(flag): _*)
      }
    Sol(marked, sol.maybe)
  }

  /** Variables referenced by a filter expression. */
  private def varsOf(f: FExpr): Set[String] = f match {
    case FCmp(l, _, r) => varsOfV(l) ++ varsOfV(r)
    case FAnd(a, b) => varsOf(a) ++ varsOf(b)
    case FOr(a, b) => varsOf(a) ++ varsOf(b)
    case FNot(e) => varsOf(e)
    case FRegex(v, _, _) => Seq(v).collect { case Var(n) => n }.toSet
    case FStrFn(_, v, _) => Seq(v).collect { case Var(n) => n }.toSet
    case FTest(_, v) => Set(v)
    case FIn(e, items, _) => (e +: items).flatMap(varsOfV).toSet
    case FSameTerm(l, r) => varsOfV(l) ++ varsOfV(r)
    case FLangMatches(t, _) => varsOfV(t)
    case FEbv(e) => varsOfV(e)
    // an EXISTS operand evaluates against whatever is bound where the
    // filter applies; it imposes no binding requirement of its own
    case FExists(_, _) => Set.empty
    case FFlag(_, _) => Set.empty
  }

  /** Variables referenced by a value expression. */
  private def varsOfV(e: VExpr): Set[String] = e match {
    case VVar(n) => Set(n)
    case VConst(_) => Set.empty
    case VCoalesce(args) => args.flatMap(varsOfV).toSet
    case VFn(_, a) => varsOfV(a)
    case VBin(_, l, r) => varsOfV(l) ++ varsOfV(r)
    case VFnN(_, args) => args.flatMap(varsOfV).toSet
    case VIf(c, t, f) => varsOf(c) ++ varsOfV(t) ++ varsOfV(f)
    case VAgg(_, arg, _, _) => arg.map(varsOfV).getOrElse(Set.empty)
    case VCast(_, a) => varsOfV(a)
  }

  /** Aggregate calls appearing in a value / filter expression. */
  private def aggsOfV(e: VExpr): Seq[VAgg] = e match {
    case a: VAgg => Seq(a)
    case VCoalesce(args) => args.flatMap(aggsOfV)
    case VFn(_, a) => aggsOfV(a)
    case VBin(_, l, r) => aggsOfV(l) ++ aggsOfV(r)
    case VFnN(_, args) => args.flatMap(aggsOfV)
    case VIf(c, t, f) => aggsOfF(c) ++ aggsOfV(t) ++ aggsOfV(f)
    case VCast(_, a) => aggsOfV(a)
    case _ => Seq.empty
  }

  private def aggsOfF(f: FExpr): Seq[VAgg] = f match {
    case FCmp(l, _, r) => aggsOfV(l) ++ aggsOfV(r)
    case FAnd(a, b) => aggsOfF(a) ++ aggsOfF(b)
    case FOr(a, b) => aggsOfF(a) ++ aggsOfF(b)
    case FNot(e) => aggsOfF(e)
    case FIn(e, items, _) => (e +: items).flatMap(aggsOfV)
    case FSameTerm(l, r) => aggsOfV(l) ++ aggsOfV(r)
    case FLangMatches(t, _) => aggsOfV(t)
    case FEbv(e) => aggsOfV(e)
    case _ => Seq.empty
  }

  /** Replace each aggregate call with what `f` yields — the grouped
    * projection's hidden-column indirection.
    */
  private def substAggs(e: VExpr, f: VAgg => VExpr): VExpr = e match {
    case a: VAgg => f(a)
    case VCoalesce(args) => VCoalesce(args.map(substAggs(_, f)))
    case VFn(fn, a) => VFn(fn, substAggs(a, f))
    case VBin(op, l, r) => VBin(op, substAggs(l, f), substAggs(r, f))
    case VFnN(fn, args) => VFnN(fn, args.map(substAggs(_, f)))
    case VIf(c, t, el) => VIf(substAggsF(c, f), substAggs(t, f), substAggs(el, f))
    case VCast(dt, a) => VCast(dt, substAggs(a, f))
    case other => other
  }

  private def substAggsF(x: FExpr, f: VAgg => VExpr): FExpr = x match {
    case FCmp(l, op, r) => FCmp(substAggs(l, f), op, substAggs(r, f))
    case FAnd(a, b) => FAnd(substAggsF(a, f), substAggsF(b, f))
    case FOr(a, b) => FOr(substAggsF(a, f), substAggsF(b, f))
    case FNot(e) => FNot(substAggsF(e, f))
    case FIn(e, items, p) => FIn(substAggs(e, f), items.map(substAggs(_, f)), p)
    case FSameTerm(l, r) => FSameTerm(substAggs(l, f), substAggs(r, f))
    case FLangMatches(t, r) => FLangMatches(substAggs(t, f), r)
    case FEbv(e) => FEbv(substAggs(e, f))
    case other => other
  }

  /** Term struct type (for typed nulls off the quads schema). */
  private[sparql] val TERM_STRUCT = org.apache.spark.sql.types.StructType(
    Seq("termType", "lex", "datatype", "lang").map(
      org.apache.spark.sql.types.StructField(_,
        org.apache.spark.sql.types.StringType)))

  /** A filter operand via the contextual variable resolver — an
    * UNBOUND variable resolves to a typed null, and SPARQL
    * expression-error semantics then drop the row via three-valued
    * logic instead of failing analysis.
    */
  private def operandCol(n: Node, resolve: String => Column): Column = n match {
    case Var(v) => resolve(v)
    case Const(t) => termLit(t)
    case QTriple(_, _, _) =>
      throw new RdfParseException("quoted-triple patterns are not filter operands; use TRIPLE()")
  }

  private def compileFilter(f: FExpr, resolve: String => Column): Column = f match {
    case FFlag(n, positive) =>
      // EXISTS never errors: the mark column is a real true/false
      if (positive) col(n) else !col(n)
    case FExists(_, _) =>
      throw new RdfParseException(
        "EXISTS is supported only inside FILTER constraints " +
        "(not in HAVING, BIND or SELECT expressions)")
    case FAnd(a, b) => compileFilter(a, resolve) && compileFilter(b, resolve)
    case FOr(a, b) => compileFilter(a, resolve) || compileFilter(b, resolve)
    case FNot(e) =>
      // SPARQL error semantics: an error inside NOT stays an error
      // (row dropped) — Spark's three-valued !null matches exactly
      !compileFilter(e, resolve)
    case FRegex(v, pattern, flags) =>
      val pat = if (flags.contains("i")) "(?i)" + pattern else pattern
      operandCol(v, resolve).getField("lex").rlike(pat)
    case FStrFn(func, v, arg) =>
      val lex = operandCol(v, resolve).getField("lex")
      func match {
        case "CONTAINS" => lex.contains(arg)
        case "STRSTARTS" => lex.startsWith(arg)
        case "STRENDS" => lex.endsWith(arg)
        case other => throw new RdfParseException(s"unsupported string test $other")
      }
    case FTest(func, v) =>
      val c = resolve(v) // a never-bound var resolves to null → false
      func match {
        case "BOUND" => c.isNotNull
        case "ISIRI" | "ISURI" => c.getField("termType") === Term.IRI
        case "ISBLANK" => c.getField("termType") === Term.BLANK
        case "ISLITERAL" => c.getField("termType") === Term.LIT
        // a numeric TERM whose lexical form actually parses
        case "ISNUMERIC" => isNumericLit(c) && numValueOf(c).isNotNull
        case "ISTRIPLE" => c.getField("termType") === Term.TRIPLE
        // SPARQL 1.2: does the literal carry a language / a direction
        case "HASLANG" =>
          c.getField("termType") === Term.LIT && c.getField("lang").isNotNull
        case "HASLANGDIR" =>
          c.getField("termType") === Term.LIT &&
            c.getField("lang").rlike("--(ltr|rtl)$")
        case other => throw new RdfParseException(s"unsupported test $other")
      }
    case FIn(e, items, positive) =>
      val ec = compileExpr(e, resolve)
      val anyEq = items
        .map(i => valueEq(ec, compileExpr(i, resolve)))
        .reduce(_ || _)
      if (positive) anyEq else !anyEq
    case FSameTerm(l, r) =>
      // structural identity of the term structs, not value equality
      compileExpr(l, resolve) === compileExpr(r, resolve)
    case FLangMatches(t, range) =>
      val tc = compileExpr(t, resolve)
      val tag = lower(tc.getField("lex"))
      val matched =
        if (range == "*") tag.isNotNull && tag =!= ""
        else {
          val r = range.toLowerCase
          tag === r || tag.startsWith(r + "-")
        }
      // the tag operand must be a literal (§17.4.3.1) — an IRI or
      // blank node is a TYPE ERROR (row dropped), not a comparison
      // of its lex as if it were a language tag
      when(tc.getField("termType") === Term.LIT, matched)
        .otherwise(lit(null).cast("boolean"))
    case FEbv(e) =>
      val c = compileExpr(e, resolve)
      when(c.getField("termType") === Term.LIT &&
          c.getField("datatype") === Term.XSD_BOOLEAN,
          c.getField("lex") === "true" || c.getField("lex") === "1")
        .when(isNumericLit(c), numValueOf(c) =!= lit(0))
        .when(isPlainString(c), length(c.getField("lex")) > 0)
        .otherwise(lit(null).cast("boolean")) // type error → row dropped
    case FCmp(l, op, r) =>
      val lc = compileExpr(l, resolve)
      val rc = compileExpr(r, resolve)
      import graft.functions.TermOps
      op match {
        // SPARQL VALUE equality, not structural: "01"^^xsd:integer
        // equals "1"^^xsd:integer (graft.functions.TermValueEquals)
        case "=" => valueEq(lc, rc)
        case "!=" => !valueEq(lc, rc)
        // ordering is VALUE-space too: "9"^^xsd:integer <
        // "10"^^xsd:integer (numeric by BigDecimal; the lexical order
        // is inverted there). Incomparable operand kinds are a TYPE
        // ERROR (null), not false — so FILTER drops the row, !(…)
        // stays an error, and IF propagates the error (§17.2)
        case "<" => when(comparable(l, r, resolve), TermOps.termValueCompare(lc, rc) < 0)
        case ">" => when(comparable(l, r, resolve), TermOps.termValueCompare(lc, rc) > 0)
        case "<=" => when(comparable(l, r, resolve), TermOps.termValueCompare(lc, rc) <= 0)
        case ">=" => when(comparable(l, r, resolve), TermOps.termValueCompare(lc, rc) >= 0)
        case other => throw new RdfParseException(s"unsupported FILTER op '$other'")
      }
  }

  /** RDFterm-equal (§17.4.1.7) with the numeric-vs-non-numeric literal
    * corner as a TYPE ERROR rather than false: `"banana" = 3` errors,
    * so `?v NOT IN (3)` drops the banana row instead of keeping it.
    */
  private def valueEq(lc: Column, rc: Column): Column = {
    val bothLit = lc.getField("termType") === Term.LIT &&
      rc.getField("termType") === Term.LIT
    when(bothLit && (isNumericLit(lc) =!= isNumericLit(rc)),
      lit(null).cast("boolean"))
      .otherwise(graft.functions.TermOps.termValueEquals(lc, rc))
  }

  /** SPARQL ordering comparability (spec §17.3, operator mapping):
    * numeric-vs-numeric and string-vs-string compare; anything else is
    * a type error, i.e. FILTER false. With a constant side this
    * resolves statically to a plain datatype/lang predicate on the
    * other operand (pushable); var-vs-var takes the column form.
    */
  private def comparable(l: VExpr, r: VExpr, resolve: String => Column): Column = (l, r) match {
    case (VConst(t), e) => comparableWith(compileExpr(e, resolve), t)
    case (e, VConst(t)) => comparableWith(compileExpr(e, resolve), t)
    case _ =>
      val a = compileExpr(l, resolve)
      val b = compileExpr(r, resolve)
      when(isNumericLit(a) || isNumericLit(b), isNumericLit(a) && isNumericLit(b))
        .when(isPlainString(a) || isPlainString(b), isPlainString(a) && isPlainString(b))
        .otherwise(lit(true)) // IRI/blank/lang-tagged: total order (extension)
  }

  private def isNumericLit(c: Column): Column =
    c.getField("termType") === Term.LIT &&
      // datatype is null for plain literals — that's false, not unknown
      coalesce(c.getField("datatype")
        .isin(graft.functions.TermOps.NUMERIC_DATATYPES.toSeq: _*), lit(false))

  private def isPlainString(c: Column): Column =
    c.getField("termType") === Term.LIT && c.getField("lang").isNull &&
      (c.getField("datatype").isNull || c.getField("datatype") === Term.XSD_STRING)

  private def comparableWith(c: Column, t: Term): Column = {
    import graft.functions.TermOps.NUMERIC_DATATYPES
    val isLit = c.getField("termType") === Term.LIT
    if (t.termType == Term.LIT && t.datatype != null &&
        NUMERIC_DATATYPES.contains(t.datatype))
      isLit && c.getField("datatype").isin(NUMERIC_DATATYPES.toSeq: _*)
    else if (t.termType == Term.LIT && t.lang == null &&
        (t.datatype == null || t.datatype == Term.XSD_STRING))
      isPlainString(c)
    else lit(true) // IRI/blank/lang-tagged: total order (extension)
  }

  /** Solve a graph pattern to a bindings DataFrame (one column per
    * variable) — the WHERE-clause engine shared with [[SparqlUpdate]].
    */
  private[sparql] def solve(quads: DataFrame, pattern: Pattern): DataFrame =
    compile(quads, pattern)

  /** Instantiate triple-pattern templates from a solutions DataFrame
    * (CONSTRUCT and the update DELETE/INSERT templates): each pattern
    * becomes a column selection over the bindings — vars project their
    * column, constants become literal term structs. Instantiations
    * using an unbound variable are skipped (spec §16.2 / §3.1.3.2).
    * One DataFrame per pattern, quad columns only.
    */
  private[sparql] def instantiate(sols: DataFrame,
      tpl: Seq[TriplePattern]): Seq[DataFrame] = {
    val termType = org.apache.spark.sql.types.StructType(
      Seq("termType", "lex", "datatype", "lang")
        .map(org.apache.spark.sql.types.StructField(_,
          org.apache.spark.sql.types.StringType)))
    tpl.flatMap { tp =>
      val slots = Seq(
        tp.graph.getOrElse(Const(null)) -> "graph",
        tp.s -> "subject", tp.p -> "predicate", tp.o -> "obj")
      def varsIn(n: Node): Seq[String] = n match {
        case Var(v) => Seq(v)
        case QTriple(s, p, o) => Seq(s, p, o).flatMap(varsIn)
        case _ => Seq.empty
      }
      val vars = slots.flatMap { case (n, _) => varsIn(n) }
      // a template var absent from the solutions is unbound in every
      // row → the whole pattern instantiates to nothing
      if (vars.exists(v => !sols.columns.contains(v))) None
      else {
        def nodeCol(n: Node): Column = n match {
          case Var(v) => col(v)
          case Const(null) => lit(null).cast(termType)
          case Const(t) => termLit(t)
          // CONSTRUCT-star: re-quote per row from the bound components
          case QTriple(s, p, o) =>
            graft.functions.TermStar.quotedOf(nodeCol(s), nodeCol(p), nodeCol(o))
        }
        val cols = slots.map { case (n, as) => nodeCol(n).as(as) }
        val bound = vars.foldLeft(sols)((d, v) => d.filter(col(v).isNotNull))
        // a quoted-triple template whose bound components don't form a
        // valid RDF-star triple (e.g. a literal subject) instantiates
        // to NULL — that solution produces no triple (§16.2), rather
        // than a quad with a null slot
        val starSlots = slots.collect {
          case (QTriple(_, _, _), as) => as }
        val out = bound.select(cols: _*)
        Some(starSlots.foldLeft(out)((d, c) => d.filter(col(c).isNotNull)))
      }
    }
  }

  private[sparql] def termLit(t: Term): Column =
    struct(lit(t.termType).as("termType"), lit(t.lex).as("lex"),
      lit(t.datatype).cast("string").as("datatype"), lit(t.lang).cast("string").as("lang"))

  /** One triple pattern → filtered projection with one column per
    * variable. Constant terms become null-safe comparisons on the term
    * struct fields (pushable); the default graph is `graph IS NULL`,
    * `GRAPH ?g` binds only named graphs (SPARQL dataset semantics).
    */
  /** Constant-term match as LEAF-FIELD comparisons rather than one
    * struct <=>: parquet cannot evaluate a struct equality against
    * row-group statistics, but `subject.lex = '…'` maps to a column
    * predicate on the leaf and skips row groups/pages at 100 TB.
    */
  private[sparql] def termEqFields(c: String, t: Term): Column =
    col(s"$c.termType") === t.termType && col(s"$c.lex") === t.lex &&
      col(s"$c.datatype") <=> lit(t.datatype).cast("string") &&
      col(s"$c.lang") <=> lit(t.lang).cast("string")

  private def compilePattern(quads: DataFrame, tp: TriplePattern): DataFrame = {
    var df = tp.graph match {
      case None => quads.filter(col("graph").isNull)
      case Some(Const(t)) => quads.filter(termEqFields("graph", t))
      case Some(Var(_)) => quads.filter(col("graph").isNotNull)
      case Some(QTriple(_, _, _)) => quads.limit(0) // graph label is never a triple
    }
    val slots: Seq[(String, Node)] = Seq(
      "subject" -> tp.s, "predicate" -> tp.p, "obj" -> tp.o) ++
      tp.graph.collect { case v: Var => "graph" -> (v: Node) }
    // walk each slot: top-level constants stay LEAF-FIELD filters
    // (parquet-pushable); SPARQL-star quoted-triple patterns narrow to
    // termType='triple' (still a leaf predicate) then destructure via
    // TermStar component extraction — variable bindings collect as
    // (name, column-expression) pairs either way
    val binds = scala.collection.mutable.ArrayBuffer[(String, Column)]()
    def walk(c: Column, n: Node): Unit = n match {
      case Const(t) =>
        // ONE struct comparison, not four field reads: `c` may be a
        // component-extraction expression, and field-wise compare
        // would re-parse the quoted lex once per field
        df = df.filter(c <=> termLit(t))
      case Var(n0) => binds += n0 -> c
      case QTriple(s, p, o) =>
        df = df.filter(c.getField("termType") === Term.TRIPLE)
        walk(graft.functions.TermStar.componentOf(c, 0), s)
        walk(graft.functions.TermStar.componentOf(c, 1), p)
        walk(graft.functions.TermStar.componentOf(c, 2), o)
    }
    slots.foreach {
      case (cName, Const(t)) => df = df.filter(termEqFields(cName, t))
      case (cName, node) => walk(col(cName), node)
    }
    // repeated vars within the pattern force equality
    binds.groupBy(_._1).values.filter(_.size > 1).foreach { dup =>
      dup.toSeq.map(_._2).sliding(2).foreach {
        case Seq(c1, c2) => df = df.filter(c1 <=> c2)
        case _ => ()
      }
    }
    val proj = binds.toMap
    df.select(proj.toSeq.map { case (n, c) => c.as(n) }: _*)
  }

  // --- parser ---------------------------------------------------------------

  def parse(text: String): Query = new Parser(text).parseQuery()

  /** Recursive-descent SPARQL tokenizer/parser. Package-visible so
    * [[SparqlUpdate]] reuses the term/group grammar for update
    * requests (same prologue, node, and group productions).
    */
  private[sparql] final class Parser(text: String) {
    private[sparql] var pos = 0

    /** Full request: prologue + SELECT | ASK | CONSTRUCT. */
    def parseRequest(): Request = {
      parsePrologue()
      if (tryKeyword("ASK")) {
        tryKeyword("WHERE") // `ASK WHERE { … }` — WHERE is optional (§19.8 AskQuery)
        val pattern = parseGroup()
        expectEnd()
        AskReq(pattern)
      } else if (tryKeyword("CONSTRUCT")) {
        def triplesOf(p: Pattern): Seq[TriplePattern] = p match {
          case Group(elems) => elems.map {
            case PatElem(tp) => tp
            case other => fail(
              s"CONSTRUCT template allows only triple patterns, found ${other.getClass.getSimpleName}")
          }
          case _ => fail("CONSTRUCT template cannot contain UNION")
        }
        // `CONSTRUCT WHERE { tps }` shorthand (§16.2.4): the pattern
        // doubles as the template
        // SolutionModifier: ORDER BY, then LIMIT/OFFSET in either order
        def modifiers(): (Seq[OrderKey], Option[Int], Option[Int]) = {
          val order =
            if (tryKeyword("ORDER")) { keyword("BY"); parseOrderKeys() }
            else Seq.empty
          var limit: Option[Int] = None
          var offset: Option[Int] = None
          var more = true
          while (more) {
            if (limit.isEmpty && tryKeyword("LIMIT")) limit = Some(parseInt())
            else if (offset.isEmpty && tryKeyword("OFFSET")) offset = Some(parseInt())
            else more = false
          }
          (order, limit, offset)
        }
        if (tryKeyword("WHERE")) {
          val pattern = parseGroup()
          val tpl = triplesOf(pattern)
          val (order, limit, offset) = modifiers()
          expectEnd()
          ConstructReq(tpl, pattern, order, limit, offset)
        } else {
          val tpl = triplesOf(parseGroup())
          keyword("WHERE")
          val pattern = parseGroup()
          val (order, limit, offset) = modifiers()
          expectEnd()
          ConstructReq(tpl, pattern, order, limit, offset)
        }
      } else if (tryKeyword("DESCRIBE")) {
        skipWs()
        if (pos < text.length && peek == '*') { // DESCRIBE * — all WHERE vars
          pos += 1
          skipWs()
          if (!tryKeyword("WHERE") && (pos >= text.length || peek != '{'))
            fail("DESCRIBE * needs a WHERE pattern")
          val pattern = parseGroup()
          expectEnd()
          return DescribeReq(Seq.empty, Some(pattern), all = true)
        }
        val nodes = scala.collection.mutable.ArrayBuffer[Node]()
        skipWs()
        // VarOrIri list: ?var, <iri>, or prefixed name — stop at WHERE
        // or '{' (a keyword-check that consumes nothing on WHERE match
        // would mis-read `WHERE` as a pname)
        var more = true
        while (more) {
          skipWs()
          if (pos >= text.length || peek == '{') more = false
          else if (peek == '?' || peek == '<') nodes += parseNode()
          else {
            val save = pos
            if (tryKeyword("WHERE")) { pos = save; more = false }
            else if (peek.isLetter || peek == ':') nodes += parseNode()
            else more = false
          }
        }
        if (nodes.isEmpty) fail("DESCRIBE needs at least one IRI or variable")
        skipWs()
        val pattern = // WHERE is optional before the group (§19.8 WhereClause)
          if (tryKeyword("WHERE") || (pos < text.length && peek == '{'))
            Some(parseGroup())
          else None
        expectEnd()
        DescribeReq(nodes.toSeq, pattern)
      } else SelectReq(parseQuery())
    }

    private def expectEnd(): Unit = {
      skipWs()
      if (pos < text.length) fail(s"trailing content: '${text.substring(pos).take(20)}'")
    }

    def parseQuery(): Query = {
      parsePrologue()
      keyword("SELECT")
      val q = parseSelectTail()
      skipWs()
      if (pos < text.length) fail(s"trailing content: '${text.substring(pos).take(20)}'")
      q
    }

    /** Everything after the SELECT keyword — shared between top-level
      * queries and sub-SELECTs (which stop at the enclosing '}').
      */
    private def parseSelectTail(): Query = {
      // REDUCED *permits* duplicate elimination (§15.3.2); eliminating
      // them fully is a conformant answer and reuses the DISTINCT path
      val distinct = tryKeyword("DISTINCT") || tryKeyword("REDUCED")
      val projection = parseProjection()
      // DatasetClause* (spec §13.2)
      val from = scala.collection.mutable.ArrayBuffer[Term]()
      val fromNamed = scala.collection.mutable.ArrayBuffer[Term]()
      var moreFrom = true
      while (moreFrom) {
        if (tryKeyword("FROM")) {
          val named = tryKeyword("NAMED")
          parseNode() match {
            case Const(t) if t.isIri => if (named) fromNamed += t else from += t
            case _ => fail("FROM expects an IRI")
          }
        } else moreFrom = false
      }
      tryKeyword("WHERE")
      val pattern = parseGroup()
      // GroupCondition subset: ?v | '(' expr AS ?x ')'
      val groupExprs = scala.collection.mutable.ArrayBuffer[(VExpr, String)]()
      val groupBy =
        if (tryKeyword("GROUP")) {
          keyword("BY")
          val keys = scala.collection.mutable.ArrayBuffer[String]()
          var moreKeys = true
          while (moreKeys) {
            skipWs()
            if (peek == '?') keys += parseVar()
            else if (peek == '(') {
              pos += 1
              val e = parseAdditive()
              keyword("AS")
              val as = parseVar()
              expect(')')
              groupExprs += ((e, as))
              keys += as
            } else moreKeys = false
          }
          if (keys.isEmpty) fail("expected at least one GROUP BY key")
          keys.toSeq
        } else Seq.empty
      // HavingClause: HAVING '(' constraint ')'+ — each constraint is
      // a full FILTER expression; aggregate calls parse via VAgg
      val having =
        if (tryKeyword("HAVING")) {
          val fs = scala.collection.mutable.ArrayBuffer[FExpr]()
          skipWs()
          while (peek == '(') {
            expect('('); fs += parseFilterOr(); expect(')'); skipWs()
          }
          if (fs.isEmpty) fail("HAVING needs at least one (constraint)")
          fs.toSeq
        } else Seq.empty
      val orderBy =
        if (tryKeyword("ORDER")) { keyword("BY"); parseOrderKeys() } else Seq.empty
      // LimitOffsetClauses: either order, each at most once
      var limit: Option[Int] = None
      var offset: Option[Int] = None
      var more = true
      while (more) {
        if (limit.isEmpty && tryKeyword("LIMIT")) limit = Some(parseInt())
        else if (offset.isEmpty && tryKeyword("OFFSET")) offset = Some(parseInt())
        else more = false
      }
      // trailing ValuesClause (§7.2): for an UNGROUPED query it joins
      // the WHERE solutions (nesting the original group keeps its
      // FILTER scopes intact — exactly the spec's Join(pattern, data));
      // a GROUPED query must join it AFTER aggregation and HAVING
      // (§18.2.4.3 — the pre-pattern join would multiply rows before
      // COUNT/SUM), so it travels separately on the Query
      // SELECT * projects every in-scope variable, which a grouped
      // query cannot do (§18.2.4.4 — only group keys and aggregates
      // are projectable); rejecting here also keeps the grouped
      // trailing-VALUES routing below total
      if (projection == SelectAll && (groupBy.nonEmpty || having.nonEmpty))
        fail("SELECT * cannot be combined with GROUP BY or HAVING")
      val isGrouped = groupBy.nonEmpty || having.nonEmpty ||
        (projection match {
          case SelectItems(items) => items.exists {
            case _: ItemAgg => true
            case ItemExpr(e, _) => aggsOfV(e).nonEmpty
            case _ => false
          }
          case _ => false
        }) || orderBy.exists(k => aggsOfV(k.expr).nonEmpty)
      val (fullPattern, trailingValues) =
        if (tryKeyword("VALUES")) {
          val v = parseValuesElem()
          if (isGrouped) (pattern, Some(v))
          else (Group(Seq(NestedElem(pattern), v)): Pattern, None)
        } else (pattern, None)
      Query(projection, fullPattern, groupBy, having, orderBy, limit, offset,
        distinct, from.toSeq, fromNamed.toSeq, groupExprs.toSeq, trailingValues)
    }

    private def parseProjection(): Projection = {
      skipWs()
      if (peek == '*') { pos += 1; return SelectAll }
      val items = scala.collection.mutable.ArrayBuffer[SelectItem]()
      var done = false
      while (!done) {
        skipWs()
        if (peek == '?') items += ItemVar(parseVar())
        else if (peek == '(') {
          // `(expr AS ?x)`: a bare aggregate call keeps the dedicated
          // ItemAgg form (raw SQL output at the top level); any other
          // expression — possibly containing aggregate calls — is an
          // expression projection
          pos += 1
          val e = parseAdditive()
          keyword("AS")
          val as = parseVar()
          expect(')')
          items += (e match {
            case VAgg(func, arg, isDistinct, sep) => ItemAgg(func, arg, as, isDistinct, sep)
            case other => ItemExpr(other, as)
          })
        } else done = true
      }
      if (items.isEmpty) fail("expected projection variables or aggregates")
      SelectItems(items.toSeq)
    }

    /** `FUNC([DISTINCT] expr|*) [; SEPARATOR="…"]` — the aggregate
      * call shared by projection items and HAVING conjuncts; the
      * argument is a full value expression (SUM(?a * ?b)).
      */
    private def parseAggCall(): (String, Option[VExpr], Boolean, String) = {
      val func = Seq("GROUP_CONCAT", "COUNT", "SUM", "MIN", "MAX", "AVG", "SAMPLE")
        .find(tryKeyword).getOrElse(fail("expected an aggregate function"))
      expect('(')
      val isDistinct = tryKeyword("DISTINCT")
      skipWs()
      val arg =
        if (peek == '*') {
          if (func != "COUNT") fail(s"$func requires an expression argument")
          pos += 1; None
        } else Some(parseAdditive())
      var sep = " "
      if (func == "GROUP_CONCAT") {
        skipWs()
        if (peek == ';') { pos += 1; keyword("SEPARATOR"); expect('='); sep = parseStringLit() }
      }
      expect(')')
      (func, arg, isDistinct, sep)
    }

    private def parseVarList(): Seq[String] = {
      val vs = scala.collection.mutable.ArrayBuffer[String]()
      skipWs()
      while (pos < text.length && peek == '?') { vs += parseVar(); skipWs() }
      if (vs.isEmpty) fail("expected at least one ?variable")
      vs.toSeq
    }

    /** `(?v | ASC(expr) | DESC(expr) | (expr))+` — expression keys may
      * contain aggregate calls in a grouped query.
      */
    private def parseOrderKeys(): Seq[OrderKey] = {
      val ks = scala.collection.mutable.ArrayBuffer[OrderKey]()
      var more = true
      while (more) {
        skipWs()
        if (peek == '?') ks += OrderKey(VVar(parseVar()))
        else if (tryKeyword("DESC")) {
          expect('('); ks += OrderKey(parseAdditive(), descending = true); expect(')')
        } else if (tryKeyword("ASC")) {
          expect('('); ks += OrderKey(parseAdditive()); expect(')')
        } else if (peek == '(') {
          pos += 1; ks += OrderKey(parseAdditive()); expect(')')
        } else more = false
      }
      if (ks.isEmpty) fail("expected at least one ORDER BY key")
      ks.toSeq
    }

    private[sparql] def parseGroup(): Pattern = {
      expect('{')
      locally {
        val elems = scala.collection.mutable.ArrayBuffer[GroupElem]()
        var done = false
        while (!done) {
          skipWs()
          if (pos >= text.length) fail("unterminated group pattern")
          else if (peek == '}') { pos += 1; done = true }
          else if (peek == '{') {
            // sub-SELECT, or a nested group pattern (possibly the head
            // of a UNION chain: `{A} UNION {B}` groups as Union(A,B))
            val save = pos
            pos += 1
            skipWs()
            val isSub = text.regionMatches(true, pos, "SELECT", 0, 6) &&
              (pos + 6 >= text.length || !text.charAt(pos + 6).isLetterOrDigit)
            pos = save
            if (isSub) {
              expect('{')
              keyword("SELECT")
              val q = parseSelectTail()
              expect('}')
              elems += SubSelectElem(q)
            } else {
              var p: Pattern = parseGroup()
              while (tryKeyword("UNION")) p = p match {
                case Union(bs) => Union(bs :+ parseGroup())
                case x => Union(Seq(x, parseGroup()))
              }
              elems += NestedElem(p)
            }
          }
          else if (tryKeyword("OPTIONAL")) elems += OptElem(parseGroup())
          else if (tryKeyword("BIND")) {
            expect('(')
            val e = parseVExpr()
            keyword("AS")
            val v = parseVar()
            expect(')')
            elems += BindElem(e, v)
          } else if (tryKeyword("GRAPH")) {
            val g = parseNode()
            parseGroup() match {
              case Group(es) if es.forall(e =>
                  e.isInstanceOf[PatElem] || e.isInstanceOf[FilterElem] ||
                  e.isInstanceOf[PathElem]) =>
                elems ++= es.map {
                  case PatElem(tp) => PatElem(tp.copy(graph = Some(g)))
                  case pe: PathElem => pe.copy(graph = Some(g))
                  case other => other
                }
              case _ => fail("GRAPH block must contain a basic pattern")
            }
            // Quads grammar allows '.' between GRAPH blocks and triples
            skipWs()
            if (pos < text.length && peek == '.') pos += 1
          } else if (tryKeyword("SERVICE")) {
            // Federated query (SPARQL 1.1 §) dereferences a remote
            // endpoint mid-query; this engine has no remote access by
            // design — same posture as SPARQL Update LOAD. Parse far
            // enough to give a precise error, never misparse.
            fail("SERVICE (federated query) is not supported: " +
              "materialize the remote data as a named graph and query it with GRAPH")
          } else if (tryKeyword("MINUS")) {
            elems += MinusElem(parseGroup())
          } else if (tryKeyword("FILTER")) {
            if (tryKeyword("NOT")) {
              keyword("EXISTS")
              elems += ExistsElem(parseGroup(), positive = false)
            } else if (tryKeyword("EXISTS")) {
              elems += ExistsElem(parseGroup(), positive = true)
            } else {
              expect('(')
              val f = parseFilterOr()
              expect(')')
              elems += FilterElem(f)
            }
          } else if (tryKeyword("VALUES")) {
            elems += parseValuesElem()
          } else {
            val (s, pre) = parseTripleNode()
            elems ++= pre
            skipWs()
            // a bare `[ ...props ]` block needs no outer predicate
            if (!(pre.nonEmpty && (peek == '.' || peek == '}')))
              elems ++= parsePropertyList(s)
            skipWs()
            if (pos < text.length && peek == '.') pos += 1
          }
        }
        Group(elems.toSeq)
      }
    }

    /** `Verb ObjectList (';' (Verb ObjectList)?)*` — predicate-object
      * lists with ',' object lists. Nested blank-node property lists
      * emit their triples alongside.
      */
    private def parsePropertyList(s: Node): Seq[GroupElem] = {
      val out = scala.collection.mutable.ArrayBuffer[GroupElem]()
      var moreProps = true
      while (moreProps) {
        val pred = parsePredicate()
        var moreObjs = true
        while (moreObjs) {
          val (o, post) = parseTripleNode()
          pred match {
            case Left(p) => out += PatElem(TriplePattern(None, s, p, o))
            case Right(path) => out += PathElem(None, s, path, o)
          }
          out ++= post
          skipWs()
          if (peek == ',') pos += 1 else moreObjs = false
        }
        skipWs()
        var sawSemi = false
        while (peek == ';') { pos += 1; skipWs(); sawSemi = true }
        if (!sawSemi || peek == '.' || peek == '}' || peek == ']') moreProps = false
      }
      out.toSeq
    }

    /** A node in triple subject/object position: a plain node, a
      * blank-node property list `[ ... ]`, or a collection `( ... )`.
      * Both sugars bind FRESH internal variables ('#'-prefixed — they
      * join like any variable, are invisible to SELECT * / DISTINCT,
      * and are stripped with the other hidden columns; a blank node in
      * a query is just an unnamed variable). A collection matches an
      * rdf:first/rdf:rest chain of exactly the listed items — the
      * shape [[graft.rdf.JsonLdParser]] `@list` /
      * [[graft.rdf.RdfXmlParser]] `parseType="Collection"` emit.
      */
    private var blankN = 0
    private def freshVar(): Var = { blankN += 1; Var(s"#b$blankN") }
    private def parseTripleNode(): (Node, Seq[GroupElem]) = {
      skipWs()
      if (peek == '[') {
        pos += 1
        skipWs()
        val v = freshVar()
        val inner =
          if (peek == ']') Seq.empty
          else parsePropertyList(v)
        expect(']')
        (v, inner)
      } else if (peek == '(') {
        pos += 1
        skipWs()
        if (peek == ')') { pos += 1; (Const(Term.iri(Term.RDF_NIL)), Seq.empty) }
        else {
          val items = scala.collection.mutable.ArrayBuffer[(Node, Seq[GroupElem])]()
          while (peek != ')') { items += parseTripleNode(); skipWs() }
          pos += 1
          val out = scala.collection.mutable.ArrayBuffer[GroupElem]()
          val head = freshVar()
          var cur: Var = head
          items.zipWithIndex.foreach { case ((n, extra), i) =>
            out ++= extra
            out += PatElem(TriplePattern(None, cur,
              Const(Term.iri(Term.RDF_FIRST)), n))
            val rest: Node =
              if (i == items.size - 1) Const(Term.iri(Term.RDF_NIL))
              else freshVar()
            out += PatElem(TriplePattern(None, cur,
              Const(Term.iri(Term.RDF_REST)), rest))
            rest match { case v: Var => cur = v; case _ => () }
          }
          (head, out.toSeq)
        }
      } else (parseNode(), Seq.empty)
    }

    /** Predicate position: a plain node (IRI/var/`a`) or a property
      * path. Path grammar: alt := seq ('|' seq)* ; seq := elt ('/'
      * elt)* ; elt := '^'? prim ('+'|'*'|'?')? ; prim := iri | '('
      * alt ')'. A modifier must touch its operand (`ex:p?` is a
      * modifier, `ex:p ?o` is the object variable).
      */
    private def parsePredicate(): Either[Node, PathExpr] = {
      skipWs()
      if (peek == '?') Left(Var(parseVar()))
      else {
        val path = parsePathAlt()
        path match {
          case PLink(t) => Left(Const(t))
          case p => Right(p)
        }
      }
    }

    private def parsePathAlt(): PathExpr = {
      var e = parsePathSeq()
      skipWs()
      while (pos < text.length && peek == '|') { pos += 1; e = PAlt(e, parsePathSeq()); skipWs() }
      e
    }

    private def parsePathSeq(): PathExpr = {
      var e = parsePathElt()
      skipWs()
      while (pos < text.length && peek == '/') { pos += 1; e = PSeq(e, parsePathElt()); skipWs() }
      e
    }

    private def parsePathElt(): PathExpr = {
      skipWs()
      val inv = if (peek == '^') { pos += 1; true } else false
      val prim: PathExpr =
        if (peek == '!') { pos += 1; parseNegatedSet() }
        else if (peek == '(') { pos += 1; val e = parsePathAlt(); expect(')'); e }
        else parseNode() match {
          case Const(t) if t.isIri => PLink(t)
          case _ => fail("a path element must be an IRI or a parenthesized path")
        }
      // modifiers bind only when directly adjacent (no whitespace)
      val modified =
        if (pos < text.length) text.charAt(pos) match {
          case '+' => pos += 1; PPlus(prim)
          case '*' => pos += 1; PStar(prim)
          case '?' => pos += 1; POpt(prim)
          case '{' => pos += 1; parseRepeat(prim)
          case _ => prim
        } else prim
      if (inv) PInv(modified) else modified
    }

    /** `p{n}` / `p{n,m}` / `p{n,}` repetition (the widely-used ARQ
      * extension; dropped from the final SPARQL 1.1 grammar) —
      * REWRITTEN onto the standard combinators so the engine needs no
      * new operator: bounded forms become an alternation of sequence
      * chains (optionally `?`-wrapped when n=0), `{n,}` becomes
      * `p/…/p/p+`. Bounds cap at 16: the rewrite is exponential-free
      * but a chain of joins, and beyond that `+`/`*`'s doubling
      * closure is the right tool.
      */
    private def parseRepeat(p: PathExpr): PathExpr = {
      skipWs()
      val lo = parseInt()
      skipWs()
      val hi: Option[Int] = // None = unbounded {n,}
        if (peek == ',') {
          pos += 1; skipWs()
          if (peek == '}') None else Some(parseInt())
        } else Some(lo)
      skipWs()
      expect('}')
      val cap = 16
      if (lo > cap || hi.exists(_ > cap))
        fail(s"path repetition bounds cap at $cap (use + or * beyond)")
      if (hi.exists(_ < lo)) fail(s"path repetition {$lo,${hi.get}} is empty")
      if (lo == 0 && hi.contains(0))
        fail("path repetition {0} (the zero-length path) is not supported")
      def chain(k: Int): PathExpr = (2 to k).foldLeft(p: PathExpr)((e, _) => PSeq(e, p))
      hi match {
        case None => // {n,}: n-1 fixed hops, then one-or-more
          if (lo <= 0) PStar(p)
          else if (lo == 1) PPlus(p)
          else PSeq(chain(lo - 1), PPlus(p))
        case Some(m) => // {n,m}: alternation of chains, ?-wrapped if n=0
          val from = math.max(lo, 1)
          val alts = (from to m).map(chain).reduce(PAlt(_, _))
          if (lo == 0) POpt(alts) else alts
      }
    }

    /** After '!': a single (possibly inverted) IRI or a '('-list of
      * them separated by '|'.
      */
    private def parseNegatedSet(): PathExpr = {
      val fwd = scala.collection.mutable.ArrayBuffer[Term]()
      val inv = scala.collection.mutable.ArrayBuffer[Term]()
      def one(): Unit = {
        skipWs()
        val inverted = if (peek == '^') { pos += 1; true } else false
        parseNode() match {
          case Const(t) if t.isIri => if (inverted) inv += t else fwd += t
          case _ => fail("a negated property set lists IRIs")
        }
      }
      skipWs()
      if (peek == '(') {
        pos += 1
        one()
        skipWs()
        while (peek == '|') { pos += 1; one(); skipWs() }
        expect(')')
      } else one()
      PNeg(fwd.toSeq, inv.toSeq)
    }

    /** The data block after the VALUES keyword — shared between the
      * in-group form and the trailing query-level clause (§7.2).
      */
    private def parseValuesElem(): ValuesElem = {
      skipWs()
      val vars =
        if (peek == '(') {
          expect('('); val vs = parseVarList(); expect(')'); vs
        } else Seq(parseVar())
      val single = vars.size == 1
      expect('{')
      val rows = scala.collection.mutable.ArrayBuffer[Seq[Option[Term]]]()
      skipWs()
      while (peek != '}') {
        val cells =
          if (single) Seq(parseValuesCell())
          else {
            expect('(')
            val cs = vars.map(_ => parseValuesCell())
            expect(')')
            cs
          }
        rows += cells
        skipWs()
      }
      expect('}')
      if (rows.isEmpty) fail("VALUES needs at least one data row")
      ValuesElem(vars, rows.toSeq)
    }

    private def parseValuesCell(): Option[Term] =
      if (tryKeyword("UNDEF")) None
      else parseNode() match {
        case Const(t) => Some(t)
        case _ => fail("VALUES data must be constant terms or UNDEF")
      }

    // FILTER grammar: or := and ('||' and)* ; and := cmp ('&&' cmp)* ;
    // cmp := '(' or ')' | operand OP operand — standard precedence,
    // parenthesized sub-expressions allowed
    private def parseFilterOr(): FExpr = {
      var e = parseFilterAnd()
      while (tryToken("||")) e = FOr(e, parseFilterAnd())
      e
    }

    private def parseFilterAnd(): FExpr = {
      var e = parseFilterCmp()
      while (tryToken("&&")) e = FAnd(e, parseFilterCmp())
      e
    }

    private def parseFilterCmp(): FExpr = {
      skipWs()
      if (peek == '(') {
        // ambiguous '(': a parenthesized boolean (`(?x < 3) || …`) or a
        // parenthesized arithmetic operand (`(?a + ?b) > 3`). Try the
        // boolean reading; if it fails, or the closing paren is
        // followed by a comparison/arithmetic operator, re-read as an
        // expression operand
        val save = pos
        val asBool: Option[FExpr] =
          try {
            expect('('); val e = parseFilterOr(); expect(')')
            skipWs()
            val c = peek
            if ("=<>+-*/".indexOf(c.toInt) >= 0 ||
                (c == '!' && pos + 1 < text.length && text.charAt(pos + 1) == '='))
              None
            else Some(e)
          } catch { case _: RdfParseException => None }
        asBool.getOrElse { pos = save; parseCmpTail() }
      }
      else if (peek == '!' && pos + 1 < text.length && text.charAt(pos + 1) != '=') {
        pos += 1
        FNot(parseFilterCmp())
      } else if (tryKeyword("REGEX")) {
        expect('('); val v = parseNode(); expect(',')
        val pat = parseStringLit()
        skipWs()
        val flags = if (peek == ',') { pos += 1; parseStringLit() } else ""
        expect(')')
        FRegex(v, pat, flags)
      } else if (tryKeyword("CONTAINS") || tryKeyword("STRSTARTS") ||
                 tryKeyword("STRENDS")) {
        val func = text.substring(0, pos).trim.split("[^A-Za-z]").last.toUpperCase
        expect('('); val v = parseNode(); expect(',')
        val arg = parseStringLit()
        expect(')')
        FStrFn(func, v, arg)
      } else if (tryKeyword("SAMETERM")) {
        expect('('); val a = parseAdditive(); expect(',')
        val b = parseAdditive(); expect(')')
        FSameTerm(a, b)
      } else if (tryKeyword("LANGMATCHES")) {
        expect('('); val t = parseAdditive(); expect(',')
        val r = parseStringLit(); expect(')')
        FLangMatches(t, r)
      } else if (tryKeyword("BOUND") || tryKeyword("ISIRI") || tryKeyword("ISURI") ||
                 tryKeyword("ISBLANK") || tryKeyword("ISLITERAL") ||
                 tryKeyword("ISNUMERIC") || tryKeyword("ISTRIPLE") ||
                 tryKeyword("HASLANGDIR") || tryKeyword("HASLANG")) {
        val func = text.substring(0, pos).trim.split("[^A-Za-z]").last.toUpperCase
        expect('('); val v = parseVar(); expect(')')
        FTest(func, v)
      } else if (tryKeyword("EXISTS")) {
        // EXISTS as an expression operand (§17.4.1.4) — combinable
        // with || / && / ! unlike the standalone FILTER EXISTS form
        FExists(parseGroup(), positive = true)
      } else if (tryKeyword("NOT")) {
        // at operand position a bare NOT must be NOT EXISTS
        // (negation of an expression is spelled !)
        keyword("EXISTS")
        FExists(parseGroup(), positive = false)
      } else parseCmpTail()
    }

    /** expression (op expression | [NOT] IN list)? — a bare expression
      * in boolean position falls through to EBV.
      */
    private def parseCmpTail(): FExpr = {
      val l = parseAdditive()
      skipWs()
      val op =
        if (tryToken("!=")) "!=" else if (tryToken("<=")) "<="
        else if (tryToken(">=")) ">=" else if (tryToken("=")) "="
        else if (tryToken("<")) "<" else if (tryToken(">")) ">"
        else ""
      if (op.nonEmpty) FCmp(l, op, parseAdditive())
      else if (tryKeyword("IN")) FIn(l, parseExprList(), positive = true)
      else if (tryKeyword("NOT")) {
        keyword("IN"); FIn(l, parseExprList(), positive = false)
      } else FEbv(l)
    }

    private def parseExprList(): Seq[VExpr] = {
      expect('(')
      val args = scala.collection.mutable.ArrayBuffer(parseAdditive())
      skipWs()
      while (peek == ',') { pos += 1; args += parseAdditive(); skipWs() }
      expect(')')
      args.toSeq
    }

    private def parseStringLit(): String = parseNode() match {
      case Const(t) if t.isLit => t.lex
      case _ => fail("expected a string literal")
    }

    private def parseVExpr(): VExpr = parseAdditive()

    // expression grammar with standard precedence:
    //   additive := mult (('+'|'-') mult)* ; mult := prim (('*'|'/') prim)*
    private def parseAdditive(): VExpr = {
      var e = parseMultiplicative()
      skipWs()
      while (pos < text.length && (peek == '+' || peek == '-')) {
        val op = peek.toString; pos += 1
        e = VBin(op, e, parseMultiplicative()); skipWs()
      }
      e
    }

    private def parseMultiplicative(): VExpr = {
      var e = parsePrimaryV()
      skipWs()
      while (pos < text.length && (peek == '*' || peek == '/')) {
        val op = peek.toString; pos += 1
        e = VBin(op, e, parsePrimaryV()); skipWs()
      }
      e
    }

    private val UNARY_FNS =
      Seq("STRLEN", "UCASE", "LCASE", "ABS", "ROUND", "CEIL", "FLOOR",
        "IRI", "URI", "ENCODE_FOR_URI",
        "MD5", "SHA1", "SHA256", "SHA384", "SHA512",
        "YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS", "TZ", "TIMEZONE",
        "SUBJECT", "PREDICATE", "OBJECT", "LANGDIR")
    private val NARY_FNS =
      Seq("CONCAT", "SUBSTR", "REPLACE", "STRBEFORE", "STRAFTER",
        "STRDT", "STRLANG", "TRIPLE", "STRLANGDIR")
    // nondeterministic builtins (§17.4.2 / §17.4.5): zero-argument;
    // BNODE is handled separately (0 or 1 argument)
    private val NILADIC_FNS = Seq("NOW", "UUID", "STRUUID", "RAND")
    private val AGG_FNS =
      Seq("GROUP_CONCAT", "COUNT", "SUM", "MIN", "MAX", "AVG", "SAMPLE")

    /** Next token is an aggregate keyword (no consumption; tryKeyword's
      * prefixed-name lookahead applies, so `sum:x` stays a pname).
      */
    private def peekAgg(): Boolean = {
      val save = pos
      val hit = AGG_FNS.exists(tryKeyword)
      pos = save
      hit
    }

    private def parsePrimaryV(): VExpr = {
      skipWs()
      if (peek == '(') { pos += 1; val e = parseAdditive(); expect(')'); e }
      else if (peekAgg()) {
        val (func, arg, isDistinct, sep) = parseAggCall()
        VAgg(func, arg, isDistinct, sep)
      }
      else if (tryKeyword("IF")) {
        expect('('); val c = parseFilterOr(); expect(',')
        val t = parseAdditive(); expect(',')
        val f = parseAdditive(); expect(')')
        VIf(c, t, f)
      } else if (tryKeyword("COALESCE")) {
        VCoalesce(parseExprList())
      } else if (tryKeyword("STR") || tryKeyword("LANG") || tryKeyword("DATATYPE")) {
        val func = text.substring(0, pos).trim.split("[^A-Za-z]").last.toUpperCase
        expect('(')
        val a = parseAdditive()
        expect(')')
        VFn(func, a)
      } else if (UNARY_FNS.exists(tryKeyword)) {
        // keep '_' in the class: ENCODE_FOR_URI must not truncate to URI
        val func = text.substring(0, pos).trim.split("[^A-Za-z0-9_]").last.toUpperCase
        expect('(')
        val a = parseAdditive()
        expect(')')
        VFnN(func, Seq(a))
      } else if (NARY_FNS.exists(tryKeyword)) {
        val func = text.substring(0, pos).trim.split("[^A-Za-z0-9_]").last.toUpperCase
        VFnN(func, parseExprList())
      } else if (NILADIC_FNS.exists(tryKeyword)) {
        val func = text.substring(0, pos).trim.split("[^A-Za-z0-9_]").last.toUpperCase
        expect('('); expect(')')
        VFnN(func, Seq.empty)
      } else if (tryKeyword("BNODE")) {
        expect('(')
        skipWs()
        if (peek == ')') { pos += 1; VFnN("BNODE", Seq.empty) }
        else { val a = parseAdditive(); expect(')'); VFnN("BNODE", Seq(a)) }
      } else if (peek == '?') VVar(parseVar())
      else parseNode() match {
        case Const(t) if t.isIri && { skipWs(); peek == '(' } =>
          // IRI function call: XSD casting constructors only (§17.5)
          if (!CAST_TARGETS.contains(t.lex))
            fail(s"unsupported function <${t.lex}>")
          val args = parseExprList()
          if (args.size != 1) fail("a casting constructor takes one argument")
          VCast(t.lex, args.head)
        case Const(t) => VConst(t)
        case _ => fail("expected a value expression")
      }
    }

    private val CAST_TARGETS: Set[String] = Set(
      Term.XSD_STRING, Term.XSD_INTEGER, Term.XSD_DECIMAL,
      Term.XSD_DOUBLE, Term.XSD_FLOAT, Term.XSD_BOOLEAN,
      Term.XSD_DATETIME, Term.XSD_DATE)

    /** `PREFIX pfx: <iri>` declarations (SPARQL grammar `Prologue`);
      * populates the pname expansion table used by [[parseNode]].
      */
    private[sparql] def parsePrologue(): Unit = {
      var more = true
      while (more) {
        if (tryKeyword("PREFIX")) {
          skipWs()
          val start = pos
          while (pos < text.length && text.charAt(pos) != ':' &&
                 !text.charAt(pos).isWhitespace) pos += 1
          val pfx = text.substring(start, pos)
          expect(':')
          parseNode() match {
            case Const(t) if t.isIri => prefixes(pfx) = t.lex
            case _ => fail("PREFIX expects an IRI")
          }
        } else if (tryKeyword("BASE")) {
          // BASE declarations interleave with PREFIX; later IRIs (and
          // later PREFIX expansions) resolve against the latest BASE
          parseNode() match {
            case Const(t) if t.isIri => base = t.lex
            case _ => fail("BASE expects an IRI")
          }
        } else more = false
      }
    }

    private val prefixes = scala.collection.mutable.Map[String, String]()
    private var base: String = null

    /** Resolve a (possibly relative) IRI reference against the BASE
      * declaration — same merge rules as [[graft.rdf.TurtleParser]].
      */
    private def resolveIri(iri: String): String = {
      if (base == null || iri.contains("://") || iri.startsWith("urn:") ||
          iri.startsWith("mailto:") || iri.startsWith("uuid:")) iri
      else if (iri.startsWith("#")) {
        val h = base.indexOf('#')
        (if (h >= 0) base.substring(0, h) else base) + iri
      } else if (iri.isEmpty) base
      else if (iri.startsWith("/")) {
        val schemeEnd = base.indexOf("://")
        if (schemeEnd < 0) base + iri
        else {
          val pathStart = base.indexOf('/', schemeEnd + 3)
          (if (pathStart < 0) base else base.substring(0, pathStart)) + iri
        }
      } else {
        val cut = base.lastIndexOf('/')
        if (cut < 0) base + iri else base.substring(0, cut + 1) + iri
      }
    }

    private[sparql] def parseNode(): Node = {
      skipWs()
      peek match {
        case '?' => Var(parseVar())
        // SPARQL-star quoted triple pattern `<< s p o >>`
        case '<' if pos + 1 < text.length && text.charAt(pos + 1) == '<' =>
          pos += 2
          val s = parseNode()
          val p = parseNode()
          val o = parseNode()
          skipWs()
          if (!(pos + 1 < text.length && peek == '>' && text.charAt(pos + 1) == '>'))
            fail("unterminated quoted triple: expected '>>'")
          pos += 2
          s match {
            case Const(t) if !t.isIri && !t.isBlank && !t.isTriple =>
              fail("quoted-triple subject must be an IRI, blank node, or quoted triple")
            case _ => ()
          }
          p match {
            case Const(t) if !t.isIri => fail("quoted-triple predicate must be an IRI")
            case _ => ()
          }
          (s, p, o) match {
            case (Const(st), Const(pt), Const(ot)) => Const(Term.quoted(st, pt, ot))
            case _ => QTriple(s, p, o)
          }
        case '<' =>
          pos += 1
          val end = text.indexOf('>', pos)
          if (end < 0) fail("unterminated IRI")
          val iri = text.substring(pos, end); pos = end + 1
          Const(Term.iri(resolveIri(iri)))
        case q @ ('"' | '\'') =>
          pos += 1
          val sb = new StringBuilder
          while (pos < text.length && text.charAt(pos) != q) {
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
        // bare numeric literal (SPARQL §19.8 NumericLiteral): digits →
        // xsd:integer, a dot followed by digits → xsd:decimal, an
        // exponent → xsd:double
        case c if c.isDigit || ((c == '-' || c == '+') &&
            pos + 1 < text.length && text.charAt(pos + 1).isDigit) =>
          val start = pos
          if (c == '-' || c == '+') pos += 1
          while (pos < text.length && text.charAt(pos).isDigit) pos += 1
          val isDec = pos + 1 < text.length && text.charAt(pos) == '.' &&
            text.charAt(pos + 1).isDigit
          if (isDec) {
            pos += 1
            while (pos < text.length && text.charAt(pos).isDigit) pos += 1
          }
          val isDouble = pos < text.length &&
            (text.charAt(pos) == 'e' || text.charAt(pos) == 'E') && {
              var i = pos + 1
              if (i < text.length && (text.charAt(i) == '+' || text.charAt(i) == '-')) i += 1
              i < text.length && text.charAt(i).isDigit
            }
          if (isDouble) {
            pos += 1
            if (text.charAt(pos) == '+' || text.charAt(pos) == '-') pos += 1
            while (pos < text.length && text.charAt(pos).isDigit) pos += 1
          }
          Const(Term.typed(text.substring(start, pos),
            if (isDouble) Term.XSD_DOUBLE
            else if (isDec) Term.XSD_DECIMAL else Term.XSD_INTEGER))
        case '_' if pos + 1 < text.length && text.charAt(pos + 1) == ':' =>
          pos += 2
          val start = pos
          while (pos < text.length && (text.charAt(pos).isLetterOrDigit ||
                 text.charAt(pos) == '_' || text.charAt(pos) == '-')) pos += 1
          if (pos == start) fail("empty blank node label")
          Const(Term.blank(text.substring(start, pos)))
        case c if c.isLetter || c == ':' =>
          // prefixed name pfx:local (expanded against the prologue)
          val start = pos
          while (pos < text.length && text.charAt(pos) != ':' &&
                 (text.charAt(pos).isLetterOrDigit || text.charAt(pos) == '_' ||
                  text.charAt(pos) == '-' || text.charAt(pos) == '.')) pos += 1
          if (pos >= text.length || text.charAt(pos) != ':')
            fail(s"unexpected token '${text.substring(start, pos).take(20)}'")
          val pfx = text.substring(start, pos)
          pos += 1
          val ls = pos
          // local part: no trailing dot (a dot ends the triple)
          while (pos < text.length && (text.charAt(pos).isLetterOrDigit ||
                 text.charAt(pos) == '_' || text.charAt(pos) == '-' ||
                 (text.charAt(pos) == '.' && pos + 1 < text.length &&
                  (text.charAt(pos + 1).isLetterOrDigit || text.charAt(pos + 1) == '_')))) pos += 1
          prefixes.get(pfx) match {
            case Some(ns) => Const(Term.iri(ns + text.substring(ls, pos)))
            case None => fail(s"undeclared prefix '$pfx:'")
          }
        case c => fail(s"unexpected character '$c'")
      }
    }

    private[sparql] def parseVar(): String = {
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
      val digits = text.substring(start, pos)
      // a bound past Int range is a clean parse error, not a raw
      // NumberFormatException escaping the parse-or-RdfParseException
      // totality contract (LIMIT/OFFSET, path {n,m} bounds)
      try digits.toInt
      catch { case _: NumberFormatException =>
        fail(s"integer out of range: $digits") }
    }

    private[sparql] def peek: Char = if (pos < text.length) text.charAt(pos) else '\u0000'
    /** Whitespace AND `#` line comments (SPARQL grammar WS). A `#`
      * inside an IRI or string literal never reaches here — the
      * `<...>` and quote scanners consume those byte-by-byte.
      */
    private[sparql] def skipWs(): Unit = {
      var more = true
      while (more) {
        while (pos < text.length && text.charAt(pos).isWhitespace) pos += 1
        if (pos < text.length && text.charAt(pos) == '#')
          while (pos < text.length && text.charAt(pos) != '\n') pos += 1
        else more = false
      }
    }
    private[sparql] def expect(c: Char): Unit = {
      skipWs()
      if (pos >= text.length || text.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }
    private[sparql] def keyword(kw: String): Unit =
      if (!tryKeyword(kw)) fail(s"expected $kw")
    private[sparql] def tryKeyword(kw: String): Boolean = {
      skipWs()
      if (!text.regionMatches(true, pos, kw, 0, kw.length)) return false
      var i = pos + kw.length
      if (i < text.length && text.charAt(i).isLetterOrDigit) return false
      // lookahead over the remaining prefix-label chars: if they run
      // into a ':', this is a prefixed name whose label starts with a
      // keyword (values:x, values_x:y), not the keyword itself
      while (i < text.length && (text.charAt(i).isLetterOrDigit ||
             text.charAt(i) == '_' || text.charAt(i) == '-' ||
             text.charAt(i) == '.')) i += 1
      if (i < text.length && text.charAt(i) == ':') return false
      pos += kw.length
      true
    }
    private[sparql] def tryToken(tok: String): Boolean = {
      skipWs()
      if (text.startsWith(tok, pos)) { pos += tok.length; true } else false
    }
    private[sparql] def fail(msg: String): Nothing =
      throw new RdfParseException(s"SPARQL parse error at $pos: $msg")
  }
}
