package graft.rdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Turtle / TriG serialization with prefix compaction —
  * the human-readable egress twin of [[NtWriter]] (the reference
  * ecosystem moves datasets around as Turtle/TriG files at least as
  * often as N-Quads; FK-CLI's dump tooling accepts both).
  *
  * Shape: ONE text block per (graph, subject) group — predicate
  * lists joined with `;`, object lists with `,`, `rdf:type`
  * written as `a`, IRIs compacted to prefixed names where a
  * namespace from the supplied prefix map matches and the local
  * part is PN_LOCAL-safe. A named-graph block serializes as
  * `<g> { s ... . }` — TriG permits repeating the same graph label
  * across blocks, so a huge graph never has to funnel through one
  * row/task: the unit of parallelism stays (graph, subject).
  *
  * Everything is built-in Column expressions (two partial-agg
  * shuffles: (g,s,p) then (g,s)); no UDF, no driver hop. Every
  * shard of [[exportTurtle]]/[[exportTriG]] is prepended the
  * `@prefix` header so each part file is a standalone parseable
  * document — at 100 TB an export is many files, and a consumer
  * must be able to stream any one of them independently.
  *
  * Round-trip: TurtleWriter output → [[TurtleParser]] → the same
  * quad set (FuzzSpec property over generated terms).
  */
object TurtleWriter {

  /** Longest-match prefix compaction of an IRI lexical to a
    * prefixed name, else the `<...>` token. Conservative PN_LOCAL
    * subset: word chars, digits, '-', '.' (not leading/trailing),
    * so no escaping is ever needed in the emitted local part.
    */
  private def iriToken(lex: Column, prefixes: Seq[(String, String)]): Column = {
    val full = concat(lit("<"), lex, lit(">"))
    // longest namespace first so nested namespaces pick the tightest
    val ordered = prefixes.sortBy { case (_, ns) => -ns.length }
    ordered.foldRight(full) { case ((pfx, ns), alt) =>
      val local = substring(lex, ns.length + 1, 1 << 24)
      val localOk = local.rlike("^(?:[A-Za-z0-9_][A-Za-z0-9_.-]*)?$") &&
        !local.rlike("\\.$")
      when(lex.startsWith(ns) && localOk, concat(lit(pfx), lit(":"), local))
        .otherwise(alt)
    }
  }

  /** One term struct as its Turtle token (prefix-compacted IRIs,
    * literal short escaping via the shared N-Triples rules —
    * strings, tags and typed literals are the same tokens in both
    * grammars; quoted-triple lex is already a valid Turtle-star
    * token).
    */
  def termToken(c: Column, prefixes: Seq[(String, String)]): Column = {
    val lex = c.getField("lex")
    val dt = c.getField("datatype")
    val lang = c.getField("lang")
    when(c.getField("termType") === Term.IRI, iriToken(lex, prefixes))
      .when(c.getField("termType") === Term.BLANK, concat(lit("_:"), lex))
      .when(c.getField("termType") === Term.TRIPLE, lex)
      .otherwise(concat(lit("\""), NtWriter.esc(lex), lit("\""),
        when(lang.isNotNull, concat(lit("@"), lang))
          .when(dt.isNotNull && dt =!= Term.XSD_STRING,
            concat(lit("^^"), iriToken(dt, prefixes)))
          .otherwise(lit(""))))
  }

  /** A quads DataFrame (graph, subject, predicate, obj) as one
    * `line` STRING column of per-(graph, subject) Turtle/TriG
    * blocks. Deterministic: object lists and predicate lists are
    * sort_array'd, so the line SET depends only on the quad set.
    */
  def turtleLines(quads: DataFrame, prefixes: Map[String, String]): DataFrame = {
    val pfx = prefixes.toSeq
    val predTok =
      when(col("predicate").getField("termType") === Term.IRI &&
           col("predicate").getField("lex") === Term.RDF_TYPE, lit("a"))
        .otherwise(termToken(col("predicate"), pfx))
    val perPred = quads
      .select(
        termToken(col("graph"), pfx).as("g"),
        termToken(col("subject"), pfx).as("s"),
        predTok.as("p"),
        termToken(col("obj"), pfx).as("o"))
      .groupBy(col("g"), col("s"), col("p"))
      .agg(concat_ws(", ", sort_array(collect_list(col("o")))).as("objs"))
      .select(col("g"), col("s"), concat(col("p"), lit(" "), col("objs")).as("po"))
    perPred
      .groupBy(col("g"), col("s"))
      .agg(concat_ws(" ; ", sort_array(collect_list(col("po")))).as("pos"))
      .select(
        when(col("g").isNotNull,
          concat(col("g"), lit(" { "), col("s"), lit(" "), col("pos"), lit(" . }")))
          .otherwise(concat(col("s"), lit(" "), col("pos"), lit(" .")))
          .as("line"))
  }

  /** The `@prefix` directive lines for a prefix map (sorted — the
    * header is part of the deterministic contract).
    */
  def prefixHeader(prefixes: Map[String, String]): Seq[String] =
    prefixes.toSeq.sortBy(_._1).map { case (p, ns) => s"@prefix $p: <$ns> ." }

  /** Write sharded Turtle (default graph only — named-graph rows are
    * an error in Turtle; use [[exportTriG]]). Each part file gets
    * the prefix header, so every shard parses standalone.
    *
    * A dataset containing named-graph quads FAILS the export rather
    * than silently dropping them (the check is a short-circuiting
    * take(1) over a single pruned column, not a full scan).
    */
  def exportTurtle(quads: DataFrame, prefixes: Map[String, String], path: String): Unit = {
    val hdr = prefixHeader(prefixes)
    import quads.sparkSession.implicits._
    if (!quads.filter(col("graph").isNotNull).isEmpty)
      throw new IllegalArgumentException(
        "exportTurtle: dataset contains named-graph quads, which Turtle " +
        "cannot represent — use exportTriG (or filter to the default graph " +
        "explicitly before exporting)")
    turtleLines(quads.filter(col("graph").isNull), prefixes)
      .select(col("line")).as[String]
      .mapPartitions(it => hdr.iterator ++ it)
      .write.mode("overwrite").text(path)
  }

  /** Write sharded TriG (default + named graphs; every shard is a
    * standalone document).
    */
  def exportTriG(quads: DataFrame, prefixes: Map[String, String], path: String): Unit = {
    val hdr = prefixHeader(prefixes)
    import quads.sparkSession.implicits._
    turtleLines(quads, prefixes)
      .select(col("line")).as[String]
      .mapPartitions(it => hdr.iterator ++ it)
      .write.mode("overwrite").text(path)
  }
}
