package graft.rdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed N-Quads serialization — the egress path (the reference
  * ecosystem's dataset backup is an N-Quads dump of the Fuseki
  * dataset; here it is one codegen'd projection + a parallel text
  * write, no driver hop). Inverse of [[NQuadsParser]]: `ntLines`
  * round-trips through it term-for-term (FuzzSpec property).
  */
object NtWriter {

  /** Literal-lexical escaping per the N-Triples grammar — the Column
    * twin of `Term.escapeLiteral` (backslash FIRST, then the quote
    * and the three control chars the grammar forbids raw).
    */
  private[rdf] def esc(c: Column): Column = {
    val noBs = regexp_replace(c, "\\\\", "\\\\\\\\")
    val noQ = regexp_replace(noBs, "\"", "\\\\\"")
    val noNl = regexp_replace(noQ, "\n", "\\\\n")
    val noCr = regexp_replace(noNl, "\r", "\\\\r")
    regexp_replace(noCr, "\t", "\\\\t")
  }

  /** One RDF term struct (termType, lex, datatype, lang) as its
    * N-Triples token.
    */
  def termNt(c: Column): Column = {
    val lex = c.getField("lex")
    val dt = c.getField("datatype")
    val lang = c.getField("lang")
    when(c.getField("termType") === Term.IRI,
        concat(lit("<"), lex, lit(">")))
      .when(c.getField("termType") === Term.BLANK,
        concat(lit("_:"), lex))
      // quoted triple: lex IS the canonical `<<s p o>>` token
      .when(c.getField("termType") === Term.TRIPLE, lex)
      .otherwise(concat(lit("\""), esc(lex), lit("\""),
        when(lang.isNotNull, concat(lit("@"), lang))
          .when(dt.isNotNull && dt =!= Term.XSD_STRING,
            concat(lit("^^<"), dt, lit(">")))
          .otherwise(lit(""))))
  }

  /** A quads DataFrame (graph, subject, predicate, obj) as one
    * `line` STRING column of N-Quads statements (default-graph rows
    * omit the graph token).
    */
  def ntLines(quads: DataFrame): DataFrame =
    quads.select(concat(
      termNt(col("subject")), lit(" "),
      termNt(col("predicate")), lit(" "),
      termNt(col("obj")),
      when(col("graph").isNotNull,
        concat(lit(" "), termNt(col("graph")))).otherwise(lit("")),
      lit(" .")).as("line"))

  /** Write the dataset as sharded N-Quads text files — each task
    * writes its partition directly (scales with executors; the line
    * set, not the file count, is the contract).
    */
  def exportNQuads(quads: DataFrame, path: String): Unit =
    ntLines(quads).write.mode("overwrite").text(path)
}
