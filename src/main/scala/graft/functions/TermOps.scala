package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.{bridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** SPARQL VALUE semantics over the engine's term struct — the cases
  * Catalyst's structural equality gets silently wrong (SURVEY.md §4.2):
  * `"01"^^xsd:integer` equals `"1"^^xsd:integer` in SPARQL value space
  * but not byte-wise, `"1.0"^^xsd:decimal` equals `"1"^^xsd:integer`,
  * and a plain `"a"` never equals `"a"@en`. Implemented as a native
  * Catalyst expression (codegen'd via a static helper) rather than a
  * rewrite rule, exactly because a rule could not see the value space.
  */
object TermOps {

  private val NUMERIC_DATATYPES = Set(
    graft.rdf.Term.XSD + "integer", graft.rdf.Term.XSD + "decimal",
    graft.rdf.Term.XSD + "double", graft.rdf.Term.XSD + "float",
    graft.rdf.Term.XSD + "int", graft.rdf.Term.XSD + "long",
    graft.rdf.Term.XSD + "short", graft.rdf.Term.XSD + "byte",
    graft.rdf.Term.XSD + "nonNegativeInteger", graft.rdf.Term.XSD + "positiveInteger")

  /** SPARQL `=` between two term-struct columns. */
  def termValueEquals(a: Column, b: Column): Column =
    ExpressionUtils.column(TermValueEquals(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))

  /** Evaluate SPARQL value equality over two term InternalRows with
    * fields (termType, lex, datatype, lang).
    */
  def valueEquals(a: InternalRow, b: InternalRow): Boolean = {
    def f(r: InternalRow, i: Int): String =
      if (r.isNullAt(i)) null else r.getUTF8String(i).toString
    val (tA, lexA, dtA, lgA) = (f(a, 0), f(a, 1), f(a, 2), f(a, 3))
    val (tB, lexB, dtB, lgB) = (f(b, 0), f(b, 1), f(b, 2), f(b, 3))
    if (tA != tB) return false
    if (tA != graft.rdf.Term.LIT) return lexA == lexB // IRI/blank: identity
    val numA = dtA != null && NUMERIC_DATATYPES.contains(dtA)
    val numB = dtB != null && NUMERIC_DATATYPES.contains(dtB)
    if (numA && numB) {
      try return new java.math.BigDecimal(lexA).compareTo(new java.math.BigDecimal(lexB)) == 0
      catch { case _: NumberFormatException => return false }
    }
    // plain/lang strings: lexical form AND language must match; a
    // plain literal never equals a lang-tagged one
    lexA == lexB && lgA == lgB && dtA == dtB
  }
}

/** See [[TermOps.termValueEquals]]. */
final case class TermValueEquals(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isTermStruct(dt: DataType): Boolean = dt match {
    case StructType(fields) =>
      fields.map(_.name).toSeq == Seq("termType", "lex", "datatype", "lang")
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isTermStruct(left.dataType) && isTermStruct(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two term structs, got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "term_value_equals"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TermOps.valueEquals(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TermOps.valueEquals($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TermValueEquals =
    copy(left = l, right = r)
}
