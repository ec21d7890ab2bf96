package graft.rdf

import scala.collection.mutable.ArrayBuffer

/** RDF Patch parser (reference fixture patch1.rdfp; op semantics per
  * RDFChangesApplyExternalTransaction.java:22-41).
  *
  * Grammar (line-oriented): `H <key> <term> .` header, `TX .`/`TC .`/
  * `TA .` transaction markers, `A s p o [g] .` add, `D s p o [g] .`
  * delete, `PA "prefix" <iri> [g] .` / `PD "prefix" [g] .` prefix ops.
  *
  * Note: nested `TX` (the malformed.rdfp fixture) parses fine — it is
  * an APPLY-time failure (abort + DLQ), not a deserialization failure,
  * matching the reference's two failure classes
  * (FusekiProjector.java:258-277).
  */
object RdfPatchParser {

  def parse(doc: String): Seq[PatchOp] = {
    val out = ArrayBuffer[PatchOp]()
    var lineNo = 0
    var start = 0
    val n = doc.length
    while (start <= n) {
      val nl = doc.indexOf('\n', start)
      val end = if (nl < 0) n else nl
      lineNo += 1
      if (end > start) parseLine(doc, start, end, lineNo, out)
      start = end + 1
      if (nl < 0) start = n + 1
    }
    out.toSeq
  }

  private def parseLine(doc: String, from: Int, to: Int, lineNo: Int,
                        out: ArrayBuffer[PatchOp]): Unit = {
    val s = new NQuadsParser.Scanner(doc, from, to, lineNo)
    s.skipWs()
    if (s.atEnd || s.peek == '#') return
    val opStart = s.pos
    while (!s.atEnd && s.peek.isLetter) s.advance()
    val op = doc.substring(opStart, s.pos)
    op match {
      case "TX" | "TC" | "TA" =>
        expectDot(s)
        out += PatchOp(op, null, null, null, null)
      case "H" =>
        s.skipWs()
        // header key is a bare word (e.g. `id`), value any term
        val kStart = s.pos
        while (!s.atEnd && s.peek != ' ' && s.peek != '\t') s.advance()
        val key = doc.substring(kStart, s.pos)
        val v = s.term()
        expectDot(s)
        // carried as subject=key-literal, obj=value for observability
        out += PatchOp("H", null, Term.lit(key), null, v)
      case "A" | "D" =>
        val subj = s.term()
        val pred = s.term()
        val obj = s.term()
        s.skipWs()
        var g: Term = null
        if (!s.atEnd && s.peek != '.') g = s.term()
        expectDot(s)
        out += PatchOp(op, g, subj, pred, obj)
      case "PA" =>
        val p = s.term()
        val iri = s.term()
        s.skipWs()
        var g: Term = null
        if (!s.atEnd && s.peek != '.') g = s.term()
        expectDot(s)
        out += PatchOp("PA", g, p, null, iri)
      case "PD" =>
        val p = s.term()
        s.skipWs()
        var g: Term = null
        if (!s.atEnd && s.peek != '.') g = s.term()
        expectDot(s)
        out += PatchOp("PD", g, p, null, null)
      case other =>
        s.fail(s"unknown patch op '$other'")
    }
  }

  private def expectDot(s: NQuadsParser.Scanner): Unit = {
    s.skipWs()
    if (s.atEnd || s.peek != '.') s.fail("missing '.' terminator")
    s.advance()
  }

  /** Apply-time transaction-marker validation: the reference's
    * malformed.rdfp (TX then TX) must fail at apply, after parse.
    * Returns the ops with markers/headers/prefix-ops stripped, i.e.
    * just the A/D stream, or throws on invalid marker nesting.
    */
  def dataOps(ops: Seq[PatchOp]): Seq[PatchOp] = {
    var inTxn = false
    val out = ArrayBuffer[PatchOp]()
    ops.foreach { o =>
      o.op match {
        case "TX" =>
          if (inTxn) throw new RdfParseException("TX inside an open patch transaction")
          inTxn = true
        case "TC" | "TA" =>
          if (!inTxn) throw new RdfParseException(s"${o.op} without open patch transaction")
          inTxn = false
        case "A" | "D" => out += o
        case _ => // H / PA / PD: no dataset effect
      }
    }
    out.toSeq
  }
}
